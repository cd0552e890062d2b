package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** SQL extension registration, source/sink round-trips, pipeline. */
class InfraSpec extends SparkSpec {

  test("GraftExtensions expose native functions to SQL") {
    graft.plans.GraftExtensions.register(spark)
    locally {
      val r = spark.sql(
        """SELECT pip(0.5D, 0.5D, array(0D,1D,1D,0D), array(0D,0D,1D,1D)) AS inside,
          |  vec_dot(array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)),
          |          array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS dot,
          |  vec_norm(array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))) AS nrm,
          |  minhash_sketch(array('a','b','c'))[16] AS n_shingles,
          |  size(shingle_hashes(array('a','b','c'))) AS n_hashes
          |""".stripMargin).head()
      assert(r.getBoolean(0))
      assert(r.getDouble(1) === 11.0)
      assert(r.getDouble(2) === 5.0)
      assert(r.getLong(3) === 2L) // shingles: "a b", "b c"
      assert(r.getInt(4) === 2)
    }
  }

  test("partitioned write round-trips and prunes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val df = Tables.orders(spark, sfDir)
    Sources.writePartitioned(df, dir, Seq("o_orderstatus"))
    val back = Sources.readParquet(spark, dir)
    assert(back.count() === df.count())
    // partition filter must prune to the one directory
    val plan = back.filter(col("o_orderstatus") === "F")
      .queryExecution.executedPlan.toString
    assert(back.filter(col("o_orderstatus") === "F").count() ===
      df.filter(col("o_orderstatus") === "F").count())
    assert(plan.contains("PartitionFilters") || !plan.contains("o_orderstatus = F"))
  }

  test("csv round-trip with explicit schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    Tables.nation(spark, sfDir).write.mode("overwrite")
      .option("header", "true").csv(dir)
    val back = Sources.readCsv(spark, dir,
      "n_nationkey INT, n_name STRING, n_regionkey INT")
    assert(back.count() === 25)
    assert(back.schema.fieldNames.toSeq === Seq("n_nationkey", "n_name", "n_regionkey"))
  }

  test("salted join matches the plain join") {
    val l = Tables.orders(spark, sfDir)
    val s = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val plain = l.join(s, Seq("o_custkey")).count()
    val salted = graft.functions.Skew.saltedJoin(l, s, "o_custkey", 8).count()
    assert(salted === plain)
  }

  test("switchback pipeline stages compose and emit sane stats") {
    val out = operators.SwitchbackPipeline.run(spark, sfDir).collect()
    assert(out.length === 2) // two configured tests
    out.foreach { r =>
      assert(r.getLong(1) > 0 && r.getLong(2) > 0) // n_on, n_off
      val p = r.getAs[Double]("p_value")
      assert(p >= 0.0 && p <= 1.0)
    }
  }
}
