package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: dump the formatted physical plan of one or more queries.
  * Usage: runMain graft.Explain <sfDir> [queryName ...] (no names = all).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq else Registry.ops.map(_.name)
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      try Registry.byName(n).fn(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"explain failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
