package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loud, self-diagnosing content invariants for the z-order SQL gates
  * (r11 verdict task 1). q_sql_zorder has hash-failed the DRIVER's
  * correctness artifact in two consecutive rounds while passing every
  * local rerun anyone has made (8+ attempts across two rounds, every
  * scale and parallelism) — so the divergence lives in an execution
  * environment we cannot attach to. These guards run INSIDE the query
  * path: every stage of the staging → OPTIMIZE ZORDER → catalog-read
  * chain is checked for exact content equality against the raw source
  * frame, and a divergence THROWS an error whose message names the
  * guilty stage and carries the manifest rows, per-file actual-vs-
  * manifest row counts, the rewrite's layout cuts, and the runtime
  * environment — landing in the correctness artifact as `err` text
  * instead of a mute `hash_match: false`.
  *
  * The fingerprint is exact and execution-shape independent: xxhash64
  * over the name-sorted columns, bucketed by the hash itself, with a
  * DECIMAL(38,0) sum per bucket (commutative, no overflow, no float
  * association) — the same identity under any partitioning, file
  * layout, or read path.
  */
object Invariants {

  /** A guard tripped: some stage of a lakehouse chain returned content
    * that differs from its proven-equal source. */
  class ContentDivergence(msg: String) extends IllegalStateException(msg)

  private def rowHash(df: DataFrame): Column =
    xxhash64(df.columns.sorted.toIndexedSeq.map(c => col(s"`$c`")): _*)

  /** Commutative exact fingerprint: bucket → (row count, Σ row-hash).
    * One column-complete pass; order/partitioning independent. */
  def fingerprint(df: DataFrame): Map[Int, (Long, java.math.BigDecimal)] = {
    val h = rowHash(df)
    df.groupBy(pmod(h, lit(16)).cast("int").as("__b"))
      .agg(count(lit(1)).as("__n"), sum(h.cast("decimal(38,0)")).as("__s"))
      .collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getDecimal(2))))
      .toMap
  }

  /** Exact content equality between `expected` and `actual`; on
    * divergence throws [[ContentDivergence]] naming `stage` with the
    * per-bucket deltas plus the caller's diagnostics. */
  def assertSameContent(stage: String, expected: DataFrame,
      actual: DataFrame, diag: => String): Unit = {
    val e = fingerprint(expected)
    val a = fingerprint(actual)
    if (e != a) {
      val keys = (e.keySet ++ a.keySet).toSeq.sorted
      val deltas = keys.filter(k => e.get(k) != a.get(k)).take(8).map { k =>
        def fmt(v: Option[(Long, java.math.BigDecimal)]) =
          v.map { case (n, s) => s"(n=$n, sum=$s)" }.getOrElse("(absent)")
        s"  bucket $k: expected=${fmt(e.get(k))} actual=${fmt(a.get(k))}"
      }
      val (en, an) = (e.values.map(_._1).sum, a.values.map(_._1).sum)
      throw new ContentDivergence(
        s"[$stage] content divergence (expected $en rows, actual $an):\n" +
          deltas.mkString("\n") + "\n" + diag)
    }
  }

  /** Exact equality of two SMALL ordered answer frames (both collect);
    * on divergence throws with the first differing rows + diagnostics.
    * Returns `actual` so the caller can hand it on. */
  def assertSameAnswer(stage: String, expected: DataFrame,
      actual: DataFrame, diag: => String): DataFrame = {
    val cols = actual.columns.toIndexedSeq
    val e = expected.select(cols.map(c => col(s"`$c`")): _*).collect().toIndexedSeq
    val a = actual.collect().toIndexedSeq
    if (e != a) {
      val diffs = (0 until math.max(e.size, a.size)).iterator
        .filter(i => e.lift(i) != a.lift(i)).take(8).map { i =>
          s"  row $i: expected=${e.lift(i).getOrElse("(absent)")} " +
            s"actual=${a.lift(i).getOrElse("(absent)")}"
        }.toSeq
      throw new ContentDivergence(
        s"[$stage] answer divergence (expected ${e.size} rows, " +
          s"actual ${a.size}; columns ${cols.mkString(",")}):\n" +
          diffs.mkString("\n") + "\n" + diag)
    }
    actual
  }

  /** The forensic state a divergence message carries: the table's
    * version list, the head manifest (file, n_rows, stats), each data
    * file's ACTUAL row count read back from the parquet vs what the
    * manifest claims, the last z-order layout decisions, and the
    * runtime environment (parallelism, memory, tmp-dir free space,
    * load) — everything needed to adjudicate staging vs rewrite vs
    * read vs environment from the error text alone. */
  def snapshotDiagnostics(spark: SparkSession, path: String): String = {
    val sb = new StringBuilder
    try {
      val vs = Maintenance.snapshotVersions(spark, path)
      sb.append(s"versions: ${vs.mkString(",")}\n")
      val mf = Maintenance.snapshotManifest(spark, path)
      val mfRows = mf.orderBy("file").collect().take(32)
      sb.append(s"head manifest (${mfRows.length} rows):\n")
      mfRows.foreach(r => sb.append(s"  $r\n"))
      // actual per-file row counts, read back from the durable parquet
      val files = mfRows.map(_.getString(mf.columns.indexOf("file"))).toIndexedSeq
      if (files.nonEmpty) {
        val actual = spark.read.parquet(files.map(f => s"$path/data/$f"): _*)
          .groupBy(input_file_name().as("f")).agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1)))
        sb.append("actual per-file rows:\n")
        actual.sortBy(_._1).take(32).foreach { case (f, n) =>
          sb.append(s"  ${f.split('/').takeRight(2).mkString("/")}: $n\n")
        }
      }
    } catch {
      case e: Throwable => sb.append(s"(diagnostics read failed: $e)\n")
    }
    sb.append(s"last zorder layout: ${Maintenance.lastZorderLayout}\n")
    sb.append(envDiagnostics(spark))
    sb.toString
  }

  /** Runtime-environment one-liner: the driver-vs-local hypothesis
    * space (parallelism, memory pressure, disk space, box load). */
  def envDiagnostics(spark: SparkSession): String = {
    val rt = Runtime.getRuntime
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val load = try new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/loadavg"))).trim.split("\\s+")(0)
    catch { case _: Throwable => "n/a" }
    s"env: master=${spark.sparkContext.master} " +
      s"parallelism=${spark.sparkContext.defaultParallelism} " +
      s"shufflePartitions=${spark.conf.get("spark.sql.shuffle.partitions")} " +
      s"heapUsedMB=${(rt.totalMemory - rt.freeMemory) / (1 << 20)} " +
      s"heapMaxMB=${rt.maxMemory / (1 << 20)} " +
      s"tmp=${tmp.getAbsolutePath} tmpFreeGB=${tmp.getUsableSpace / (1 << 30)} " +
      s"load1m=$load"
  }
}
