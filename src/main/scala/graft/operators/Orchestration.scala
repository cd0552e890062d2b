package graft.operators

import graft.{Op, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference DAG's orchestration semantics as a LIBRARY primitive —
  * the one reference behavior with no engine counterpart until r11
  * (dags/switchback_test_dag.py:14-23 default_args, :31-70 the chain):
  * a linear task chain with per-task bounded retries (`retries = 1`,
  * `retry_delay`), notification policy (`email_on_failure = True`,
  * `email_on_retry = False`, `email_on_success = True`, plus the
  * trailing EmailOperator success mail), and downstream tasks not
  * running after a failure (Airflow's default all_success trigger
  * rule).
  *
  * Re-expressed Spark-first: a task is a named `() => DataFrame` whose
  * action runs eagerly (the PythonOperator shape); the chain returns
  * the TASK-INSTANCE TABLE — (position, task_id, attempts, status,
  * n_rows, error) — which is what an Airflow user reads off the
  * metadata DB, and notifications go to a pluggable sink. The engine
  * is a library, so the default sink RECORDS what would be sent
  * instead of owning SMTP; a deployment passes its own sink. Driver
  * cost is one `count()` action per task — orchestration metadata,
  * not data movement; every task's own work is distributed.
  */
object Orchestration {

  /** One task instance, Airflow-metadata-shaped. `status` is
    * `success`, `failed` (retries exhausted), or `upstream_failed`
    * (never attempted — a predecessor failed). */
  final case class TaskRun(position: Int, task_id: String, attempts: Int,
      status: String, n_rows: Long, error: String)

  /** One notification the chain would send: `kind` is
    * `failure_email` / `retry_email` / `success_email`. */
  final case class Notice(kind: String, task_id: String, message: String)

  /** Run `tasks` in order with the reference DAG's semantics. Each
    * task gets `1 + retries` attempts (`retries = 1` is the reference
    * default), sleeping `retryDelayMs` between attempts; the first
    * failure marks the task `failed`, every later task
    * `upstream_failed`, and the chain emits a `failure_email` (when
    * `emailOnFailure`). A fully-successful chain emits the trailing
    * `success_email` (the EmailOperator counterpart). Notifications go
    * to `notify`; the returned frame is the task-instance table. */
  def runChain(spark: SparkSession,
      tasks: Seq[(String, () => DataFrame)],
      retries: Int = 1, retryDelayMs: Long = 0L,
      emailOnFailure: Boolean = true, emailOnRetry: Boolean = false,
      emailOnSuccess: Boolean = true,
      notify: Notice => Unit = _ => ()): DataFrame = {
    require(tasks.nonEmpty, "runChain needs at least one task")
    require(retries >= 0, s"retries must be >= 0, got $retries")
    val runs = scala.collection.mutable.Buffer.empty[TaskRun]
    var failedAt: Option[String] = None
    tasks.zipWithIndex.foreach { case ((id, body), pos) =>
      failedAt match {
        case Some(_) =>
          runs += TaskRun(pos, id, 0, "upstream_failed", 0L, "")
        case None =>
          var attempt = 0
          var done = false
          var lastErr = ""
          while (!done && attempt <= retries) {
            attempt += 1
            try {
              val n = body().count() // the eager action: the task RAN
              runs += TaskRun(pos, id, attempt, "success", n, "")
              done = true
            } catch {
              // NonFatal only: an OutOfMemoryError or interrupt must
              // propagate, not be swallowed into a retry loop (and
              // NonFatal already excludes InterruptedException, so the
              // interrupt status survives — no sleep-after-interrupt)
              case scala.util.control.NonFatal(e) =>
                lastErr = s"${e.getClass.getSimpleName}: " +
                  Option(e.getMessage).getOrElse("").take(200)
                if (attempt <= retries) {
                  if (emailOnRetry)
                    notify(Notice("retry_email", id,
                      s"attempt $attempt of task '$id' failed; retrying"))
                  if (retryDelayMs > 0) Thread.sleep(retryDelayMs)
                }
            }
          }
          if (!done) {
            runs += TaskRun(pos, id, attempt, "failed", 0L, lastErr)
            failedAt = Some(id)
            if (emailOnFailure)
              notify(Notice("failure_email", id,
                s"task '$id' failed after $attempt attempts: $lastErr"))
          }
      }
    }
    if (failedAt.isEmpty && emailOnSuccess)
      notify(Notice("success_email", tasks.last._1,
        "the chain has been successfully executed"))
    import spark.implicits._
    runs.toSeq.toDF()
  }

  /** The reference DAG's run, orchestration included (NEW r11): the
    * dummy → run_queries → run_analysis_script chain with the analysis
    * step failing TRANSIENTLY on its first attempt — the retry
    * (default_args retries = 1) absorbs it, the task-instance table
    * records attempts = 2, and the chain still reaches the success
    * mail. The oracle recomputes each task's row count from raw
    * events, so a skipped/duplicated retry or a miscounted task
    * hash-fails. */
  def dagRunQuery(spark: SparkSession, dir: String): DataFrame = {
    val transientOnce = new java.util.concurrent.atomic.AtomicBoolean(true)
    val report = runChain(spark, Seq(
      "dummy_task" -> (() => spark.range(1).toDF("ok")),
      "run_queries" -> (() => Tables.events(spark, dir)),
      "run_analysis_script" -> (() => {
        if (transientOnce.getAndSet(false))
          throw new IllegalStateException("transient backend error")
        Tables.events(spark, dir).groupBy("event_type").count()
      })), retries = 1)
    report.select(col("position").cast("int").as("position"),
      col("task_id"), col("attempts").cast("int").as("attempts"),
      col("status"), col("n_rows").cast("long").as("n_rows"))
      .orderBy("position")
  }

  private val dagRunOracle =
    """SELECT CAST(0 AS INT) AS position, 'dummy_task' AS task_id,
      |  CAST(1 AS INT) AS attempts, 'success' AS status,
      |  CAST(1 AS BIGINT) AS n_rows
      |UNION ALL
      |SELECT 1, 'run_queries', 1, 'success',
      |  (SELECT COUNT(*) FROM events)
      |UNION ALL
      |SELECT 2, 'run_analysis_script', 2, 'success',
      |  (SELECT COUNT(DISTINCT event_type) FROM events)
      |ORDER BY position""".stripMargin

  val ops: Seq[Op] = Seq(
    Op("q_dag_run", dagRunQuery, Some(dagRunOracle)),
  )
}
