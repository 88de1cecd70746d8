package graft.pipeline

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import scala.collection.mutable
import scala.util.control.NonFatal

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dependency-aware pipeline orchestration — the query-shaped analog of the
  * reference's six Airflow DAGs (airflow/dags: bronze→silver→gold→dbt→DQ
  * ordering with retries and SLAs). Medallion.runAll hardcodes the linear
  * order; real daily operation needs the DAG: independent branches run in
  * parallel, a failed stage blocks ONLY its dependents, completed stages are
  * skipped on re-run (per-stage idempotency), transient failures retry.
  *
  * Scale shape: the orchestrator itself is pure driver-side control flow —
  * each stage's work is whatever Spark jobs its `run` launches. Independent
  * stages run concurrently on a bounded pool (Spark's scheduler interleaves
  * their jobs across the cluster; the FAIR scheduler pools apply if
  * configured), so a 1000-executor cluster is kept busy across branches
  * instead of draining between the reference's sequential Airflow tasks.
  */
object Orchestrator {

  /** One pipeline stage.
    *
    * @param name       unique stage id
    * @param deps       names of stages that must SUCCEED (or be skipped as
    *                   already-done) before this one starts
    * @param run        the stage body (launches Spark jobs)
    * @param done       idempotency probe: true ⇒ the stage's output is
    *                   already materialized and valid, so `run` is skipped
    *                   (Airflow's "already succeeded in this interval");
    *                   checked once, immediately before the stage would run
    * @param maxRetries transient-failure retries (attempts = maxRetries + 1)
    * @param slaMs      duration SLA: a stage that takes longer is flagged
    *                   `sla_breached` in the report but NOT failed —
    *                   Airflow SLA semantics (alert, don't kill)
    */
  final case class Stage(
      name: String,
      deps: Seq[String] = Nil,
      run: () => Unit,
      done: () => Boolean = () => false,
      maxRetries: Int = 0,
      slaMs: Long = Long.MaxValue)

  /** Terminal state of one stage within a pipeline run. */
  final case class StageResult(
      stage: String,
      status: String, // success | skipped_done | failed | blocked
      attempts: Int,
      duration_ms: Long,
      sla_breached: Boolean,
      error: String)

  /** Run `stages` respecting dependencies; independent ready stages run
    * concurrently up to `parallelism`. Returns one StageResult per stage:
    * `success` (ran), `skipped_done` (idempotency probe said the output
    * already exists), `failed` (exhausted retries), `blocked` (an upstream
    * failed — never started). Throws on malformed DAGs (duplicate names,
    * unknown deps, cycles) — a wiring bug, not a runtime condition.
    */
  def run(stages: Seq[Stage], parallelism: Int = 4): Seq[StageResult] = {
    require(parallelism >= 1, "parallelism must be >= 1")
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size,
      s"duplicate stage names: ${stages.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", ")}")
    stages.foreach { s =>
      val unknown = s.deps.filterNot(byName.contains)
      require(unknown.isEmpty, s"stage '${s.name}' depends on unknown: ${unknown.mkString(", ")}")
    }
    assertAcyclic(stages)

    val results = new ConcurrentHashMap[String, StageResult]()
    val remainingDeps = new ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicInteger]()
    stages.foreach(s => remainingDeps.put(s.name,
      new java.util.concurrent.atomic.AtomicInteger(s.deps.size)))
    val dependents: Map[String, Seq[String]] = stages
      .flatMap(s => s.deps.map(_ -> s.name)).groupBy(_._1)
      .map { case (k, v) => k -> v.map(_._2) }
    val pool = Executors.newFixedThreadPool(parallelism)
    val allDone = new CountDownLatch(stages.size)
    // single lock serializes scheduling decisions (not stage work)
    val lock = new Object

    def finish(name: String, r: StageResult): Unit = {
      results.put(name, r)
      val ok = r.status == "success" || r.status == "skipped_done"
      lock.synchronized {
        dependents.getOrElse(name, Nil).foreach { d =>
          if (!ok) {
            // cascade: block the whole downstream cone exactly once
            if (results.putIfAbsent(d, StageResult(d, "blocked", 0, 0L, sla_breached = false,
                s"upstream '$name' ${r.status}")) == null) {
              allDone.countDown()
              finishBlocked(d)
            }
          } else if (remainingDeps.get(d).decrementAndGet() == 0 &&
                     !results.containsKey(d)) {
            pool.execute(() => exec(byName(d)))
          }
        }
      }
      allDone.countDown()
    }

    def finishBlocked(name: String): Unit =
      dependents.getOrElse(name, Nil).foreach { d =>
        if (results.putIfAbsent(d, StageResult(d, "blocked", 0, 0L, sla_breached = false,
            s"upstream '$name' blocked")) == null) {
          allDone.countDown()
          finishBlocked(d)
        }
      }

    def exec(s: Stage): Unit = {
      val t0 = System.nanoTime()
      def result(status: String, attempts: Int, error: String) = {
        val ms = elapsedMs(t0)
        StageResult(s.name, status, attempts, ms,
          sla_breached = status != "skipped_done" && ms > s.slaMs, error)
      }
      val r =
        try {
          val isDone =
            try s.done()
            catch { case NonFatal(e) => throw new IllegalStateException(
              s"idempotency probe failed: ${e.getMessage}", e) }
          if (isDone) result("skipped_done", 0, "")
          else {
            var attempt = 0
            var lastErr: Throwable = null
            var succeeded = false
            while (!succeeded && attempt <= s.maxRetries) {
              attempt += 1
              try { s.run(); succeeded = true }
              catch { case NonFatal(e) => lastErr = e }
            }
            if (succeeded) result("success", attempt, "")
            else result("failed", attempt,
              Option(lastErr.getMessage).getOrElse(lastErr.getClass.getName))
          }
        } catch {
          // Throwable, not NonFatal: a fatal stage error (OOM, linkage,
          // interrupt) must still produce a terminal result — otherwise
          // the latch never counts down and run() hangs forever. Fatal
          // errors also skip the retry loop by construction (the inner
          // catch is NonFatal), which is the right call: retrying an OOM
          // repeats it.
          case e: InterruptedException =>
            Thread.currentThread().interrupt()
            result("failed", 0, s"interrupted: ${e.getMessage}")
          case e: Throwable =>
            result("failed", 0,
              Option(e.getMessage).getOrElse(e.getClass.getName))
        }
      finish(s.name, r)
    }

    try {
      lock.synchronized {
        stages.filter(_.deps.isEmpty).foreach(s => pool.execute(() => exec(s)))
      }
      allDone.await()
    } finally {
      pool.shutdown()
      pool.awaitTermination(1, TimeUnit.MINUTES)
      ()
    }
    // report in declaration order — stable for tests and dashboards
    stages.map(s => results.get(s.name))
  }

  private def elapsedMs(t0: Long): Long = (System.nanoTime() - t0) / 1000000L

  /** Kahn's algorithm purely for cycle detection (run order itself is
    * event-driven above). */
  private def assertAcyclic(stages: Seq[Stage]): Unit = {
    val inDeg = mutable.Map(stages.map(s => s.name -> s.deps.size): _*)
    val deps = stages.flatMap(s => s.deps.map(_ -> s.name))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val q = mutable.Queue(stages.filter(_.deps.isEmpty).map(_.name): _*)
    var seen = 0
    while (q.nonEmpty) {
      val n = q.dequeue(); seen += 1
      deps.getOrElse(n, Nil).foreach { d =>
        inDeg(d) -= 1
        if (inDeg(d) == 0) q.enqueue(d)
      }
    }
    require(seen == stages.size,
      s"dependency cycle among: ${inDeg.filter(_._2 > 0).keys.mkString(", ")}")
  }

  /** Run report as a queryable frame (the Airflow task-instance table
    * shape: status, attempts, duration, error per stage). */
  def report(spark: SparkSession, results: Seq[StageResult]): DataFrame = {
    import spark.implicits._
    results.toDF()
  }
}
