package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job-accounting profiler: runs one (or a few) contract queries and
  * reports, per rep, wall time, number of Spark JOBS (each one a
  * driver round-trip — blocking checkpoints, AQE stage
  * materializations, broadcast builds), number of stages, and total
  * task time. The gap between wall time and task time is
  * driver/scheduling overhead — the thing to cut when a query's data
  * is small but its bench time is large.
  *
  * Usage: runMain graft.Profile <q1,q2,...> [sfDir] [reps]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q_agg_gini").split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var stages = 0
    @volatile var taskMs = 0L
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, System.nanoTime())
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val t0 = starts.remove(j.jobId)
        if (t0 != 0L) jobMs += (System.nanoTime() - t0) / 1000000L
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages += 1
        taskMs += s.stageInfo.taskMetrics.executorRunTime
        if (sys.env.contains("SPARK_GRAFT_PROFILE_STAGES"))
          println(f"    stage ${s.stageInfo.stageId}%4d " +
            f"tasks=${s.stageInfo.numTasks}%4d " +
            f"run=${s.stageInfo.taskMetrics.executorRunTime}%7dms " +
            f"gc=${s.stageInfo.taskMetrics.jvmGCTime}%6dms " +
            f"cpu=${s.stageInfo.taskMetrics.executorCpuTime / 1000000}%7dms " +
            s"${s.stageInfo.name.take(80)}")
      }
    })

    // warm tables once (staging + plan memoization) so rep 1 is honest
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .foreach(t => graft.sources.Tables.table(spark, sfDir, t))

    names.foreach { n =>
      (1 to reps).foreach { r =>
        jobs = 0; stages = 0; taskMs = 0L; jobMs = 0L
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val wallMs = (System.nanoTime() - t0) / 1000000L
        Materialize.releaseAll()
        // Drain the async listener bus before reading counters. The
        // fixed sleep is heuristic — under heavy load a straggling
        // stage/job-end event can still post after the print (and then
        // bleed into the next rep's freshly-reset counters), so treat
        // a single surprising rep as suspect and re-run; waitUntilEmpty
        // is not public API on this bus.
        Thread.sleep(300)
        // Janino whole-stage compile time this rep — nonzero steady-state
        // means the codegen class cache (spark.sql.codegen.cache
        // .maxEntries, static conf, default 100) is thrashing and every
        // rep recompiles its stages from source.
        val cn = org.apache.spark.metrics.source.CodegenMetrics
          .METRIC_COMPILATION_TIME.getCount
        println(f"$n%-24s rep$r wall=${wallMs}ms jobs=$jobs stages=$stages " +
          f"taskTime=${taskMs}ms jobWall=${jobMs}ms compileCum=${cn}")
      }
    }
    spark.stop()
  }
}
