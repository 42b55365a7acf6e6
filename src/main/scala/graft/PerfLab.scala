package graft

import org.apache.spark.sql.SparkSession

/** Dev-only wall-clock decomposition lab (round 16): where does a
  * key's wall time go when executor time is a fraction of it? Times
  * each named query's (a) DataFrame construction, (b) analysis +
  * optimization + physical planning (executedPlan force), (c) action,
  * repeated `SPARK_GRAFT_PROFILE_REPS` times in one JVM, with optional
  * conf overrides via SPARK_GRAFT_LAB_CONF ("k=v,k=v") — the A/B lens
  * for driver-side costs (AQE re-planning, codegen, scheduling) that
  * Profile's stage listener cannot see. */
object PerfLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "3").toInt.max(1)
    val names = if (args.nonEmpty) args.toSeq else Seq("t01_doc_stats")
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    val b = sys.env.get("SPARK_GRAFT_LAB_CONF").map(_.split(",").toSeq)
      .getOrElse(Nil).filter(_.contains("="))
      .foldLeft(b0) { (bb, kv) =>
        val Array(k, v) = kv.split("=", 2); bb.config(k, v)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // stage timeline: (stageId, submitMs, completeMs, tasks, runMs) to
    // expose inter-stage driver gaps that stage-level metrics hide
    case class W(id: Int, sub: Long, done: Long, tasks: Int, runMs: Long)
    val wins = scala.collection.mutable.ArrayBuffer.empty[W]
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          wins.synchronized {
            wins += W(si.stageId, si.submissionTime.getOrElse(0L),
              si.completionTime.getOrElse(0L), si.numTasks,
              si.taskMetrics.executorRunTime)
          }
        }
      })
    // warmup: JIT + parquet footer cache
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      val o = spark.read.parquet(s"$sfDir/orders.parquet")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, DataQueries.benchOnly(name))
      (1 to reps).foreach { rep =>
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force analysis->physical plan
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = ms(t2)
        println(f"[lab] $name rep $rep: build=$tBuild%.0f ms " +
          f"plan=$tPlan%.0f ms exec=$tExec%.0f ms total=${ms(t0)}%.0f ms")
        if (rep == reps) {
          val ws = wins.synchronized { val v = wins.sortBy(_.sub).toVector
            wins.clear(); v }
          var prevDone = 0L
          ws.foreach { w =>
            val gap = if (prevDone == 0) 0 else (w.sub - prevDone).max(0)
            println(f"[lab]   stage ${w.id}%4d wall=${w.done - w.sub}%5d ms " +
              f"gapBefore=$gap%5d ms tasks=${w.tasks}%3d run=${w.runMs}%6d ms")
            prevDone = prevDone.max(w.done)
          }
        } else wins.synchronized(wins.clear())
      }
    }
    spark.stop()
  }
}
