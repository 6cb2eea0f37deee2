package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: run named queries (or all) twice, print cold/warm
  * timings; with -e also print the formatted physical plan; with -noop
  * evaluate via the noop sink (exactly what Bench measures — full
  * output columns + contract sorts) instead of count(); with -stages
  * print every completed stage's duration/task-count/IO so slow plans
  * decompose without the (disabled) UI. */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-e")
    val noop = args.contains("-noop")
    val stages = args.contains("-stages")
    // -once: single evaluation (skip the warm rerun) — decade-scale
    // stage decomposition where one execution is 30+ min
    val once = args.contains("-once")
    // -c key=value pairs become session confs (e.g. -c
    // spark.sql.autoBroadcastJoinThreshold=-1) for plan experiments
    val (confArgs, rest) = args.toSeq
      .filterNot(a => a == "-e" || a == "-noop" || a == "-stages"
        || a == "-once")
      .foldLeft((Seq.empty[(String, String)], Seq.empty[String], false)) {
        case ((cs, ns, true), kv) =>
          val Array(k, v) = kv.split("=", 2); (cs :+ (k -> v), ns, false)
        case ((cs, ns, false), "-c") => (cs, ns, true)
        case ((cs, ns, false), a)    => (cs, ns :+ a, false)
      } match { case (cs, ns, _) => (cs, ns) }
    val names = rest
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    confArgs.foreach { case (k, v) => spark.conf.set(k, v) }
    spark.sparkContext.setLogLevel("WARN")
    if (stages)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted)
              : Unit = {
            val i = sc.stageInfo
            val m = i.taskMetrics
            println(f"[stage] ${i.stageId}%4d ${i.numTasks}%4d tasks " +
              f"${(i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)) / 1e3}%8.2fs " +
              f"exec=${m.executorRunTime / 1e3}%8.1fs " +
              f"gc=${m.jvmGCTime / 1e3}%6.1fs " +
              f"cpu=${m.executorCpuTime / 1e9}%8.1fs " +
              f"spill=${m.memoryBytesSpilled / 1e6}%7.0fM " +
              f"in=${m.inputMetrics.recordsRead}%11d " +
              f"sh_r=${m.shuffleReadMetrics.recordsRead}%11d " +
              f"sh_w=${m.shuffleWriteMetrics.recordsWritten}%11d  " +
              i.name.takeWhile(_ != '\n').take(60))
          }
        })
    val sel = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    def eval(df: org.apache.spark.sql.DataFrame): Long =
      if (noop) { df.write.format("noop").mode("overwrite").save(); -1L }
      else df.count()
    sel.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime(); val n1 = eval(fn(spark, sfDir))
      val t1 = System.nanoTime()
      // the warm plan can differ: materialized caches carry real stats
      if (!once && explain) fn(spark, sfDir).explain("formatted")
      if (!once) eval(fn(spark, sfDir))
      val t2 = System.nanoTime()
      println(f"[profile] $name%-22s cold=${(t1 - t0) / 1e9}%7.2fs " +
        f"warm=${(t2 - t1) / 1e9}%7.2fs rows=$n1")
      // per-query cache scope (after the warm rerun, so warm still
      // measures cache-reuse): a multi-query sweep must not accumulate
      // every query's persisted subplans in one JVM
      graft.core.Core.releaseShared()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
