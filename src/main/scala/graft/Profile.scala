package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiler: run named queries (or all) twice, print cold/warm
  * timings; with -e also print the formatted physical plan. */
object Profile {
  def main(args: Array[String]): Unit = {
    val explain = args.contains("-e")
    val names = args.filterNot(_ == "-e")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sel = if (names.isEmpty) SparkEntry.queries.keys.toSeq.sorted else names.toSeq
    sel.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (explain) fn(spark, sfDir).explain("formatted")
      val t0 = System.nanoTime(); val n1 = fn(spark, sfDir).count()
      val t1 = System.nanoTime(); val n2 = fn(spark, sfDir).count()
      val t2 = System.nanoTime()
      println(f"[profile] $name%-22s cold=${(t1 - t0) / 1e9}%7.2fs " +
        f"warm=${(t2 - t1) / 1e9}%7.2fs rows=$n1")
    }
    spark.stop()
  }
}
