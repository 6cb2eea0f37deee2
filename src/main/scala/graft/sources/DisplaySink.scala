package graft.sources

import org.apache.spark.sql.DataFrame

/** The display sink's icon dispatch (draw_icon,
  * /root/reference/weather.py:205-219) at engine scale: route rendered
  * frames by icon category as a partitioned, compressed columnar write.
  * Partition pruning then makes "all rain frames" a directory listing,
  * not a scan — the 100 TB analogue of branching to a draw function.
  */
object DisplaySink {
  def writeFrames(frames: DataFrame, path: String): Unit =
    frames.write
      .mode("overwrite")
      .partitionBy("icon")
      .option("compression", "zstd")
      .parquet(path)
}
