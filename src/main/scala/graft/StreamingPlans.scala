package graft

import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming plan-audit dump (round-8 verdict ask #6): docs/PLANS.md
  * covered batch plans only, so the StreamingOpsSpec-verified stateful
  * shapes — watermark state eviction in the stream-stream interval
  * join, dropDuplicatesWithinWatermark state bounds, watermarked
  * tumbling aggregation — were auditable only by running tests. This
  * main starts each query on a MemoryStream, processes one
  * micro-batch, and prints the EXECUTED physical plan (the state
  * operators and their watermark annotations appear only on a started
  * query), for pasting into docs/PLANS.md.
  *
  * Usage: runMain graft.StreamingPlans
  */
object StreamingPlans {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sc: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)

    def dump(title: String)
        (build: () => org.apache.spark.sql.streaming.StreamingQuery)
        : Unit = {
      println(s"\n===== $title =====")
      val q = build()
      q.processAllAvailable()
      q.explain() // prints the executed micro-batch physical plan
      q.stop()
    }

    dump("tumblingCounts: watermarked tumbling agg (append mode)") { () =>
      val in = MemoryStream[StreamingOps.Obs]
      in.addData(StreamingOps.Obs("London", ts(0), Some(11.0), Some(61)))
      StreamingOps.tumblingCounts(in.toDF(), "20 minutes")
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
    }

    dump("dedupWithinWatermark: bounded-state exactly-once dedup") { () =>
      val in = MemoryStream[StreamingOps.Obs]
      in.addData(StreamingOps.Obs("London", ts(0), Some(11.0), Some(61)))
      StreamingOps.dedupWithinWatermark(in.toDF(), "30 minutes")
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
    }

    dump("obsAlertJoin: stream-stream interval join, two watermarks") { () =>
      val obs = MemoryStream[StreamingOps.Obs]
      val alerts = MemoryStream[StreamingOps.Alert]
      obs.addData(StreamingOps.Obs("London", ts(10), Some(12.0), Some(63)))
      alerts.addData(StreamingOps.Alert("London", ts(5), 2))
      StreamingOps.obsAlertJoin(obs.toDF(), alerts.toDF())
        .writeStream.format("noop").outputMode(OutputMode.Append()).start()
    }

    spark.stop()
  }
}
