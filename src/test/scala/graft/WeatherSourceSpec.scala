package graft

import graft.streaming.WeatherPipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end tests for the weather-json DSv2 source: batch reads with
  * pushdown, the reference's error semantics, and the streaming
  * micro-batch loop with per-tick error fallback. */
class WeatherSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val fx = "src/test/resources/weather"

  test("geocode lookup: filter+limit pushdown, top-1 result (weather.py:42-59)") {
    val row = WeatherPipeline.geocodeTop1(spark, s"$fx/geocode_gb.json",
      "London", "GB")
    assert(row.getAs[Double]("latitude") == 51.50853)
    assert(row.getAs[String]("admin1") == "Greater London")
  }

  test("pushdown reaches the scan (filters, limit, pruned columns)") {
    val df = spark.read.format("weather-json")
      .option("endpoint", "geocode").option("path", s"$fx/geocode_gb.json")
      .load()
      .filter(col("name") === "London" && col("country_code") === "GB")
      .limit(1)
      .select("latitude", "longitude")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("EqualTo(name,London)")
      && plan.contains("EqualTo(country_code,GB)"), plan)
    assert(plan.contains("PushedLimit=1"), plan)
    assert(plan.contains("ReadSchema=latitude,longitude")
      || plan.contains("ReadSchema=name,country_code,latitude,longitude"), plan)
    val r = df.collect()
    assert(r.length == 1 && r.head.getDouble(0) == 51.50853)
  }

  test("empty geocode raises like weather.py:49-51") {
    val e = intercept[RuntimeException] {
      WeatherPipeline.geocodeTop1(spark, s"$fx/geocode_empty.json",
        "Atlantis", "XX")
    }
    assert(e.getMessage.contains("No geocoding results for: Atlantis"))
  }

  test("forecast batch read: nested projection with null defaults (weather.py:73-85)") {
    val df = spark.read.format("weather-json")
      .option("endpoint", "forecast")
      .option("path", Seq("forecast_rain", "forecast_clear", "forecast_missing")
        .map(f => s"$fx/$f.json").mkString(","))
      .load()
    val out = WeatherPipeline.interpret(spark, df)
      .select("temperature", "code", "description", "icon", "rain_prob")
      .collect()
      .map(r => (Option(r.get(0)), Option(r.get(1)), r.getString(2),
        r.getString(3), Option(r.get(4))))
      .toSet
    assert(out == Set(
      (Some(12.4), Some(63), "Rain", "rain", Some(85)),   // full payload
      (Some(2.5), Some(0), "Clear", "sun", None),         // empty probs array
      (None, Some(99), "Code 99", "unknown", None)))      // missing temp, unknown code
  }

  test("typed Dataset facade mirrors the fetch_current_weather tuple (weather.py:85)") {
    val df = spark.read.format("weather-json")
      .option("endpoint", "forecast")
      .option("path", s"$fx/forecast_missing.json")
      .load()
    val cw = WeatherPipeline.currentWeather(df).collect().head
    assert(cw == WeatherPipeline.CurrentWeather(
      None, Some(99), "2026-08-12T14:50", None))
  }

  test("HTTP-error payload raises like weather.py:34-35") {
    val e = intercept[Exception] {
      spark.read.format("weather-json")
        .option("endpoint", "forecast")
        .option("path", s"$fx/forecast_error.json")
        .load().collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("HTTP 503")), msgs(e).mkString("; "))
  }

  test("streaming loop: one payload per micro-batch, error tick -> fallback frame") {
    val ticks = Seq("forecast_rain", "forecast_error", "forecast_clear")
      .map(f => s"$fx/$f.json").mkString(",")
    val seen = scala.collection.mutable.ArrayBuffer.empty[WeatherPipeline.Frame]
    val ckpt = java.nio.file.Files.createTempDirectory("wx-ckpt").toString
    val q = WeatherPipeline.run(spark, ticks, "London",
      Trigger.AvailableNow(), ckpt) { frames =>
      seen.synchronized { seen ++= frames }
    }
    q.awaitTermination(120000)
    val frames = seen.synchronized(seen.toList)
    assert(frames.length == 3, frames)
    assert(frames(0).temp_text == "12°" && frames(0).description == "Rain"
      && frames(0).rain_line == "Chance of rain: 85%"
      && frames(0).footer == "Updated 14:30")
    assert(frames(1).temp_text == "--" && frames(1).icon == "unknown"
      && frames(1).description.startsWith("Error:"), frames(1))
    assert(frames(2).temp_text == "2°" && frames(2).icon == "sun"
      && frames(2).rain_line == null) // empty probs -> no rain line
  }
}
