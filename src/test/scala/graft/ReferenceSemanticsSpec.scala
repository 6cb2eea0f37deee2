package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Scalar-semantics golden tests pinned to the reference:
  * "{:.0f}" half-even rounding (weather.py:268), updated[-5:] slicing
  * (:306), null-guarded array head (:79-83), measure/draw_text_spaced
  * folds (:226-238). */
class ReferenceSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("%.0f via bround matches Python round-half-even incl. .5 cases") {
    // Python: f"{x:.0f}" -> 0.5:'0' 1.5:'2' 2.5:'2' 3.5:'4' -0.5:'-0' 12.5:'12'
    // bround (BigDecimal) can't produce -0.0, so the (-0.5, 0) band needs
    // the explicit Python-style "-0" branch of Core.pyFmt0f.
    val cases = Seq(0.5 -> "0", 1.5 -> "2", 2.5 -> "2", 3.5 -> "4",
      -0.5 -> "-0", -0.4 -> "-0", 12.5 -> "12", 12.4 -> "12", 12.6 -> "13")
    val out = cases.map(_._1).toDF("x")
      .select($"x", graft.core.Core.pyFmt0f($"x").as("s"))
      .collect().map(r => r.getDouble(0) -> r.getString(1)).toMap
    cases.foreach { case (x, want) => assert(out(x) == want, s"x=$x") }
  }

  test("-0.4 renders as \"-0°\" end-to-end through str_format's expression") {
    // the latent-divergence case of round 1: DuckDB printf('%.0f', -0.4)
    // and Python's f"{-0.4:.0f}" both emit "-0"; the query must too.
    val dir = java.nio.file.Files.createTempDirectory("graft_neg0").toString
    Seq(
      (1L, java.sql.Timestamp.valueOf("2026-08-12 14:30:00"), 7L,
        "drizzle", -0.4, """{"k": 51}"""),
      (2L, java.sql.Timestamp.valueOf("2026-08-12 14:40:00"), 7L,
        "clear", -0.6, """{"k": 0}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.ReferenceOps.queries("str_format")(spark, dir)
      .select("event_id", "temp_str")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "-0°")  // (-0.5, 0) band: the Python "-0" branch
    assert(out(2L) == "-1°")  // half-even: -0.6 rounds to -1
  }

  test("updated[-5:] suffix slice yields HH:MM (weather.py:306)") {
    val out = Seq("2026-08-12T14:30").toDF("updated")
      .select(substring($"updated", -5, 5)).as[String].head()
    assert(out == "14:30")
  }

  test("array head is null-guarded like weather.py:79-83") {
    val df = Seq(
      (1, Seq(85, 60, 40)), (2, Seq.empty[Int]), (3, null)
    ).toDF("id", "probs")
      .select($"id", try_element_at($"probs", lit(1)).as("head"))
    val rows = df.collect().map(r => r.getInt(0) ->
      (if (r.isNullAt(1)) None else Some(r.getInt(1)))).toMap
    assert(rows(1).contains(85))
    assert(rows(2).isEmpty)
    assert(rows(3).isEmpty)
  }

  /** Reference fold (weather.py:226-231) re-implemented literally. */
  private def measureRef(text: String, w: Char => Int, spacing: Int): Int = {
    var width = 0
    for (c <- text) width += w(c) + spacing
    if (width > 0) width - spacing else 0
  }

  test("agg width == measure_text_spaced fold (incl. empty -> 0)") {
    def w(c: Char): Int = c.toInt % 7 + 3
    val texts = Seq("", "a", "hello world", "spark graft engine")
    val got = texts.zipWithIndex.map(_.swap).toDF("id", "text")
      .select($"id",
        greatest(
          coalesce(
            aggregate(
              filter(split($"text", ""), c => c =!= lit("")),
              lit(0L), (acc, c) => acc + ascii(c).cast(LongType) % 7 + 4) - 1,
            lit(0L)),
          lit(0L)).as("width"))
      .collect().map(r => r.getInt(0) -> r.getLong(1).toInt).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i) == measureRef(t, w, 1), s"text='$t'")
    }
  }

  test("prefix-sum offsets == draw_text_spaced accumulator (weather.py:233-238)") {
    def w(c: Char): Int = c.toInt % 7 + 3
    val text = "graft"
    // reference: offset starts 0, then += w+spacing per char
    val want = text.scanLeft(0)((acc, c) => acc + w(c) + 1).init
    val got = Seq(text).toDF("text")
      .select(posexplode(split($"text", "")).as(Seq("pos", "c")))
      .filter($"c" =!= "")
      .select($"pos", sum(ascii($"c") % 7 + 4).over(
        org.apache.spark.sql.expressions.Window.orderBy("pos")
          .rowsBetween(Long.MinValue, -1)).as("off"))
      .collect().map(r => r.getInt(0) ->
        (if (r.isNullAt(1)) 0 else r.getLong(1).toInt)).toMap
    want.zipWithIndex.foreach { case (o, i) => assert(got(i) == o, s"pos $i") }
  }
}
