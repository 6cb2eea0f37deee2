package graft.operators

import graft.core.Core._
import graft.functions.WeatherDims
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** SURVEY.md §2-A — every dataflow operator the reference implements,
  * re-expressed Spark-first over the driver testdata. `events` plays the
  * part of the weather observation stream (props.k = WMO-ish code, value
  * = temperature, ts = observation time); `documents` chars play the part
  * of the text-layout engine (weather.py:226-238).
  *
  * Scale notes: all lookup joins broadcast; all scans project/push
  * filters into parquet; aggregations are map-side-combinable (sum/count
  * over longs); windows partition by high-cardinality keys (doc_id,
  * user_id) so no single partition hot-spots at 100 TB.
  */
object ReferenceOps {

  // ---- shared fragments ----------------------------------------------

  /** Spark: char stream of documents with 0-based position.
    * Filters the ""-element Spark's split-by-empty-regex appends. */
  private def chars(s: SparkSession, dir: String): DataFrame =
    table(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), "")).as(Seq("pos", "c")))
      .filter(col("c") =!= "")

  private val charsSql =
    """SELECT doc_id, unnest(string_split(text, '')) AS c,
      |       generate_subscripts(string_split(text, ''), 1) - 1 AS pos
      |FROM documents""".stripMargin

  /** Fake-but-deterministic per-char font width (the real device font is
    * hardware; weather.py:229 `display.measure_text`): width = ascii%7+3,
    * spacing = 1 — so (width+spacing) = ascii%7+4. */
  private def charW(c: org.apache.spark.sql.Column) = ascii(c) % 7 + 4
  private val charWSql = "unicode(c) % 7 + 4"

  // ---- queries --------------------------------------------------------

  def queries: Map[String, Q] = Map(
    // HTTP JSON source: schema-on-read parse of a JSON payload column
    // (weather.py:31-39 http_get_json -> dict).
    "src_http_json" -> { (s, dir) =>
      table(s, dir, "events")
        .select(
          col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .orderBy("event_id")
    },

    // Geocode lookup: filter + top-1 limit + projected cast, the
    // count=1 server-side pushdown shape of weather.py:42-59.
    "src_geocode_lookup" -> { (s, dir) =>
      table(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .orderBy("c_custkey")
        .limit(1)
        .select(
          col("c_custkey"), col("c_name"),
          col("c_acctbal").cast(DoubleType).as("acctbal"),
          col("c_mktsegment"))
    },

    // Forecast scan: projection + predicate pushed into the parquet
    // scan, the field-list URL params of weather.py:66-67.
    "src_forecast_scan" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(col("l_quantity") < 5)
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Display sink: the fully-rendered frame of weather.py:240-308 as
    // formatted columns (title/temp/desc/icon/rain/footer).
    "sink_display" -> { (s, dir) =>
      val obs = WeatherDims.withDescription(s, observations(s, dir))
      obs.select(
          col("event_id"),
          upper(col("event_type")).as("title"),
          concat(pyFmt0f(col("value")), lit("°")).as("temp_text"),
          col("description"),
          WeatherDims.iconCol(col("code")).as("icon"),
          format_string("Chance of rain: %d%%", col("code")).as("rain_line"),
          concat(lit("Updated "), substring(isoMin(col("ts")), -5, 5))
            .as("footer"))
        .orderBy("event_id")
    },

    // Nested-field projection with null defaults (weather.py:73-77).
    "proj_nested" -> { (s, dir) =>
      val payload = struct(
        col("value").as("temperature_2m"), col("code").as("weather_code"),
        isoMin(col("ts")).as("time"))
      observations(s, dir)
        .withColumn("current", payload)
        .select(
          col("event_id"),
          coalesce(col("current.temperature_2m"), lit(-999.0d))
            .as("temperature_2m"),
          coalesce(col("current.weather_code"), lit(-1)).as("weather_code"),
          col("current.time").as("time"))
        .orderBy("event_id")
    },

    // Null-guarded array head (weather.py:79-83): try_element_at returns
    // null on empty/missing, same as the reference's guards (plain
    // element_at THROWS under Spark 4's default ANSI mode).
    "proj_array_head" -> { (s, dir) =>
      table(s, dir, "embeddings")
        .select(
          col("vec_id"),
          try_element_at(col("embedding"), lit(1)).cast(DoubleType).as("head"))
        .orderBy("vec_id")
    },

    // Empty-relation guard (weather.py:49-51): size(...) > 0 filter.
    "filter_nonempty" -> { (s, dir) =>
      table(s, dir, "documents")
        .withColumn("n_tokens", size(split(col("text"), " ")))
        .filter(col("n_tokens") > 0)
        .select("doc_id", "n_tokens")
        .orderBy("doc_id")
    },

    // Null-presence predicate + '--' fallback (weather.py:264-268).
    "filter_notnull" -> { (s, dir) =>
      val obs = observations(s, dir).withColumn(
        "temperature",
        when(col("event_type") === "error", lit(null).cast(DoubleType))
          .otherwise(col("value")))
      obs.select(
          col("event_id"),
          when(col("temperature").isNull, lit("--"))
            .otherwise(concat(pyFmt0f(col("temperature")), lit("°")))
            .as("temp_text"))
        .orderBy("event_id")
    },

    // Dictionary lookup join with default (weather.py:92-114): broadcast
    // LEFT join against the 18-row WMO dim + COALESCE('Code %d').
    "join_code_dim" -> { (s, dir) =>
      WeatherDims.withDescription(s, observations(s, dir))
        .select("event_id", "code", "description")
        .orderBy("event_id")
    },

    // Set-membership classification, first-match-wins (weather.py:117-130).
    "class_in_sets" -> { (s, dir) =>
      observations(s, dir)
        .select(
          col("event_id"), col("code"),
          WeatherDims.iconCol(col("code")).as("icon"))
        .orderBy("event_id")
    },

    // Sum aggregation with fencepost correction, empty->0
    // (measure_text_spaced, weather.py:226-231): total text width =
    // sum(char_width + spacing) - trailing spacing.
    "agg_sum_width" -> { (s, dir) =>
      val raw = chars(s, dir).groupBy("doc_id")
        .agg(sum(charW(col("c"))).as("raw"))
      table(s, dir, "documents")
        .join(raw, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          greatest(coalesce(col("raw") - 1, lit(0L)), lit(0L))
            .cast(LongType).as("width"))
        .orderBy("doc_id")
    },

    // Running prefix sum (draw_text_spaced, weather.py:233-238):
    // per-char x-offset = sum of preceding (width+spacing) — a frame-spec
    // window aggregate.
    "win_prefix_sum" -> { (s, dir) =>
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
      chars(s, dir)
        .select(
          col("doc_id"), col("pos").cast(IntegerType).as("pos"), col("c"),
          coalesce(sum(charW(col("c"))).over(w), lit(0L))
            .cast(LongType).as("x_offset"))
        .orderBy("doc_id", "pos")
    },

    // Top-1 (weather.py:45,53): ORDER BY ... LIMIT 1.
    "limit_top1" -> { (s, dir) =>
      table(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(1)
        .select("o_orderkey", "o_totalprice")
    },

    // Template formatting (weather.py:35,114,268,301): %d / %s / %.0f
    // (half-even via bround, matching Python's round-half-even and C
    // printf in DuckDB) / literal %%.
    "str_format" -> { (s, dir) =>
      observations(s, dir)
        .select(
          col("event_id"),
          format_string("HTTP %d: %s", col("code"), col("event_type"))
            .as("http_msg"),
          concat(pyFmt0f(col("value")), lit("°")).as("temp_str"),
          format_string("Chance of rain: %d%%", col("code")).as("rain_msg"))
        .orderBy("event_id")
    },

    // Suffix slice updated[-5:] (weather.py:306) — HH:MM from ISO-8601.
    "str_substr_suffix" -> { (s, dir) =>
      observations(s, dir)
        .select(
          col("event_id"), isoMin(col("ts")).as("iso"),
          substring(isoMin(col("ts")), -5, 5).as("hhmm"))
        .orderBy("event_id")
    },

    // Concatenation "Updated " + updated[-5:] (weather.py:306).
    "str_concat" -> { (s, dir) =>
      observations(s, dir)
        .select(
          col("event_id"),
          concat(lit("Updated "), substring(isoMin(col("ts")), -5, 5))
            .as("updated"))
        .orderBy("event_id")
    },

    // URL-encoding replace (weather.py:46): name.replace(" ", "%20").
    "str_replace_urlenc" -> { (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          regexp_replace(col("p_name"), " ", "%20").as("url_name"))
        .orderBy("p_partkey")
    },

    // String-function breadth beyond the reference's literal usage:
    // pad / translate / repeat / reverse / edit distance (all with
    // identical semantics in DuckDB).
    "str_suite" -> { (s, dir) =>
      table(s, dir, "part")
        .select(
          col("p_partkey"),
          lpad(col("p_brand"), 12, "*").as("padded"),
          translate(col("p_name"), " aeiou", "_AEIOU").as("translated"),
          concat(repeat(lit("-"), 3), reverse(col("p_type"))).as("revtype"),
          levenshtein(col("p_name"), col("p_type")).as("edit_dist"),
          length(col("p_name")).as("name_len"))
        .orderBy("p_partkey")
    },

    // Date-part extraction from the shipdate timestamp; day-of-week via
    // an epoch-days formula (portable: Spark dayofweek is 1=Sunday,
    // DuckDB dayofweek is 0=Sunday — the arithmetic sidesteps both).
    "date_extract" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .filter(col("l_orderkey") % 500 === 0)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          year(col("l_shipdate")).as("y"),
          month(col("l_shipdate")).as("m"),
          dayofmonth(col("l_shipdate")).as("d"),
          // 1970-01-01 was a Thursday: (days+4)%7 -> 0=Sunday
          ((datediff(to_date(col("l_shipdate")), lit("1970-01-01")) + 4) % 7)
            .cast(IntegerType).as("dow"),
          quarter(col("l_shipdate")).as("q"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Casts (weather.py:55-56,145-148): double->int truncates toward
    // zero (Python int() semantics; DuckDB oracle uses trunc()).
    "cast_numeric" -> { (s, dir) =>
      table(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          col("l_quantity").cast(IntegerType).as("qty_int"),
          col("l_linenumber").cast(DoubleType).as("ln_dbl"))
        .orderBy("l_orderkey", "l_linenumber")
    },

    // Trig ray endpoints (draw_sun, weather.py:143-148): radians/cos/sin
    // over 45-degree steps; int() truncation of the products.
    "math_trig" -> { (s, dir) =>
      table(s, dir, "region")
        .select(
          col("r_regionkey"),
          explode(sequence(lit(0), lit(315), lit(45))).as("deg"))
        .select(
          col("r_regionkey"), col("deg"),
          // +0.0 canonicalizes IEEE -0.0 (e.g. round(cos(270°),6)) so
          // Spark and DuckDB agree on the sign of zero.
          (round(cos(radians(col("deg"))), 6) + 0.0).as("cos6"),
          (round(sin(radians(col("deg"))), 6) + 0.0).as("sin6"),
          (lit(70) + (cos(radians(col("deg"))) * 32).cast(IntegerType))
            .as("x1"),
          (lit(110) + (sin(radians(col("deg"))) * 32).cast(IntegerType))
            .as("y1"),
          (lit(70) + (cos(radians(col("deg"))) * 44).cast(IntegerType))
            .as("x2"),
          (lit(110) + (sin(radians(col("deg"))) * 44).cast(IntegerType))
            .as("y2"))
        .orderBy("r_regionkey", "deg")
    },

    // Integer sequence generation (weather.py:143,167,194): the three
    // range() loops as one tagged sequence relation.
    "seq_range" -> { (s, dir) =>
      import s.implicits._
      Seq(("ray", 0, 315, 45), ("rain", -15, 15, 10), ("fog", 25, 45, 10))
        .toDF("kind", "a", "b", "step")
        .select(
          col("kind"),
          explode(sequence(col("a"), col("b"), col("step"))).as("v"))
        .orderBy("kind", "v")
    },

    // Temperature unit conversion (weather.py:23,69-70): C -> F.
    "unit_convert" -> { (s, dir) =>
      observations(s, dir)
        .select(
          col("event_id"), col("value").as("celsius"),
          (col("value") * 9.0 / 5.0 + 32.0).as("fahrenheit"))
        .orderBy("event_id")
    },

    // Micro-batch refresh (weather.py:24,324-333), batch-checkable
    // equivalent: 10-minute tumbling-window aggregate over event time.
    "stream_microbatch" -> { (s, dir) =>
      observations(s, dir)
        .groupBy(window(col("ts"), "10 minutes").as("w"))
        .agg(
          count(lit(1)).as("n"),
          (sum(cents(col("value"))) / 100.0).as("total_value"))
        .select(
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          col("n"), col("total_value"))
        .orderBy("window_start")
    },

    // Stream-static enrichment (weather.py:321): broadcast join of the
    // observation stream with a static dimension, computed once.
    "stream_static_enrich" -> { (s, dir) =>
      table(s, dir, "events")
        .join(
          broadcast(table(s, dir, "customer")),
          col("user_id") === col("c_custkey"), "left")
        .select(
          col("event_id"), col("user_id"),
          coalesce(col("c_mktsegment"), lit("unknown")).as("segment"))
        .orderBy("event_id")
    },

    // Per-tick error fallback (weather.py:325-331): failed ticks emit a
    // degraded frame ('--', 'Error: ...', unknown icon, empty footer).
    "stream_error_fallback" -> { (s, dir) =>
      val obs = WeatherDims.withDescription(s, observations(s, dir))
      val isErr = col("event_type") === "error"
      obs.select(
          col("event_id"),
          when(isErr, lit("--"))
            .otherwise(concat(pyFmt0f(col("value")), lit("°")))
            .as("temp_text"),
          when(isErr, lit("Error: tick failed")).otherwise(col("description"))
            .as("description"),
          when(isErr, lit("unknown"))
            .otherwise(WeatherDims.iconCol(col("code"))).as("icon"),
          when(isErr, lit(""))
            .otherwise(concat(lit("Updated "),
              substring(isoMin(col("ts")), -5, 5))).as("updated"))
        .orderBy("event_id")
    })

  // ---- DuckDB oracles -------------------------------------------------

  def oracleSql: Map[String, String] = {
    val k = kSql
    val iso = isoMinSql("ts")
    Map(
      "src_http_json" ->
        s"SELECT event_id, $k AS k FROM events ORDER BY event_id",

      "src_geocode_lookup" ->
        """SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS acctbal,
          |       c_mktsegment
          |FROM customer WHERE c_mktsegment = 'BUILDING'
          |ORDER BY c_custkey LIMIT 1""".stripMargin,

      "src_forecast_scan" ->
        """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          |WHERE l_quantity < 5 ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "sink_display" ->
        s"""SELECT event_id, upper(event_type) AS title,
           |       printf('%.0f', value) || '°' AS temp_text,
           |       ${WeatherDims.descSql("code")} AS description,
           |       ${WeatherDims.iconCaseSql("code")} AS icon,
           |       printf('Chance of rain: %d%%', code) AS rain_line,
           |       'Updated ' || right($iso, 5) AS footer
           |FROM (SELECT *, $k AS code FROM events) e
           |LEFT JOIN ${WeatherDims.wmoValuesSql} ON e.code = wmo.wcode
           |ORDER BY event_id""".stripMargin,

      "proj_nested" ->
        s"""SELECT event_id,
           |       COALESCE(value, -999.0) AS temperature_2m,
           |       COALESCE($k, -1) AS weather_code,
           |       $iso AS time
           |FROM events ORDER BY event_id""".stripMargin,

      "proj_array_head" ->
        """SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS head
          |FROM embeddings ORDER BY vec_id""".stripMargin,

      "filter_nonempty" ->
        """SELECT doc_id, CAST(len(string_split(text, ' ')) AS INTEGER)
          |         AS n_tokens
          |FROM documents WHERE len(string_split(text, ' ')) > 0
          |ORDER BY doc_id""".stripMargin,

      "filter_notnull" ->
        """SELECT event_id,
          |       CASE WHEN event_type = 'error' THEN '--'
          |            ELSE printf('%.0f', value) || '°' END AS temp_text
          |FROM events ORDER BY event_id""".stripMargin,

      "join_code_dim" ->
        s"""SELECT event_id, code,
           |       ${WeatherDims.descSql("code")} AS description
           |FROM (SELECT event_id, $k AS code FROM events) e
           |LEFT JOIN ${WeatherDims.wmoValuesSql} ON e.code = wmo.wcode
           |ORDER BY event_id""".stripMargin,

      "class_in_sets" ->
        s"""SELECT event_id, code,
           |       ${WeatherDims.iconCaseSql("code")} AS icon
           |FROM (SELECT event_id, $k AS code FROM events) e
           |ORDER BY event_id""".stripMargin,

      "agg_sum_width" ->
        s"""SELECT d.doc_id,
           |       CAST(greatest(COALESCE(w.raw - 1, 0), 0) AS BIGINT)
           |         AS width
           |FROM documents d LEFT JOIN (
           |  SELECT doc_id, SUM($charWSql) AS raw
           |  FROM ($charsSql) GROUP BY doc_id
           |) w ON d.doc_id = w.doc_id
           |ORDER BY d.doc_id""".stripMargin,

      "win_prefix_sum" ->
        s"""SELECT doc_id, CAST(pos AS INTEGER) AS pos, c,
           |       CAST(COALESCE(SUM($charWSql) OVER (
           |         PARTITION BY doc_id ORDER BY pos
           |         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           |         AS BIGINT) AS x_offset
           |FROM ($charsSql)
           |ORDER BY doc_id, pos""".stripMargin,

      "limit_top1" ->
        """SELECT o_orderkey, o_totalprice FROM orders
          |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 1""".stripMargin,

      "str_format" ->
        s"""SELECT event_id,
           |       printf('HTTP %d: %s', code, event_type) AS http_msg,
           |       printf('%.0f', value) || '°' AS temp_str,
           |       printf('Chance of rain: %d%%', code) AS rain_msg
           |FROM (SELECT *, $k AS code FROM events) e
           |ORDER BY event_id""".stripMargin,

      "str_substr_suffix" ->
        s"""SELECT event_id, $iso AS iso, right($iso, 5) AS hhmm
           |FROM events ORDER BY event_id""".stripMargin,

      "str_concat" ->
        s"""SELECT event_id, 'Updated ' || right($iso, 5) AS updated
           |FROM events ORDER BY event_id""".stripMargin,

      "str_replace_urlenc" ->
        """SELECT p_partkey, replace(p_name, ' ', '%20') AS url_name
          |FROM part ORDER BY p_partkey""".stripMargin,

      "str_suite" ->
        """SELECT p_partkey,
          |       lpad(p_brand, 12, '*') AS padded,
          |       translate(p_name, ' aeiou', '_AEIOU') AS translated,
          |       repeat('-', 3) || reverse(p_type) AS revtype,
          |       CAST(levenshtein(p_name, p_type) AS INTEGER) AS edit_dist,
          |       CAST(length(p_name) AS INTEGER) AS name_len
          |FROM part ORDER BY p_partkey""".stripMargin,

      "date_extract" ->
        """SELECT l_orderkey, l_linenumber,
          |       CAST(year(l_shipdate) AS INTEGER) AS y,
          |       CAST(month(l_shipdate) AS INTEGER) AS m,
          |       CAST(day(l_shipdate) AS INTEGER) AS d,
          |       CAST(((CAST(l_shipdate AS DATE) - DATE '1970-01-01') + 4) % 7
          |         AS INTEGER) AS dow,
          |       CAST(quarter(l_shipdate) AS INTEGER) AS q
          |FROM lineitem WHERE l_orderkey % 500 = 0
          |ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "cast_numeric" ->
        """SELECT l_orderkey, l_linenumber,
          |       CAST(trunc(l_quantity) AS INTEGER) AS qty_int,
          |       CAST(l_linenumber AS DOUBLE) AS ln_dbl
          |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,

      "math_trig" ->
        """SELECT r_regionkey, CAST(deg AS INTEGER) AS deg,
          |       round(cos(radians(deg)), 6) + 0.0 AS cos6,
          |       round(sin(radians(deg)), 6) + 0.0 AS sin6,
          |       70 + CAST(trunc(cos(radians(deg)) * 32) AS INTEGER) AS x1,
          |       110 + CAST(trunc(sin(radians(deg)) * 32) AS INTEGER) AS y1,
          |       70 + CAST(trunc(cos(radians(deg)) * 44) AS INTEGER) AS x2,
          |       110 + CAST(trunc(sin(radians(deg)) * 44) AS INTEGER) AS y2
          |FROM region, (SELECT unnest(generate_series(0, 315, 45)) AS deg)
          |ORDER BY r_regionkey, deg""".stripMargin,

      "seq_range" ->
        """SELECT kind, CAST(unnest(generate_series(a, b, step)) AS INTEGER)
          |         AS v
          |FROM (VALUES ('ray', 0, 315, 45), ('rain', -15, 15, 10),
          |             ('fog', 25, 45, 10)) AS t(kind, a, b, step)
          |ORDER BY kind, v""".stripMargin,

      "unit_convert" ->
        """SELECT event_id, value AS celsius,
          |       value * 9.0 / 5.0 + 32.0 AS fahrenheit
          |FROM events ORDER BY event_id""".stripMargin,

      "stream_microbatch" ->
        """SELECT strftime(time_bucket(INTERVAL '10 minutes', ts),
          |                '%Y-%m-%d %H:%M:%S') AS window_start,
          |       CAST(COUNT(*) AS BIGINT) AS n,
          |       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
          |         / 100.0 AS total_value
          |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,

      "stream_static_enrich" ->
        """SELECT event_id, user_id,
          |       COALESCE(c_mktsegment, 'unknown') AS segment
          |FROM events LEFT JOIN customer ON user_id = c_custkey
          |ORDER BY event_id""".stripMargin,

      "stream_error_fallback" ->
        s"""SELECT event_id,
           |       CASE WHEN event_type = 'error' THEN '--'
           |            ELSE printf('%.0f', value) || '°' END AS temp_text,
           |       CASE WHEN event_type = 'error' THEN 'Error: tick failed'
           |            ELSE ${WeatherDims.descSql("code")} END AS description,
           |       CASE WHEN event_type = 'error' THEN 'unknown'
           |            ELSE ${WeatherDims.iconCaseSql("code")} END AS icon,
           |       CASE WHEN event_type = 'error' THEN ''
           |            ELSE 'Updated ' || right($iso, 5) END AS updated
           |FROM (SELECT *, $k AS code FROM events) e
           |LEFT JOIN ${WeatherDims.wmoValuesSql} ON e.code = wmo.wcode
           |ORDER BY event_id""".stripMargin)
  }
}
