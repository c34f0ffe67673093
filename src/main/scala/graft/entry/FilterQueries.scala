package graft.entry

import org.apache.spark.sql.functions._

import graft.entry.LogQueries.{P, T, sqlP, sqlT}

/** Round-3 widening of the Logstash standard-filter surface (SURVEY §2.2 [L]
  * tail): bytes, tld, uuid, de_dot, range, truncate, json_encode, metricize —
  * each the Spark-native analogue of the published filter plugin, each a
  * DuckDB differential over the same deterministic synthesis. Plus two §2.6
  * additions (integer histogram, exact interpolated percentiles).
  *
  * All are narrow, codegen'd projections/aggregations: no UDFs, no shuffles
  * beyond the aggregating ones, embarrassingly parallel at 100 TB.
  */
object FilterQueries {

  /** `bytes`-filter unit table: decimal SI units and binary IEC units.
    * Renders BOTH the Spark map literal and the DuckDB CASE chain. */
  private val ByteUnits: Seq[(String, Long)] = Seq(
    "B" -> 1L, "kB" -> 1000L, "MB" -> 1000000L, "GB" -> 1000000000L,
    "KiB" -> 1024L, "MiB" -> 1048576L)

  val all: Seq[Q] = Seq(

    // P27: Logstash `bytes` filter — parse human-readable sizes ("371 MiB",
    // "12kB") into a byte count. Size strings synthesized per turn in both
    // engines; number+unit split by regex, unit resolved against ByteUnits
    // (decimal vs binary multipliers), all-integer so the differential is
    // float-free.
    Q("p27_bytes", {
      val mult = ByteUnits
        .map { case (u, m) => s"WHEN unit = '$u' THEN CAST($m AS BIGINT)" }
        .mkString("CASE ", " ", " END")
      val units = ByteUnits.map { case (u, _) => s"'$u'" }.mkString("[", ", ", "]")
      sqlT(
        s""", sz AS (
           |  SELECT conv_id, turn_idx,
           |    CAST((turn_idx * 7 + 3) % 1000 AS VARCHAR)
           |      || (CASE WHEN turn_idx % 2 = 0 THEN ' ' ELSE '' END)
           |      || $units[turn_idx % 6 + 1] AS size_str
           |  FROM turns),
           |p AS (
           |  SELECT conv_id, turn_idx, size_str,
           |    CAST(regexp_extract(size_str, '^([0-9]+)', 1) AS BIGINT) AS num,
           |    regexp_extract(size_str, '([A-Za-z]+)$$', 1) AS unit
           |  FROM sz)
           |SELECT conv_id, turn_idx, size_str, num * ($mult) AS n_bytes
           |FROM p ORDER BY conv_id, turn_idx""".stripMargin)
    }) { (s, d) =>
      val unitArr = array(ByteUnits.map { case (u, _) => lit(u) }: _*)
      T(s, d)
        .withColumn("size_str", concat(
          ((col("turn_idx") * 7 + 3) % 1000).cast("string"),
          when(col("turn_idx") % 2 === 0, " ").otherwise(""),
          element_at(unitArr, (col("turn_idx") % 6) + 1)))
        .withColumn("num", regexp_extract(col("size_str"), "^([0-9]+)", 1).cast("long"))
        .withColumn("unit", regexp_extract(col("size_str"), "([A-Za-z]+)$", 1))
        .select(col("conv_id"), col("turn_idx"), col("size_str"),
          (col("num") * element_at(typedLit(ByteUnits.toMap), col("unit")))
            .as("n_bytes"))
        .orderBy("conv_id", "turn_idx")
    },

    // P29: Logstash `tld` filter — split dst_host into subdomain / registered
    // domain / tld (public-suffix list reduced to last-label semantics, as the
    // fixture hosts are single-suffix). Same regex + left() arithmetic in both
    // engines.
    Q("p29_tld", sqlP(
      """SELECT conv_id, turn_idx, dst_host,
        |  regexp_extract(dst_host, '\.([^.]+)$', 1) AS tld,
        |  regexp_extract(dst_host, '([^.]+\.[^.]+)$', 1) AS domain,
        |  CASE WHEN regexp_extract(dst_host, '([^.]+\.[^.]+)$', 1) != ''
        |        AND length(dst_host) > length(regexp_extract(dst_host, '([^.]+\.[^.]+)$', 1))
        |       THEN left(dst_host, length(dst_host) - length(regexp_extract(dst_host, '([^.]+\.[^.]+)$', 1)) - 1)
        |       ELSE '' END AS subdomain
        |FROM parsed WHERE parse_ok AND dst_host IS NOT NULL
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val dom = regexp_extract(col("dst_host"), "([^.]+\\.[^.]+)$", 1)
      P(s, d).filter(col("parse_ok") && col("dst_host").isNotNull)
        .select(col("conv_id"), col("turn_idx"), col("dst_host"),
          regexp_extract(col("dst_host"), "\\.([^.]+)$", 1).as("tld"),
          dom.as("domain"),
          // a dot-less host has NO registered domain: without the dom =!= ""
          // guard the left() arithmetic would chop its last character
          when(dom =!= "" && length(col("dst_host")) > length(dom),
            expr("left(dst_host, length(dst_host) - length(regexp_extract(dst_host, '([^.]+\\\\.[^.]+)$', 1)) - 1)"))
            .otherwise("").as("subdomain"))
        .orderBy("conv_id", "turn_idx")
    },

    // P30: Logstash `uuid` filter, made differential-testable: a NAME-BASED
    // (v3-shaped) UUID from md5 of the event identity instead of a random v4
    // — version nibble forced to '3', variant nibble to '8', 8-4-4-4-12
    // layout. Deterministic, so both engines agree byte-for-byte.
    Q("p30_uuid", sqlT(
      """SELECT conv_id, turn_idx,
        |  substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-3' || substr(h, 14, 3)
        |    || '-8' || substr(h, 18, 3) || '-' || substr(h, 21, 12) AS event_uuid
        |FROM (SELECT conv_id, turn_idx,
        |        md5(conv_id || ':' || CAST(turn_idx AS VARCHAR)) AS h
        |      FROM turns)
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d)
        .withColumn("h", md5(concat(col("conv_id"), lit(":"), col("turn_idx").cast("string"))))
        .select(col("conv_id"), col("turn_idx"),
          concat(substring(col("h"), 1, 8), lit("-"), substring(col("h"), 9, 4),
            lit("-3"), substring(col("h"), 14, 3), lit("-8"),
            substring(col("h"), 18, 3), lit("-"), substring(col("h"), 21, 12))
            .as("event_uuid"))
        .orderBy("conv_id", "turn_idx")
    },

    // P31: Logstash `de_dot` filter — dotted keys in a dynamic map column
    // rewritten to underscore keys. The Spark side does the real map work
    // (map → transform_keys → sorted entry join); the oracle states the
    // expected flattened rendering directly.
    Q("p31_de_dot", sqlP(
      """SELECT conv_id, turn_idx,
        |  'geo_host=' || dst_host || ',geo_ip=' || src_ip
        |    || ',http_status=' || CAST(status AS VARCHAR) AS fields_flat
        |FROM parsed WHERE parse_ok
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .withColumn("m", map(
          lit("geo.ip"), col("src_ip"), lit("geo.host"), col("dst_host"),
          lit("http.status"), col("status").cast("string")))
        .withColumn("m2", transform_keys(col("m"), (k, _) => regexp_replace(k, "\\.", "_")))
        .select(col("conv_id"), col("turn_idx"),
          array_join(array_sort(transform(map_entries(col("m2")),
            e => concat(e.getField("key"), lit("="), e.getField("value")))), ",")
            .as("fields_flat"))
        .orderBy("conv_id", "turn_idx")
    },

    // P32: Logstash `range` filter — band numeric fields into named ranges
    // (text length and HTTP status class), the action-on-range semantics.
    Q("p32_range", sqlT(
      """SELECT conv_id, turn_idx,
        |  CASE WHEN length(text) < 40 THEN 'short'
        |       WHEN length(text) < 80 THEN 'mid' ELSE 'long' END AS len_band,
        |  CASE WHEN regexp_extract(text, 'status=([0-9]+)', 1) = '' THEN 'none'
        |       WHEN CAST(regexp_extract(text, 'status=([0-9]+)', 1) AS INT) < 300 THEN 'ok'
        |       WHEN CAST(regexp_extract(text, 'status=([0-9]+)', 1) AS INT) < 500 THEN 'client_err'
        |       ELSE 'server_err' END AS status_band
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      val st = regexp_extract(col("text"), "status=([0-9]+)", 1)
      T(s, d).select(col("conv_id"), col("turn_idx"),
        when(length(col("text")) < 40, "short")
          .when(length(col("text")) < 80, "mid").otherwise("long").as("len_band"),
        when(st === "", "none")
          .when(st.cast("int") < 300, "ok")
          .when(st.cast("int") < 500, "client_err")
          .otherwise("server_err").as("status_band"))
        .orderBy("conv_id", "turn_idx")
    },

    // P33: Logstash `truncate` filter — cap the event text at a byte budget
    // and tag what was cut (fixture text is ASCII, so chars == bytes and the
    // two engines' left() agree).
    Q("p33_truncate", sqlT(
      """SELECT conv_id, turn_idx, left(text, 48) AS text_trunc,
        |  length(text) > 48 AS was_truncated
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d).select(col("conv_id"), col("turn_idx"),
        expr("left(text, 48)").as("text_trunc"),
        (length(col("text")) > 48).as("was_truncated"))
        .orderBy("conv_id", "turn_idx")
    },

    // P34: Logstash `json_encode` filter — re-serialize parsed fields as a
    // JSON document (to_json over a struct; Spark emits no spaces and keeps
    // field order, which the oracle mirrors by explicit concatenation —
    // fixture values need no JSON escaping).
    Q("p34_json_encode", sqlP(
      """SELECT conv_id, turn_idx,
        |  '{"action":"' || action || '","status":' || CAST(status AS VARCHAR)
        |    || ',"uri":"' || uri || '"}' AS j
        |FROM parsed WHERE parse_ok
        |ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .select(col("conv_id"), col("turn_idx"),
          to_json(struct(col("action"), col("status"), col("uri"))).as("j"))
        .orderBy("conv_id", "turn_idx")
    },

    // P35: Logstash `metricize` filter — one multi-metric event fans out into
    // one event per metric (explode of a (metric, value) struct array; the
    // oracle is the equivalent UNION ALL).
    Q("p35_metricize", sqlP(
      """SELECT conv_id, turn_idx, metric, value FROM (
        |  SELECT conv_id, turn_idx, 'status' AS metric, status AS value
        |  FROM parsed WHERE parse_ok
        |  UNION ALL
        |  SELECT conv_id, turn_idx, 'textlen' AS metric, length(text) AS value
        |  FROM parsed WHERE parse_ok)
        |ORDER BY conv_id, turn_idx, metric""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .select(col("conv_id"), col("turn_idx"), explode(array(
          struct(lit("status").as("metric"), col("status").cast("int").as("value")),
          struct(lit("textlen").as("metric"), length(col("text")).cast("int").as("value"))))
          .as("mv"))
        .select(col("conv_id"), col("turn_idx"),
          col("mv.metric").as("metric"), col("mv.value").as("value"))
        .orderBy("conv_id", "turn_idx", "metric")
    },

    // P36: Logstash `extractnumbers` filter — pull every number out of the
    // free-text event into typed fields (count + sum here, so the
    // differential stays integer-exact; regexp_extract_all in both engines).
    Q("p36_extractnumbers", sqlT(
      """SELECT conv_id, turn_idx,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
        |  CAST(coalesce(list_sum(list_transform(
        |    regexp_extract_all(text, '[0-9]+'),
        |    x -> CAST(CASE WHEN length(x) > 15 THEN left(x, 15) ELSE x END AS BIGINT))), 0) AS BIGINT) AS num_sum
        |FROM turns ORDER BY conv_id, turn_idx""".stripMargin)) { (s, d) =>
      T(s, d)
        .withColumn("nums", regexp_extract_all(col("text"), lit("[0-9]+"), lit(0)))
        .select(col("conv_id"), col("turn_idx"),
          size(col("nums")).cast("long").as("n_nums"),
          coalesce(expr(
            """aggregate(transform(nums,
              |  x -> CAST(CASE WHEN length(x) > 15 THEN left(x, 15) ELSE x END AS BIGINT)),
              |CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin), lit(0L))
            .as("num_sum"))
        .orderBy("conv_id", "turn_idx")
    },

    // P37: the composite-grok path end-to-end — synthesize a combined-format
    // Apache access line per parsed turn, then parse it back with the
    // recursively-expanded %{COMBINEDAPACHELOG} library pattern. ONE compiled
    // regex (GrokCompiler) runs in BOTH engines (the library is RE2-safe by
    // construction), so the oracle exercises the same groups at the same
    // indices.
    Q("p37_grok_apache", {
      import graft.functions.GrokCompiler
      val g = GrokCompiler.compile("%{COMBINEDAPACHELOG}")
      val rx = g.regex
      sqlP(
        ", al AS (SELECT conv_id, turn_idx, src_ip || ' - ' || usr || ' [' " +
        "|| strftime(ts, '%d/%b/%Y:%H:%M:%S') || ' +0000] \"GET ' || uri " +
        "|| ' HTTP/1.1\" ' || CAST(status AS VARCHAR) || ' ' " +
        "|| CAST(length(text) AS VARCHAR) || ' \"-\" \"curl/8.5.0\"' AS line " +
        "FROM parsed WHERE parse_ok) " +
        // DuckDB's integer-group regexp_extract caps at group 9; the
        // name-list form returns ALL groups as one struct in group order
        s", px AS (SELECT conv_id, turn_idx, regexp_extract(line, '$rx', " +
        g.fields.map(f => s"'$f'").mkString("[", ", ", "]") + ") AS p FROM al) " +
        "SELECT conv_id, turn_idx, p.clientip AS clientip, " +
        "p.\"timestamp\" AS ts_str, p.verb AS verb, p.request AS request, " +
        "CAST(p.response AS INT) AS response, CAST(p.bytes AS INT) AS n_bytes, " +
        "p.agent AS agent " +
        "FROM px ORDER BY conv_id, turn_idx")
    }) { (s, d) =>
      import graft.functions.GrokCompiler
      val g = GrokCompiler.compile("%{COMBINEDAPACHELOG}")
      val rx = g.regex
      def ex(f: String) = regexp_extract(col("line"), rx, g.groupOf(f))
      P(s, d).filter(col("parse_ok"))
        .withColumn("line", concat(
          col("src_ip"), lit(" - "), col("user"), lit(" ["),
          date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000] \"GET "),
          col("uri"), lit(" HTTP/1.1\" "), col("status").cast("string"), lit(" "),
          length(col("text")).cast("string"), lit(" \"-\" \"curl/8.5.0\"")))
        .select(col("conv_id"), col("turn_idx"),
          ex("clientip").as("clientip"), ex("timestamp").as("ts_str"),
          ex("verb").as("verb"), ex("request").as("request"),
          ex("response").cast("int").as("response"),
          ex("bytes").cast("int").as("n_bytes"), ex("agent").as("agent"))
        .orderBy("conv_id", "turn_idx")
    },

    // §2.6 widening: fixed-width integer histogram of text length per role —
    // bucket arithmetic is plain integer division so both engines agree
    // exactly; the 100-TB shape is a map-side-combined hash aggregate.
    Q("agg_hist_textlen", sqlT(
      """SELECT role, least(length(text) // 20, 7) AS bucket, count(*) AS n
        |FROM turns GROUP BY role, bucket
        |ORDER BY role, bucket""".stripMargin)) { (s, d) =>
      T(s, d)
        .groupBy(col("role"),
          least(floor(length(col("text")) / 20), lit(7)).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("role", "bucket")
    },

    // P38: gap-based sessionization — Spark's native session_window (1-hour
    // inactivity gap) vs the oracle's lag/flag/cumulative-sum rendering of
    // the same semantics. The log-pipeline "split a conversation into
    // visits" op; in streaming the same call works under a watermark.
    Q("p38_sessionize", sqlT(
      // gap detection on MICROSECOND epochs (epoch_us) — Spark's
      // session_window merges on full timestamp precision, so a
      // second-truncated oracle would disagree near the 3600s boundary on
      // sub-second fixtures (ADVICE r3); only the EMITTED bounds truncate
      // (both sides floor to seconds identically)
      """SELECT conv_id, CAST(min(ts_s) AS BIGINT) AS session_start,
        |  CAST(max(ts_s) AS BIGINT) AS session_last, count(*) AS n_events
        |FROM (
        |  SELECT conv_id, ts_s, sum(new_s) OVER (
        |    PARTITION BY conv_id ORDER BY ts_us, turn_idx
        |    ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM (
        |    SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
        |      CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
        |      CASE WHEN lag(epoch_us(ts)) OVER (
        |          PARTITION BY conv_id ORDER BY ts, turn_idx) IS NULL THEN 1
        |        WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |            PARTITION BY conv_id ORDER BY ts, turn_idx)
        |          >= 3600000000 THEN 1
        |        ELSE 0 END AS new_s
        |    FROM turns))
        |GROUP BY conv_id, sess ORDER BY conv_id, session_start""".stripMargin)) { (s, d) =>
      T(s, d)
        .groupBy(col("conv_id"), session_window(col("ts"), "1 hour").as("w"))
        .agg(min(unix_timestamp(col("ts"))).as("session_start"),
          max(unix_timestamp(col("ts"))).as("session_last"),
          count(lit(1)).as("n_events"))
        .select(col("conv_id"), col("session_start"), col("session_last"),
          col("n_events"))
        .orderBy("conv_id", "session_start")
    },

    // §2.6 widening: pivot — per-role event counts pivoted across status
    // classes (Spark `pivot` with a pinned column list == the oracle's
    // conditional aggregation; pinning the list keeps the plan a single
    // hash aggregate, no distinct-values pre-pass).
    Q("agg_pivot", sqlP(
      """SELECT role,
        |  CAST(coalesce(sum(CASE WHEN status < 300 THEN 1 END), 0) AS BIGINT) AS ok,
        |  CAST(coalesce(sum(CASE WHEN status >= 400 AND status < 500 THEN 1 END), 0) AS BIGINT) AS client_err,
        |  CAST(coalesce(sum(CASE WHEN status >= 500 THEN 1 END), 0) AS BIGINT) AS server_err
        |FROM parsed WHERE parse_ok GROUP BY role ORDER BY role""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .withColumn("cls", when(col("status") < 300, "ok")
          .when(col("status") >= 400 && col("status") < 500, "client_err")
          .when(col("status") >= 500, "server_err"))
        .groupBy(col("role")).pivot("cls", Seq("ok", "client_err", "server_err"))
        .agg(coalesce(count(lit(1)), lit(0L)))
        .na.fill(0L, Seq("ok", "client_err", "server_err"))
        .orderBy("role")
    },

    // §2.6 widening: exact linear-interpolated percentiles of status per
    // action (Spark `percentile` == DuckDB `quantile_cont`), rounded to 4dp
    // to keep the differential stable across float formatting.
    Q("agg_percentile", sqlP(
      """SELECT action, round(quantile_cont(status, 0.5), 4) AS p50,
        |  round(quantile_cont(status, 0.9), 4) AS p90, count(*) AS n
        |FROM parsed WHERE parse_ok GROUP BY action
        |ORDER BY action""".stripMargin)) { (s, d) =>
      P(s, d).filter(col("parse_ok"))
        .groupBy(col("action"))
        .agg(round(expr("percentile(status, 0.5)"), 4).as("p50"),
          round(expr("percentile(status, 0.9)"), 4).as("p90"),
          count(lit(1)).as("n"))
        .orderBy("action")
    })
}
