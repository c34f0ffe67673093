package graft.entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Maps the driver-provided `events` table into the BASELINE.json transcript
  * shape (conv_id, turn_idx, role, text, tool, ts) fully deterministically, so
  * every pipeline operator can be exercised on /root/testdata AND reproduced
  * by DuckDB (FIXTURES.md §5).
  *
  * THE MAPPING IS A CROSS-ENGINE CONTRACT: [[turns]] (DataFrame API) and
  * [[turnsCte]] (DuckDB SQL) must produce byte-identical rows. Change both or
  * neither; `tools/check_oracle.py` is the differential gate.
  */
object TestdataAdapter {

  private def s(c: Column): Column = c.cast("string")

  /** Spark side. Line shape matches the fixture grok pattern. */
  def turns(spark: SparkSession, sfDir: String): DataFrame = {
    val e = graft.sources.Source.readTable(spark, graft.model.PipelineConf(), s"$sfDir/events.parquet")
    val id = col("event_id")
    val uid = col("user_id")

    val action = when(id % 37 === 0, "exfil").otherwise(col("event_type"))
    val user = when(id % 53 === 0, concat(lit("nu"), s(id)))
      .otherwise(concat(lit("u"), s(uid % 60)))
    val srcIp = when(id % 23 === 0, concat(lit("203.0.113."), s(id % 80 + 1)))
      .otherwise(concat(lit("10."), s(id % 4), lit("."), s(uid % 200), lit("."), s(id % 250 + 1)))
    val dstHost = when(id % 41 === 5, concat(lit("evil"), s(id % 60), lit(".example.net")))
      .otherwise(concat(lit("host"), s(id % 25), lit(".corp.example")))
    val status = when(id % 31 === 0, 503).when(id % 13 === 0, 404).otherwise(200)
    val hashv = when(id % 43 === 0, md5(concat(lit("mal"), s(id % 40))))
      .otherwise(md5(concat(lit("h"), s(id % 97))))
    val uri = when(id % 29 === 3, "/api/secret/keys")
      .when(id % 29 === 4, "/debug/trace")
      .otherwise(concat(lit("/api/v"), s(id % 7), lit("/r"), s(uid % 15)))
    val text = when(id % 10 === 7, concat(lit("noise "), col("props")))
      .otherwise(concat(
        action, lit(" user="), user, lit(" src="), srcIp, lit(" dst="), dstHost,
        lit(" status="), s(status), lit(" hash="), hashv, lit(" uri="), uri))

    e.select(
      concat(lit("conv-"), s(uid)).as("conv_id"),
      (row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy(uid).orderBy(col("ts"), id)) - 1).cast("int").as("turn_idx"),
      when(col("event_type") === "error", "tool")
        .when(col("event_type").isin("click", "view"), "user")
        .otherwise("assistant").as("role"),
      text.as("text"),
      when(col("event_type") === "error", "bash").otherwise("").as("tool"),
      col("ts"))
  }

  /** DuckDB side of the same mapping, as a CTE named `turns`. */
  val turnsCte: String = """
turns AS (
  SELECT
    'conv-' || CAST(user_id AS VARCHAR) AS conv_id,
    CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
    CASE WHEN event_type = 'error' THEN 'tool'
         WHEN event_type IN ('click','view') THEN 'user'
         ELSE 'assistant' END AS role,
    CASE WHEN event_id % 10 = 7 THEN 'noise ' || props
         ELSE (CASE WHEN event_id % 37 = 0 THEN 'exfil' ELSE event_type END)
      || ' user=' || (CASE WHEN event_id % 53 = 0 THEN 'nu' || CAST(event_id AS VARCHAR)
                           ELSE 'u' || CAST(user_id % 60 AS VARCHAR) END)
      || ' src=' || (CASE WHEN event_id % 23 = 0 THEN '203.0.113.' || CAST(event_id % 80 + 1 AS VARCHAR)
                          ELSE '10.' || CAST(event_id % 4 AS VARCHAR) || '.'
                            || CAST(user_id % 200 AS VARCHAR) || '.'
                            || CAST(event_id % 250 + 1 AS VARCHAR) END)
      || ' dst=' || (CASE WHEN event_id % 41 = 5 THEN 'evil' || CAST(event_id % 60 AS VARCHAR) || '.example.net'
                          ELSE 'host' || CAST(event_id % 25 AS VARCHAR) || '.corp.example' END)
      || ' status=' || CAST(CASE WHEN event_id % 31 = 0 THEN 503
                                 WHEN event_id % 13 = 0 THEN 404 ELSE 200 END AS VARCHAR)
      || ' hash=' || (CASE WHEN event_id % 43 = 0 THEN md5('mal' || CAST(event_id % 40 AS VARCHAR))
                           ELSE md5('h' || CAST(event_id % 97 AS VARCHAR)) END)
      || ' uri=' || (CASE WHEN event_id % 29 = 3 THEN '/api/secret/keys'
                          WHEN event_id % 29 = 4 THEN '/debug/trace'
                          ELSE '/api/v' || CAST(event_id % 7 AS VARCHAR) || '/r'
                            || CAST(user_id % 15 AS VARCHAR) END)
    END AS text,
    CASE WHEN event_type = 'error' THEN 'bash' ELSE '' END AS tool,
    ts
  FROM events
)""".trim
}
