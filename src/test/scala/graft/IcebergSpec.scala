package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.fixtures.Gen
import graft.sources.Source

/** Iceberg behind the Source seam (SURVEY §7.6). The sandbox ships no
  * Iceberg runtime jar, so this CANCELS cleanly here; on any machine with
  * `iceberg-spark-runtime-3.x_2.13` on the classpath it activates and
  * round-trips a real Hadoop-catalog Iceberg table through
  * [[Source.readTable]] + the enrich chain — the regression gate for the
  * contract's actual target format. Activation: drop the runtime jar into
  * the unmanaged classpath (e.g. /opt/spark/jars) and rerun `sbt test`. */
class IcebergSpec extends SparkSuite {
  import spark.implicits._

  private def icebergAvailable: Boolean =
    try { Class.forName("org.apache.iceberg.spark.SparkCatalog"); true }
    catch { case _: Throwable => false }

  test("iceberg table round-trips through Source.readTable and the enrich chain") {
    assume(icebergAvailable,
      "iceberg-spark-runtime jar not on classpath — cancelled (see Scaladoc)")
    val wh = Files.createTempDirectory("graft-iceberg-wh").toString
    spark.conf.set("spark.sql.catalog.graft_ice",
      "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.graft_ice.type", "hadoop")
    spark.conf.set("spark.sql.catalog.graft_ice.warehouse", wh)

    val fx = Gen.fixture(40)
    val df = spark.createDataset(fx.turns).toDF()
    df.writeTo("graft_ice.db.transcripts").using("iceberg").createOrReplace()

    val back = Source.readTable(spark, "iceberg", s"$wh/db/transcripts")
    assert(back.count() === df.count())

    val tb = RuleTables(fx.ioc.toDF(), fx.rules, fx.ref.toDF(), fx.whitelist)
    def routed(src: org.apache.spark.sql.DataFrame) =
      Pipeline.enrich(src, tb, fx.conf).filter(col("routed"))
        .select("conv_id", "turn_idx", "note")
        .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2)))
        .sortBy(t => (t._1, t._2)).toSeq
    assert(routed(back) === routed(df),
      "enrich over the iceberg scan must equal enrich over the in-memory frame")
  }
}
