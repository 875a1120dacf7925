package graft.ingest

import java.nio.file.Files
import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** The canonical bar table must survive CSV and JSON roundtrips —
  * parquet is the engine's storage format, but an ingest pipeline
  * exchanges data with external systems in text formats too; schema-on-read
  * plus the UTC session timezone must reproduce the exact rows. */
class BarFormatsSpec extends SparkSuite {
  import spark.implicits._

  private def canonical: DataFrame =
    BarPipeline.canonicalBars(spark, sf())

  private def normalized(df: DataFrame) =
    df.select("bar_key", "symbol", "timestamp", "timeframe",
      "open", "high", "low", "close", "volume")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq

  test("CSV roundtrip preserves the canonical bars") {
    val dir = Files.createTempDirectory("bars_csv").toString + "/bars"
    canonical.write.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .csv(dir)
    val back = spark.read.option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSXXX")
      .schema(canonical.schema) // schema-on-read: no inference drift
      .csv(dir)
    assert(normalized(back) == normalized(canonical))
  }

  test("JSON roundtrip preserves the canonical bars") {
    val dir = Files.createTempDirectory("bars_json").toString + "/bars"
    canonical.write.json(dir)
    val back = spark.read.schema(canonical.schema).json(dir)
    assert(normalized(back) == normalized(canonical))
  }
}
