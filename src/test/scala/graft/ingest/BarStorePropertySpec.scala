package graft.ingest

import java.nio.file.Files
import java.sql.Timestamp
import graft.SparkSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for the keyed MERGE sink: applying random batches
  * sequentially must equal a last-write-wins reference fold over the
  * same batches, for any mix of new keys, updated keys, and touched /
  * untouched date partitions.  Fixed seeds keep runs reproducible. */
class BarStorePropertySpec extends SparkSuite {
  import spark.implicits._

  private val symGen = Gen.oneOf("A", "B", "C")
  private val dayGen = Gen.choose(1, 6)
  private val rowGen = Gen.zip(symGen, dayGen, Gen.choose(1, 999))
  private val batchesGen = Gen.listOfN(3, Gen.listOfN(12, rowGen))

  private def toDf(rows: Seq[(String, Int, Int)], seq: Int) =
    rows.map { case (s, d, v) =>
      val ts = Timestamp.valueOf(f"2024-01-0$d 00:00:00")
      (f"202401$d%02dT000000Z_Day",
        s, ts, "Day", v.toDouble, v.toDouble, v.toDouble, v.toDouble, seq.toLong)
    }.toDF("bar_key", "symbol", "timestamp", "timeframe",
      "open", "high", "low", "close", "volume")

  test("sequential merges equal a last-write-wins fold") {
    (1 to 5).foreach { i =>
      val batches = batchesGen.apply(Gen.Parameters.default, Seed(i.toLong)).get
      val store = Files.createTempDirectory(s"merge_prop_$i").toString + "/bars"
      batches.zipWithIndex.foreach { case (b, seq) =>
        BarStore.merge(toDf(b, seq), store)
      }
      val got = BarStore.read(spark, store)
        .select("symbol", "bar_key", "volume")
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // reference: within a batch dropDuplicates keeps an arbitrary
      // row per key, but our generator makes volume == seq for every
      // row of a batch, so last-batch-wins is well-defined on volume;
      // the key is pure-Scala computable (same format toDf builds)
      val want = batches.zipWithIndex.flatMap { case (b, seq) =>
        b.map { case (s, d, _) =>
          (s, f"202401$d%02dT000000Z_Day") -> seq.toLong
        }
      }.toMap // later entries overwrite earlier → last write wins
      assert(got == want, s"seed $i")
    }
  }
}
