package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.DataFrame

/** The LSH band-bucket size cap (TextOps.MaxBandBucket): on an
  * adversarially self-similar corpus — a large clique of identical
  * documents, the quadratic floor of the fixed-vocab 100× scaling
  * fixture in miniature — candidate generation must degrade to
  * bounded work (over-cap buckets dropped whole), while pairs living
  * in under-cap buckets are untouched and the dropped mass is exactly
  * reported by `Dedup.capReportOf`.  Expected values are re-derived
  * in plain Scala (clique combinatorics), not replayed from SQL. */
class BandBucketCapSpec extends SparkSuite {
  import spark.implicits._

  private val CliqueN = 30
  // identical texts → identical signatures → every one of the 8 band
  // buckets holds the whole clique (deterministically, no hash luck)
  private val cliqueText =
    "the same viral chain letter body repeated verbatim in every copy"
  private val benignText =
    "a genuinely distinctive body that appears exactly twice in the corpus"

  /** 30-doc identical clique + one identical benign pair (100, 101). */
  private lazy val docs: DataFrame =
    ((0L until CliqueN.toLong).map(i => i -> cliqueText) ++
      Seq(100L -> benignText, 101L -> benignText))
      .toDF("doc_id", "text")

  test("over-cap buckets are dropped whole; under-cap pairs are untouched") {
    val capped = Dedup.verifiedPairsOf(docs, 8)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    // the clique's C(30,2) pairs are gone — every bucket they collide
    // in is over the cap — but the benign pair's 2-member buckets
    // survive untouched
    assert(capped == Set((100L, 101L)))
    val uncapped = Dedup.verifiedPairsOf(docs, Int.MaxValue).count()
    assert(uncapped == CliqueN.toLong * (CliqueN - 1) / 2 + 1)
  }

  test("cap report accounts the dropped pair mass exactly") {
    val r = Dedup.capReportOf(docs, 8).collect()
    assert(r.length == 1)
    val row = r.head
    // all 8 band buckets of the identical clique are over the cap
    assert(row.getLong(row.fieldIndex("capped_buckets")) == 8L)
    // Σ C(f,2) over the 8 capped buckets, each holding the full clique
    assert(row.getLong(row.fieldIndex("capped_pairs")) ==
      8L * CliqueN * (CliqueN - 1) / 2)
    assert(row.getLong(row.fieldIndex("kept_pairs")) == 1L)
  }

  test("the default cap is benign on the fixture corpus") {
    val row = Dedup.minhashCapReport(spark, sf(), TextOps.MaxBandBucket)
      .collect().head
    assert(row.getLong(row.fieldIndex("capped_buckets")) == 0L)
    assert(row.getLong(row.fieldIndex("capped_pairs")) == 0L)
    // with no bucket capped, the surviving-pair count IS the uncapped
    // operator's result — the cap provably never changed the fixture
    assert(row.getLong(row.fieldIndex("kept_pairs")) ==
      Dedup.minhashLsh(spark, sf()).count())
  }

  test("simhash band join degrades identically: clique dropped, mass reported") {
    // identical texts → identical simhash → all 6 band buckets hold
    // the whole clique; the benign pair's buckets hold 2
    val r = Dedup.simhashCapReportOf(docs, 8).collect().head
    assert(r.getLong(r.fieldIndex("capped_buckets")) == 6L)
    assert(r.getLong(r.fieldIndex("capped_pairs")) ==
      6L * CliqueN * (CliqueN - 1) / 2)
    assert(r.getLong(r.fieldIndex("kept_pairs")) == 1L)
    // uncapped, the clique pairs are all hamming-0 and verified
    val un = Dedup.simhashCapReportOf(docs, Int.MaxValue).collect().head
    assert(un.getLong(un.fieldIndex("capped_buckets")) == 0L)
    assert(un.getLong(un.fieldIndex("kept_pairs")) ==
      CliqueN.toLong * (CliqueN - 1) / 2 + 1)
  }

  test("simhash default cap is benign on the fixture corpus") {
    val r = Dedup.simhashCapReport(spark, sf(), TextOps.MaxBandBucket)
      .collect().head
    assert(r.getLong(r.fieldIndex("capped_buckets")) == 0L)
    assert(r.getLong(r.fieldIndex("kept_pairs")) ==
      Dedup.simhashBanded(spark, sf()).count())
  }

  test("bounded work: candidate fan-out never exceeds cap per bucket row") {
    // with the cap, the band self-join's per-key fan-out is ≤ cap, so
    // total candidate rows from the adversarial corpus are bounded by
    // bands · cap² even though the clique alone would emit 8·C(30,2);
    // observable on the capped pipeline's verified output being tiny
    // while the uncapped one is clique-quadratic
    val cappedPairs = Dedup.verifiedPairsOf(docs, 8).count()
    val uncappedPairs = Dedup.verifiedPairsOf(docs, Int.MaxValue).count()
    assert(cappedPairs == 1L)
    assert(uncappedPairs > 400L)
  }
}
