package graft.ops

/** Shared scalar-logic fragments for the LLM-data-pipeline operators,
  * emitted in two SQL dialects: Spark SQL (the engine) and DuckDB SQL
  * (the driver's correctness oracle).
  *
  * Everything here is *engine-portable by construction*: the only hash
  * primitive is MD5 (bit-identical in every engine), reduced to a
  * 60-bit integer via the first 15 hex chars, and all arithmetic stays
  * inside signed-64-bit / IEEE-double ranges with an identical fold
  * order on both sides.  That makes MinHash signatures, SimHash bits,
  * rolling fingerprints and cosine scores hash-comparable between the
  * Spark result and the DuckDB oracle — the same trick used to verify
  * any distributed engine against a single-node reference.
  *
  * The reference pipeline (SURVEY.md §2.3) only ever hashes by string
  * concat for doc keys (F3); these fragments extend that to the
  * content-addressed world a training-data pipeline needs.
  */
sealed trait SqlDialect {
  /** Regex literal with dialect-correct escaping ('\s' vs '\\s'). */
  def rx(pattern: String): String

  /** 60-bit non-negative integer hash of an expression (string input):
    * first 15 hex chars of md5, parsed base-16. Range [0, 2^60). */
  def h60(x: String): String

  /** regexp_replace with global semantics. */
  def reReplace(x: String, pattern: String, rep: String): String

  /** Array of non-empty tokens: lower → strip non-alnum → split. */
  def tokens(text: String): String =
    arrFilter(
      split(s"trim(${reReplace(s"lower($text)", "[^a-z0-9]+", " ")})", " "),
      "t", "t != ''")

  /** Whitespace tokens of the raw (un-normalized) text. */
  def wsTokens(text: String): String =
    arrFilter(splitRx(s"trim($text)", "\\s+"), "t", "t != ''")

  def split(x: String, sep: String): String
  def splitRx(x: String, pattern: String): String
  def arrFilter(arr: String, v: String, pred: String): String
  def arrTransform(arr: String, v: String, body: String): String
  def arrSize(arr: String): String
  def arrAt(arr: String, i: String): String // 1-based
  def arrDistinct(arr: String): String
  def arrIntersectSize(a: String, b: String): String
  def sequence1(n: String): String // [1..n], empty when n < 1
  /** Left fold with explicit double/long init — identical order both sides. */
  def fold(arr: String, init: String, acc: String, v: String, body: String): String
  def xor(a: String, b: String): String
  def shiftRight(a: String, n: String): String
  def intDiv(a: String, b: String): String
  def regexpExtractAllSize(x: String, pattern: String): String
  def containedIn(v: String, items: Seq[String]): String
  def arrSlice(arr: String, start1: String, len: String): String // 1-based
  def arrMin(arr: String): String
  def arrMax(arr: String): String
  /** Join a string-array into one string with a separator. */
  def arrJoin(arr: String, sep: String): String
  def castStr(x: String): String
  /** Explode an array column to rows (select-list position). */
  def explode(arr: String): String
  /** Array literal from element expressions. */
  def arrOf(items: Seq[String]): String
  /** Double literal (Spark parses bare `5.0` as DECIMAL — force the
    * double type explicitly in both dialects). */
  def dlit(x: Double): String
  /** [0..n-1], empty when n < 1. */
  def sequence0(n: String): String
  /** Aggregate values into an array (grouped-select position).  Element
    * order is engine-dependent — callers may only use the result in
    * order-insensitive ways (size, intersection size). */
  def listAgg(x: String): String

  /** CTE materialization hint (`name AS $mat (...)`): DuckDB inlines
    * CTEs per reference by default, so a CTE consumed k times
    * recomputes its whole upstream chain k times — mark multi-consumer
    * CTEs MATERIALIZED there.  Spark has no such keyword (and the
    * engine side caches multi-consumer relations as DataFrames
    * instead), so its hint is empty. */
  def mat: String

  /** Word 3-gram shingle set (distinct) from a token-array expression. */
  def shingles3(toks: String): String =
    arrDistinct(arrTransform(
      sequence1(s"${arrSize(toks)} - 2"), "i",
      s"${arrAt(toks, "i")} || ' ' || ${arrAt(toks, "i + 1")} || ' ' || ${arrAt(toks, "i + 2")}"))

  /** Dot product of two double-array expressions, left-to-right fold. */
  def dot(a: String, b: String): String =
    fold(arrTransform(sequence1(arrSize(a)), "i",
           s"${arrAt(a, "i")} * ${arrAt(b, "i")}"),
         "CAST(0.0 AS DOUBLE)", "s", "x", "s + x")

  /** Cast a float-array to double-array (before any arithmetic). */
  def toDoubleArr(a: String): String =
    arrTransform(a, "x", "CAST(x AS DOUBLE)")
}

object SparkDialect extends SqlDialect {
  def rx(p: String): String = "'" + p.replace("\\", "\\\\") + "'"
  /** Native fused expression (graft.functions.GraftH60) — bit-identical
    * to CAST(CONV(SUBSTRING(MD5(x),1,15),16,10) AS BIGINT), which the
    * oracle dialect keeps. */
  def h60(x: String): String = s"graft_h60($x)"
  def reReplace(x: String, p: String, rep: String): String =
    s"regexp_replace($x, ${rx(p)}, '$rep')"
  def split(x: String, sep: String): String = s"split($x, ${rx(sep)})"
  def splitRx(x: String, p: String): String = s"split($x, ${rx(p)})"
  def arrFilter(arr: String, v: String, pred: String): String =
    s"filter($arr, $v -> $pred)"
  def arrTransform(arr: String, v: String, body: String): String =
    s"transform($arr, $v -> $body)"
  def arrSize(arr: String): String = s"size($arr)"
  def arrAt(arr: String, i: String): String = s"element_at($arr, $i)"
  def arrDistinct(arr: String): String = s"array_distinct($arr)"
  def arrIntersectSize(a: String, b: String): String =
    s"size(array_intersect($a, $b))"
  // Spark sequence(1, n) DESCENDS when n < 1 — guard to empty instead.
  def sequence1(n: String): String =
    s"(CASE WHEN ($n) >= 1 THEN sequence(1, $n) ELSE slice(sequence(1, 1), 1, 0) END)"
  def fold(arr: String, init: String, acc: String, v: String, body: String): String =
    s"aggregate($arr, $init, ($acc, $v) -> $body)"
  def xor(a: String, b: String): String = s"($a ^ $b)"
  def shiftRight(a: String, n: String): String = s"shiftright($a, $n)"
  def intDiv(a: String, b: String): String = s"($a DIV $b)"
  def regexpExtractAllSize(x: String, p: String): String =
    s"size(regexp_extract_all($x, ${rx(p)}, 0))"
  def containedIn(v: String, items: Seq[String]): String =
    s"array_contains(array(${items.map(s => s"'$s'").mkString(", ")}), $v)"
  /** Codegen'd native expression (graft.functions.DotProduct) instead
    * of the interpreted HOF fold — same left-to-right accumulation. */
  override def dot(a: String, b: String): String = s"graft_dot($a, $b)"

  /** Codegen'd native tokenizer (graft.functions.GraftTokens): one
    * byte-scan pass, bit-identical to the regex chain the oracle
    * dialect keeps. */
  override def tokens(text: String): String = s"graft_tokens($text)"

  /** Native one-pass shingle set (graft.functions.GraftShingles3) —
    * same first-occurrence-ordered distinct as the array_distinct/
    * transform chain the oracle dialect keeps, which Spark would run
    * as interpreted HOF lambdas. */
  override def shingles3(toks: String): String = s"graft_shingles3($toks)"
  def arrSlice(arr: String, start1: String, len: String): String =
    s"slice($arr, $start1, $len)"
  def arrMin(arr: String): String = s"array_min($arr)"
  def arrMax(arr: String): String = s"array_max($arr)"
  def arrJoin(arr: String, sep: String): String =
    s"array_join($arr, '$sep')"
  def castStr(x: String): String = s"CAST($x AS STRING)"
  def explode(arr: String): String = s"explode($arr)"
  def arrOf(items: Seq[String]): String = s"array(${items.mkString(", ")})"
  def dlit(x: Double): String = s"${x}D"
  def sequence0(n: String): String =
    s"(CASE WHEN ($n) >= 1 THEN sequence(0, ($n) - 1) ELSE slice(sequence(1, 1), 1, 0) END)"
  def listAgg(x: String): String = s"collect_list($x)"
  def mat: String = ""
}

object DuckDialect extends SqlDialect {
  def rx(p: String): String = "'" + p + "'"
  def h60(x: String): String =
    s"CAST(CAST(('0x' || substr(md5($x), 1, 15)) AS UBIGINT) AS BIGINT)"
  def reReplace(x: String, p: String, rep: String): String =
    s"regexp_replace($x, ${rx(p)}, '$rep', 'g')"
  def split(x: String, sep: String): String = s"string_split($x, ${rx(sep)})"
  def splitRx(x: String, p: String): String = s"string_split_regex($x, ${rx(p)})"
  def arrFilter(arr: String, v: String, pred: String): String =
    s"list_filter($arr, $v -> $pred)"
  def arrTransform(arr: String, v: String, body: String): String =
    s"list_transform($arr, $v -> $body)"
  def arrSize(arr: String): String = s"len($arr)"
  def arrAt(arr: String, i: String): String = s"$arr[$i]"
  def arrDistinct(arr: String): String = s"list_distinct($arr)"
  def arrIntersectSize(a: String, b: String): String =
    s"len(list_intersect($a, $b))"
  def sequence1(n: String): String = s"generate_series(1, $n)"
  def fold(arr: String, init: String, acc: String, v: String, body: String): String =
    s"list_reduce(list_prepend($init, $arr), ($acc, $v) -> $body)"
  def xor(a: String, b: String): String = s"xor($a, $b)"
  def shiftRight(a: String, n: String): String = s"($a >> $n)"
  def intDiv(a: String, b: String): String = s"($a // $b)"
  def regexpExtractAllSize(x: String, p: String): String =
    s"len(regexp_extract_all($x, ${rx(p)}))"
  def containedIn(v: String, items: Seq[String]): String =
    s"list_contains([${items.map(s => s"'$s'").mkString(", ")}], $v)"
  def arrSlice(arr: String, start1: String, len: String): String =
    s"list_slice($arr, $start1, ($start1) + ($len) - 1)"
  def arrMin(arr: String): String = s"list_min($arr)"
  def arrMax(arr: String): String = s"list_max($arr)"
  def arrJoin(arr: String, sep: String): String =
    s"array_to_string($arr, '$sep')"
  def castStr(x: String): String = s"CAST($x AS VARCHAR)"
  def explode(arr: String): String = s"unnest($arr)"
  def arrOf(items: Seq[String]): String = s"[${items.mkString(", ")}]"
  def dlit(x: Double): String = s"CAST($x AS DOUBLE)"
  def sequence0(n: String): String = s"generate_series(0, ($n) - 1)"
  def listAgg(x: String): String = s"list($x)"
  def mat: String = "MATERIALIZED"

  /** DuckDB-native sequential dot product.  The trait's interpreted
    * fold re-builds any LITERAL array operand once per element
    * reference (the literal text sits inside the per-element lambda),
    * so a 64-dim dot against a literal hyperplane costs 64 list
    * constructions PER ROW — measured ~60 s for one 2000-row
    * hyperplane-bits stage at sf0.1, ~0.01 s with the native kernel.
    * `list_dot_product` accumulates left-to-right in doubles, exactly
    * like the fold and the engine's `graft_dot`: verified 0 differing
    * results (IS DISTINCT FROM) over all 40k sf0.1 query-pair dots and
    * all 2000×literal-plane dots before the swap. */
  override def dot(a: String, b: String): String =
    s"list_dot_product($a, $b)"
}

/** Deterministic parameters shared by the hashing operators. */
object TextOps {
  /** Mersenne prime 2^31 - 1: (a * (h % P) + b) stays < 2^62. */
  val P: Long = 2147483647L

  /** Hot-gram document-frequency cap for the inverted-index joins
    * (n-gram Jaccard dedup, contamination check).  A shingle shared by
    * f documents contributes O(f²) candidate pairs, so one viral
    * boilerplate phrase is a skew bomb at scale; postings for grams
    * with df > MaxGramDf are dropped from candidate *generation*, and
    * the dropped grams are folded back EXACTLY into each surviving
    * pair's shared-count via the intersection of the (small) per-doc
    * hot-gram arrays — scores are unchanged, only pairs whose every
    * shared gram is hot are lost (boilerplate-only overlaps, far below
    * any Jaccard threshold when the cap is generous).  64 is generous
    * for the fixture corpora (max observed df: 7 at sf0.01, 25 at
    * sf0.1 — results are bit-identical with or without the cap, which
    * is how the oracle proves recall is intact); production corpora
    * tune it via the operator parameter. */
  val MaxGramDf = 64

  /** Asymmetric containment gate: a pair is a containment dup when
    * shared-gram mass covers ≥ 80 % of EITHER document's gram set.
    * High enough that IID word-salad overlap never trips it; low
    * enough to catch quoted/embedded sub-documents with light edits. */
  val ContainThreshold = 0.8

  /** MinHash: 32 permutations, banded 8 × 4 for LSH candidates. */
  val NumPerms = 32
  val Bands = 8
  val RowsPerBand = 4

  /** LSH band-bucket size cap: a bucket of f colliding signatures
    * contributes O(f²) candidate pairs, so on an adversarially
    * IID-similar corpus (every doc near every other — the fixed-vocab
    * 100× scaling fixture) candidate generation has a quadratic floor
    * no blocking can evade.  Buckets larger than this are dropped
    * whole from candidate generation — the `MaxGramDf` move one level
    * up: work becomes bounded per bucket, and the dropped mass is
    * exactly observable (`Dedup.minhashCapReport`'s capped_pairs =
    * Σ C(f,2) over capped buckets).  Unlike the hot-gram cap there is
    * no exact fold-back — a pair is LOST iff every band bucket it
    * collides in is capped, which on a benign corpus means losing
    * only pairs embedded in ≥ cap-sized near-clone cliques (whose
    * members are retrievable from any surviving bucket).  1000 is
    * orders of magnitude above the fixture maxima (df ≤ 3 at sf0.01,
    * ≤ 4 at sf0.1 — results bit-identical with or without the cap,
    * which the oracle suite proves) while bounding any one bucket's
    * join fan-out at ~500k pairs. */
  val MaxBandBucket = 1000

  /** Knuth multiplicative constants → 32 fixed (a, b) pairs. */
  def permA(i: Int): Long = {
    val a = (2654435761L * (i + 1) + 1L) % P
    if (a == 0L) 1L else a
  }
  def permB(i: Int): Long = (40503L * (i + 1) * 69069L) % P

  /** SimHash: 60-bit signature (full h60 width — 32 bits is too dense
    * for repetitive corpora), banded 6 × 10 bits.  By pigeonhole, any
    * pair with Hamming distance ≤ 5 shares at least one intact band, so
    * band-join candidate generation is *complete* for distance ≤ 5. */
  val SimHashBits = 60
  val SimHashBands = 6
  val SimHashBandBits = 10
  val SimHashMaxHamming: Int = SimHashBands - 1 // 5

  /** Random-hyperplane LSH for embeddings: 16 planes → 4 bands × 4 bits.
    * Integer plane weights (exact in IEEE double) from a fixed affine
    * formula — identical in any engine, no RNG needed. */
  val AnnPlanes = 16
  val AnnBands = 4
  val AnnBandBits = 4

  /** weight(plane p, dim d) = ((1 + (p*67 + d*29) % 97) - 49) ∈ [-48, 48]. */
  def planeWeightSql(d: SqlDialect, p: String, dim0: String): String =
    s"CAST((1 + (($p * 67 + $dim0 * 29) % 97)) - 49 AS DOUBLE)"

  /** Embedding dimensionality of the fixture corpus (64-float vectors). */
  val EmbeddingDim = 64

  /** The same plane weights as literal doubles (integers — exact in
    * IEEE), so hyperplane projections compile to a plain dot product
    * against a constant array instead of a per-element HOF chain. */
  def planeWeights(p: Int): Seq[Double] =
    (0 until EmbeddingDim).map(d => ((1 + ((p * 67 + d * 29) % 97)) - 49).toDouble)

  /** Hot-gram sets up to this many rows are force-broadcast into the
    * cap joins; larger sets fall back to a shuffled join.  1M grams at
    * ~60 bytes each is ≲ 64 MB on the driver — far under the 8 GB
    * broadcast ceiling but large enough that every realistic
    * boilerplate vocabulary fits.  A corpus whose hot set exceeds this
    * has `maxDf` tuned far too low for its size (at web scale a df cap
    * of 64 marks *every common phrase* hot — the cap parameter must
    * scale with the corpus, this guard just makes the failure mode a
    * slower join instead of a driver OOM). */
  val BroadcastMaxHotGrams: Long = 1000000L

  /** Session-scoped memo for the sized hot-gram side, keyed by the
    * posting relation's canonicalized plan + cap: the guard count that
    * sizes the broadcast decision runs ONCE per distinct
    * (relation, cap) per session, not once per operator invocation —
    * four operators (ngram Jaccard, contamination, contamination risk,
    * dup spans) share the same posting relation, so each invocation
    * after the first saves the count job.  Entries carry the same
    * session-lifetime caveat as `RelationCache` (a relation regenerated
    * in place under an identical plan needs `clearHotMemo`). */
  private val hotMemo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, Int),
    org.apache.spark.sql.DataFrame]()
  /** Test hook: number of guard-count jobs actually run. */
  private[ops] val hotGuardCounts = new java.util.concurrent.atomic.AtomicLong

  private[ops] def clearHotMemo(spark: org.apache.spark.sql.SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    hotMemo.keySet.asScala.filter(_._1 eq spark).toSeq.foreach { k =>
      Option(hotMemo.remove(k)).foreach(_.unpersist())
    }
  }

  /** Split an exploded posting relation `e(doc_id, ..., gram)` into the
    * capped candidate-generation inputs: (cold postings — `e` minus the
    * rows whose gram has document frequency > `maxDf` — and the per-doc
    * hot-gram arrays for the exact fold-back).  This is the engine-side
    * form of the df cap in `Dedup.ngramJaccardSql` /
    * `TextAnalysis.contaminationSql`:
    *  - gram df comes from a map-side-combining `groupBy("gram")` — NOT
    *    the SQL form's `count(*) OVER (PARTITION BY gram)`, which ships
    *    every posting of a hot gram into a single window task (the
    *    linear-skew variant of the same bomb the cap exists to defuse);
    *  - the hot-gram set is counted first (one agg job over the — in
    *    practice cached — posting relation, memoized per session by
    *    `hotMemo` so repeat invocations skip the job entirely) and
    *    broadcast into both consumers only while it stays under
    *    `BroadcastMaxHotGrams`, so no stage shuffles postings keyed on
    *    a skewed gram and an over-eager `maxDf` cannot OOM the driver.
    *    The two broadcasts share one exchange (identical subplans →
    *    ReusedExchange).  In the oversized fallback the joins shuffle;
    *    hot postings then skew linearly per gram, which AQE's
    *    skew-split handles — a degraded mode, never a fatal one.
    *
    * The per-doc `hgrams` arrays are bounded by each document's own
    * distinct-shingle count (≤ its token length), never by corpus
    * size. */
  def capPostings(posts: org.apache.spark.sql.DataFrame, maxDf: Int)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.functions._
    RelationCache.hookShutdown(posts.sparkSession)
    val key = (posts.sparkSession,
      posts.queryExecution.analyzed.canonicalized.toString, maxDf)
    var hotSide = hotMemo.get(key)
    if (hotSide == null) {
      // The hot set is persisted around the size-guard count so the
      // groupBy-count aggregation runs exactly once even when `posts`
      // is an uncached relation (the count is eager; without the
      // persist the `hot` subplan would be re-evaluated inside both
      // joins below — three full scans of an uncached `posts`).  The
      // pinned set is tiny (grams with df > maxDf — the boilerplate
      // vocabulary, not the corpus), so the memo footprint is bounded
      // by distinct (relation, cap) pairs — the same O(1)-per-session
      // shape as RelationCache.
      val hot = posts.groupBy("gram").agg(count(lit(1)).as("df"))
        .filter(col("df") > maxDf)
        .select("gram")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      hotGuardCounts.incrementAndGet()
      val sized =
        if (hot.count() <= BroadcastMaxHotGrams) broadcast(hot) else hot
      val prev = hotMemo.putIfAbsent(key, sized)
      // a lost race leaves a duplicate persist; keep the winner's (the
      // CacheManager dedupes storage by plan — don't unpersist, that
      // would evict the shared entry)
      hotSide = if (prev != null) prev else sized
    }
    val cold = posts.join(hotSide, Seq("gram"), "left_anti")
    val hotPerDoc = posts.join(hotSide, Seq("gram"))
      .groupBy("doc_id")
      .agg(collect_list(col("gram")).as("hgrams"))
    (cold, hotPerDoc)
  }

  /** Add an optimizer rule to spark.sql.optimizer.excludedRules,
    * preserving exclusions already present (idempotent). */
  def excludeRule(spark: org.apache.spark.sql.SparkSession, rule: String): Unit = {
    val existing = spark.conf.getOption("spark.sql.optimizer.excludedRules")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    if (!existing.contains(rule))
      spark.conf.set("spark.sql.optimizer.excludedRules",
        (existing :+ rule).mkString(","))
  }
}
