package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY.md §2.6):
  * exact (hash-groupBy), exact n-gram Jaccard, MinHash+LSH near-dup, SimHash
  * near-dup, and embedding-cosine near-dup.
  *
  * Scale design notes (the point of each variant):
  *  - q25 exact: one shuffle on a 128-bit content hash — the cheapest dedup
  *    at any scale; never shuffles the text itself, only (hash, id).
  *  - q26 exact Jaccard: the quadratic-ish ground truth (gram-join blows up
  *    on ultra-frequent grams); kept as the oracle-shaped baseline. At 100 TB
  *    you run q27 instead — same output, near-linear cost.
  *  - q27 MinHash-LSH: shingle → 64 minhashes → 16 bands × 4 rows →
  *    candidates from band-bucket join → exact-Jaccard verify of candidates
  *    only. Shuffles are on fixed-width band keys (not text); candidate count
  *    ~ true-dup count, so verify cost tracks output size. Miss probability
  *    for a 0.9-Jaccard pair: (1 - 0.9^4)^16 ≈ 4e-8.
  *  - q28 SimHash: 32-bit signature; pairs at hamming ≤ 3 found via the
  *    pigeonhole band join (4 × 8-bit chunks — distance ≤ 3 forces one equal
  *    chunk), so no all-pairs cross join at scale, and the band join is
  *    EXACT, not approximate.
  *  - q29 cosine: brute pair join at test SF; the scale path is the IVF
  *    variant in Similarity.q31 (bucket by nearest seed, join within bucket).
  *
  * All hash primitives are the cross-engine-deterministic ones from
  * TextFunctions, so every query here has a value-exact DuckDB oracle (the
  * LSH/SimHash queries verify candidates with the exact measure, making their
  * output equal to the exact-computation oracle).
  */
object Dedup {

  /** Jaccard threshold for near-dup (fixture dups sit at >= 0.9, background
    * pairs at <= 0.07, so recall at 0.5 is exact).
    */
  private val JaccardThreshold = 0.5

  // Shared oracle body: exact distinct-3-gram Jaccard pairs >= threshold.
  private val exactJaccardSql =
    s"""WITH toks AS (
         SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
         WHERE len(string_split(text, ' ')) >= 3),
       grams AS (
         SELECT DISTINCT doc_id, g FROM (
           SELECT doc_id, unnest(list_transform(range(1, len(tokens) - 1),
             i -> tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2])) AS g
           FROM toks)),
       sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
       pair AS (
         SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
         FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT d1, d2,
         round(inter / (s1.n + s2.n - inter), 6) AS jaccard
       FROM pair JOIN sizes s1 ON d1 = s1.doc_id
                 JOIN sizes s2 ON d2 = s2.doc_id
       WHERE inter / (s1.n + s2.n - inter) >= $JaccardThreshold
       ORDER BY d1, d2"""

  /** (doc_id, g) distinct 3-gram pairs for docs with >= 3 tokens. */
  private def gramTable(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(trigrams(col("toks"))).as("g"))

  /** Exact Jaccard >= threshold for the given candidate (d1 < d2) pairs. */
  private def verifyJaccard(cands: DataFrame, grams: DataFrame): DataFrame = {
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val g1 = grams.select(col("doc_id").as("d1"), col("g"))
    val g2 = grams.select(col("doc_id").as("d2r"), col("g").as("g2"))
    cands
      .join(g1, "d1").join(g2, col("d2") === col("d2r") && col("g") === col("g2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  // ---- q25: exact dedup via content hash -------------------------------------
  // Group on md5(text): keeper = min doc_id, copies counted. The only data
  // shuffled is (hash, doc_id) — at 100 TB the text never moves.
  private def q25(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(md5(col("text")).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n_copies"))
      .select(col("keeper"), col("n_copies"))
      .orderBy(col("keeper"))
  private val q25Sql =
    """SELECT min(doc_id) AS keeper, count(*) AS n_copies
       FROM documents GROUP BY md5(text) ORDER BY keeper"""

  // ---- q26: exact n-gram Jaccard near-dup pairs ------------------------------
  private def q26(s: SparkSession, d: String): DataFrame = {
    val grams = gramTable(s, d)
    val sizes = grams.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val a = grams.select(col("doc_id").as("d1"), col("g"))
    val b = grams.select(col("doc_id").as("d2"), col("g"))
    a.join(b, a("g") === b("g") && col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("doc_id").as("d1"), col("n").as("n1")), "d1")
      .join(sizes.select(col("doc_id").as("d2"), col("n").as("n2")), "d2")
      .withColumn("jac", col("inter") / (col("n1") + col("n2") - col("inter")))
      .filter(col("jac") >= JaccardThreshold)
      .select(col("d1"), col("d2"), round(col("jac"), 6).as("jaccard"))
      .orderBy(col("d1"), col("d2"))
  }

  /** MinHash parameters: 64 permutations in 16 bands of 4 rows. */
  private val NumHashes = 64
  private val BandRows = 4
  private val NumBands = NumHashes / BandRows

  // ---- q27: MinHash + LSH near-dup -------------------------------------------
  private def q27(s: SparkSession, d: String): DataFrame = {
    val grams = gramTable(s, d)
    // Signature stage: explode grams, xxhash64 them (native codegen;
    // signature values never meet the oracle, which verifies the
    // exact-Jaccard OUTPUT), then 64 min-aggregates — a map-side-partial
    // hash aggregation over codegen'd arithmetic. Measured alternative
    // (per-doc higher-order transform/array_min fold, zero shuffle) is 10x
    // SLOWER because Spark HOF lambdas are interpreted per element, not
    // codegen'd — keep the agg in whole-stage codegen instead and pay one
    // narrow (doc_id, h) shuffle.
    val hashed = grams.withColumn("h", abs(xxhash64(col("g"))) % P)
    val sigCols = (0 until NumHashes).map { i =>
      min((col("h") * (2 * i + 1) + (i * 12345 + 7)) % P).as(s"m$i")
    }
    val sigs = hashed.groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    // Band keys: concat of each 4-signature slice, exploded to (doc, band, key).
    val bandCol = array((0 until NumBands).map { b =>
      struct(lit(b).as("band"),
        concat_ws("_", (0 until BandRows).map(r => col(s"m${b * BandRows + r}")): _*)
          .as("key"))
    }: _*)
    val bands = sigs.select(col("doc_id"), explode(bandCol).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.key") === col("y.key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    verifyJaccard(cands, grams)
  }

  // ---- q28: SimHash near-dup --------------------------------------------------
  // 32-bit signature from token-hash bit votes; pairs at hamming <= 3 via the
  // exact pigeonhole band join on 4 byte-chunks.
  private val HammingMax = 3
  private def q28(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
    val th = tok.withColumn("h", polyHash(col("t")))
    val votes = th
      .select(col("doc_id"), explode(sequence(lit(0), lit(31))).as("j"),
        col("h").as("h"))
      .withColumn("w", (expr("shiftright(h, j)") % 2) * 2 - 1)
      .groupBy(col("doc_id"), col("j")).agg(sum(col("w")).as("v"))
    val sh = votes.groupBy(col("doc_id"))
      .agg(sum(when(col("v") > 0, expr("shiftleft(cast(1 as bigint), j)"))
        .otherwise(0L)).as("simhash"))
    val chunks = sh.select(col("doc_id"), col("simhash"),
        explode(sequence(lit(0), lit(3))).as("k"))
      .withColumn("chunk", expr("shiftright(simhash, k * 8)") % 256)
    val cands = chunks.as("x").join(chunks.as("y"),
        col("x.k") === col("y.k") && col("x.chunk") === col("y.chunk") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("x.simhash").as("s1"),
        col("y.doc_id").as("d2"), col("y.simhash").as("s2"))
      .distinct()
    cands
      .withColumn("hamming", bit_count(col("s1").bitwiseXOR(col("s2"))))
      .filter(col("hamming") <= HammingMax)
      .select(col("d1"), col("d2"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("d1"), col("d2"))
  }
  private val q28Sql =
    """WITH th AS (
         SELECT doc_id, list_reduce(list_prepend(0::BIGINT,
             list_transform(string_split(t, ''), c -> ord(c)::BIGINT)),
           (acc, c) -> (acc * 131 + c) % 2147483647) AS h
         FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)),
       votes AS (
         SELECT doc_id, r.range AS j,
           sum(((h >> r.range) & 1) * 2 - 1) AS v
         FROM th, range(0, 32) r GROUP BY 1, 2),
       sh AS (
         SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::BIGINT << j) ELSE 0 END)
           AS simhash
         FROM votes GROUP BY doc_id)
       SELECT a.doc_id AS d1, b.doc_id AS d2,
         bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
       FROM sh a JOIN sh b ON a.doc_id < b.doc_id
       WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
       ORDER BY d1, d2"""

  /** Cosine threshold for embedding near-dup (fixture max pair ≈ 0.51). */
  private val CosineThreshold = 0.4

  // ---- q29: embedding-cosine near-dup ----------------------------------------
  private def q29(s: SparkSession, d: String): DataFrame = {
    val e = Tables.embeddings(s, d)
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("e1"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("e2"))
    a.join(b, col("v1") < col("v2"))
      .withColumn("c", cosine(col("e1"), col("e2")))
      .filter(col("c") >= CosineThreshold)
      .select(col("v1"), col("v2"), round(col("c"), 6).as("cos_sim"))
      .orderBy(col("v1"), col("v2"))
  }
  private val q29Sql =
    """WITH c AS (
         SELECT a.vec_id AS v1, b.vec_id AS v2,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
             k -> a.embedding[k]::DOUBLE * b.embedding[k]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE))))
             AS cs
         FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
       SELECT v1, v2, round(cs, 6) AS cos_sim FROM c
       WHERE cs >= 0.4 ORDER BY v1, v2"""

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q25_exact_dedup", q25, Some(q25Sql)),
    QueryDef("q26_ngram_jaccard", q26, Some(exactJaccardSql)),
    QueryDef("q27_minhash_lsh", q27, Some(exactJaccardSql), headline = true),
    QueryDef("q28_simhash", q28, Some(q28Sql)),
    QueryDef("q29_embedding_neardup", q29, Some(q29Sql)))
}
