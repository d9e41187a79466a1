package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic text/hash primitives.
  *
  * Every function here is built from Spark built-ins only (codegen'd, no
  * UDFs) and has a bitwise-identical DuckDB formulation, so operators built
  * on them can be hash-verified against the driver's DuckDB oracle:
  *  - `polyHash`   ↔ `list_reduce(list_prepend(0, list_transform(string_split(s,''), c -> ord(c))), …)`
  *  - `cosine`     ↔ explicit `list_sum(list_transform(…))` double arithmetic
  *    (verified bitwise-equal; DuckDB's builtin `list_cosine_similarity`
  *    accumulates differently and is NOT a match)
  *
  * All arithmetic is 64-bit with mod 2^31-1, so intermediates stay exact in
  * both engines (max acc*131 + c < 2^39).
  */
object TextFunctions {

  /** Large Mersenne prime 2^31-1; hash values lie in [0, P). */
  val P: Long = 2147483647L

  /** Deterministic polynomial rolling hash over the characters of `s`:
    * acc = (acc*131 + codepoint) mod P. Used as the document fingerprint
    * and as the token hash feeding MinHash/SimHash. The native [[PolyHash]]
    * kernel — one compiled pass per string; the `aggregate(split(s,''),…)`
    * built-ins form it replaces ([[polyHashHof]]) interpreted a lambda per
    * CHARACTER. Engine-portable: codePointAt ↔ DuckDB `ord` ↔ Spark
    * `ascii`, bit-equal (TextKernelsSpec).
    */
  def polyHash(s: Column): Column =
    call_function("graft_polyhash", s)

  /** The built-ins-only formulation of [[polyHash]] — reference semantics
    * the kernel must reproduce bit-for-bit.
    */
  def polyHashHof(s: Column): Column =
    aggregate(split(s, ""), lit(0L), (acc, c) => (acc * 131 + ascii(c)) % P)

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word 3-grams of a token array (1-based element_at, matching
    * DuckDB `tokens[i] || ' ' || tokens[i+1] || ' ' || tokens[i+2]` over
    * `range(1, len-1)`). Caller must guard size(tokens) >= 3.
    */
  def trigrams(toks: Column): Column = distinctNgrams(toks, 3)

  /** All word n-gram windows of a token array, in order, NON-distinct
    * (the multiset — for frequency/repetition measures). The native
    * [[WordNGrams]] kernel; [[ngramsHof]] is the built-ins form it
    * replaces (a lambda per window). Caller must guard size(toks) >= n
    * (the kernel returns [] below n; the HOF form's `sequence(1, 0)` is
    * DESCENDING, not empty).
    */
  def ngrams(toks: Column, n: Int): Column =
    call_function("graft_ngrams", toks, lit(n), lit(false))

  /** Distinct word n-grams (the set — for Jaccard/containment measures);
    * first-occurrence order, the `array_distinct` contract.
    */
  def distinctNgrams(toks: Column, n: Int): Column =
    call_function("graft_ngrams", toks, lit(n), lit(true))

  /** The built-ins formulation of [[ngrams]] — reference semantics
    * (and the shape mirrored by every oracle SQL's `list_transform`).
    */
  def ngramsHof(toks: Column, n: Int): Column =
    transform(sequence(lit(1), size(toks) - (n - 1)), i =>
      concat_ws(" ", (0 until n).map(k => element_at(toks, i + k)): _*))

  /** Per-row repetition ratio of the word n-gram multiset (max window
    * frequency / total windows) — the native [[RepetitionRatioExpr]]
    * kernel: zero-shuffle map work; null below n tokens.
    */
  def repetitionRatio(toks: Column, n: Int): Column =
    call_function("graft_repetition", toks, lit(n))

  /** Occurrences of tokens from a fixed word set — the native [[TokenHits]]
    * kernel (one hash-set probe per token); equals
    * `size(filter(toks, t => array_contains(array(words…), t)))`
    * (TextKernelsSpec).
    */
  def tokenHits(toks: Column, words: Seq[String]): Column =
    call_function("graft_token_hits", toks, array(words.map(lit): _*))

  /** Tiles whose corpus-wide `xxhash64` is NOT in the hot set — the native
    * [[KeepCoolTiles]] kernel: one O(1) hash-set probe per tile, replacing
    * the `filter(tiles, t => !array_contains(hot, xxhash64(t)))` form
    * whose per-probe linear scan is O(|hot|).
    */
  def keepCoolTiles(tiles: Column, hotHashes: Seq[Long]): Column =
    call_function("graft_keep_tiles", tiles, lit(hotHashes.toArray))

  /** MinHash signature (array<long> of `numHashes` mins) of a token array's
    * word-trigram set — the native one-pass [[MinHashSignature]] kernel
    * (requires [[Native.register]]). Null when fewer than 3 tokens.
    */
  def minhash(toks: Column, numHashes: Int): Column =
    call_function("graft_minhash", toks, lit(numHashes))

  /** LSH band keys ("b:m_m_m_m" strings) of a token array's trigram
    * MinHash — the fused [[MinHashBands]] kernel. Null when fewer than 3
    * tokens.
    */
  def minhashBands(toks: Column, numHashes: Int, bandRows: Int): Column =
    call_function("graft_minhash_bands", toks, lit(numHashes), lit(bandRows))

  /** 32-bit SimHash of a token array — the native one-pass
    * [[SimHashSignature]] kernel (requires [[Native.register]]). Bit-equal
    * to the exploded token-vote formulation it replaces (SimHashSpec).
    */
  def simhashSig(toks: Column): Column =
    call_function("graft_simhash", toks)

  /** L2 squared norm of a float/double vector — native [[L2SquaredNorm]]
    * kernel; take `sqrt(...)` on top for the norm.
    */
  def l2sq(vec: Column): Column =
    call_function("graft_l2sq", vec)

  /** Symmetric int8 quantization floor(x_i / max|x| * 127) as array<long> —
    * native [[QuantizeInt8]] kernel, one compiled pass.
    */
  def quantize8(vec: Column): Column =
    call_function("graft_quantize8", vec)

  /** Jaro–Winkler similarity of two strings — native codegen'd
    * [[JaroWinklerSim]] kernel, bit-identical to DuckDB's
    * `jaro_winkler_similarity` (requires [[Native.register]]).
    */
  def jaroWinkler(a: Column, b: Column): Column =
    call_function("graft_jaro_winkler", a, b)

  /** Unicode NFC canonical composition — native [[NfcNormalize]] kernel
    * (java.text.Normalizer, UAX #15). Run before any hashing/dedup
    * operator so canonically-equal text hashes equal.
    */
  def nfc(s: Column): Column =
    call_function("graft_nfc", s)

  /** Squared L2 distance Σ(aᵢ−bᵢ)² of two float/double vectors — native
    * codegen'd [[L2SquaredDist]] kernel (requires [[Native.register]]).
    * Double left-to-right accumulation, bitwise identical to the oracle's
    * `list_sum(list_transform(range(...), (a[k]-b[k])^2))` form.
    */
  def l2dist(a: Column, b: Column): Column =
    call_function("graft_l2dist", a, b)

  /** Exact BIGINT dot product of two array<long> vectors — native
    * [[DotProductInt]] kernel; the ADC-style scorer over [[quantize8]]
    * output (integer algebra: bit-stable under any summation order).
    */
  def doti(a: Column, b: Column): Column =
    call_function("graft_doti", a, b)

  /** Cosine similarity of two float/double vectors — the native codegen'd
    * [[CosineSimilarity]] expression (requires [[Native.register]], which
    * every session factory and SparkEntry entry point performs). Double
    * left-to-right accumulation, bitwise identical to the DuckDB oracle's
    * `list_sum(list_transform(...))` form and to [[cosineHof]].
    */
  def cosine(a: Column, b: Column): Column =
    call_function("graft_cosine", a, b)

  /** The built-ins-only higher-order formulation of [[cosine]]. Kept as the
    * reference semantics (and for environments where no function
    * registration is possible); ~10x slower because Spark HOF lambdas are
    * interpreted per element.
    */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    def dot(x: Column, y: Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def norm(x: Column) =
      sqrt(aggregate(x, lit(0.0), (acc, v) => acc + v * v))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** "BPE-ish" subword token count: runs of letters, runs of digits, or any
    * single non-space symbol. Same regex compiles under Java regex and RE2.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-z]+|[0-9]+|\\S"), lit(0)))
}
