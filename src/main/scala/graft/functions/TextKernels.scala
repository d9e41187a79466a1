package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels replacing the interpreted higher-order-function hot
  * paths (Spark HOF lambdas run through the interpreter PER ELEMENT — the
  * measured ~10x pitfall):
  *
  *  - [[PolyHash]]: the per-character rolling hash (document fingerprints,
  *    token hashes) as one compiled pass — the `aggregate(split(s,''),...)`
  *    column form it replaces interpreted a lambda per CHARACTER of the
  *    corpus.
  *  - [[WordNGrams]]: word n-gram windows (multiset or first-occurrence
  *    distinct) as one compiled pass — replaces
  *    `transform(sequence(...), i -> concat_ws(...))`, a lambda per
  *    window.
  *  - [[RepetitionRatioExpr]]: the intra-document repetition measure
  *    computed per row with a local frequency table — besides retiring the
  *    lambda, this turns a two-shuffle groupBy pipeline into ZERO-shuffle
  *    map work (the (doc_id, gram) exchange carried every window of the
  *    corpus).
  *
  * All three are bit-compatible with the built-ins forms they replace
  * (TextKernelsSpec asserts equality; the forms are kept as `...Hof`
  * reference semantics in TextFunctions) and with the DuckDB oracle.
  */
object TextKernelUtil {
  private val Space = UTF8String.fromString(" ")

  /** All or distinct word n-gram windows, in order (distinct keeps FIRST
    * occurrence order — the `array_distinct` contract). Empty when fewer
    * than n tokens (callers guard, mirroring the column form's
    * size-descending-sequence hazard). Null token slots are skipped inside
    * a window like concat_ws skips nulls.
    */
  def ngrams(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = tokens.numElements()
    if (cnt < n) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](n)
    val out = new java.util.ArrayList[Any](cnt - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= cnt - n) {
      var k = 0
      while (k < n) { parts(k) = tokens.getUTF8String(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, parts: _*)
      if (!distinct || seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Most-frequent-window count over total windows of the n-gram multiset;
    * null when no window exists (mirrors the relational form, where such
    * docs produce no rows).
    */
  def repetition(tokens: ArrayData, n: Int): java.lang.Double = {
    val cnt = tokens.numElements()
    if (cnt < n) return null
    val parts = new Array[UTF8String](n)
    val freq = new java.util.HashMap[UTF8String, Int]()
    var max = 0
    var i = 0
    while (i <= cnt - n) {
      var k = 0
      while (k < n) { parts(k) = tokens.getUTF8String(i + k); k += 1 }
      val g = UTF8String.concatWs(Space, parts: _*)
      val c = freq.merge(g, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    java.lang.Double.valueOf(max.toDouble / (cnt - n + 1))
  }
}

object TokenDiversityUtil {
  /** `[distinct, total, sumSq]` of the token multiset in one pass (null
    * slots skipped): the exact sufficient statistics for type-token ratio
    * (distinct/total) and the Simpson concentration index (sumSq/total²) —
    * integer outputs, so cross-engine parity is exact with no float
    * rounding. Replaces the explode → groupBy(doc, token) → groupBy(doc)
    * pipeline, whose first exchange shuffles every token occurrence of
    * the corpus.
    */
  def stats(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    val freq = new java.util.HashMap[UTF8String, Int]()
    var total = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        freq.merge(toks.getUTF8String(i), 1, Integer.sum)
        total += 1L
      }
      i += 1
    }
    var sumSq = 0L
    val it = freq.values().iterator()
    while (it.hasNext) { val c = it.next().toLong; sumSq += c * c }
    new GenericArrayData(Array[Any](freq.size.toLong, total, sumSq))
  }
}

object WinnowUtil {
  /** Winnowing (MOSS) fingerprint selection in one pass: polyhash every
    * word k-gram, slide a window of `w` consecutive gram hashes, select
    * the minimum of each window (rightmost on ties — robust winnowing),
    * record each selected position once. A document shorter than one full
    * window yields its single global (rightmost) minimum. Output longs
    * encode `pos << 31 | hash` (polyhash < 2^31; callers decode with
    * shiftright/mask).
    *
    * O(m) via a monotonic deque — `>=` pops on push keep the RIGHTMOST of
    * equal minima at the front. Selected positions are non-decreasing
    * across windows, so duplicate picks are consecutive and the lastPick
    * check is a full dedup.
    */
  def select(toks: ArrayData, k: Int, w: Int): ArrayData = {
    val cnt = toks.numElements()
    val m = cnt - k + 1
    if (m < 1) return new GenericArrayData(Array.empty[Any])
    val parts = new Array[UTF8String](k)
    val hs = new Array[Long](m)
    var g = 0
    while (g < m) {
      var j = 0
      while (j < k) { parts(j) = toks.getUTF8String(g + j); j += 1 }
      hs(g) = SimHashUtil.polyHash(
        UTF8String.concatWs(UTF8String.fromString(" "), parts: _*))
      g += 1
    }
    val out = new java.util.ArrayList[Any]()
    val deque = new java.util.ArrayDeque[Int]()
    var lastPick = -1
    var i = 0
    while (i < m) {
      while (!deque.isEmpty && hs(deque.peekLast) >= hs(i)) deque.pollLast()
      deque.addLast(i)
      if (i >= w - 1) {
        while (deque.peekFirst < i - w + 1) deque.pollFirst()
        val p = deque.peekFirst
        if (p != lastPick) { out.add(p.toLong << 31 | hs(p)); lastPick = p }
      }
      i += 1
    }
    if (m < w) {
      val p = deque.peekFirst
      out.add(p.toLong << 31 | hs(p))
    }
    new GenericArrayData(out.toArray)
  }
}

object TokenHitsUtil {
  /** Occurrences (multiset count) of tokens present in `set`; null slots
    * are skipped — `array_contains(words, null)` is null, which the HOF
    * `filter` treats as false.
    */
  def count(toks: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = toks.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i) && set.contains(toks.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def buildSet(words: Seq[UTF8String]): java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(s.add)
    s
  }
}

/** Count of token occurrences matching a fixed word set (stopword-ratio
  * quality scoring, language-ID profiles) — replaces
  * `size(filter(toks, t -> array_contains(words, t)))`, which interpreted
  * a lambda (and a linear array scan) per TOKEN; here it is one hash-set
  * probe per token inside codegen.
  */
final case class TokenHits(child: Expression, words: Seq[UTF8String])
    extends UnaryExpression with TokenArrayKernel {
  override protected def fnName: String = "graft_token_hits"
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  @transient private lazy val set = TokenHitsUtil.buildSet(words)

  override protected def nullSafeEval(toks: Any): Any =
    TokenHitsUtil.count(toks.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("wordSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      toks => s"graft.functions.TokenHitsUtil.count($toks, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHits =
    copy(child = newChild)
}

object TileProbeUtil {
  /** Spark's `xxhash64` for one string at the default seed — bit-identical
    * to the built-in, so set members built from `xxhash64(tile)` counts
    * probe correctly.
    */
  def sparkHash(s: UTF8String): Long =
    org.apache.spark.sql.catalyst.expressions.XXH64
      .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  def buildSet(hot: Seq[Long]): java.util.HashSet[java.lang.Long] = {
    val set = new java.util.HashSet[java.lang.Long](hot.length * 2 + 16)
    hot.foreach(h => set.add(h))
    set
  }

  /** Elements whose spark-xxhash64 is NOT in `hot`, original order kept;
    * null slots are dropped.
    */
  def keep(tiles: ArrayData,
      hot: java.util.HashSet[java.lang.Long]): ArrayData = {
    val n = tiles.numElements()
    val out = new java.util.ArrayList[AnyRef](n)
    var i = 0
    while (i < n) {
      if (!tiles.isNullAt(i)) {
        val t = tiles.getUTF8String(i)
        if (!hot.contains(sparkHash(t))) out.add(t)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Filter a tile array down to the tiles whose corpus-wide `xxhash64` is
  * NOT in a fixed hot set — one O(1) hash-set probe per tile inside
  * codegen, replacing `filter(tiles, t -> !array_contains(hot, ...))`:
  * that form interpreted a lambda per tile AND scanned the hot array
  * linearly per probe, O(|hot|) each — quadratic-class pain once a loose
  * `maxOccurrences` grows the hot set.
  */
final case class KeepCoolTiles(child: Expression, hot: Seq[Long])
    extends UnaryExpression with TokenArrayKernel {
  override protected def fnName: String = "graft_keep_tiles"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val set = TileProbeUtil.buildSet(hot)

  override protected def nullSafeEval(tiles: Any): Any =
    TileProbeUtil.keep(tiles.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("hotSet", set, "java.util.HashSet")
    defineCodeGen(ctx, ev,
      t => s"graft.functions.TileProbeUtil.keep($t, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): KeepCoolTiles =
    copy(child = newChild)
}

/** Rolling polynomial hash over code points: acc = (acc*131 + cp) mod
  * 2^31-1 — [[SimHashUtil.polyHash]] compiled per row instead of a lambda
  * per character.
  */
final case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_polyhash expects string, got ${other.simpleString}")
  }

  override protected def nullSafeEval(s: Any): Any =
    SimHashUtil.polyHash(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.SimHashUtil.polyHash($s)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

private[functions] trait TokenArrayKernel extends UnaryExpression {
  protected def fnName: String
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$fnName expects array<string>, got ${other.simpleString}")
  }
}

/** Word n-gram windows of a token array (ordered; multiset or
  * first-occurrence distinct).
  */
final case class WordNGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression with TokenArrayKernel {
  require(n >= 1, "n-gram size must be >= 1")
  override protected def fnName: String = "graft_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override protected def nullSafeEval(toks: Any): Any =
    TextKernelUtil.ngrams(toks.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      toks => s"graft.functions.TextKernelUtil.ngrams($toks, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

/** One-pass `[distinct, total, sumSq]` token-multiset statistics (lexical
  * diversity / Simpson concentration).
  */
final case class TokenDiversity(child: Expression)
    extends UnaryExpression with TokenArrayKernel {
  override protected def fnName: String = "graft_token_stats"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(toks: Any): Any =
    TokenDiversityUtil.stats(toks.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      toks => s"graft.functions.TokenDiversityUtil.stats($toks)")

  override protected def withNewChildInternal(newChild: Expression): TokenDiversity =
    copy(child = newChild)
}

/** Winnowing fingerprint selection over word k-grams (window `w` of gram
  * hashes, rightmost-min). Longs encode `pos << 31 | polyhash`.
  */
final case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with TokenArrayKernel {
  require(k >= 1 && w >= 1, "k-gram size and window must be >= 1")
  override protected def fnName: String = "graft_winnow"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(toks: Any): Any =
    WinnowUtil.select(toks.asInstanceOf[ArrayData], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      toks => s"graft.functions.WinnowUtil.select($toks, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** Per-row repetition ratio of the n-gram multiset (max window frequency /
  * total windows); null when fewer than n tokens.
  */
final case class RepetitionRatioExpr(child: Expression, n: Int)
    extends UnaryExpression with TokenArrayKernel {
  require(n >= 1, "n-gram size must be >= 1")
  override protected def fnName: String = "graft_repetition"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(toks: Any): Any = {
    val r = TextKernelUtil.repetition(toks.asInstanceOf[ArrayData], n)
    if (r == null) null else r.doubleValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, toks => {
      val r = ctx.freshName("rep")
      s"""
         |java.lang.Double $r =
         |  graft.functions.TextKernelUtil.repetition($toks, $n);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionRatioExpr =
    copy(child = newChild)
}
