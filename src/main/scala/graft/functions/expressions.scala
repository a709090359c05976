package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the LLM-data operators (SURVEY.md §2.9,
  * §2.11) — used where the equivalent built-in higher-order-function
  * pipeline is correct but interpreted (lambda-per-element) and therefore
  * orders of magnitude slower than a per-row native evaluation.
  *
  * Measured motivation (sf0.001, 500 docs): the `transform(sequence(0,23),
  * h -> array_min(transform(shingles, s -> md5(...))))` formulation of the
  * MinHash signature cost ~4.5 s to evaluate once and was re-evaluated per
  * band reference by downstream projections — 192 s for the full pipeline.
  * [[MinHashBands]] computes signature AND band hashes in one pass per row
  * (~0.3 s), and because it is a single expression under a `posexplode`
  * generator it is evaluated exactly once per row.
  */
object GraftFx {

  /** 24-hash MinHash signature banded b=12 × r=2 → 12 band-hash strings.
    * Hash family: h_i(s) = md5(i || "|" || s) compared as unsigned bytes
    * (== lexicographic on lowercase hex, the form the DuckDB oracle
    * computes); band hash = md5(hex(mh_{2b}) || "," || hex(mh_{2b+1})). */
  def minhashBands(shingles: Column): Column =
    GraftBridge.column(MinHashBands(GraftBridge.expression(shingles)))

  /** Sequential-order dot product of two array<double> columns; codegen'd.
    * Matches the fold order of both `aggregate(zip_with(...))` and DuckDB
    * `list_dot_product`, so oracle compares are bit-stable. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** `bits`-wide SimHash of space-delimited text; one md5 per token,
    * bit-identical to the `aggregate(sequence(1, bits), ...)` SQL
    * formulation (and the DuckDB oracle). See [[SimHash]]. */
  def simhash(text: Column, bits: Int): Column =
    GraftBridge.column(SimHash(GraftBridge.expression(text), bits))

  /** Distinct character trigrams of `text` in first-occurrence order —
    * element-identical to `array_distinct(transform(sequence(1,
    * greatest(length(text) - 2, 1)), i -> substring(text, i, 3)))`.
    * See [[CharNgrams]]. */
  def charTrigrams(text: Column): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(text), 3, dedup = true))

  /** ALL character `n`-grams of `text` in order, with multiplicity —
    * element-identical to `transform(sequence(1, greatest(length(text)
    * - (n-1), 1)), i -> substring(text, i, n))`. See [[CharNgrams]]. */
  def charNgrams(text: Column, n: Int): Column =
    GraftBridge.column(CharNgrams(GraftBridge.expression(text), n, dedup = false))

  /** Min-md5 over `width`-char rolling windows — value-identical to
    * `array_min(transform(sequence(1, greatest(length(text) - (width-1),
    * 1)), i -> md5(substring(text, i, width))))`. See
    * [[RollingFingerprint]]. */
  def rollingFingerprint(text: Column, width: Int): Column =
    GraftBridge.column(RollingFingerprint(GraftBridge.expression(text), width))
}

/** See [[GraftFx.minhashBands]]. One pass per row: for each of
  * `numHashes` hash functions take the min digest over all shingles,
  * then emit `numHashes / bandSize` band hashes. CodegenFallback: the
  * eval is a tight per-row loop (md5 dominates); fallback costs one
  * virtual call per row, not per element. */
case class MinHashBands(
    child: Expression,
    numHashes: Int = 24,
    bandSize: Int = 2)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.StringType)
  override def nullIntolerant: Boolean = true
  // an empty shingle array yields null even when the input is non-null,
  // so nullability must not be inherited from the child
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  private val hexDigits = "0123456789abcdef".toCharArray

  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Unsigned byte-array compare == lexicographic compare of hex form. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xff
      val bi = b(i) & 0xff
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val md = MinHashBands.md5.get()
    // Pre-render the "i|" prefixes' UTF-8 bytes once.
    val prefixes = Array.tabulate(numHashes)(i => s"$i|".getBytes("UTF-8"))
    val mins = new Array[Array[Byte]](numHashes)
    var j = 0
    while (j < n) {
      val sBytes = arr.getUTF8String(j).getBytes
      var h = 0
      while (h < numHashes) {
        md.reset()
        md.update(prefixes(h))
        md.update(sBytes)
        val d = md.digest()
        if (mins(h) == null || less(d, mins(h))) mins(h) = d
        h += 1
      }
      j += 1
    }
    val nBands = numHashes / bandSize
    val out = new Array[Any](nBands)
    var b = 0
    while (b < nBands) {
      md.reset()
      var r = 0
      while (r < bandSize) {
        if (r > 0) md.update(','.toByte)
        md.update(hex(mins(b * bandSize + r)).getBytes("UTF-8"))
        r += 1
      }
      out(b) = UTF8String.fromString(hex(md.digest()))
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}

object MinHashBands {
  /** Shared per-thread digest for the md5-based expressions. */
  private[functions] val md5: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
}

/** See [[GraftFx.simhash]]. `bits`-wide (bits ≤ 32) SimHash of a
  * space-delimited text: per-token md5; for signature bit i (1-based)
  * the token votes +1 when the top bit of hex nibble i of its digest is
  * set, else −1; a positive vote sum sets bit i−1 of the result —
  * BIT-IDENTICAL to the higher-order-function formulation it replaces
  * (`transform(split(text,' '), w -> md5(w))` folded over
  * `sequence(1, bits)`) and to the DuckDB oracle, which both keep that
  * independent construction as the cross-check.
  *
  * Why an expression (SURVEY.md §2.9 preference order b): the HOF
  * formulation is interpreted per lambda element — 32 nibble
  * extractions × W tokens per row through `substring`/`instr` on
  * strings. This is one digest per token and integer bit tests, one
  * pass over the row's UTF-8 bytes. Tokens split on the ASCII space
  * byte — safe inside UTF-8 (continuation bytes have the high bit set)
  * — keeping every empty segment, matching `split(text, ' ')` regex
  * semantics at limit −1. CodegenFallback for the same reason as
  * [[MinHashBands]]: md5 dominates and the fallback costs one virtual
  * call per ROW, not per element. */
case class SimHash(child: Expression, bits: Int)
  extends UnaryExpression with CodegenFallback {
  require(bits >= 1 && bits <= 32, "md5 has 32 hex nibbles")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val md = MinHashBands.md5.get()
    val votes = new Array[Int](bits)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var b = 0
        while (b < bits) {
          // hex nibble b+1 = byte b/2, high nibble when b is even
          val top =
            if ((b & 1) == 0) (d(b >> 1) & 0x80) != 0
            else (d(b >> 1) & 0x08) != 0
          votes(b) += (if (top) 1 else -1)
          b += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Shared byte-offset walk for the character-windowing expressions:
  * byte offset of each character start (code-point stepping — the same
  * unit Spark's `substring`/`length` count), plus an end sentinel. */
private[functions] object CharWindows {
  def starts(bytes: Array[Byte]): Array[Int] = {
    val out = new Array[Int](bytes.length + 1)
    var n = 0
    var i = 0
    while (i < bytes.length) {
      out(n) = i
      n += 1
      i += UTF8String.numBytesForFirstByte(bytes(i))
    }
    out(n) = bytes.length
    java.util.Arrays.copyOf(out, n + 1)
  }
}

/** See [[GraftFx.charTrigrams]]/[[GraftFx.charNgrams]]. Character
  * `n`-grams of a string — with multiplicity in window order
  * (`dedup = false`), or the first-occurrence-ordered distinct SET
  * (`dedup = true`, exactly `array_distinct`'s order). Replaces the
  * interpreted `transform(sequence(1, greatest(length(text) - (n-1),
  * 1)), i -> substring(text, i, n))` pipeline, whose per-index
  * `substring` walks the string from byte 0 every call — O(chars²) per
  * row on top of lambda dispatch. One pass here: character start
  * offsets are computed once, each window is a byte slice. Empty/short
  * strings follow `substring`'s truncation: `max(chars - (n-1), 1)`
  * windows, the last ones shorter. CodegenFallback: per-row cost is
  * the slicing loop, one virtual call per row. */
case class CharNgrams(child: Expression, n: Int, dedup: Boolean)
  extends UnaryExpression with CodegenFallback {
  require(n >= 1)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (dedup) "char_ngram_set" else "char_ngrams"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = CharWindows.starts(bytes)
    val nChars = starts.length - 1
    val nGrams = math.max(nChars - (n - 1), 1)
    def slice(g: Int): UTF8String = UTF8String.fromBytes(
      java.util.Arrays.copyOfRange(
        bytes, starts(g), starts(math.min(g + n, nChars))))
    if (dedup) {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var g = 0
      while (g < nGrams) { seen.add(slice(g)); g += 1 }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = it.next(); k += 1 }
      new GenericArrayData(out)
    } else {
      val out = new Array[Any](nGrams)
      var g = 0
      while (g < nGrams) { out(g) = slice(g); g += 1 }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CharNgrams =
    copy(child = newChild)
}

/** See [[GraftFx.rollingFingerprint]]. The winnowing-lite document
  * fingerprint: minimum md5 over all `width`-char rolling windows,
  * returned as lowercase hex — value-identical to `array_min(
  * transform(sequence(1, greatest(length(text) - (width-1), 1)),
  * i -> md5(substring(text, i, width))))`, because Spark's string
  * `array_min` compares UTF8Strings as unsigned bytes ≡ lexicographic
  * hex ≡ unsigned digest compare. One digest per window over byte
  * slices instead of a from-byte-0 `substring` walk per index.
  * CodegenFallback: md5 dominates. */
case class RollingFingerprint(child: Expression, width: Int)
  extends UnaryExpression with CodegenFallback {
  require(width >= 1)

  override def dataType: DataType = org.apache.spark.sql.types.StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  private val hexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = CharWindows.starts(bytes)
    val nChars = starts.length - 1
    val nWin = math.max(nChars - (width - 1), 1)
    val md = MinHashBands.md5.get()
    var min: Array[Byte] = null
    var g = 0
    while (g < nWin) {
      md.reset()
      md.update(bytes, starts(g),
        starts(math.min(g + width, nChars)) - starts(g))
      val d = md.digest()
      if (min == null || {
        var i = 0
        var cmp = 0
        while (cmp == 0 && i < d.length) {
          cmp = (d(i) & 0xff) - (min(i) & 0xff)
          i += 1
        }
        cmp < 0
      }) min = d
      g += 1
    }
    val out = new Array[Char](min.length * 2)
    var i = 0
    while (i < min.length) {
      out(2 * i) = hexDigits((min(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(min(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** See [[GraftFx.dot]]. Whole-stage-codegen dot product over
  * array<double>: a single fused loop over the two ArrayData buffers, no
  * per-element lambda dispatch or boxing. Sequential accumulation order
  * (index 0 → n-1) for cross-engine float determinism. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
