package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the document-fingerprint hot path.
  *
  * `min(md5(substring(text, i, n)))` over all rolling character n-grams:
  * the HOF form (`array_min(transform(sequence(...), i -> md5(...)))`)
  * interprets two lambda frames per gram and materializes a 32-char hex
  * string per gram just to compare; the exploded form additionally pays a
  * Generate + shuffle. This expression runs the whole roll in one tight
  * loop, compares raw 16-byte digests unsigned (hex conversion only for
  * the single winner — hex order == unsigned byte order), and slices
  * grams with `UTF8String.substringSQL`, i.e. byte-for-byte the same
  * character semantics as SQL `substring`. Measured at sf0.1: 2.9 s
  * (explode+groupBy) → 2.2 s (HOF) → ~0.9 s (this, codegen).
  */
case class GramMinMd5(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_gram_min_md5 expects (string, int), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    GramMinMd5.minGram(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (s, n) => {
      s"""
        ${ev.value} = graft.functions.GramMinMd5.minGram($s, $n);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })
    code
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native expression for DISTINCT rolling character n-grams.
  *
  * `array_distinct(transform(sequence(1, length(text)-n+1), i ->
  * substring(text, i, n)))` pays two interpreted lambda frames per gram
  * plus an array rebuild; this does the roll in one loop over the UTF-8
  * bytes (char-boundary offsets computed once — exact SQL substring
  * character semantics) with hash-set dedup. First-occurrence order, the
  * same as array_distinct. Profiled at sf0.1: the ngram dedup operator's
  * gram-set build drops 1.8 s → ~0.3 s. */
case class CharGrams(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == IntegerType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_char_grams expects (string, int), got ${left.dataType} / ${right.dataType}")

  override def nullSafeEval(l: Any, r: Any): Any =
    CharGrams.distinctGrams(l.asInstanceOf[UTF8String], r.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, n) => {
      s"""
        ${ev.value} = graft.functions.CharGrams.distinctGrams($s, $n);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CharGrams {

  /** Distinct rolling `n`-char grams of `s` in first-occurrence order;
    * null when the text is shorter than one gram. Gram bytes are copied
    * out of the source buffer (the result must not alias row memory). */
  def distinctGrams(s: UTF8String, n: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val total = s.numChars()
    if (n <= 0 || total < n) return null
    val bytes = s.getBytes
    val offs = new Array[Int](total + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(total) = bytes.length
    val seen = new java.util.HashSet[UTF8String]()
    val out = new scala.collection.mutable.ArrayBuffer[Any](total - n + 1)
    var i = 0
    val last = total - n
    while (i <= last) {
      val g = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, offs(i), offs(i + n)))
      if (seen.add(g)) out += g
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

object GramMinMd5 {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Minimum md5 (as lowercase hex) over all rolling `n`-char grams of
    * `s`; null when the text is shorter than one gram. Called from both
    * interpreted eval and generated code.
    *
    * Exact SQL-substring character semantics at O(len) total: one forward
    * pass records each character's byte offset (UTF-8 boundaries), then
    * every gram digests a slice of the ORIGINAL byte array — no per-gram
    * substring objects, no re-scan from the string start (substringSQL in
    * a loop is O(len²)), no per-gram hex strings. */
  def minGram(s: UTF8String, n: Int): UTF8String = {
    val total = s.numChars()
    if (n <= 0 || total < n) return null
    val bytes = s.getBytes
    // offs(c) = byte offset where character c starts; offs(total) = end
    val offs = new Array[Int](total + 1)
    var b = 0
    var c = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(total) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    var best: Array[Byte] = null
    var i = 0
    val last = total - n
    while (i <= last) {
      md.update(bytes, offs(i), offs(i + n) - offs(i))
      val d = md.digest() // digest() resets for the next gram
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val sb = new java.lang.StringBuilder(32)
    var j = 0
    while (j < best.length) {
      sb.append(hexDigits((best(j) >> 4) & 0xf)).append(hexDigits(best(j) & 0xf))
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }
}

/** Count-only intersection of two SORTED string arrays — the exact-
  * Jaccard verify hot path (`graft.operators.Dedup.ngramJaccard`).
  *
  * `size(array_intersect(a, b))` builds a hash set of one side, re-hashes
  * every element of the other, deduplicates, and MATERIALIZES the
  * intersected array just to count it — per candidate pair. Both inputs
  * here are per-doc DISTINCT gram sets sorted once with `sort_array`
  * (binary UTF8 order), so the count is a single allocation-free merge
  * walk with byte comparisons. sf1 profile: 620k surviving candidate
  * pairs × ~2k-element sets dropped from ~14 s of hash-set churn to
  * ~2 s. Inputs MUST be sorted ascending and duplicate-free — both
  * guaranteed by construction (distinct grams + sort_array), not checked
  * here.
  */
case class SortedInterCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  private lazy val longElements: Boolean = left.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_sorted_inter expects two array<string> or two array<bigint>, got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val b = r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (longElements) SortedInterCount.countLong(a, b)
    else SortedInterCount.countUtf8(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (longElements) "countLong" else "countUtf8"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"${ev.value} = graft.functions.SortedInterCount.$fn($a, $b);"
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedInterCount {

  /** Merge-walk over two ascending duplicate-free UTF8String arrays.
    * UTF8String.compareTo is unsigned byte order — the same order
    * `sort_array` produces. */
  def countUtf8(a: org.apache.spark.sql.catalyst.util.ArrayData,
                b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** Merge-walk over two ascending duplicate-free long arrays (signed
    * order — `sort_array` on bigint). */
  def countLong(a: org.apache.spark.sql.catalyst.util.ArrayData,
                b: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** Native expression for the BPE ENCODE dictionary build: symbol count of
  * one word after applying a learned merge table in rank order
  * (`graft.operators.Bpe.mergeOnce` folded over `(chars :+ "</w>")`).
  *
  * The r16 shape was a TYPED Dataset map (`wordFreq.as[(String, Long)]
  * .map { fold }`) — a Deserialize→MapElements→Serialize sandwich in the
  * physical plan that breaks whole-stage codegen and pays an encoder
  * round-trip per distinct word (guide §4: prefer codegen expressions in
  * hot paths; at 100 TB the distinct-word relation is millions of rows).
  * This expression runs the same leftmost-first non-overlapping greedy
  * scan natively under codegen. `right` is the merge table as a foldable
  * `array<array<string>>` literal in rank order ([[left, right], …]) —
  * k ≤ 8 pairs, collected on the driver by the trainer exactly as
  * before. Bit-identical to the typed fold (same char split, same
  * sentinel, same greedy rule — pinned against the BpeSpec reference). */
case class BpeSymLen(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, ArrayType(ArrayType(StringType, _), _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"graft_bpe_sym_len expects (string, array<array<string>>), got $other")
    }

  override def nullSafeEval(l: Any, r: Any): Any =
    BpeSymLen.symLen(l.asInstanceOf[UTF8String],
      r.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) => {
      s"${ev.value} = graft.functions.BpeSymLen.symLen($w, $m);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BpeSymLen {
  /** The trainer's greedy scan, natively: split into UTF-16 chars (the
    * exact semantics of Scala's `w.map(_.toString)` in the reference
    * fold), append the end-of-word sentinel, apply each merge pair
    * leftmost-first non-overlapping, return the surviving symbol count. */
  def symLen(word: UTF8String,
             merges: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val w = word.toString
    var syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    syms.add(graft.operators.Bpe.Eow)
    var m = 0
    val nm = merges.numElements()
    while (m < nm) {
      val pair = merges.getArray(m)
      val a = pair.getUTF8String(0).toString
      val b = pair.getUTF8String(1).toString
      val out = new java.util.ArrayList[String](syms.size)
      var j = 0
      while (j < syms.size) {
        if (j + 1 < syms.size && syms.get(j) == a && syms.get(j + 1) == b) {
          out.add(a + b); j += 2
        } else { out.add(syms.get(j)); j += 1 }
      }
      syms = out
      m += 1
    }
    syms.size.toLong
  }
}
