package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object MinhashKernels {
  private val hexChars = "0123456789abcdef".toCharArray

  /** One-pass MinHash signature + distinct shingle set of a document.
    *
    * For each distinct `width`-codepoint shingle of `text`
    * (codepoint-exact `substringSQL`, matching SQL `substring` and the
    * DuckDB oracle): md5 the shingle's UTF-8 bytes once and keep the
    * running minimum of each of the `nPerms` disjoint `sliceLen`-hex-char
    * digest slices — the same values as
    * `min(substring(md5(shingle), p*sliceLen+1, sliceLen))` per doc, but
    * in a single tight loop instead of `nPerms` interpreted
    * higher-order-function passes allocating intermediate arrays.
    *
    * Returns struct(ss: array&lt;string&gt; — the distinct shingles, for
    * exact-Jaccard verification; mins: array&lt;string&gt;[nPerms]).
    */
  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  def sig(text: UTF8String, width: Int, nPerms: Int, sliceLen: Int): InternalRow = {
    // ONE copy of the document's bytes; every shingle below is a
    // zero-copy UTF8String view into this array, and the digest reads
    // (offset, length) slices of it directly. The previous form called
    // substringSQL per window — which rescans from byte 0 to find the
    // codepoint offset, O(n²) per document — and then copied each
    // shingle's bytes again for the digest. Window byte offsets are
    // advanced incrementally (one numBytesForFirstByte per edge per
    // step), so the whole pass is O(n).
    val bytes = text.getBytes
    val len = bytes.length
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val ssBuf = new java.util.ArrayList[AnyRef]()
    val md = mdLocal.get()
    val mins = Array.ofDim[Char](nPerms, sliceLen)
    val minSet = new Array[Boolean](nPerms)
    val hex = new Array[Char](32)
    // initial window: `width` codepoints from byte 0
    var endB = 0
    var cp = 0
    while (cp < width && endB < len) {
      endB += UTF8String.numBytesForFirstByte(bytes(endB))
      cp += 1
    }
    var startB = 0
    var more = cp == width && endB <= len
    while (more) {
      val shingle = UTF8String.fromBytes(bytes, startB, endB - startB)
      if (seen.add(shingle)) {
        ssBuf.add(shingle)
        md.reset()
        md.update(bytes, startB, endB - startB)
        val digest = md.digest()
        var j = 0
        while (j < 16) {
          hex(2 * j) = hexChars((digest(j) >> 4) & 0xf)
          hex(2 * j + 1) = hexChars(digest(j) & 0xf)
          j += 1
        }
        // running minimums kept as raw hex chars, compared in place —
        // ASCII hex ordering == UTF8String binary ordering
        var p = 0
        while (p < nPerms) {
          val off = p * sliceLen
          val m = mins(p)
          var cmp = if (minSet(p)) 0 else -1 // unset ⇒ adopt
          var c = 0
          while (cmp == 0 && c < sliceLen) {
            cmp = Character.compare(hex(off + c), m(c))
            c += 1
          }
          if (cmp < 0) {
            var d = 0
            while (d < sliceLen) { m(d) = hex(off + d); d += 1 }
            minSet(p) = true
          }
          p += 1
        }
      }
      if (endB >= len) more = false
      else {
        startB += UTF8String.numBytesForFirstByte(bytes(startB))
        endB += UTF8String.numBytesForFirstByte(bytes(endB))
      }
    }
    InternalRow(
      new GenericArrayData(ssBuf.toArray.asInstanceOf[Array[Any]]),
      new GenericArrayData(
        (0 until nPerms).map(p =>
          if (!minSet(p)) null
          else UTF8String.fromString(new String(mins(p))))
          .toArray[Any]))
  }
}

/** Static kernel for [[BigramSet]]. */
object NgramKernels {
  /** Distinct word-bigram set of a document: lowercase, tokenize on
    * maximal `[a-z]+` runs (any other codepoint separates — multibyte
    * UTF-8 bytes are ≥ 0x80, so a byte scan is codepoint-exact here),
    * join consecutive tokens with a space, dedupe preserving first-seen
    * order. Exactly `array_distinct` over
    * `transform(sequence(0, size(ws)-2), i -> ws[i] || ' ' || ws[i+1])`
    * (0-based Spark subscripts; the DuckDB oracle writes the same with
    * 1-based `range(1, len(ws))`) with
    * `ws = filter(split(lower(text), '[^a-z]+'), w -> w <> '')` —
    * in one loop instead of four interpreted higher-order passes.
    */
  def bigrams(text: UTF8String): GenericArrayData = {
    val bytes = text.toLowerCase.getBytes
    val seen = new java.util.LinkedHashSet[String]()
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    val n = bytes.length
    while (i <= n) {
      // token start
      while (i < n && (bytes(i) < 'a' || bytes(i) > 'z')) i += 1
      if (i >= n) {
        i = n + 1
      } else {
        val start = i
        while (i < n && bytes(i) >= 'a' && bytes(i) <= 'z') i += 1
        if (prevStart >= 0) {
          val sb = new java.lang.StringBuilder(
            (prevEnd - prevStart) + 1 + (i - start))
          var j = prevStart
          while (j < prevEnd) { sb.append(bytes(j).toChar); j += 1 }
          sb.append(' ')
          j = start
          while (j < i) { sb.append(bytes(j).toChar); j += 1 }
          seen.add(sb.toString)
        }
        prevStart = start
        prevEnd = i
      }
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }
}

/** Native distinct-word-bigram expression — the per-document stage of
  * the n-gram Jaccard dedup (q23). See [[NgramKernels.bigrams]].
  */
case class BigramSet(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bigram_set requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    NgramKernels.bigrams(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NgramKernels.bigrams($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Native MinHash-signature expression — the hot kernel of the
  * near-duplicate operators (SURVEY.md §7.1.8 / BASELINE.json
  * north-star dedup family). The composed-expression form
  * (array_distinct ∘ transform + 8 × array_min ∘ transform) runs
  * interpreted and allocates ~10 short-lived strings per shingle; this
  * is a single generated call into one loop.
  */
case class MinhashSig(child: Expression) extends UnaryExpression {
  // fail at analysis, not with an executor ClassCastException
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = StructType(Seq(
    StructField("ss", ArrayType(StringType, containsNull = false)),
    StructField("mins", ArrayType(StringType, containsNull = true))))

  override def nullSafeEval(t: Any): Any =
    MinhashKernels.sig(t.asInstanceOf[UTF8String], 5, 8, 4)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.MinhashKernels.sig($t, 5, 8, 4);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
