package graft.crz

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parser for the reference's stringified-Python-list attachment cells
  * (F27/F28, 01_parse_xml.py:122-193 written, 04_tag_text_contracts
  * .py:137-165 consumed). A JSON round-trip (quote rewriting +
  * from_json) corrupts any name containing an apostrophe — Python
  * repr renders those with DOUBLE quotes — and erases the
  * quoted-string vs bare-int distinction the reference's classifier
  * depends on (`type(x) == str and x.isnumeric()` ⇒ ID vs
  * `type(x) == int` ⇒ size). This kernel tokenizes the repr directly.
  */
object LegacyListKernels {

  private val tsPattern =
    java.util.regex.Pattern.compile("\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}")

  private final case class Tok(v: String, quoted: Boolean)

  /** Tokenize a Python-repr list literal: quoted elements keep their
    * content (backslash escapes unwrapped), bare elements (ints,
    * floats, nan) are trimmed text. Returns null for a non-list. */
  private def tokenize(s: String): java.util.ArrayList[Tok] = {
    val out = new java.util.ArrayList[Tok]()
    var i = 0
    val n = s.length
    while (i < n && Character.isWhitespace(s.charAt(i))) i += 1
    if (i >= n || s.charAt(i) != '[') return null
    i += 1
    while (i < n) {
      while (i < n && (Character.isWhitespace(s.charAt(i)) || s.charAt(i) == ',')) i += 1
      if (i < n && s.charAt(i) == ']') return out
      if (i >= n) return out
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val quote = c
        i += 1
        val sb = new java.lang.StringBuilder()
        var closed = false
        while (i < n && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else if (ch == quote) { closed = true; i += 1 }
          else { sb.append(ch); i += 1 }
        }
        out.add(Tok(sb.toString, quoted = true))
      } else {
        val start = i
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != ']') i += 1
        val v = s.substring(start, i).trim
        if (v.nonEmpty) out.add(Tok(v, quoted = false))
      }
    }
    out
  }

  private def isDigits(v: String): Boolean =
    v.nonEmpty && v.forall(c => c >= '0' && c <= '9')

  /** Segment the token stream into typed attachments. A quoted
    * all-digit token starts a new attachment (the reference's ID
    * rule); within a segment: name = next element, filename = the one
    * after (when quoted), size = first BARE all-digit token (bare
    * `nan` ⇒ null — the reference's `' nan,'` repair case), url =
    * first element containing `https://`, date = first
    * timestamp-shaped element. Faithful to the reference's pooled
    * classifier per segment, without dropping attachments 2..N. */
  def parse(cell: UTF8String): GenericArrayData = {
    val toks = tokenize(cell.toString)
    if (toks == null || toks.isEmpty) return new GenericArrayData(Array.empty[Any])
    val idIdx = new java.util.ArrayList[Int]()
    var i = 0
    while (i < toks.size()) {
      val t = toks.get(i)
      if (t.quoted && isDigits(t.v)) idIdx.add(i)
      i += 1
    }
    val rows = new Array[Any](idIdx.size())
    var k = 0
    while (k < idIdx.size()) {
      val start = idIdx.get(k)
      val end = if (k + 1 < idIdx.size()) idIdx.get(k + 1) else toks.size()
      var name: String = null
      var filename: String = null
      var size: java.lang.Long = null
      var url: String = null
      var date: String = null
      if (start + 1 < end) name = toks.get(start + 1).v
      if (start + 2 < end && toks.get(start + 2).quoted &&
        !tsPattern.matcher(toks.get(start + 2).v).find() &&
        !toks.get(start + 2).v.contains("https://"))
        filename = toks.get(start + 2).v
      var j = start
      while (j < end) {
        val t = toks.get(j)
        if (size == null && !t.quoted && isDigits(t.v)) size = t.v.toLong
        if (url == null && t.v.contains("https://")) url = t.v
        if (date == null && tsPattern.matcher(t.v).find()) date = t.v
        j += 1
      }
      rows(k) = InternalRow(
        UTF8String.fromString(toks.get(start).v),
        if (name == null) null else UTF8String.fromString(name),
        if (filename == null) null else UTF8String.fromString(filename),
        if (size == null) null else size.longValue(),
        if (url == null) null else UTF8String.fromString(url),
        if (date == null) null else UTF8String.fromString(date))
      k += 1
    }
    new GenericArrayData(rows)
  }
}

/** `legacy_attachments(cell)` — native parser of the legacy
  * stringified-attachment cell into typed per-attachment structs
  * (attDate kept as string; callers to_timestamp it so the session
  * time zone governs). */
case class LegacyAttachments(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"legacy_attachments requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("attId", StringType),
    StructField("name", StringType),
    StructField("filename", StringType),
    StructField("sizeBytes", LongType),
    StructField("url", StringType),
    StructField("attDate", StringType))), containsNull = false)

  override def nullSafeEval(t: Any): Any =
    LegacyListKernels.parse(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.crz.LegacyListKernels.parse($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
