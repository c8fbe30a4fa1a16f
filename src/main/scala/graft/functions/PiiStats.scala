package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass PII detection + redaction for the two patterns the scrub
  * operator (q102) uses — a hand-rolled linear scanner with semantics
  * PROVEN equal to the java.util.regex reference (PiiStatsSpec sweeps
  * adversarial and random inputs against `Pattern`-based evaluation):
  *
  *   email = `[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}`
  *   phone = `\b555-[0-9]+\b`
  *
  * Replaces four regex traversals per row (2× regexp_extract_all with
  * array materialization just for its size + 2× regexp_replace inside the
  * scrub chain) with three allocation-free scans: email count+scrub on
  * the input, phone count on the input, phone scrub on the email-scrubbed
  * text — exactly the composition the original column expressions
  * computed, including the order-of-scrubbing subtleties. Each scan is
  * O(length) with no backtracking: the email pattern's only backtracking
  * point (`[a-z0-9.-]+` vs `\.[a-z]{2,}`) resolves to "rightmost dot in
  * the maximal domain run followed by ≥2 letters", evaluated directly.
  */
case class PiiStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis
          .TypeCheckResult.TypeCheckFailure(
            s"pii_stats requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("scrubbed", StringType, nullable = false)))

  override def nullSafeEval(input: Any): Any =
    PiiStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.PiiStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): PiiStats =
    copy(child = newChild)
}

object PiiStats {

  @inline private def isLocal(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
      c == '.' || c == '_' || c == '%' || c == '+' || c == '-'

  @inline private def isDomain(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '.' || c == '-'

  @inline private def isAlpha(c: Char): Boolean = c >= 'a' && c <= 'z'

  @inline private def isWord(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_'

  /** Email pass: returns the match count; if `out` is non-null, appends
    * the redacted text to it. Mirrors `Matcher.find` semantics: leftmost
    * match, greedy local/domain runs, find() resumes at the match end
    * (`last` clamps the local-part run so consumed text is never reused).
    */
  private def emailPass(t: String, out: java.lang.StringBuilder): Int = {
    val len = t.length
    var n = 0
    var last = 0
    var i = 0
    while (i < len) {
      if (t.charAt(i) == '@') {
        var ls = i
        while (ls > last && isLocal(t.charAt(ls - 1))) ls -= 1
        var matched = false
        if (ls < i) {
          var de = i + 1
          while (de < len && isDomain(t.charAt(de))) de += 1
          // rightmost '.' with >=1 domain char before it and >=2 letters
          // after (the regex engine's longest-first backtracking order)
          var dp = de - 1
          while (dp >= i + 2 && !matched) {
            if (t.charAt(dp) == '.') {
              var ae = dp + 1
              while (ae < len && isAlpha(t.charAt(ae))) ae += 1
              if (ae - dp - 1 >= 2) {
                if (out != null) {
                  out.append(t, last, ls)
                  out.append("<EMAIL>")
                }
                n += 1
                last = ae
                i = ae - 1 // -1: the outer loop increments
                matched = true
              }
            }
            dp -= 1
          }
        }
      }
      i += 1
    }
    if (out != null) out.append(t, last, len)
    n
  }

  /** Phone pass (`\b555-[0-9]+\b`): literal "555-" with a word boundary
    * before it, ≥1 digit, and a word boundary after the maximal digit run
    * (a shorter run can never end at a boundary, so no backtracking).
    */
  private def phonePass(t: String, out: java.lang.StringBuilder): Int = {
    val len = t.length
    var n = 0
    var last = 0
    var i = 0
    while (i + 3 < len) {
      if (t.charAt(i) == '5' && t.charAt(i + 1) == '5' && t.charAt(i + 2) == '5' &&
          t.charAt(i + 3) == '-' && (i == 0 || !isWord(t.charAt(i - 1)))) {
        var de = i + 4
        while (de < len && { val c = t.charAt(de); c >= '0' && c <= '9' }) de += 1
        if (de > i + 4 && (de == len || !isWord(t.charAt(de)))) {
          if (out != null) {
            out.append(t, last, i)
            out.append("<PHONE>")
          }
          n += 1
          last = de
          i = de - 1
        }
      }
      i += 1
    }
    if (out != null) out.append(t, last, len)
    n
  }

  def compute(s: UTF8String): InternalRow = {
    val t = s.toString
    val sb1 = new java.lang.StringBuilder(t.length + 16)
    val nEmails = emailPass(t, sb1)
    val nPhones = phonePass(t, null) // counted on the ORIGINAL text
    val s1 = sb1.toString
    val sb2 = new java.lang.StringBuilder(s1.length)
    phonePass(s1, sb2) // scrubbed AFTER the email redaction
    InternalRow(nEmails, nPhones, UTF8String.fromString(sb2.toString))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(PiiStats(ColumnBridge.expression(c)))
}
