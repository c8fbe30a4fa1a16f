package graft

import graft.functions.PiiStats
import graft.operators.TextCuration
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Proof that the hand-rolled PiiStats scanner computes EXACTLY what the
  * java.util.regex formulation computed: counts on the original text,
  * scrub = phone-replace(email-replace(text)). Adversarial cases target
  * every backtracking/boundary subtlety, then a deterministic random
  * sweep over a PII-dense alphabet hammers the rest.
  */
class PiiStatsSpec extends AnyFunSuite {

  private val emailP = java.util.regex.Pattern.compile(TextCuration.EmailRe)
  private val phoneP = java.util.regex.Pattern.compile(TextCuration.PhoneRe)

  private def reference(t: String): (Int, Int, String) = {
    def count(p: java.util.regex.Pattern, s: String): Int = {
      val m = p.matcher(s); var n = 0; while (m.find()) n += 1; n
    }
    val scrub = phoneP.matcher(
      emailP.matcher(t).replaceAll("<EMAIL>")).replaceAll("<PHONE>")
    (count(emailP, t), count(phoneP, t), scrub)
  }

  private def engine(t: String): (Int, Int, String) = {
    val r = PiiStats.compute(UTF8String.fromString(t))
    (r.getInt(0), r.getInt(1), r.getUTF8String(2).toString)
  }

  private def check(t: String): Unit =
    assert(engine(t) === reference(t), s"input: <$t>")

  test("adversarial email/phone boundary cases match java.util.regex") {
    Seq(
      "", "plain text only",
      "a@b.com", "a@b.c", "a@b.co", "a@b.c.de", "a@b..com", "a@.com",
      "@a.com", "a@", "a@b", "a@b.", "a@b.c1m", "a@b.comx", "a@b.com.",
      "a@b@c.com", "b.c@d.com", "x@ a@b.com", "a@b.comx@d.com",
      "A@b.com", "a@B.com", "..@b.com", "a+b_c%d@e-f.org",
      "a@b.c.d.ef", "a@b-.com", "a@-b.com", "a@b.cde.f", "a@b.cd1ef",
      "x555-1@a.com", "user5@mail.org call now",
      "555-1234", "555-", "555-a", "5555-123", "555-12a", "x555-123",
      "_555-123", " 555-123 ", "555-123-456", "555-555-12", "a555-1",
      "555-1234567890123", "call 555-0001 or 555-0002",
      "email a@b.com and 555-99 end", "555-1a@b.com",
      "contact user42@example.com or user42@mail.example.org call 555-42 now",
    ).foreach(check)
  }

  test("deterministic random sweep over a PII-dense alphabet") {
    val alphabet = "ab5@.-_%+ 1A\t".toCharArray
    val rnd = new java.util.Random(20260813L)
    (1 to 4000).foreach { _ =>
      val n = 1 + rnd.nextInt(40)
      val sb = new java.lang.StringBuilder(n)
      (1 to n).foreach(_ => sb.append(alphabet(rnd.nextInt(alphabet.length))))
      check(sb.toString)
    }
  }

  test("longer documents with embedded pii match too") {
    val doc = ("lorem ipsum dolor sit amet " * 20) +
      "reach me at first.last+tag@sub.domain-x.example.com " +
      ("filler words here " * 10) +
      "or 555-0199, backup 555-0200x and a@b.c trailing"
    check(doc)
    check(doc.toUpperCase)
    check(doc + " " + doc)
  }
}
