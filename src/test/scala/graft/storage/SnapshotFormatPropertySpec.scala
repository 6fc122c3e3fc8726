package graft.storage

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Seeded property pins for the string-stats codec's ORDER THEORY — the
  * soundness of truncate+increment bounds is an order-theoretic claim
  * over all of Unicode, exactly the shape example tests under-cover:
  * for ANY value set, `stringBounds(min, max)` must bracket every value
  * in UTF8 byte order, `incrementLastCodePoint` must dominate every
  * extension of its input, and blob escaping must round-trip every
  * value through one `unescapePathName`. No SparkSession needed — the
  * codec is pure. (In the same package as [[SnapshotFormat]] by design:
  * the codec is `private[storage]`, and a test-only re-export would be
  * API noise.)
  */
class SnapshotFormatPropertySpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260815)

  private def cmp(a: String, b: String): Int =
    UTF8String.fromString(a).compareTo(UTF8String.fromString(b))

  /** Random string over ALL valid code-point classes (ASCII, 2-/3-byte
    * BMP, supplementary), occasionally including U+10FFFF runs so the
    * increment-overflow path gets real traffic.
    */
  private def randStr(maxLen: Int = 40): String = {
    val n = rnd.nextInt(maxLen)
    val sb = new java.lang.StringBuilder
    (0 until n).foreach { _ =>
      val cp = rnd.nextInt(6) match {
        case 0 => 1 + rnd.nextInt(127) // ASCII (no NUL: not in real data)
        case 1 => 0x80 + rnd.nextInt(0x800 - 0x80) // 2-byte UTF-8
        case 2 => 0x800 + rnd.nextInt(0xD800 - 0x800) // 3-byte, pre-gap
        case 3 => 0xE000 + rnd.nextInt(0x10000 - 0xE000) // 3-byte, post-gap
        case 4 => 0x10000 + rnd.nextInt(0x110000 - 0x10000) // supplementary
        case 5 => 0x10FFFF // overflow-path pressure
      }
      sb.appendCodePoint(cp)
    }
    sb.toString
  }

  test("stringBounds brackets every value of a random set in UTF8 byte " +
    "order (2000 seeded rounds over all code-point classes)") {
    (0 until 2000).foreach { round =>
      val vals = Seq.fill(1 + rnd.nextInt(6))(randStr())
      val sorted = vals.sortWith(cmp(_, _) < 0)
      val (mn, mx) = (sorted.head, sorted.last)
      SnapshotFormat.stringBounds(mn, mx) match {
        case Some((lo, hi)) =>
          vals.foreach { v =>
            assert(cmp(lo, v) <= 0,
              s"round $round: lo '$lo' > value '$v' (min '$mn')")
            assert(cmp(v, hi) <= 0,
              s"round $round: value '$v' > hi '$hi' (max '$mx')")
          }
        case None =>
          // only an increment overflow may refuse: the truncated max must
          // be all U+10FFFF
          val t = mx.codePoints().toArray.take(SnapshotFormat.StatsTruncLen)
          assert(t.nonEmpty && t.forall(_ == 0x10FFFF),
            s"round $round: bounds refused without overflow (max '$mx')")
      }
    }
  }

  test("incrementLastCodePoint dominates EVERY extension of its input " +
    "(the upper-bound argument), and refuses exactly the all-U+10FFFF " +
    "inputs") {
    (0 until 2000).foreach { round =>
      val t = randStr(8)
      SnapshotFormat.incrementLastCodePoint(t) match {
        case Some(u) =>
          assert(cmp(t, u) < 0, s"round $round: '$t' !< increment '$u'")
          (0 until 4).foreach { _ =>
            val ext = t + randStr(6)
            assert(cmp(ext, u) < 0,
              s"round $round: extension '$ext' !< increment '$u' of '$t'")
          }
        case None =>
          assert(t.codePoints().toArray.forall(_ == 0x10FFFF),
            s"round $round: refused '$t' which has a successor")
      }
    }
  }

  test("blob escaping round-trips every value through ONE unescape, and " +
    "parseStats recovers exactly what genStats would write") {
    val Esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    (0 until 2000).foreach { round =>
      val (lo, hi) = (randStr(), randStr())
      val blob = "c=s:" + SnapshotFormat.escapeStatValue(lo) + ":" +
        SnapshotFormat.escapeStatValue(hi)
      // the grammar's structural characters never survive escaping
      val payload = blob.stripPrefix("c=s:")
      assert(!payload.contains(';') && !payload.contains('='),
        s"round $round: reserved char leaked in '$payload'")
      assert(payload.count(_ == ':') == 1,
        s"round $round: ':' leaked in '$payload'")
      // v1/v2 string fields parse as INEXACT on both sides (grammar v3
      // added the exactness flags; legacy bounds carry no proof)
      val parsed = SnapshotFormat.parseStats(blob)
      assert(parsed ==
        Map("c" -> SnapshotFormat.ColStat('s', lo, hi, None, None,
          loExact = false, hiExact = false)),
        s"round $round: '$lo'/'$hi' did not round-trip")
      // the v2 grammar (counts appended) round-trips the same values
      val parsed2 = SnapshotFormat.parseStats(blob + ":3:10")
      assert(parsed2 ==
        Map("c" -> SnapshotFormat.ColStat('s', lo, hi, Some(3L), Some(10L),
          loExact = false, hiExact = false)),
        s"round $round: v2 counts did not round-trip")
      // the v3 grammar: every flag combination round-trips verbatim
      val flags = round % 4
      val parsed3 = SnapshotFormat.parseStats(blob + s":3:10:$flags")
      assert(parsed3 ==
        Map("c" -> SnapshotFormat.ColStat('s', lo, hi, Some(3L), Some(10L),
          loExact = (flags & 1) != 0, hiExact = (flags & 2) != 0)),
        s"round $round: v3 flags $flags did not round-trip")
      // the single-unescape contract, value-wise
      assert(Esc.unescapePathName(SnapshotFormat.escapeStatValue(lo)) == lo,
        s"round $round: one unescape did not invert the escape for '$lo'")
    }
  }
}
