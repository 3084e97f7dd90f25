package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{UnicodeNorm, UnicodeNormUtil}

/** Unicode normalization expressions: NFC composition and accent
  * stripping (corpus canonicalization before hashing/dedup).
  * Decomposed forms are written with explicit U+0301 combining-acute
  * escapes; accented literals elsewhere are precomposed.
  */
class UnicodeNormSpec extends SparkTestBase {
  import spark.implicits._

  private val composed = "café"
  private val decomposed = "caf\u0065\u0301"

  private def u(s: String): UTF8String = UTF8String.fromString(s)

  test("nfc composes decomposed sequences; idempotent on composed") {
    assert(UnicodeNormUtil.nfc(u(decomposed)).toString === composed)
    assert(UnicodeNormUtil.nfc(u(composed)).toString === composed)
    // ASCII hot path returns the input reference (no allocation)
    val ascii = u("plain ascii")
    assert(UnicodeNormUtil.nfc(ascii) eq ascii)
  }

  test("stripAccents removes combining marks in both input forms") {
    assert(UnicodeNormUtil.stripAccents(u(composed)).toString === "cafe")
    assert(UnicodeNormUtil.stripAccents(u(decomposed)).toString === "cafe")
    assert(UnicodeNormUtil.stripAccents(u("über naïve")).toString
      === "uber naive")
    val ascii = u("no accents here")
    assert(UnicodeNormUtil.stripAccents(ascii) eq ascii)
  }

  test("stripAccents output is NFC even for mark-free decomposed input") {
    // conjoining Hangul jamo: NFD-stable, contains NO Mn marks — the
    // no-mark fast path must still compose, or strip(x) != strip(nfc(x))
    // and the CollapseIdempotentNorms rewrite would change results
    val jamo = "\u1100\u1161" // ᄀ + ᅡ, composes to 가 (U+AC00)
    assert(UnicodeNormUtil.stripAccents(u(jamo)).toString === "\uAC00")
    assert(UnicodeNormUtil.stripAccents(u(jamo)).toString ===
      UnicodeNormUtil.stripAccents(UnicodeNormUtil.nfc(u(jamo))).toString)
  }

  test("normalized forms hash identically after nfc (the dedup motivation)") {
    val df = Seq(composed, decomposed).toDF("t")
      .select(md5(UnicodeNorm.nfcNormalize($"t")).as("h"))
    assert(df.distinct().count() === 1L)
    // ...whereas raw bytes do NOT collide
    val raw = Seq(composed, decomposed).toDF("t")
      .select(md5($"t").as("h"))
    assert(raw.distinct().count() === 2L)
  }

  test("null propagation and codegen path via DataFrame") {
    val df = Seq(Some("résumé"), None).toDF("t")
      .select(
        UnicodeNorm.nfcNormalize($"t").as("n"),
        UnicodeNorm.stripAccents($"t").as("s"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "résumé")
    assert(rows(0).getString(1) === "resume")
    assert(rows(1).isNullAt(0) && rows(1).isNullAt(1))
  }

  test("SQL registry exposes nfc_normalize and strip_accents") {
    val r = spark.sql(
      "SELECT nfc_normalize('e\u0301') AS n, strip_accents('e\u0301') AS s")
      .head()
    assert(r.getString(0) === "é" && r.getString(1) === "e")
  }

  test("non-string input is rejected at analysis") {
    val e = intercept[Exception] {
      Seq(1).toDF("x").select(UnicodeNorm.nfcNormalize($"x")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
