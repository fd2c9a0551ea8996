package graft.functions

import java.text.Normalizer

import graft.fm.SparkSessionSuite
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._

/** Pins the Unicode normalization operator (`normalize_text` /
  * `TextAnalysis.normalizeUnicode`) — the r5 extension past
  * `ta_normalize`'s documented ASCII scope. The DuckDB oracle cannot
  * express Java's Normalizer, so the contract is pinned three ways:
  * golden folds, normalization-form insensitivity + idempotence, and a
  * self-validating diacritic-injection round-trip over the real
  * documents corpus at two scale factors. */
class UnicodeNormalizeSuite extends SparkSessionSuite {

  private def foldOne(s: String): String = {
    val t = spark
    import t.implicits._
    Seq(s).toDF("x")
      .select(TextAnalysis.normalizeUnicode(col("x")).as("y"))
      .head().getString(0)
  }

  test("golden folds: composed, decomposed, case, pass-through") {
    foldOne("Café") shouldBe "cafe"               // é composed
    foldOne("Café") shouldBe "cafe"              // e + combining acute
    foldOne("naïve") shouldBe "naive"             // ï
    foldOne("ÅNGSTRÖM") shouldBe "angstrom"  // Å Ö upper
    foldOne("ASCII Only 42!") shouldBe "ascii only 42!" // fast path
    foldOne("") shouldBe ""
  }

  test("null-safe and registered as a catalog function") {
    val t = spark
    import t.implicits._
    val out = Seq[Option[String]](Some("Über"), None).toDF("x")
      .selectExpr("normalize_text(x) AS y").collect()
    out(0).getString(0) shouldBe "uber"
    assert(out(1).isNullAt(0))
  }

  test("idempotent and insensitive to input normalization form") {
    val inputs = Seq("Café au lait", "Café au lait",
      "résumés", "resumés", "ẞ-Straße",
      "ｆｕｌｌｗｉｄｔｈ", "mixed É́ marks")
    inputs.foreach { s =>
      val once = foldOne(s)
      withClue(s"input $s: ") {
        foldOne(once) shouldBe once // idempotent
        foldOne(Normalizer.normalize(s, Normalizer.Form.NFD)) shouldBe once
        foldOne(Normalizer.normalize(s, Normalizer.Form.NFC)) shouldBe once
      }
    }
  }

  test("diacritic-injected documents fold back to lower(text) at two SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { dir =>
      val docs = graft.Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"))
      // Deterministic Unicode mess: a→à, o→ö via 1:1 translate, every
      // 'e' gains a COMBINING acute (two-char sequence — exercises the
      // NFC path), every 3rd doc upper-cased. Folding must recover
      // exactly lower(text) for every row.
      val messy = docs.select(col("doc_id"), col("text"),
        when(col("doc_id") % 3 === 0,
          upper(regexp_replace(translate(col("text"), "ao", "àö"),
            "e", "é")))
          .otherwise(
            regexp_replace(translate(col("text"), "ao", "àö"),
              "e", "é")).as("raw"))
      val checked = messy.select(
        when(TextAnalysis.normalizeUnicode(col("raw")) === lower(col("text")), 1)
          .otherwise(0).as("ok"))
      val (n, okSum) = checked.agg(count(lit(1)), sum(col("ok"))).head() match {
        case r => (r.getLong(0), r.getLong(1))
      }
      withClue(s"$dir: ") {
        n should be > 0L
        okSum shouldBe n
      }
    }
  }
}
