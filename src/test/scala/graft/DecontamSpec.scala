package graft

import org.apache.spark.sql.functions._

import graft.ext.{Decontam, TextAnalysis}

/** Decontamination (eval n-gram overlap) and TF-IDF semantics on
  * hand-built fixtures.
  */
class DecontamSpec extends SparkTestBase {
  import spark.implicits._

  test("contaminationReport flags only docs sharing a k-gram with eval") {
    val toks = (s: String) => s.split(" ").toSeq
    val train = Seq(
      (1L, toks("the quick brown fox jumps over the lazy dog")),
      (2L, toks("completely unrelated text about spark engines here")),
      (3L, toks("quick brown fox jumps over something else entirely"))
    ).toDF("doc_id", "ws")
    val eval = Seq(
      Tuple1(toks("a benchmark with the quick brown fox jumps over it"))
    ).toDF("ws")

    val got = Decontam.contaminationReport(train, eval, k = 5)
      .orderBy("doc_id").collect()
    // doc 1: grams "the quick brown fox jumps" + "quick brown fox jumps over" hit
    // doc 3: gram "quick brown fox jumps over" hits; doc 2: clean, absent
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    val d1 = got(0)
    assert(d1.getLong(1) === 5L) // 9 tokens -> 5 distinct 5-grams
    assert(d1.getLong(2) === 2L)
    assert(d1.getDouble(3) === 0.4)
  }

  test("docs shorter than k never appear on either side") {
    val train = Seq((1L, Seq("too", "short"))).toDF("doc_id", "ws")
    val eval = Seq(Tuple1(Seq("too", "short"))).toDF("ws")
    assert(Decontam.contaminationReport(train, eval, k = 5).count() === 0L)
  }

  test("tfidf ranks distinctive terms above ubiquitous ones") {
    val dir = java.nio.file.Files.createTempDirectory("tfidf").toString
    // 3 docs; "common" is in all (idf=ln(1)=0), "rare" only in doc 1
    Seq(
      (1L, "common rare rare", "en", "s", 16L),
      (2L, "common other words", "en", "s", 18L),
      (3L, "common more things", "en", "s", 17L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val top = TextAnalysis.q106(spark, dir)
      .filter($"doc_id" === 1L).collect()
    // rare: tf=2, df=1 -> 2*ln(3) ~ 2.1972 tops doc 1; common: tfidf = 0
    assert(top(0).getString(2) === "rare")
    assert(math.abs(top(0).getDouble(5) - 2.1972) < 1e-4)
    val commonRow = top.find(_.getString(2) == "common").get
    assert(commonRow.getDouble(5) === 0.0)
  }
}
