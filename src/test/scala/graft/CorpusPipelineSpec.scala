package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.pipeline.{Corpus, CorpusConfig}

/** Corpus-cleaning pipeline: monotone stage counts, output free of
  * exact AND near duplicates, deterministic across runs.
  */
class CorpusPipelineSpec extends SparkTestBase {

  private lazy val out = Files.createTempDirectory("graft_corpus").toString + "/clean"
  private lazy val config = CorpusConfig(
    inDir = "/root/testdata/sf0.001",
    outPath = out,
    langs = Seq("en"),
    minQuality = 0.3)
  private lazy val metrics = Corpus.run(spark, config)
  private lazy val clean = { metrics; spark.read.parquet(out) }

  test("stage counts are monotone non-increasing and non-trivial") {
    assert(metrics.input >= metrics.afterLang)
    assert(metrics.afterLang >= metrics.afterQuality)
    assert(metrics.afterQuality === metrics.afterDecontam,
      "no eval set configured -> decontamination is a no-op")
    assert(metrics.afterDecontam >= metrics.afterExactDedup)
    assert(metrics.afterExactDedup >= metrics.written)
    assert(metrics.written > 0)
    assert(metrics.afterLang < metrics.input, "language filter must bite on a 5-lang corpus")
  }

  test("output has no exact content duplicates") {
    val n = clean.count()
    assert(clean.select(Dedup.contentHash(col("text"))).distinct().count() === n)
  }

  test("output contains no near-dup pair within the Hamming threshold") {
    val hashed = Dedup.simhashN(clean, col("doc_id"), col("text"), config.nearDupBits)
    val pairs = Dedup.simhashBandPairs(
      hashed, config.nearDupBits, config.nearDupBands, config.nearDupMaxHamming)
    assert(pairs.isEmpty, "greedy keep-first must leave no in-threshold pair")
  }

  test("chunk/pack tail: every clean doc chunked, packs respect the start-offset rule") {
    val chunks = { metrics; spark.read.parquet(out + "_chunks") }
    assert(metrics.chunksWritten === chunks.count())
    assert(metrics.chunksWritten >= metrics.written,
      "each clean doc yields at least one chunk")
    // every clean doc appears in the chunk table
    assert(clean.select("doc_id")
      .exceptAll(chunks.select("doc_id").distinct()).isEmpty)
    // COMPLETE coverage: per doc, the windows reach the last token
    // (the clamped final window closes any stride remainder), start at
    // 1, and every start is on the stride grid OR the final clamp
    val docLens = clean.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
    val cover = chunks.groupBy("doc_id")
      .agg(
        min("start_tok").as("first_start"),
        max(col("start_tok") + col("chunk_tokens") - 1).as("cover_end"))
      .join(docLens, "doc_id")
    assert(cover.filter(col("first_start") =!= 1).count() === 0)
    assert(cover.filter(col("cover_end") =!= col("n_tok")).count() === 0,
      "trailing tokens must never be dropped")
    val badStart = chunks.join(docLens, "doc_id")
      .filter((col("start_tok") - 1) % config.chunkStride =!= 0 &&
        col("start_tok") =!= col("n_tok") - config.chunkTokens + 1)
      .count()
    assert(badStart === 0)
    // packs: each pack's id equals floor(startOffset / budget) — spot
    // check by re-deriving the running sum per shard
    assert(metrics.packs > 0 && metrics.packs <= metrics.chunksWritten)
  }

  test("decontamination stage drops docs overlapping the eval set") {
    // eval set = the text of one surviving clean doc: that doc (and any
    // doc sharing a k-gram with it) must vanish from the output
    val evalDir = Files.createTempDirectory("graft_eval").toString + "/eval"
    val victim = clean.orderBy("doc_id").limit(1)
    victim.select("text").write.parquet(evalDir)
    val out3 = Files.createTempDirectory("graft_corpus3").toString + "/clean"
    val m3 = Corpus.run(spark, config.copy(
      outPath = out3, decontamEvalPath = Some(evalDir), decontamK = 5))
    assert(m3.afterDecontam < m3.afterQuality,
      "the planted eval doc must be flagged")
    val victimId = victim.collect()(0).getAs[Long]("doc_id")
    val survivors = spark.read.parquet(out3)
      .filter(col("doc_id") === victimId).count()
    assert(survivors === 0L)
  }

  test("transitive near-dup mode keeps at most one doc per component") {
    val out4 = Files.createTempDirectory("graft_corpus4").toString + "/clean"
    val m4 = Corpus.run(spark, config.copy(
      outPath = out4, transitiveNearDup = true))
    val clean4 = spark.read.parquet(out4)
    // pairwise guarantee still holds (components subsume it)
    val hashed = Dedup.simhashN(clean4, col("doc_id"), col("text"), config.nearDupBits)
    val pairs = Dedup.simhashBandPairs(
      hashed, config.nearDupBits, config.nearDupBands, config.nearDupMaxHamming)
    assert(pairs.isEmpty)
    // transitive mode can only drop MORE than greedy pairwise
    assert(m4.written <= metrics.written)
    assert(m4.written > 0)
  }

  test("pipeline is deterministic across runs") {
    val out2 = Files.createTempDirectory("graft_corpus2").toString + "/clean"
    val m2 = Corpus.run(spark, config.copy(outPath = out2))
    assert(m2 === metrics)
    val ids1 = clean.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = spark.read.parquet(out2).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
  }
}
