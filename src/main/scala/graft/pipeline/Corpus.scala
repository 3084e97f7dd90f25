package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.Tables
import graft.ext.{Dedup, TextAnalysis}

final case class CorpusConfig(
    inDir: String,
    outPath: String,
    langs: Seq[String] = Seq("en"),
    minQuality: Double = 0.3,
    nearDupBits: Int = 60,
    nearDupBands: Int = 4,
    nearDupMaxHamming: Int = 2,
    chunkTokens: Int = 32,
    chunkStride: Int = 24,
    packBudgetChars: Long = 4096L,
    // benchmark decontamination: when set, docs sharing a decontamK-gram
    // with any doc in the eval parquet (a `text` column) are dropped
    decontamEvalPath: Option[String] = None,
    decontamK: Int = 8,
    // near-dup scope: pairwise greedy (default — no surviving pair is a
    // near-dup) vs transitive components (one survivor per dedup GROUP)
    transitiveNearDup: Boolean = false)

final case class CorpusMetrics(
    input: Long,
    afterLang: Long,
    afterQuality: Long,
    afterDecontam: Long,
    afterExactDedup: Long,
    written: Long,
    nearDupDocsDropped: Long,
    chunksWritten: Long,
    packs: Long)

/** Training-corpus cleaning pipeline — the LLM-data counterpart of the
  * healthcare ETL: compose the text-analysis and dedup operators into
  * one declarative job.
  *
  *   read → language filter (heuristic, not the label) → quality
  *   threshold → [optional] benchmark decontamination (eval k-gram
  *   overlap, broadcast eval side) → exact content dedup (keep lowest
  *   doc_id) → SimHash band near-dup removal (greedy keep-first, or
  *   transitive connected-components groups) → sorted parquet + stats
  *   → sliding-window chunking → size-budget packing (the training-prep
  *   tail: chunks are what gets embedded/tokenized, packs are the batch
  *   assembly unit)
  *
  * Every stage is a set operation; the near-dup stage is band-bucketed
  * (never all-pairs). Greedy keep-first drops the higher doc_id of
  * every candidate pair, which guarantees the OUTPUT contains no pair
  * within the Hamming threshold (any surviving pair would contain a
  * dropped id — contradiction). At 100 TB the doc_id ordering makes
  * the drop set deterministic across retries.
  */
object Corpus {

  def run(spark: SparkSession, config: CorpusConfig): CorpusMetrics = {
    val docs = Tables.table(spark, config.inDir, "documents")
    val input = docs.count()

    val scored = docs
      .withColumn("guess", TextAnalysis.guessLang(col("text")))
      .withColumn("quality", TextAnalysis.qualityScore(col("text")))
    val byLang = scored.filter(col("guess").isin(config.langs: _*))
    val afterLang = byLang.count()

    val byQuality = byLang.filter(col("quality") >= config.minQuality)
    val afterQuality = byQuality.count()

    // optional benchmark decontamination (Decontam.contaminationReport's
    // machinery): drop any doc sharing a k-gram with the eval set
    val decontaminated = config.decontamEvalPath match {
      case Some(evalPath) =>
        val evalDocs = spark.read.parquet(evalPath)
          .select(split(col("text"), " ").as("ws"))
        val contaminated = graft.ext.Decontam.contaminationReport(
          byQuality.select(col("doc_id"), split(col("text"), " ").as("ws")),
          evalDocs, config.decontamK)
          .select("doc_id")
        byQuality.join(contaminated, Seq("doc_id"), "left_anti")
      case None => byQuality
    }
    val afterDecontam = decontaminated.count()

    // exact dedup: keep the lowest doc_id per content hash
    val keep = decontaminated
      .groupBy(Dedup.contentHash(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val exact = decontaminated.join(keep, Seq("doc_id"), "left_semi")
    exact.persist() // reused: count, simhash build, final anti-join
    val afterExact = exact.count()

    // near-dup removal: greedy keep-first over band-bucketed candidates
    val hashed = Dedup.simhashN(exact, col("doc_id"), col("text"), config.nearDupBits)
    val pairs = Dedup.simhashBandPairs(
      hashed, config.nearDupBits, config.nearDupBands, config.nearDupMaxHamming)
    // dropIds is tiny (distinct ids to remove) but DERIVING it runs the
    // full simhash + band self-join — persist before counting so the
    // final anti-join reuses the result instead of recomputing the whole
    // near-dup pipeline a second time.
    //   pairwise (default): drop every id_b — no surviving pair is a
    //     near-dup (any such pair would contain a dropped id).
    //   transitive: connected components over the pair graph, keep the
    //     min id per GROUP — one survivor per dedup cluster even when
    //     A~B, B~C but A and C never met in a band.
    val dropIds =
      if (config.transitiveNearDup) {
        val verts = pairs.select(col("id_a").as("id"))
          .union(pairs.select(col("id_b").as("id"))).distinct()
        graft.ext.Components
          .connectedComponents(verts, pairs.select(
            col("id_a").as("src"), col("id_b").as("dst")))
          .filter(col("id") =!= col("comp"))
          .select(col("id").as("doc_id"))
      } else pairs.select(col("id_b").as("doc_id")).distinct()
    dropIds.persist()
    val dropped = dropIds.count()
    val clean = exact.join(dropIds, Seq("doc_id"), "left_anti")
      .drop("guess", "quality")

    clean
      .repartitionByRange(col("doc_id"))
      .sortWithinPartitions("doc_id")
      .write.mode(SaveMode.Overwrite).parquet(config.outPath)
    val written = spark.read.parquet(config.outPath).count()
    dropIds.unpersist()
    exact.unpersist()

    // training-prep tail: chunk the CLEAN corpus (read back from the
    // sink — the cleaned table is the contract boundary), then pack
    // chunks into contiguous size-budget bins per source shard
    val cleanDocs = spark.read.parquet(config.outPath)
    // `carry` threads `source` through the explode — re-joining the
    // chunk table (the pipeline's largest frame) to its parent just to
    // recover one column would add a full shuffle join
    val chunks = TextAnalysis.chunkDocs(
      cleanDocs.withColumnRenamed("doc_id", "__id"), col("__id"), col("text"),
      config.chunkTokens, config.chunkStride, carry = Seq("source"))
    val packed = graft.ext.Sampling.packBudget(
      chunks.withColumn("chunk_chars", length(col("chunk"))),
      shard = col("source"),
      order = struct(col("doc_id"), col("start_tok")),
      size = col("chunk_chars").cast("long"),
      budget = config.packBudgetChars)
    packed
      .repartitionByRange(col("source"), col("pack_id"))
      .sortWithinPartitions("source", "pack_id", "doc_id", "start_tok")
      .write.mode(SaveMode.Overwrite).parquet(config.outPath + "_chunks")
    val chunkTable = spark.read.parquet(config.outPath + "_chunks")
    val chunksWritten = chunkTable.count()
    val packs = chunkTable.select("source", "pack_id").distinct().count()

    CorpusMetrics(input, afterLang, afterQuality, afterDecontam, afterExact,
      written, dropped, chunksWritten, packs)
  }

  def main(args: Array[String]): Unit = {
    val inDir = sys.env.getOrElse("GRAFT_CORPUS_IN", "/root/testdata/sf0.001")
    val outPath = sys.env.getOrElse("GRAFT_CORPUS_OUT", "out/corpus_clean")
    val spark = Engine.session(appName = "graft-corpus")
    val m = run(spark, CorpusConfig(inDir, outPath))
    println(s"[corpus] input=${m.input} lang=${m.afterLang} quality=${m.afterQuality} " +
      s"decontam=${m.afterDecontam} exact=${m.afterExactDedup} " +
      s"neardup_docs_dropped=${m.nearDupDocsDropped} " +
      s"written=${m.written} chunks=${m.chunksWritten} packs=${m.packs}")
    spark.stop()
  }
}
