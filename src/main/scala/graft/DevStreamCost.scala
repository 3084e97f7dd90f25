package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dev-only cost curve for the streaming ingest near-dup filter (r13
  * verdict item 6): run N micro-batches of documents through
  * `EventStream.dedupIngestBatch` against a growing signature store and
  * time each batch — is batch-N's cost flat, or does the accumulated
  * store drag the band join superlinear?
  *
  * Batch construction: batch i = `doc_id % nBatches == i`, so the
  * fixture's adjacent-id planted near-dups STRADDLE batches — the
  * cross-batch band join (the stage under measurement) actually fires,
  * and the within-batch self-join stays small.
  *
  * What "flat" can mean here: the store grows linearly in batches, and
  * the reference read scans every earlier `batch_id=` partition (that
  * is the operator's contract — dedup against EVERYTHING landed), so
  * the true asymptote is O(store). The question this tool answers is
  * where the constant ends and the slope begins at gate scale, and the
  * printed head/tail means make the answer a recorded number in
  * SCALE.md rather than a claim. The partition-pruning leg (a REPLAY
  * of batch k must not read partitions ≥ k) is structural and pinned
  * in Round14Spec, not timed here.
  *
  * Usage: `sbt -batch 'runMain graft.DevStreamCost [sfDir] [nBatches]'`.
  */
object DevStreamCost {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nBatches = if (args.length > 1) args(1).toInt else 50
    val spark = Engine.session(cores = "32", appName = "graft-stream-cost")
    val root = Files.createTempDirectory("graft-streamcost").toString
    val sigDir = s"$root/sigs"
    val keepDir = s"$root/keep"
    val docs = Tables.table(spark, base, "documents")
      .select("doc_id", "text").localCheckpoint(true)

    // Mid-stream compaction (r14 verdict item 4): merge every aged
    // signature partition at the halfway mark, leaving the latest
    // landed batch uncompacted (the replay-visibility requirement).
    // The cost question: does the flat curve SURVIVE the boundary —
    // same keep semantics, fewer directories on every later reference
    // read?
    val compactAt = nBatches / 2
    val times = (0 until nBatches).map { i =>
      if (i == compactAt && i >= 3) {
        val t0 = System.nanoTime()
        streaming.EventStream.compactSignatureStore(spark, sigDir, i - 2L)
        println(f"[stream-cost] compacted batch_id<=${i - 2} " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val batch = docs.filter(col("doc_id") % nBatches === i)
      val t0 = System.nanoTime()
      streaming.EventStream.dedupIngestBatch(batch, i.toLong, sigDir, keepDir)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stream-cost] batch $i%02d $dt%.2f s")
      dt
    }
    def mean(xs: Seq[Double]): Double = xs.sum / xs.length
    // Head excludes the JIT-cold first batches; tail is the steady
    // state against the near-full store.
    val head = mean(times.slice(5, 15))
    val tail = mean(times.slice(nBatches - 10, nBatches))
    val preC = mean(times.slice(math.max(0, compactAt - 10), compactAt))
    val postC = mean(times.slice(compactAt, math.min(nBatches, compactAt + 10)))
    val kept = spark.read.parquet(keepDir).count()
    val sigs = spark.read.parquet(sigDir).count()
    println(f"[stream-cost] batches=$nBatches head(5-14)=$head%.2f s " +
      f"tail(last 10)=$tail%.2f s tail/head=${tail / head}%.2f " +
      f"pre-compact=$preC%.2f s post-compact=$postC%.2f s kept=$kept sigs=$sigs")

    // ---- q435's sink: the HLL register micro-batch curve ----------------
    // Per-batch work here is WRITE-ONLY (the sink never reads the
    // store), so unlike the dedup loop above there is no O(store) term
    // at all — the curve must be flat outright, and the mid-stream
    // register compaction (MAX algebra) must leave it untouched. The
    // per-batch register frame is ≤ types × 256 rows at any batch size.
    val regDir = s"$root/regs"
    val ev = Tables.events(spark, base)
      .select(col("event_type").as("t"), col("user_id"))
      .localCheckpoint(true)
    val regTimes = (0 until nBatches).map { i =>
      if (i == compactAt && i >= 3) {
        val t0 = System.nanoTime()
        ops.RegisterStore.compact(spark, regDir, "batch_id", i - 2L,
          m => m.groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho")))
        println(f"[stream-cost] reg-compacted batch_id<=${i - 2} " +
          f"in ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      val batch = ev.filter(col("user_id") % nBatches === i)
      val t0 = System.nanoTime()
      streaming.EventStream.writeBatchIdempotent(
        ops.Sketches.hllPortableRegisters(batch, Seq("t"), col("user_id")),
        i.toLong, regDir)
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[stream-cost] reg-batch $i%02d $dt%.2f s")
      dt
    }
    val rHead = mean(regTimes.slice(5, 15))
    val rTail = mean(regTimes.slice(nBatches - 10, nBatches))
    val rPre = mean(regTimes.slice(math.max(0, compactAt - 10), compactAt))
    val rPost = mean(regTimes.slice(compactAt, math.min(nBatches, compactAt + 10)))
    val merged = spark.read.parquet(regDir)
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho")).count()
    println(f"[stream-cost] reg batches=$nBatches head(5-14)=$rHead%.2f s " +
      f"tail(last 10)=$rTail%.2f s tail/head=${rTail / rHead}%.2f " +
      f"pre-compact=$rPre%.2f s post-compact=$rPost%.2f s merged_regs=$merged")
    spark.stop()
  }
}
