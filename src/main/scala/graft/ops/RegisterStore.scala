package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compaction for GENERATION-PARTITIONED register stores — the
  * two-generation sketch families (DF q427, histogram q419, CMS q423,
  * Bloom q428, HLL q411-q413) all append one file-set per batch
  * forever: a year of daily appends is 365 small directories per
  * store, and the per-read listing + footer cost grows with batch
  * COUNT even though the register payload is census-sized. This
  * collapses every generation `<= upTo` into the single partition
  * `gen=upTo` under the family's own merge algebra (SUM for
  * count-like registers, `max` for HLL rhos, `distinct` for Bloom bit
  * sets), exactly the signature store's retention posture
  * ([[graft.streaming.EventStream.compactSignatureStore]]) applied to
  * registers.
  *
  * Crash discipline is the signature compactor's stage-and-swap +
  * rename-aside under an [[FsLock]], with ONE addition the register
  * algebra forces: SUM/MAX merges are NOT idempotent over their own
  * output the way the signature store's `.distinct()` is — if a crash
  * lands after the swap but before the aged directories are deleted, a
  * naive re-run would merge the already-merged partition with its own
  * inputs and double every register. So the staged partition carries a
  * `_COMPACTED_<upTo>` marker file (underscore-prefixed — invisible to
  * Spark's file listing): a re-run that finds the marker in the live
  * `gen=upTo` partition knows the merge landed and only finishes the
  * cleanup. Every kill point therefore re-runs to the same store:
  *
  *  - before the swap: originals intact (asides restored first, stale
  *    stages deleted) → full re-merge from the originals;
  *  - between the two renames: the aside holds the only copy of the
  *    original `gen=upTo` → restored, then re-merge;
  *  - after the swap: marker present → cleanup only, never a re-merge.
  *
  * `upTo` must be strictly below the newest landed generation — the
  * newest batch is the one a concurrently-running producer may still
  * be appending to, and keeping at least one uncompacted generation
  * preserves the store's two-generation read shape (old + tail).
  */
object RegisterStore {

  def compact(
      spark: SparkSession,
      root: String,
      genCol: String,
      upTo: Long,
      merge: DataFrame => DataFrame,
      targetFiles: Int = 1): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val rootPath = new HPath(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(rootPath)) return
    FsLock.withLock(fs, new HPath(rootPath, ".compact_lock"),
      "RegisterStore.compact") {
      compactLocked(spark, fs, rootPath, root, genCol, upTo, merge, targetFiles)
    }
  }

  private def compactLocked(
      spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      rootPath: org.apache.hadoop.fs.Path,
      root: String,
      genCol: String,
      upTo: Long,
      merge: DataFrame => DataFrame,
      targetFiles: Int): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val target = new HPath(rootPath, s"$genCol=$upTo")
    val marker = s"_COMPACTED_$upTo"
    // Aside recovery FIRST (the signature compactor's rule): restore
    // any aside whose target is missing (crash between the renames —
    // the aside holds the only copy), drop any whose target exists
    // (crash after the swap), and throw on a failed rename rather than
    // proceed past it.
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".compact_old_"))
      .foreach { st =>
        val k = st.getPath.getName.stripPrefix(".compact_old_")
        val tgt = new HPath(rootPath, s"$genCol=$k")
        if (fs.exists(tgt)) fs.delete(st.getPath, true)
        else if (!fs.rename(st.getPath, tgt))
          throw new java.io.IOException(
            s"register compact recovery failed: ${st.getPath} -> $tgt")
      }
    // Stale stages are debris once their run died.
    fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory &&
        st.getPath.getName.startsWith(".compact_stage_"))
      .foreach(st => fs.delete(st.getPath, true))
    def landed = fs.listStatus(rootPath).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(s"$genCol="))
      .map(_.getPath.getName.stripPrefix(s"$genCol=").toLong)
    // Finish any INTERRUPTED cleanup before computing a new merge: a
    // partition `gen=k` carrying its `_COMPACTED_k` marker proves the
    // merge up to k landed, so any partition with gen < k still on
    // disk is an un-deleted INPUT of that finished merge (a crash
    // between the swap and deleteAged). The same-upTo re-run is
    // short-circuited by the marker below — but a LATER run at a
    // HIGHER upTo would read those leftovers ALONGSIDE the head that
    // already contains them and double every register under SUM.
    // Deleting them here makes the marker's guarantee hold for every
    // future upTo, not just the crashed run's own.
    landed.sorted.reverse
      .find(k => fs.exists(new HPath(rootPath, s"$genCol=$k/_COMPACTED_$k")))
      .foreach { k =>
        landed.filter(_ < k).foreach { g =>
          fs.delete(new HPath(rootPath, s"$genCol=$g"), true)
        }
      }
    val all = landed
    require(all.isEmpty || upTo < all.max,
      s"RegisterStore.compact: upTo=$upTo must be strictly below the " +
        s"newest landed generation (${all.max}) — the newest batch may " +
        "still be receiving appends and the store keeps a live tail")
    val aged = all.filter(_ <= upTo)
    def deleteAged(): Unit = aged.filter(_ < upTo).foreach { g =>
      fs.delete(new HPath(rootPath, s"$genCol=$g"), true)
    }
    // Marker short-circuit: the merge already landed; a re-merge would
    // DOUBLE the registers (sum algebra). Finish the cleanup only.
    if (fs.exists(new HPath(target, marker))) { deleteAged(); return }
    if (aged.size <= 1) return // nothing to merge
    // The partition-column directory names round-trip as int — read
    // through a cast so the filter is type-stable.
    val merged = merge(
      spark.read.parquet(root)
        .filter(col(genCol).cast("long") <= upTo)
        .drop(genCol))
    val stage = new HPath(rootPath, s".compact_stage_$upTo")
    fs.delete(stage, true)
    merged.repartition(targetFiles).write.mode("overwrite").parquet(stage.toString)
    fs.create(new HPath(stage, marker), true).close()
    val old = new HPath(rootPath, s".compact_old_$upTo")
    fs.delete(old, true)
    if (fs.exists(target) && !fs.rename(target, old))
      throw new java.io.IOException(s"register compact swap failed: $target -> $old")
    if (!fs.rename(stage, target))
      throw new java.io.IOException(s"register compact swap failed: $stage -> $target")
    fs.delete(old, true)
    deleteAged()
  }
}
