package graft.ext

import org.apache.spark.sql.SparkSession

/** Central release valve for the session-scoped derived-frame memo
  * caches (the "one pass, many consumers" shared frames: prepared
  * walks, probe LSH band pairs, near-dup labels, incremental batch
  * fingerprints, the co-order graph, LPA labels, covariance cells).
  *
  * Why it exists (r17 verdict item 1): `Bench` runs the whole suite
  * several rounds in ONE JVM session and reports warm-round medians.
  * With the memo caches live across rounds, the shared derivations
  * executed exactly once — inside the discarded warmup round — so
  * every reported consumer number timed a `localCheckpoint` read and
  * the real prep cost appeared in NO reported figure. Clearing the
  * caches at the START of every timed round makes each round pay each
  * derivation exactly once (the first consumer in registry order
  * carries it), so the medians again measure what a fresh session
  * would pay while the within-round sharing keeps the production
  * "materialize once, fan out" shape.
  *
  * This does NOT touch [[graft.StoreLifecycle]]: the q411-q435 warm
  * stores are persisted-fixture state by design (the queries measure
  * reads of an EXISTING store), not derived-frame memoization.
  *
  * Block reclamation: the orphaned `localCheckpoint` blocks of cleared
  * entries are unpersisted explicitly by the caller (Bench drops every
  * persistent RDD between rounds — nothing legitimately holds RDD
  * blocks across queries once these maps are empty), and otherwise by
  * the ContextCleaner once the frames are GC'd. This is also the
  * eviction valve the r17 ADVICE asked for in long-lived sessions.
  */
object SessionMemo {

  /** Clear every session-scoped derived-frame memo. Safe at any
    * quiesced point (no query in flight); next access rebuilds.
    */
  def clearAll(): Unit = {
    Components.clearSessionMemos()
    Graph.clearSessionMemos()
    Similarity.clearSessionMemos()
    // Base-relation metadata memo (r18): cleared on the same cadence
    // so each timed round re-pays one real parquet resolution per
    // table, keeping the round medians fresh-session-honest.
    graft.Tables.clearSessionMemo()
  }

  /** [[clearAll]] plus explicit unpersist of every RDD still pinned in
    * the block manager — between queries the only legitimate holders
    * of persistent RDD blocks are the memo frames just cleared, so
    * this bounds block-manager growth across bench rounds instead of
    * waiting on GC + ContextCleaner.
    */
  def clearAllAndUnpersist(s: SparkSession): Unit = {
    clearAll()
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
  }
}
