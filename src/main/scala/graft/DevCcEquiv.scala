package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: prove the warm ≡ cold connected-components contract at
  * FULL corpus scale (the oracle gate certifies it on the bounded
  * probe set; the DevScaleAudit rows time it — this checks the
  * LABELS themselves on the audit tiers). Mirrors the audit's
  * cc_warm_full/cc_warm_batch derivation: old = doc_id % mod ≠ mod-1
  * fingerprinted+labeled as the persisted state, new = the rest,
  * pairs = new-self ∪ new-vs-store ∪ star edges, warm loop seeded
  * from the store — the result must equal the cold full-graph run
  * row-for-row.
  *
  *   sbt 'runMain graft.DevCcEquiv dev/sf10x 10'
  */
object DevCcEquiv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("dev/sf10x")
    val mod = if (args.length > 1) args(1).toInt else 10
    val spark = Engine.session(cores = "32", appName = "graft-cc-equiv")
    def docs = Tables.table(spark, dir, "documents").select("doc_id", "text")

    val cold = {
      val pairs = ext.Dedup.simhashBandPairs(
        ext.Dedup.simhashN(docs, col("doc_id"), col("text"), bits = 60),
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      ext.Components.connectedComponents(
        docs.select(col("doc_id").as("id")), pairs)
    }

    val warm = {
      val old = docs.filter(col("doc_id") % mod =!= (mod - 1))
      val oldFp = ext.Dedup.simhashN(old, col("doc_id"), col("text"), bits = 60)
        .localCheckpoint(true)
      val labels = ext.Components.connectedComponents(
        old.select(col("doc_id").as("id")),
        ext.Dedup.simhashBandPairs(oldFp, bits = 60, bands = 4, maxHamming = 2)
          .select(col("id_a").as("src"), col("id_b").as("dst")))
      val newFp = ext.Dedup.simhashN(
        docs.filter(col("doc_id") % mod === (mod - 1)),
        col("doc_id"), col("text"), bits = 60).localCheckpoint(true)
      val newNew = ext.Dedup.simhashBandPairs(newFp,
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val newOld = ext.Dedup.simhashBandJoin(newFp, oldFp,
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val star = labels.filter(col("comp") =!= col("id"))
        .select(col("comp").as("src"), col("id").as("dst"))
      ext.Components.connectedComponentsWarm(
        docs.select(col("doc_id").as("id")),
        newNew.union(newOld).union(star), initial = labels)
    }

    def cnt(d: DataFrame) = d.count()
    val onlyCold = cnt(cold.exceptAll(warm))
    val onlyWarm = cnt(warm.exceptAll(cold))
    val n = cnt(cold)
    println(s"[cc-equiv] dir=$dir mod=$mod nodes=$n " +
      s"only_cold=$onlyCold only_warm=$onlyWarm " +
      (if (onlyCold == 0 && onlyWarm == 0) "EQUAL" else "MISMATCH"))
    spark.stop()
    if (onlyCold != 0 || onlyWarm != 0) sys.exit(1)
  }
}
