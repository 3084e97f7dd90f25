package graft

/** CDC chunker equivalence: the production byte-scan path
  * (`mapPartitions` over raw UTF-8 bytes, one row per chunk) must be
  * row-for-row identical to the relational per-character form the
  * DuckDB oracle mirrors — on the real fixtures AND on adversarial
  * synthetic payloads (boundary at the very first eligible position,
  * back-to-back boundaries, no boundary at all, short docs below the
  * 8-byte window, non-ASCII text exercising the char-window
  * fallback). With this equality, the q289 oracle certificate
  * transfers to the byte path transitively.
  */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def collectChunks(df: org.apache.spark.sql.DataFrame) =
    df.select("source", "doc_id", "chunk_idx", "n_bytes", "h").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSet

  test("byte-scan CDC chunks == relational CDC chunks on the fixture corpus") {
    val rel = collectChunks(graft.ext.Multimodal.cdcChunksRelational(spark, sf))
    val fast = collectChunks(graft.ext.Multimodal.cdcChunksByteScan(spark, sf))
    assert(fast == rel)
    assert(rel.nonEmpty)
    // The corpus must exercise multi-chunk docs or the equality is weak.
    val maxIdx = rel.map(_._3).max
    assert(maxIdx >= 3, s"fixture docs barely chunk (max idx $maxIdx)")
  }

  test("byte-scan CDC chunks == relational on adversarial synthetic payloads") {
    // Find single chars whose repeated 8-window md5 starts with '0' to
    // force dense back-to-back boundaries, plus windows that never
    // fire; build docs covering each edge shape.
    val md = java.security.MessageDigest.getInstance("MD5")
    def fires(s8: String): Boolean =
      (md.digest(s8.getBytes("UTF-8"))(0) & 0xf0) == 0
    val dense = ('a' to 'z').map(_.toString * 8).find(fires)
      .getOrElse(fail("no dense char found")).substring(0, 1)
    val quiet = ('a' to 'z').map(_.toString * 8).filterNot(fires).head.head
    val docsLocal = Seq(
      (0L, dense * 24),                      // boundary at every p >= 8
      (1L, quiet.toString * 40),             // no boundary ever
      (2L, quiet.toString * 7),              // below the window: one chunk
      (3L, dense * 8 + quiet * 9 + dense * 8), // boundary runs then silence
      (4L, "héllo wörld ünïcode påyload " * 4), // non-ASCII fallback path
      (5L, quiet.toString * 7 + dense * 9)   // first boundary at p == 8+
    )
    val df = docsLocal.toDF("doc_id", "text")
      .selectExpr("'synthetic' AS source", "doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_cdc_eq").toString
    df.selectExpr("doc_id", "text", "'xx' AS lang", "'synthetic' AS source",
        "CAST(length(text) AS LONG) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rel = collectChunks(graft.ext.Multimodal.cdcChunksRelational(spark, dir))
    val fast = collectChunks(graft.ext.Multimodal.cdcChunksByteScan(spark, dir))
    assert(fast == rel)
    // The shapes must actually occur: a doc with many chunks, a doc
    // with exactly one, and the non-ASCII doc present in both frames.
    val perDoc = rel.groupBy(_._2).view.mapValues(_.size).toMap
    assert(perDoc(0L) > 10, s"dense doc under-chunked: ${perDoc(0L)}")
    assert(perDoc(1L) == 1 && perDoc(2L) == 1)
    assert(perDoc.contains(4L))
  }
}
