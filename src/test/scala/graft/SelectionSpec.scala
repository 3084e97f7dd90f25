package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ext.Selection

/** DSIR importance-resampling family: full integer replays of the
  * bucket-weight table and the doc scores, the portable-hash pin, and
  * the per-bucket e4 rounding margins the float discipline requires
  * (CLAUDE.md: never hash-compare a rounded double without measuring
  * the boundary margin) — at BOTH the spec fixture (sf0.001) and the
  * driver-gate fixture (sf0.01; the documents table is 500 rows, so
  * the sf0.01 replay is cheap enough to run in CI).
  */
class SelectionSpec extends SparkTestBase {
  import spark.implicits._

  private val B = Selection.B

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(w: String): Long =
    java.lang.Long.parseLong(md5hex(w).substring(0, 8), 16) % B

  private case class Doc(id: Long, source: String, words: Seq[String])

  private def docsOf(sf: String): Seq[Doc] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"source", $"text").collect().toSeq
      .map(r => Doc(r.getLong(0), r.getString(1),
        r.getString(2).split(" ", -1).toSeq))

  /** Driver-side replay of the weight table: (b -> (ct, cr, ratio_e4))
    * plus the raw (unrounded) ratio doubles for margin measurement.
    */
  private def replayWeights(docs: Seq[Doc])
      : (Map[Long, (Long, Long, Long)], Map[Long, Double]) = {
    val tgt = Selection.targetSources.toSet
    val byBucket = docs.flatMap(d => d.words.map(w => (bucket(w), tgt(d.source))))
      .groupBy(_._1)
    val counts = byBucket.view.mapValues { g =>
      val ct = g.count(_._2).toLong
      (ct, g.size.toLong - ct)
    }.toMap
    val nt = counts.values.map(_._1).sum
    val nr = counts.values.map(_._2).sum
    val raw = counts.map { case (b, (ct, cr)) =>
      b -> (math.log((ct + 1.0) / (nt + B.toDouble))
        - math.log((cr + 1.0) / (nr + B.toDouble)))
    }
    val table = counts.map { case (b, (ct, cr)) =>
      b -> (ct, cr, math.round(raw(b) * 10000))
    }
    (table, raw)
  }

  test("bucket(): portable md5 hash matches the Spark-side expression") {
    val words = Seq("hello", "the", "zebra", "42", "")
    val got = words.toDF("w").select(Selection.bucket($"w").as("b"))
      .as[Long].collect().toSeq
    assert(got === words.map(bucket))
  }

  for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    val tag = sf.split("/").last

    test(s"q227 weights: exact replay at $tag") {
      val (expected, _) = replayWeights(docsOf(sf))
      val got = Selection.q227(spark, sf).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expected)
    }

    test(s"q227 weights: every bucket's e4 rounding margin is wide at $tag") {
      // The only drift source is ln (one-ulp libm differences, ~1e-12
      // in e4 units at these magnitudes). Any margin above 1e-6 gives
      // six orders of headroom.
      val (_, raw) = replayWeights(docsOf(sf))
      val minMargin = raw.values.map { x =>
        val frac = math.abs(x * 10000) % 1.0
        math.abs(frac - 0.5)
      }.min
      assert(minMargin > 1e-6, s"min margin $minMargin")
    }

    test(s"q228 select: exact score replay, raw-only, total order at $tag") {
      val docs = docsOf(sf)
      val (table, _) = replayWeights(docs)
      val tgt = Selection.targetSources.toSet
      val expected = docs.filterNot(d => tgt(d.source)).map { d =>
        val tf = d.words.groupBy(bucket).view.mapValues(_.size.toLong)
        val score = tf.map { case (b, n) => n * table(b)._3 }.sum
        (d.id, d.source, d.words.size.toLong, score)
      }.sortBy { case (id, _, _, s) => (-s, id) }.take(50)
      val got = Selection.q228(spark, sf).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expected)
      assert(got.forall(r => !tgt(r._2)))
      assert(got.map(_._4) === got.map(_._4).sorted(Ordering[Long].reverse))
    }
  }
}
