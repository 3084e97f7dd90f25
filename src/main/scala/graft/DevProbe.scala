package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the one-pass explode workloads the r9
  * verdict asked to chase (q240 winnowing, q290 Good-Turing): times
  * each pipeline stage in isolation so "intrinsic vs fixable" is a
  * measurement, not a guess. Not part of the driver contract.
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = "32", appName = "graft-devprobe")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val docs = Tables.table(spark, dir, "documents")

    // ---- q290 stages
    val toks = docs.select(split(col("text"), " ").as("ws"))
    time("q290 tokenize only") {
      toks.select(size(col("ws")).as("n")).agg(sum("n")).collect()(0).getLong(0)
    }
    val tris = docs.select(explode(
      graft.ext.Dedup.shinglesKAll(
        graft.ext.TextAnalysis.tokens(col("text")), 3)).as("tri"))
    time("q290 trigram explode (count only)") { tris.count() }
    val triCounts = tris.groupBy("tri").agg(count(lit(1)).as("r"))
    time("q290 + groupBy(tri) [string shuffle]") { triCounts.count() }
    val triHashed = tris
      .select(conv(substring(md5(col("tri")), 1, 15), 16, 10)
        .cast("long").as("h"))
      .groupBy("h").agg(count(lit(1)).as("r"))
    time("q290 alt: md5-hash then groupBy(h)") { triHashed.count() }
    time("q290 full registry entry") {
      SparkEntry.queries("q290_good_turing")(spark, dir).count()
    }

    // ---- explode-shape alternatives (the 3.3 s lives in the
    // generator expression, not the shuffle — find the fast shape)
    val ws0 = split(col("text"), " ")
    time("alt A: explode positions, concat after") {
      docs.select(col("doc_id"), ws0.as("ws"))
        .select(col("doc_id"), col("ws"),
          posexplode(sequence(lit(1), greatest(size(col("ws")) - 2, lit(0))))
            .as(Seq("pos", "i")))
        .select(concat_ws(" ", element_at(col("ws"), col("i")),
          element_at(col("ws"), col("i") + 1),
          element_at(col("ws"), col("i") + 2)).as("tri"))
        .count()
    }
    time("alt B: zip_with-free arrays_zip slice") {
      docs.select(ws0.as("ws"))
        .select(explode(zip_with(
          slice(col("ws"), lit(1), greatest(size(col("ws")) - 2, lit(0))),
          zip_with(slice(col("ws"), lit(2), greatest(size(col("ws")) - 1, lit(0))),
            slice(col("ws"), lit(3), size(col("ws"))),
            (b, c) => concat(b, lit(" "), c)),
          (a, bc) => concat(a, lit(" "), bc))).as("tri"))
        .count()
    }
    time("alt C: transform but explode precomputed column") {
      val sh = transform(sequence(lit(1), greatest(size(col("ws")) - 2, lit(0))),
        i => concat_ws(" ", element_at(col("ws"), i),
          element_at(col("ws"), i + 1), element_at(col("ws"), i + 2)))
      docs.select(ws0.as("ws")).select(sh.as("sh"))
        .select(explode(col("sh")).as("tri")).count()
    }

    // ---- q240 stages
    val ws = split(col("text"), " ")
    val sh3 = when(size(ws) >= 3,
      transform(sequence(lit(1), size(ws) - 2), i =>
        concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
          element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))
    val g = docs.select(col("doc_id"), posexplode(sh3).as(Seq("pos", "sh")))
    time("q240 shingle explode (count only)") { g.count() }
    val h = g.select(col("doc_id"), col("pos"),
      conv(substring(md5(col("sh")), 1, 10), 16, 10).cast("long").as("h40"))
    time("q240 + md5 h40") { h.agg(sum("h40")).count() }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 3)
    time("q240 + doc window min") {
      h.withColumn("wmin", min(col("h40")).over(w)).agg(sum("wmin")).count()
    }
    time("q240 full registry entry") {
      SparkEntry.queries("q240_winnowing")(spark, dir).count()
    }
    spark.stop()
  }
}
