package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only: q108/q300 gram-pipeline variants (optimization r17). */
object DevGramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = "32", appName = "graft-gramprobe")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gramprobe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = Tables.table(spark, dir, "documents")
    def g = d
      .select(col("doc_id"), col("source"),
        graft.ext.TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("doc_id"), col("source"),
        explode_outer(graft.ext.Dedup.shinglesKAll(col("ws"), 10)).as("gram"))
      .filter(col("gram").isNotNull)

    // current q108 shape: counts agg + join back (2 explodes)
    (1 to 2).foreach { i =>
      time(s"q108 current r$i") {
        val gg = g.select(col("doc_id"), col("gram"))
        val counts = gg.groupBy(col("gram")).agg(count(lit(1)).as("n"))
        gg.join(counts, "gram")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_grams"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"q108 window r$i") {
        val gg = g.select(col("doc_id"), col("gram"))
        val w = Window.partitionBy(col("gram"))
        gg.withColumn("n", count(lit(1)).over(w))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_grams"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"q300 current r$i") {
        val gs = g.select(col("source"), col("gram"))
        val counts = gs.groupBy(col("gram")).agg(count(lit(1)).as("n"))
        gs.join(counts, "gram")
          .groupBy("source")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_grams"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"q300 window r$i") {
        val gs = g.select(col("source"), col("gram"))
        val w = Window.partitionBy(col("gram"))
        gs.withColumn("n", count(lit(1)).over(w))
          .groupBy("source")
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_grams"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"q300 twolevel r$i") {
        val gs = g.select(col("source"), col("gram"))
        val cnt = gs.groupBy(col("gram"), col("source"))
          .agg(count(lit(1)).as("k"))
        val w = Window.partitionBy(col("gram"))
        cnt.withColumn("n", sum(col("k")).over(w))
          .groupBy("source")
          .agg(sum(col("k")).as("n_grams"),
            sum(when(col("n") > 1, col("k")).otherwise(0L)).as("dup_grams"))
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
