package graft

import org.apache.spark.sql.functions._

/** Dev-only: stage-level timing probe for q153's linkPrediction body
  * (optimization round 17 — guide §1, measure before changing).
  */
object DevQ153Probe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = "32", appName = "graft-q153probe")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[q153probe] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val li = Tables.table(spark, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e0 = li.select(col("o"), col("p").as("src"))
      .join(li.select(col("o"), col("p").as("dst")), "o")
      .filter(col("src") < col("dst"))
      .select(col("src"), col("dst"))
      .filter(col("src") < 10000 && col("dst") < 10000)
    val e = time("canonEdges+checkpoint") {
      e0.select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct().localCheckpoint(true)
    }
    val sym = e.select(col("a").as("z"), col("b").as("n"))
      .unionAll(e.select(col("b").as("z"), col("a").as("n")))
    val zw = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= 1000)
      .select(col("z"), (lit(1.0) / log(col("deg"))).as("w"))
    val wz = time("wz checkpoint") { sym.join(zw, "z").localCheckpoint(true) }
    // A: wedge fan-out, count only (no agg)
    time("wedge fanout count") {
      val n = wz.select(col("z"), col("n").as("x"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y")).count()
      println(s"[q153probe] wedges = $n")
    }
    // B: cn-only agg (no double sum)
    time("cand agg cn only (noop)") {
      wz.select(col("z"), col("n").as("x"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
        .write.format("noop").mode("overwrite").save()
    }
    // C: full cand agg (cn + aa)
    val cand = time("cand agg cn+aa (noop)") {
      val c = wz.select(col("z"), col("n").as("x"), col("w"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
      c.write.format("noop").mode("overwrite").save()
      c
    }
    // D: anti-join + top-500
    time("anti+top500 (noop)") {
      cand.join(e, col("x") === col("a") && col("y") === col("b"), "left_anti")
        .orderBy(col("cn").desc, col("x"), col("y"))
        .limit(500)
        .write.format("noop").mode("overwrite").save()
    }
    // E: single-long pairkey agg
    time("cand agg pairkey (noop)") {
      wz.select(col("z"), col("n").as("x"), col("w"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .select((col("x") * 100000L + col("y")).as("k"), col("w"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
        .select((col("k") / 100000L).cast("long").as("x"),
          (col("k") % 100000L).as("y"), col("cn"), col("aa"))
        .write.format("noop").mode("overwrite").save()
    }
    // F: distinct pair count (cardinality check)
    time("distinct pairs") {
      val n = wz.select(col("z"), col("n").as("x"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .select(col("x"), col("y")).distinct().count()
      println(s"[q153probe] distinct pairs = $n")
    }
    // G: top-500 by cn via count-only agg + TakeOrdered, then aa pass
    time("two-phase top500 (noop)") {
      val cn = wz.select(col("z"), col("n").as("x"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cn"))
        .join(e, col("x") === col("a") && col("y") === col("b"), "left_anti")
        .orderBy(col("cn").desc, col("x"), col("y"))
        .limit(500)
        .localCheckpoint(true)
      val aa = wz.select(col("z"), col("n").as("x"), col("w"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .join(broadcast(cn.select(col("x"), col("y"))), Seq("x", "y"))
        .groupBy(col("x"), col("y")).agg(sum(col("w")).as("aa"))
      cn.join(aa, Seq("x", "y"))
        .orderBy(col("cn").desc, col("x"), col("y"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
