package graft

import org.apache.spark.sql.functions._

/** Dev-only stage profiler for q97 (r11: where does the ~1 s go?). */
object DevProbe97 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Engine.session(cores = "32", appName = "graft-probe97")
    def time(name: String)(f: => Long): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-44s min ${ts.min}%.2f s")
    }
    val orders = Tables.table(spark, dir, "orders")
    time("orders scan (2 cols, count)") {
      orders.select(col("o_orderpriority"), col("o_custkey")).count()
    }
    time("md5 only") {
      orders.select(md5(col("o_custkey").cast("string")).as("hx"))
        .agg(count(col("hx"))).collect()(0).getLong(0)
    }
    time("register file (groupBy prio,reg)") {
      graft.ops.Sketches.hllPortableRegisters(
        orders, Seq("o_orderpriority"), col("o_custkey")).count()
    }
    time("full q97") {
      SparkEntry.queries("q97_hll_rollup")(spark, dir).count()
    }
    time("q97 build+plan only (no exec)") {
      val df = SparkEntry.queries("q97_hll_rollup")(spark, dir)
      df.queryExecution.executedPlan
      1L
    }
    time("q97 build+noop (the DevTime shape)") {
      SparkEntry.queries("q97_hll_rollup")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      1L
    }
    spark.stop()
  }
}
