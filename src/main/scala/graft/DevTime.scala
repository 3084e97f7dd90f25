package graft

/** Dev-only timing harness (not part of the driver contract). */
object DevTime {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
    val spark = Engine.session(cores = "32", appName = "graft-devtime")
    val runs = sys.env.getOrElse("GRAFT_DEVTIME_RUNS", "3").toInt
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val times = (1 to runs).map { i =>
        // Standalone-cost discipline (r17 verdict item 1): clear the
        // session derived-frame memos so every run pays its own shared
        // prep, like a fresh session would. GRAFT_DEVTIME_KEEP_MEMO=1
        // opts back into warm-consumer timing.
        if (!sys.env.contains("GRAFT_DEVTIME_KEEP_MEMO"))
          graft.ext.SessionMemo.clearAllAndUnpersist(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[devtime] $n run$i $dt%.2f s")
        dt
      }
      println(f"[devtime] $n min ${times.min}%.2f s " +
        f"median ${times.sorted.apply(times.length / 2)}%.2f s")
    }
    spark.stop()
  }
}
