package graft

/** Dev-only: print the formatted physical plan + timing of one query. */
object DevExplain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Engine.session(cores = "32", appName = "graft-explain")
    val df = SparkEntry.queries(name)(spark, dir)
    df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    println(f"[explain] $name took ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
