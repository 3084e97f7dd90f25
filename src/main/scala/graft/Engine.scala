package graft

import org.apache.spark.sql.SparkSession

/** Single place that builds a correctly-configured SparkSession so every
  * entry point (Verify, Bench, pipeline mains, tests) agrees on the
  * settings that affect semantics:
  *
  *  - UTC session timezone (oracle parity with DuckDB);
  *  - AQE on (runtime re-plan: broadcast-when-small, skew splitting,
  *    partition coalescing — the 100 TB levers);
  *  - `spark.sql.legacy.parquet.nanosAsLong=true` at SESSION BUILD time
  *    (events.parquet carries TIMESTAMP(NANOS), which Spark 4.x refuses
  *    to read otherwise; setting it per-read mutated shared session state
  *    mid-query — SURVEY §2.5);
  *  - shuffle partitions sized to the local core count, not the 200
  *    default (on a real cluster this is sized to executor count ×
  *    cores; AQE coalesces downward from there).
  */
object Engine {

  def session(
      cores: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"),
      appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .appName(appName)
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // Codegen class cache (STATIC conf — bind at build time).
      // Hypothesis was that the Spark default of 100 compiled classes
      // thrashes under a 432-query suite (every generated stage
      // recompiles via Janino every sweep round); the r18 controlled
      // A/B (two RUNS=2 mini-sweeps, identical code, cache 100 vs
      // 5000) measured NO win — geomean 0.98, total 388.7 s vs 394.9 s,
      // differences inside block-phase noise. Janino compile cost is
      // evidently not a per-query bottleneck at this suite's plan
      // sizes, so the Spark default stays; the env lever remains for
      // re-testing on other hosts.
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "100"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
