package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Sources

/** Interchange sources (SURVEY §2.2): JSONL + ORC round-trips with
  * explicit schemas, corrupt-line quarantine, and proof that ORC gets
  * the same pushdown/pruning treatment as parquet.
  */
class SourcesSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def tmp(name: String): String =
    Files.createTempDirectory(s"graft-$name").toString

  private def orders = spark.read.parquet(s"$dir/orders.parquet")

  test("JSONL round-trip preserves rows, nulls, dates and doubles") {
    val out = tmp("jsonl")
    Sources.writeJsonl(orders, out)
    val back = Sources.readJsonl(spark, out, orders.schema)
    assert(back.schema === orders.schema)
    assert(back.count() === orders.count())
    // exceptAll in both directions = exact multiset equality
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
    // null preservation: same per-column null counts
    val nulls = (df: org.apache.spark.sql.DataFrame) =>
      df.select(df.columns.map(c => count(when(col(c).isNull, 1)).as(c)): _*)
        .collect().head.toSeq
    assert(nulls(back) === nulls(orders))
  }

  test("permissive JSONL read quarantines corrupt lines instead of failing") {
    val out = tmp("jsonl-bad")
    Sources.writeJsonl(orders.limit(10), out)
    // drop a malformed producer file into the landing dir (a separate
    // file, not an edit of a part file — Hadoop's .crc sidecar would
    // reject the latter before the JSON parser ever saw it)
    Files.writeString(new java.io.File(out, "bad-producer.json").toPath,
      "{not json at all\n")
    // cache first: Spark disallows queries whose only referenced column
    // is the internal corrupt-record column on an uncached raw read
    val back = Sources.readJsonlPermissive(spark, out, orders.schema).cache()
    try {
      assert(back.count() === 11)
      assert(back.filter(col("_corrupt_record").isNotNull).count() === 1)
      assert(back.filter(col("_corrupt_record").isNull).count() === 10)
    } finally back.unpersist()
  }

  test("ORC round-trip preserves rows and schema") {
    val out = tmp("orc")
    Sources.writeOrc(orders, out)
    val back = Sources.readOrc(spark, out, orders.schema)
    assert(back.schema === orders.schema)
    assert(back.exceptAll(orders).isEmpty && orders.exceptAll(back).isEmpty)
  }

  test("ORC scan gets predicate pushdown and column pruning like parquet") {
    val out = tmp("orc-push")
    Sources.writeOrc(orders, out)
    val q = Sources.readOrc(spark, out, orders.schema)
      .filter(col("o_orderkey") === 42L)
      .select("o_orderkey", "o_totalprice")
    val plan = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"),
      s"pushdown missing:\n$plan")
    assert(plan.contains("ReadSchema: struct<o_orderkey:bigint,o_totalprice:double>"),
      s"pruning missing:\n$plan")
  }

  test("schema evolution: merged read unions columns, old files yield nulls") {
    import spark.implicits._
    val path = tmp("evolve")
    // epoch 1: two columns
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("overwrite").parquet(path)
    // epoch 2: a column added — appended files carry the wider schema
    Seq((3L, "c", 30.0)).toDF("id", "name", "score")
      .write.mode("append").parquet(path)
    val merged = Sources.readParquetEvolved(spark, path)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    val rows = merged.orderBy("id")
      .collect().map(r => (r.getLong(0), Option(r.get(2)))).toSeq
    assert(rows === Seq((1L, None), (2L, None), (3L, Some(30.0))))
    // pinned read: same data without per-query footer merging
    val pinned = Sources.readParquetEvolved(spark, path, Some(merged.schema))
    assert(pinned.exceptAll(merged).isEmpty && merged.exceptAll(pinned).isEmpty)
  }
}
