package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Cdc, Layout}

/** Layout operators (Z-order clustering, compaction), dynamic partition
  * pruning over a partitioned sink, and the set-based CDC apply.
  */
class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val work = Files.createTempDirectory("graft_layout").toString

  private def li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("interleaveBits is the Morton curve on small inputs") {
    // (x=0b11, y=0b01) -> bits: z0=x0=1, z1=y0=1, z2=x1=1, z3=y1=0 -> 0b0111
    val r = Seq((3L, 1L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
      .head().getLong(0)
    assert(r === 7L)
  }

  test("z-order clustering preserves content exactly") {
    val clustered = Layout.clusterByZorder(li, Seq("l_partkey", "l_suppkey"), 8)
    assert(clustered.exceptAll(li).isEmpty && li.exceptAll(clustered).isEmpty)
  }

  test("z-order layout prunes point queries on the SECOND clustered column") {
    // the property single-column sort cannot give: a file skips a
    // point predicate on l_suppkey iff its (min,max) range misses the
    // point. Under partkey-only sort every file spans ~all suppkeys
    // (zero skipping); under z-order each file covers a bounded
    // suppkey sub-range, so most files are skippable.
    def filesContaining(path: String, supp: Int): Long =
      spark.read.parquet(path)
        .select(input_file_name().as("f"), col("l_suppkey"))
        .groupBy("f")
        .agg(min("l_suppkey").as("mn"), max("l_suppkey").as("mx"))
        .filter(col("mn") <= supp && col("mx") >= supp)
        .count()
    Layout.clusterByZorder(li, Seq("l_partkey", "l_suppkey"), 8)
      .write.mode("overwrite").parquet(s"$work/zorder")
    li.repartitionByRange(8, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$work/linear")
    // average over every suppkey point (sf0.001 suppkeys are 1-10)
    val probes = 1 to 10
    val zHits = probes.map(filesContaining(s"$work/zorder", _)).sum
    val lHits = probes.map(filesContaining(s"$work/linear", _)).sum
    assert(zHits < lHits * 0.75,
      s"z-order should let point queries skip files: z=$zHits files hit vs linear=$lHits")
  }

  test("compact bin-packs a many-small-files directory to the expected count") {
    val frag = s"$work/frag"
    li.repartition(40).write.mode("overwrite").parquet(frag)
    assert(spark.read.parquet(frag).inputFiles.length >= 40)
    val bytes = {
      import org.apache.hadoop.fs.{Path => HPath}
      val p = new HPath(frag)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).getContentSummary(p).getLength
    }
    val target = bytes / 4 + 1 // aim for ~4 files
    val n = Layout.compact(spark, frag, s"$work/compacted", target)
    assert(n >= 3 && n <= 5, s"expected ~4 output files, planned $n")
    val out = spark.read.parquet(s"$work/compacted")
    assert(out.inputFiles.length === n)
    assert(out.exceptAll(li).isEmpty && li.exceptAll(out).isEmpty)
  }

  test("partitioned sink + dim-filtered join triggers dynamic partition pruning") {
    val facts = spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
    facts.write.mode("overwrite").partitionBy("o_year").parquet(s"$work/orders_part")
    // the dim must be a REAL scan with a surviving Filter node: a
    // LocalRelation constant-folds the filter away and DPP's
    // selective-predicate check never fires
    (1995 to 2001).map(y => (y, if (y == 1996) "pick" else "skip"))
      .toDF("d_year", "tag").write.mode("overwrite").parquet(s"$work/dim_year")
    val dim = spark.read.parquet(s"$work/dim_year")
    val q = spark.read.parquet(s"$work/orders_part")
      .join(broadcast(dim.filter(col("tag") === "pick")), col("o_year") === col("d_year"))
      .groupBy("o_year").agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruningexpression"),
      s"expected DPP on the partitioned fact scan:\n$plan")
    assert(q.collect().map(_.getInt(0)).toSeq === Seq(1996))
  }

  test("applyChanges: latest change per key wins; deletes remove; inserts add") {
    val base = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30)).toDF("id", "name", "v")
    val changes = Seq(
      (2L, "b2", 21, "update", 1L),
      (2L, "b3", 22, "update", 2L), // latest for id=2 -> b3/22
      (3L, "c", 30, "delete", 1L),  // id=3 removed
      (4L, "d", 40, "insert", 1L),
      (5L, "e", 50, "insert", 1L),
      (5L, "e", 50, "delete", 2L)   // inserted then deleted -> absent
    ).toDF("id", "name", "v", "op", "seq")
    val out = Cdc.applyChanges(base, changes, Seq("id"), "op", col("seq"))
      .orderBy("id").collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(out.toSeq === Seq((1L, "a", 10), (2L, "b3", 22), (4L, "d", 40)))
  }

  test("HLL sketches: shard-sketch union estimate equals the whole-table sketch estimate") {
    import graft.ops.Sketches
    val docs = spark.read.parquet(s"$sf/orders.parquet")
    // per-status shards, merged back — the persist-then-merge pattern
    val merged = docs.groupBy("o_orderstatus")
      .agg(Sketches.hllSketch(col("o_custkey")).as("sk"))
      .agg(Sketches.hllEstimate(Sketches.hllMerge(col("sk"))).as("est"))
      .head().getLong(0)
    val direct = docs
      .agg(Sketches.hllEstimate(Sketches.hllSketch(col("o_custkey"))).as("est"))
      .head().getLong(0)
    assert(merged === direct, "sketch union must be lossless vs one-shot sketching")
    val exact = docs.select("o_custkey").distinct().count()
    assert(math.abs(merged - exact).toDouble / exact < 0.05,
      s"estimate $merged vs exact $exact beyond 5%")
  }

  test("distinctByRollup estimates per-rollup uniques within error") {
    import graft.ops.Sketches
    val orders = spark.read.parquet(s"$sf/orders.parquet")
    val est = Sketches.distinctByRollup(
      orders, shard = Seq("o_orderstatus"), rollup = Seq("o_orderpriority"),
      col("o_custkey"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = orders.groupBy("o_orderpriority")
      .agg(countDistinct("o_custkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(est(k) - n).toDouble / n < 0.05, s"$k: est ${est(k)} vs exact $n")
    }
  }

  test("applyChanges is idempotent: re-applying the same changelog is a no-op") {
    val base = Seq((1L, "a", 10), (2L, "b", 20)).toDF("id", "name", "v")
    val changes = Seq((2L, "b2", 21, "update", 1L), (9L, "z", 90, "insert", 1L))
      .toDF("id", "name", "v", "op", "seq")
    val once = Cdc.applyChanges(base, changes, Seq("id"), "op", col("seq"))
    val twice = Cdc.applyChanges(once, changes, Seq("id"), "op", col("seq"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }
}
