package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-side half of the X1 story (the
  * reference's B-tree indexes, `/root/reference/migration.py:80-103`,
  * become physical layout that lets parquet footer stats and partition
  * directories prune reads):
  *
  *  - [[zorderKey]] / [[clusterByZorder]] — multi-column clustering via
  *    a Z-order (Morton) curve. Range-partition+sort on ONE column
  *    prunes reads on that column only; interleaving the bits of N
  *    rank-normalized columns gives every one of them locality, so
  *    point/range predicates on ANY clustered column skip most row
  *    groups. This is the standard lakehouse answer (Delta OPTIMIZE
  *    ZORDER, Iceberg sort orders) rebuilt from public bit arithmetic —
  *    entirely codegen'd built-ins, one stats pass + one range shuffle.
  *  - [[compact]] — small-file compaction: bin-packs a directory's
  *    parquet files into ~`targetBytes` outputs. Small files are the
  *    silent killer of 100 TB scans (every file is a task + a footer
  *    fetch + an open); streaming sinks and per-partition appends
  *    produce them constantly.
  *
  * Z-order correctness note: the curve only CLUSTERS — it never changes
  * row content, so any query over a z-ordered copy returns identical
  * results (asserted in LayoutSpec), and the operator composes with
  * [[graft.pipeline.Healthcare.writeIdempotent]]'s range layout.
  */
object Layout {

  /** Interleave the low `bitsPerCol` bits of already-normalized
    * non-negative long columns: result bit (j*n + i) = bit j of col i.
    * Pure bitwise built-ins — codegen'd, no UDF, no shuffle.
    */
  def interleaveBits(norm: Seq[Column], bitsPerCol: Int): Column = {
    require(norm.nonEmpty && norm.size * bitsPerCol <= 63,
      s"${norm.size} cols x $bitsPerCol bits must fit in a signed long")
    val n = norm.size
    val terms = for {
      j <- 0 until bitsPerCol
      (c, i) <- norm.zipWithIndex
    } yield shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), j * n + i)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Z-order key over numeric columns, each min/max-normalized to
    * `bitsPerCol` bits using the supplied per-column (min, max) stats
    * (gather them with ONE `agg(min, max, ...)` pass — the caller holds
    * them so repeated writes can reuse frozen stats and keep keys
    * stable across incremental runs). Nulls sort first (key 0 in that
    * dimension's contribution).
    */
  def zorderKey(cols: Seq[Column], stats: Seq[(Double, Double)], bitsPerCol: Int = 16): Column = {
    require(cols.size == stats.size, "one (min,max) pair per column")
    val top = (1L << bitsPerCol) - 1
    val norm = cols.zip(stats).map { case (c, (mn, mx)) =>
      val range = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
      // explicit floor, not a truncating cast: engines disagree on
      // double->int cast semantics (round vs truncate); floor is floor
      // everywhere, so the key is reproducible outside Spark
      val scaled = floor(((coalesce(c.cast("double"), lit(mn)) - mn) / range) * top)
      least(greatest(scaled.cast("long"), lit(0L)), lit(top))
    }
    interleaveBits(norm, bitsPerCol)
  }

  /** One-pass (min, max) stats for [[zorderKey]]. Fails with a clear
    * message (not a bare NullPointerException) on an empty input or an
    * all-null clustered column — both routine in per-partition
    * maintenance jobs and both meaningless to Z-order.
    */
  def minMaxStats(df: DataFrame, cols: Seq[String]): Seq[(Double, Double)] = {
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"mn_$c"), max(col(c).cast("double")).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.indices.map { i =>
      require(!row.isNullAt(2 * i) && !row.isNullAt(2 * i + 1),
        s"minMaxStats: column '${cols(i)}' has no non-null values " +
          "(empty input or all-null column) — nothing to cluster on")
      (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }
  }

  /** Cluster `df` along the Z-order curve of `cols`: range-partition on
    * the curve key (contiguous curve segments per output file), sort
    * within partitions, drop the key. Each output file then covers a
    * small hyper-rectangle of the clustered columns, so parquet min/max
    * stats prune reads filtered on ANY of them.
    */
  def clusterByZorder(
      df: DataFrame, cols: Seq[String],
      numPartitions: Int, bitsPerCol: Int = 16): DataFrame = {
    val z = zorderKey(cols.map(col), minMaxStats(df, cols), bitsPerCol)
    df.withColumn("__z", z)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Compact a parquet directory into ~`targetBytes` files at `outPath`.
    * File count = ceil(on-disk bytes / target) — computed from the
    * FileSystem listing (no data pass); the rewrite itself is one scan
    * + one round-robin shuffle. At 100 TB this runs per-partition (pass
    * the partition directory), never over the whole table at once.
    *
    * Reads the data from `inPath` itself (no DataFrame parameter): the
    * bin-packing math is sized from `inPath`'s listing, so letting a
    * caller pass a filtered or unrelated frame would make the file
    * sizing silently wrong.
    */
  def compact(
      spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    import org.apache.hadoop.fs.{Path => HPath}
    val p = new HPath(inPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartition(nFiles).write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
