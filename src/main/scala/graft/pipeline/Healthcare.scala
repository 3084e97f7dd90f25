package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Engine
import graft.ops._

/** M1 — run metrics, the Spark analog of the reference's logged
  * pre/post statistics and created/total counters
  * (`migration.py:135-142,240-251`).
  */
final case class RunMetrics(
    inputRows: Long,
    nullNames: Long,
    nullAdmitDates: Long,
    dupRows: Long,
    afterDedupRows: Long,
    patientsCreated: Long,
    admissionsCreated: Long,
    patientsTotal: Long,
    admissionsTotal: Long,
    elapsedSec: Double)

/** The reference's entire ETL program (`migration.py:105-251`) as ONE
  * declarative Spark job — SURVEY §2.3's dataflow DAG:
  *
  *   csv_scan → rename → profile (side output) → drop_duplicates
  *     → patients  = clean-name dim, first-wins dedup, surrogate key
  *     → admissions = date-parse fact, FK join, first-wins keyed dedup
  *     → idempotent write (overwrite | anti-join append) → post-stats
  *
  * vs the reference's per-row N+1 Mongo RPC loop: every step here is a
  * set operation — the dim dedup is one shuffle, the FK resolution one
  * broadcast join, the existence check one anti join. At 100 TB the only
  * shuffles are the two keyed dedups and (if the dim outgrows the
  * broadcast threshold) the FK join; AQE handles skewed natural keys.
  */
object Healthcare {

  /** Explicit input schema (SURVEY §1.4: no inferSchema on correctness
    * paths). Raw headers as in the Kaggle CSV; dates stay string until
    * parseDate so malformed values null-propagate like the reference.
    */
  val csvSchema: StructType = StructType(Seq(
    StructField("Name", StringType),
    StructField("Age", IntegerType),
    StructField("Gender", StringType),
    StructField("Blood Type", StringType),
    StructField("Medical Condition", StringType),
    StructField("Date of Admission", StringType),
    StructField("Doctor", StringType),
    StructField("Hospital", StringType),
    StructField("Insurance Provider", StringType),
    StructField("Billing Amount", DoubleType),
    StructField("Room Number", IntegerType),
    StructField("Admission Type", StringType),
    StructField("Discharge Date", StringType),
    StructField("Medication", StringType),
    StructField("Test Results", StringType)))

  val patientKey: Seq[String] = Seq("name", "age", "gender", "blood_type")
  val admissionKey: Seq[String] =
    Seq("patient_sk", "date_of_admission", "hospital", "room_number")

  /** S1 — CSV scan with the reference's null semantics (empty field →
    * NULL, `migration.py:61,76`), plus an explicit ingest-order column.
    *
    * "First-wins" (§7.4.2) needs file order, which distributed Spark
    * does not carry implicitly. `monotonically_increasing_id` is
    * (partitionId << 33) + offset: for a single-file scan the splits are
    * byte ranges in offset order, so ORDERING by the id equals file
    * order at any split granularity — no extra pass over the data, no
    * driver involvement, scale-safe. (Multi-file ingest would add an
    * `input_file_name` tiebreak first.)
    */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema(csvSchema)
      .option("header", "true")
      .option("nullValue", "")
      .csv(path)
      .withColumn("_ingest_ord", monotonically_increasing_id())

  /** P1-P4 side output over one cached pass (the reference computes all
    * stats on the same in-memory frame, `migration.py:135-139`).
    */
  def profile(df: DataFrame): (Long, Long, Long, Long) = {
    val stats = df.agg(
      count(lit(1)).as("n"),
      (count(lit(1)) - count(col("name"))).as("null_names"),
      (count(lit(1)) - count(col("date_of_admission"))).as("null_admits")
    ).head()
    val dups = dupRowCount(df.drop("_ingest_ord")).head().getLong(0)
    (stats.getLong(0), stats.getLong(1), stats.getLong(2), dups)
  }

  /** Patients dim (`migration.py:154-189`): clean name, first-wins dedup
    * on the natural key, deterministic surrogate key.
    */
  def patients(clean: DataFrame): DataFrame =
    dedupFirstWinsAgg(
      clean.select(
        cleanName(col("name")).as("name"),
        col("age"), col("gender"), col("blood_type"), col("_ingest_ord")),
      key = patientKey,
      order = Seq(col("_ingest_ord")))
      .transform(withSurrogateKey(_, "patient_sk", patientKey))
      .select("patient_sk", "name", "age", "gender", "blood_type")

  /** Admissions fact (`migration.py:191-231`): parse dates, resolve the
    * patient FK through the dim (broadcast — the dim is the deduped key
    * set, small relative to the fact), first-wins dedup on the admission
    * key.
    */
  def admissions(clean: DataFrame, dim: DataFrame): DataFrame = {
    val facts = clean.select(
      cleanName(col("name")).as("name"),
      col("age"), col("gender"), col("blood_type"),
      col("medical_condition"),
      parseDate(col("date_of_admission")).as("date_of_admission"),
      col("doctor"), col("hospital"), col("insurance_provider"),
      col("billing_amount"), col("room_number"), col("admission_type"),
      parseDate(col("discharge_date")).as("discharge_date"),
      col("medication"), col("test_results"), col("_ingest_ord"))
    resolveFk(facts, dim.select((patientKey :+ "patient_sk").map(col): _*), patientKey,
      nullSafeKeys = true)
      .transform(dedupFirstWinsAgg(_, admissionKey, Seq(col("_ingest_ord"))))
      .transform(withSurrogateKey(_, "admission_sk", admissionKey))
      .select("admission_sk", "patient_sk", "medical_condition",
        "date_of_admission", "doctor", "hospital", "insurance_provider",
        "billing_amount", "room_number", "admission_type", "discharge_date",
        "medication", "test_results")
  }

  /** W1/W2 + J2 — idempotent write. Overwrite truncates (the
    * `DROP_COLLECTIONS=true` path, `migration.py:124-127`); append
    * anti-joins against the CURRENT sink state first
    * (`find_one`-before-insert, `migration.py:179-212`), correctly
    * treating a missing sink as empty (first run).
    *
    * X1 layout — the Spark fate of the reference's compound B-tree
    * indexes (`migration.py:80-103`): rows are range-partitioned and
    * sorted by the index columns before writing, so parquet row-group
    * min/max stats prune reads on those columns at 100 TB (the same read
    * paths the Mongo indexes served).
    */
  /** Marker file recording which surrogate-key derivation a sink was
    * written under (K1 versioning contract, `ops.surrogateKeyVersion`).
    * An append against a sink keyed under a DIFFERENT derivation would
    * pass the anti-join for every row (old keys never match new keys)
    * and silently duplicate the whole sink — fail fast instead.
    */
  private val KeyVersionMarker = "_graft_key_version"

  private def checkKeyVersion(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val dir = new HPath(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new HPath(dir, KeyVersionMarker)
    if (fs.exists(marker)) {
      val found = {
        val in = fs.open(marker)
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      }
      require(found == surrogateKeyVersion.toString,
        s"sink $path was written under surrogate-key version $found but this build derives " +
          s"version ${surrogateKeyVersion} — appending would duplicate every row. " +
          "Re-run with overwrite to re-key the sink.")
    } else {
      // A populated sink with NO marker is exactly the unknown-provenance
      // case the K1 hazard describes (written before key versioning, or
      // by another tool) — the version check can't protect it. Warn
      // loudly rather than silently assuming the current derivation;
      // the append still runs (the marker is stamped after the write,
      // so the sink is protected from here on).
      System.err.println(
        s"[graft] WARNING: sink $path has no $KeyVersionMarker marker — " +
          "key provenance unknown; appending assumes the current key " +
          s"version ${surrogateKeyVersion}. Overwrite to re-key if unsure.")
    }
  }

  private def stampKeyVersion(spark: SparkSession, path: String): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    val dir = new HPath(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(new HPath(dir, KeyVersionMarker), true)
    try out.write(s"${surrogateKeyVersion}\n".getBytes("UTF-8"))
    finally out.close()
  }

  /** @return (createdRows, totalRowsAfterWrite). The delta is persisted
    *   (DISK_ONLY — it is about to be written anyway, so burning executor
    *   memory on a MEMORY_AND_DISK copy of the full output buys nothing)
    *   and counted ONCE; the post-write total is `before + created` — no
    *   re-scan of the full sink after every write (at 100 TB that scan
    *   costs more than the write itself), and no second execution of the
    *   upstream plan for the count.
    *
    *   SINGLE-WRITER ASSUMPTION: `before + created` is the observed total
    *   only if no other writer appends between the `before` count and the
    *   write — the same assumption the reference's count-then-insert loop
    *   makes (`migration.py:240-249`). Under concurrent writers, re-scan
    *   the sink when a strict total is needed.
    */
  def writeIdempotent(
      df: DataFrame, path: String, key: Seq[String], overwrite: Boolean): (Long, Long) = {
    val spark = df.sparkSession
    val existing: Option[DataFrame] =
      if (overwrite) None
      else scala.util.Try(spark.read.parquet(path)).toOption
    if (existing.isDefined) checkKeyVersion(spark, path)
    val before = existing.fold(0L)(_.count())
    val delta = existing.fold(df)(ex => antiExisting(df, ex, key))
    val createdRows = delta
      .repartitionByRange(col(key.head))
      .sortWithinPartitions(key.map(col): _*)
    createdRows.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val created = createdRows.count()
      createdRows.write
        .mode(if (overwrite) SaveMode.Overwrite else SaveMode.Append)
        .parquet(path)
      // stamp AFTER the write: overwrite mode replaces the directory,
      // which would wipe a pre-write marker
      stampKeyVersion(spark, path)
      (created, before + created)
    } finally createdRows.unpersist()
  }

  /** Run the full DAG; returns the post-stats the reference logs. */
  def run(spark: SparkSession, config: PipelineConfig): RunMetrics = {
    val t0 = System.nanoTime()
    val raw = normalizeColumnNames(readCsv(spark, config.csvPath))
    raw.persist()
    val (n, nullNames, nullAdmits, dupRows) = profile(raw)

    // Full-row dedup must keep the FIRST copy's _ingest_ord —
    // dropDuplicates keeps an ARBITRARY copy, which could hand a later
    // ord to the downstream first-wins dedups. Persisted because the dim
    // build, fact build, and count all reuse it.
    val deduped = dedupFirstWinsAgg(
      raw,
      key = raw.columns.filter(_ != "_ingest_ord").toIndexedSeq,
      order = Seq(col("_ingest_ord")))
    deduped.persist()
    val dim = patients(deduped)
    dim.persist() // used twice: own write + FK resolution
    val fact = admissions(deduped, dim)

    val (patientsCreated, patientsTotal) = writeIdempotent(
      dim, s"${config.outDir}/patients", Seq("patient_sk"), config.overwrite)
    val (admissionsCreated, admissionsTotal) = writeIdempotent(
      fact, s"${config.outDir}/admissions", Seq("admission_sk"), config.overwrite)

    val metrics = RunMetrics(
      inputRows = n,
      nullNames = nullNames,
      nullAdmitDates = nullAdmits,
      dupRows = dupRows,
      afterDedupRows = deduped.count(),
      patientsCreated = patientsCreated,
      admissionsCreated = admissionsCreated,
      patientsTotal = patientsTotal,
      admissionsTotal = admissionsTotal,
      elapsedSec = (System.nanoTime() - t0) / 1e9)
    raw.unpersist()
    deduped.unpersist()
    dim.unpersist()
    writeLog(metrics, config.logDir)
    metrics
  }

  /** The reference's log lines (`migration.py:136-142,240-251`). */
  def metricLines(m: RunMetrics): Seq[String] = Seq(
    s"[healthcare] input=${m.inputRows} dups=${m.dupRows} " +
      s"null_names=${m.nullNames} null_admit_dates=${m.nullAdmitDates}",
    s"[healthcare] patients: created=${m.patientsCreated} total=${m.patientsTotal}",
    s"[healthcare] admissions: created=${m.admissionsCreated} total=${m.admissionsTotal}",
    f"[healthcare] elapsed=${m.elapsedSec}%.1fs")

  /** M1 log-file parity (`migration.py:28-48` writes
    * `logs/migration.log` alongside console output): append this run's
    * metric lines so successive runs accumulate, like the reference's
    * FileHandler.
    */
  def writeLog(m: RunMetrics, logDir: String): java.nio.file.Path = {
    import java.nio.file.{Files, Paths, StandardOpenOption}
    val dir = Files.createDirectories(Paths.get(logDir))
    val path = dir.resolve("migration.log")
    Files.write(
      path,
      (metricLines(m).mkString("", "\n", "\n")).getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    path
  }

  /** Entry point mirroring `python migration.py`. */
  def main(args: Array[String]): Unit = {
    val config = PipelineConfig.fromEnv()
    val spark = Engine.session(appName = "graft-healthcare")
    val m = run(spark, config)
    metricLines(m).foreach(println)
    spark.stop()
  }
}
