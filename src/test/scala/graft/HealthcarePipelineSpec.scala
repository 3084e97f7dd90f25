package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops._
import graft.pipeline.{Healthcare, HealthcareFixture, PipelineConfig}

/** End-to-end pipeline spec: SURVEY §2.3 DAG on the synthetic fixture,
  * asserting (a) the three reference invariants
  * (`/root/reference/test_migration.py:15-34`), (b) each FIXTURES.md
  * §A.1 adversarial behavior, (c) idempotent re-append, (d) X1 layout
  * filter pushdown on the written parquet.
  */
class HealthcarePipelineSpec extends SparkTestBase {

  private lazy val workDir = Files.createTempDirectory("graft_hc").toString
  private lazy val csv = s"$workDir/healthcare.csv"
  private lazy val out = s"$workDir/out"
  private lazy val logDir = s"$workDir/logs"
  private lazy val metrics = {
    HealthcareFixture.write(csv, rows = 200)
    Healthcare.run(spark, PipelineConfig(csv, out, overwrite = true, logDir = logDir))
  }
  private lazy val patients = { metrics; spark.read.parquet(s"$out/patients") }
  private lazy val admissions = { metrics; spark.read.parquet(s"$out/admissions") }

  // -- the reference's three integration tests ---------------------------

  test("invariant 1: both output tables exist") {
    assert(patients.columns.nonEmpty && admissions.columns.nonEmpty)
  }

  test("invariant 2: both output tables are non-empty") {
    assert(patients.count() > 0 && admissions.count() > 0)
  }

  test("invariant 3: no duplicate patients by natural key") {
    assert(dupCheck(patients, Healthcare.patientKey).isEmpty)
  }

  // -- adversarial fixture behaviors -------------------------------------

  test("full-row duplicates are dropped and counted") {
    assert(metrics.dupRows === 1L)
    // bob smith's duplicated admission appears once
    assert(admissions.filter(col("date_of_admission") === "2024-01-10").count() === 1L)
  }

  test("case/whitespace-differing patient rows unify to one cleaned patient") {
    val bobs = patients.filter(col("name") === "Bob Smith")
    assert(bobs.count() === 1L)
    // ... with all three of bob's distinct admissions resolved to that one sk
    val bobSk = bobs.head().getAs[String]("patient_sk")
    assert(admissions.filter(col("patient_sk") === bobSk).count() === 3L)
  }

  test("title-case cleanup applies Python word-boundary semantics") {
    assert(patients.filter(col("name") === "Ann O'Brien").count() === 1L)
  }

  test("conflicting admission rows: first occurrence wins") {
    val annSk = patients.filter(col("name") === "Ann O'Brien")
      .head().getAs[String]("patient_sk")
    val annFlu = admissions
      .filter(col("patient_sk") === annSk && col("room_number") === 300)
    assert(annFlu.count() === 1L)
    assert(annFlu.head().getAs[String]("doctor") === "Dr First")
  }

  test("missing dates propagate as null") {
    assert(metrics.nullAdmitDates === 1L)
    assert(admissions.filter(col("date_of_admission").isNull).count() >= 1L)
  }

  test("null-name patient still links to its admission (null-safe FK join)") {
    // fixture row 7: ',33,Male,B+,...' — the reference's dict lookup
    // matches None keys, so the admission must carry the dim row's sk
    val nullPatient = patients.filter(col("name").isNull)
    assert(nullPatient.count() === 1L)
    val sk = nullPatient.head().getAs[String]("patient_sk")
    assert(admissions.filter(col("patient_sk") === sk).count() === 1L)
    // and no admission is orphaned
    assert(admissions.filter(col("patient_sk").isNull).count() === 0L)
  }

  test("metrics mirror the reference's pre/post stats") {
    assert(metrics.inputRows === 200L)
    assert(metrics.afterDedupRows === 199L)
    assert(metrics.nullNames === 1L)
    assert(metrics.patientsTotal === patients.count())
    assert(metrics.patientsCreated === metrics.patientsTotal)
    assert(metrics.admissionsTotal === admissions.count())
  }

  // -- idempotency (J2 against live sink state) ---------------------------

  test("sink records the surrogate-key version and a mismatched append fails fast") {
    metrics // force the initial run
    val marker = java.nio.file.Paths.get(s"$out/patients/_graft_key_version")
    assert(Files.exists(marker))
    assert(new String(Files.readAllBytes(marker), "UTF-8").trim ===
      surrogateKeyVersion.toString)
    // simulate a sink written under an older derivation (drop Hadoop's
    // local-FS .crc sidecar, which the out-of-band edit invalidates)
    val crc = java.nio.file.Paths.get(s"$out/patients/._graft_key_version.crc")
    Files.write(marker, "1\n".getBytes("UTF-8"))
    Files.deleteIfExists(crc)
    val e = intercept[IllegalArgumentException] {
      Healthcare.run(spark, PipelineConfig(csv, out, overwrite = false, logDir = logDir))
    }
    assert(e.getMessage.contains("surrogate-key version"), e.getMessage)
    // restore for the append-idempotency test
    Files.write(marker, s"$surrogateKeyVersion\n".getBytes("UTF-8"))
    Files.deleteIfExists(crc)
  }

  test("re-running in append mode creates nothing new") {
    val before = (patients.count(), admissions.count())
    val m2 = Healthcare.run(
      spark, PipelineConfig(csv, out, overwrite = false, logDir = logDir))
    assert(m2.patientsCreated === 0L)
    assert(m2.admissionsCreated === 0L)
    assert((spark.read.parquet(s"$out/patients").count(),
      spark.read.parquet(s"$out/admissions").count()) === before)
  }

  // -- M1 log-file parity (migration.py:28-48 writes logs/migration.log) --

  test("run writes the metric counters to the log file") {
    metrics // force at least one run
    val log = java.nio.file.Paths.get(logDir).resolve("migration.log")
    assert(java.nio.file.Files.exists(log))
    val text = new String(java.nio.file.Files.readAllBytes(log), "UTF-8")
    assert(text.contains(s"patients: created=${metrics.patientsCreated} " +
      s"total=${metrics.patientsTotal}"), text)
    assert(text.contains(s"admissions: created=${metrics.admissionsCreated} " +
      s"total=${metrics.admissionsTotal}"), text)
    assert(text.contains(s"input=${metrics.inputRows}"), text)
  }

  // -- X1 layout: written files support scan-level filter pushdown --------

  test("sk filters push down to the parquet scan of the written output") {
    val sk = patients.head().getAs[String]("patient_sk")
    val plan = spark.read.parquet(s"$out/patients")
      .filter(col("patient_sk") === sk)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("patient_sk"),
      plan)
  }
}
