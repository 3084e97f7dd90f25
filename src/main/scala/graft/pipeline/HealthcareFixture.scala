package graft.pipeline

import java.nio.file.{Files, Paths}
import scala.util.Random

/** Deterministic synthetic replica of the reference's input CSV
  * (FIXTURES.md §A.1 — the real Kaggle file is a missing blob,
  * reference `.MISSING_LARGE_BLOBS:1`). Raw headers are the
  * title-case/space forms the reference normalizes away
  * (`migration.py:133`).
  *
  * The first rows are hand-written adversarial cases pinning reference
  * behaviors (full-row dups, key-unification after name cleanup,
  * conflicting admission attributes, null propagation); the remainder is
  * seeded bulk.
  */
object HealthcareFixture {

  val header: String =
    "Name,Age,Gender,Blood Type,Medical Condition,Date of Admission,Doctor," +
      "Hospital,Insurance Provider,Billing Amount,Room Number,Admission Type," +
      "Discharge Date,Medication,Test Results"

  // Each tuple pins a FIXTURES.md §A.1 adversarial behavior.
  val adversarial: Seq[String] = Seq(
    // 1. exact full-row duplicate (dropped by D1; counted by P4)
    "bob smith,40,Male,A+,Diabetes,2024-01-10,Dr House,General,Acme,100.5,101,Urgent,2024-01-12,Aspirin,Normal",
    "bob smith,40,Male,A+,Diabetes,2024-01-10,Dr House,General,Acme,100.5,101,Urgent,2024-01-12,Aspirin,Normal",
    // 2. same patient natural key, different admission -> 1 patient, 2 admissions
    "bob smith,40,Male,A+,Asthma,2024-02-20,Dr Wilson,General,Acme,250.0,102,Elective,2024-02-21,Inhaler,Normal",
    // 3. same patient differing only in case/whitespace -> unify after cleanup
    "  BOB smith ,40,Male,A+,Cancer,2024-03-05,Dr Chase,Mercy,Beta,999.9,201,Emergency,2024-03-15,Chemo,Abnormal",
    // 4. same admission key with conflicting doctor -> first wins, later dropped
    "ann o'brien,55,Female,O-,Flu,2024-04-01,Dr First,Mercy,Beta,50.0,300,Urgent,2024-04-02,Rest,Normal",
    "ann o'brien,55,Female,O-,Flu,2024-04-01,Dr Second,Mercy,Beta,75.0,300,Urgent,2024-04-03,Rest,Normal",
    // 5. missing name / missing dates -> nulls propagate
    ",33,Male,B+,Checkup,2024-05-01,Dr Null,General,Acme,10.0,400,Elective,2024-05-02,None,Normal",
    "jean-luc picard,60,Male,AB+,Checkup,,Dr Crusher,Enterprise,Fleet,0.0,401,Elective,,None,Inconclusive")

  def bulkRow(rng: Random): String = {
    // First-name pool is disjoint from the adversarial rows' names so
    // bulk rows can never collide with the pinned patients.
    val first = Seq("alice", "grace", "carol", "dave", "erin", "frank")(rng.nextInt(6))
    val last = Seq("smith", "jones", "o'hara", "lee", "garcia-diaz", "chen")(rng.nextInt(6))
    val age = 18 + rng.nextInt(73)
    val gender = Seq("Male", "Female")(rng.nextInt(2))
    val blood = Seq("A+", "A-", "B+", "B-", "AB+", "AB-", "O+", "O-")(rng.nextInt(8))
    val cond = Seq("Diabetes", "Asthma", "Cancer", "Flu", "Arthritis")(rng.nextInt(5))
    val admitDay = 1 + rng.nextInt(28)
    val admitMonth = 1 + rng.nextInt(12)
    val admit = f"2023-$admitMonth%02d-$admitDay%02d"
    val doctor = s"Dr ${Seq("House", "Wilson", "Chase", "Cameron")(rng.nextInt(4))}"
    val hospital = Seq("General", "Mercy", "Hope", "Central")(rng.nextInt(4))
    val insurer = Seq("Acme", "Beta", "Fleet")(rng.nextInt(3))
    val amount = math.round(rng.nextDouble() * 100000 - 5000) / 100.0 // negatives allowed
    val room = 100 + rng.nextInt(401)
    val admType = Seq("Urgent", "Emergency", "Elective")(rng.nextInt(3))
    val discharge = f"2023-$admitMonth%02d-${math.min(admitDay + rng.nextInt(14), 28)}%02d"
    val medication = Seq("Aspirin", "Ibuprofen", "Penicillin", "None")(rng.nextInt(4))
    val result = Seq("Normal", "Abnormal", "Inconclusive")(rng.nextInt(3))
    s"$first $last,$age,$gender,$blood,$cond,$admit,$doctor,$hospital,$insurer," +
      s"$amount,$room,$admType,$discharge,$medication,$result"
  }

  /** CLI: `runMain graft.pipeline.HealthcareFixture <path> [rows]`. */
  def main(args: Array[String]): Unit =
    write(args(0), if (args.length > 1) args(1).toInt else 200)

  /** Streaming variant of [[write]] for audit-scale fixtures (50k–5M
    * rows): rows go straight to a buffered writer — no single giant
    * string on the driver heap. Same header, same adversarial head,
    * same seeded bulk generator, so any size is a prefix-extension of
    * the gate fixture's distribution.
    */
  def writeLarge(path: String, rows: Int, seed: Long = 42L): Unit = {
    val rng = new Random(seed)
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    val w = Files.newBufferedWriter(p)
    try {
      w.write(header); w.newLine()
      adversarial.foreach { r => w.write(r); w.newLine() }
      var i = adversarial.length
      while (i < rows) { w.write(bulkRow(rng)); w.newLine(); i += 1 }
    } finally w.close()
  }

  /** Write a `rows`-row fixture CSV (adversarial head + seeded bulk). */
  def write(path: String, rows: Int = 200, seed: Long = 42L): Unit = {
    val rng = new Random(seed)
    val bulk = (adversarial.length until rows).map(_ => bulkRow(rng))
    val content = (header +: (adversarial ++ bulk)).mkString("\n") + "\n"
    val p = Paths.get(path)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.writeString(p, content)
  }
}
