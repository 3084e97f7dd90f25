package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.ops._

/** Unit coverage for the §2.1 operator vocabulary on adversarial
  * in-memory fixtures (FIXTURES.md §A.1 behaviors).
  */
class OpsSpec extends SparkTestBase {
  import spark.implicits._

  test("normalizeColumnName: strip, lower, spaces to underscores") {
    assert(normalizeColumnName("  Blood Type ") === "blood_type")
    assert(normalizeColumnName("Name") === "name")
    assert(normalizeColumnName("already_ok") === "already_ok")
  }

  test("normalizeColumnNames renames every column") {
    val df = Seq((1, "x")).toDF("Patient Name", " Age ")
    assert(normalizeColumnNames(df).columns.toSeq === Seq("patient_name", "age"))
  }

  test("parseDate: ISO parses, null and empty propagate to null") {
    val out = Seq((1, "2024-03-05"), (2, null), (3, "")).toDF("id", "d")
      .select($"id", parseDate($"d").as("p")).orderBy("id").collect()
    assert(out(0).getDate(1).toString === "2024-03-05")
    assert(out(1).isNullAt(1) && out(2).isNullAt(1))
  }

  test("surrogateKey: no boundary collisions, nulls encoded, deterministic") {
    val df = Seq(
      ("a", "bc"),   // vs ("ab","c") — separator must keep these distinct
      ("ab", "c"),
      ("x", null),   // vs (null,"x") — null encoding must keep these distinct
      (null, "x"),
      ("x", null)    // duplicate of row 3 — must collide (determinism)
    ).toDF("k1", "k2")
    val keys = df.select(surrogateKey(Seq($"k1", $"k2")).as("sk"))
      .collect().map(_.getString(0))
    assert(keys(0) !== keys(1))
    assert(keys(2) !== keys(3))
    assert(keys(2) === keys(4))
  }

  test("dedupFirstWins keeps exactly the first row per key by the order col") {
    val df = Seq(
      ("k1", 2, "late"), ("k1", 1, "first"), ("k2", 5, "only"),
      ("k1", 3, "later"), ("k2", 6, "late")
    ).toDF("k", "ord", "v")
    val out = dedupFirstWins(df, key = Seq("k"), order = Seq($"ord"))
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("k1", "first"), ("k2", "only")))
  }

  test("dedupFirstWins drops later rows with conflicting non-key attrs") {
    // reference migration.py:200-231: same admission key, different doctor
    // -> first wins, the conflict is silently dropped.
    val df = Seq((10, 1, "Dr A"), (10, 2, "Dr B")).toDF("key", "ord", "doctor")
    val out = dedupFirstWins(df, Seq("key"), Seq($"ord")).collect()
    assert(out.length === 1 && out(0).getString(2) === "Dr A")
  }

  test("nullProfile counts nulls per column in one row") {
    val df = Seq[(Integer, String)]((1, null), (null, "a"), (null, null))
      .toDF("a", "b")
    assert(nullProfile(df, Seq("a", "b")).collect().toSeq ===
      Seq(Row(2L, 2L)))
  }

  test("dupRowCount counts extra copies only, zero on empty") {
    val df = Seq(("a", 1), ("a", 1), ("a", 1), ("b", 2)).toDF("x", "y")
    assert(dupRowCount(df).head().getLong(0) === 2L)
    assert(dupRowCount(df.limit(0)).head().getLong(0) === 0L)
  }

  test("schemaReport lists (column, type) pairs") {
    val rep = schemaReport(Seq((1, "x")).toDF("id", "name"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rep === Seq(("id", "IntegerType"), ("name", "StringType")))
  }

  test("resolveFk attaches dim attributes; unmatched facts survive as null") {
    val fact = Seq(("k1", 10.0), ("k3", 30.0)).toDF("k", "amount")
    val dim = Seq(("k1", "sk1"), ("k2", "sk2")).toDF("k", "sk")
    val out = resolveFk(fact, dim, Seq("k")).orderBy("k").collect()
    assert(out(0).getString(2) === "sk1")
    assert(out(1).isNullAt(2)) // left join: fact row kept, fk null
  }

  test("antiExisting keeps only keys absent from the sink") {
    val newRows = Seq(("k1", 1), ("k2", 2), ("k3", 3)).toDF("k", "v")
    val existing = Seq(("k2", 99), ("k2", 98)).toDF("k", "v")
    val out = antiExisting(newRows, existing, Seq("k"))
      .orderBy("k").collect().map(_.getString(0)).toSeq
    assert(out === Seq("k1", "k3"))
  }

  test("dedupFirstWinsAgg equals window-based dedupFirstWins") {
    val df = Seq(
      ("k1", 2, "late"), ("k1", 1, "first"), ("k2", 5, "only"),
      ("k1", 3, "later"), ("k2", 6, "late"), (null, 4, "nullkey")
    ).toDF("k", "ord", "v")
    val win = dedupFirstWins(df, Seq("k"), Seq($"ord")).orderBy("ord").collect().toSeq
    val agg = dedupFirstWinsAgg(df, Seq("k"), Seq($"ord")).orderBy("ord").collect().toSeq
    assert(agg === win)
    assert(agg.map(_.getString(2)).toSet === Set("first", "only", "nullkey"))
  }

  test("saltedResolveFk equals the unsalted join on a skewed fixture") {
    // hot key: 90% of facts share one key
    val fact = ((1 to 90).map(i => ("hot", i)) ++ Seq(("k1", 91), ("k2", 92)))
      .toDF("k", "v")
    val dim = Seq(("hot", "H"), ("k1", "A"), ("k3", "C")).toDF("k", "attr")
    val plain = resolveFk(fact, dim, Seq("k"), broadcastDim = false)
      .orderBy("v").collect().toSeq
    val salted = saltedResolveFk(fact, dim, Seq("k"), buckets = 8)
      .select(plain.head.schema.fieldNames.map(col).toIndexedSeq: _*)
      .orderBy("v").collect().toSeq
    assert(salted === plain)
  }

  test("dedupFirstWinsSalted equals single-shuffle dedupFirstWins") {
    val df = ((1 to 50).map(i => ("hot", i, s"v$i")) ++
      Seq(("k1", 3, "a"), ("k1", 1, "b"), ("k2", 9, "c")))
      .toDF("k", "ord", "payload")
    val plain = dedupFirstWins(df, Seq("k"), Seq($"ord"))
      .orderBy("k").collect().toSeq
    val salted = dedupFirstWinsSalted(df, Seq("k"), Seq($"ord"), buckets = 4)
      .orderBy("k").collect().toSeq
    assert(salted === plain)
  }

  test("approxDistinct lands within the configured error of the exact count") {
    val df = spark.range(10000).select(($"id" % 1234).as("k"))
    val approx = approxDistinct(df, "k").head().getLong(0)
    assert(math.abs(approx - 1234.0) / 1234.0 < 0.1, s"approx=$approx")
  }

  test("Metrics.record captures completed actions with durations") {
    val (n, actions) = Metrics.record(spark) {
      spark.range(100).filter($"id" % 2 === 0).count()
    }
    assert(n === 50L)
    assert(actions.nonEmpty)
    assert(actions.forall(_.durationMs >= 0))
  }

  test("dupCheck returns keys occurring more than once") {
    val df = Seq("a", "a", "b", "c", "c", "c").toDF("k")
    val out = dupCheck(df, Seq("k")).orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out === Seq(("a", 2L), ("c", 3L)))
  }
}
