package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-consistency net: the three surfaces that must stay in sync
  * — `SparkEntry.queries`, `SparkEntry.oracleSql`, and SURVEY.md §8 —
  * drift independently (the §8 header already went stale once, r11).
  * This spec fails the build when:
  *   (a) a `queries` key has no `oracleSql` entry and is not on the
  *       NAMED rows-only allowlist (EMPTY since r15: q24/q57/q110 were
  *       retired from the registry — their capabilities stay certified
  *       by q111, q107+Round14Spec, and ExtensionsSpec's java.util.zip
  *       reference oracle respectively — so every registered query is
  *       now hash-certified against the oracle),
  *   (b) an `oracleSql` key has no `queries` implementation (dangling
  *       oracle), or
  *   (c) a `queries` key ≥ q23 has no SURVEY §8 row (single row or a
  *       qA-qB range row); q01-q22 are certified in §2.5 instead.
  * No Spark session needed — this is pure map/file introspection.
  */
class RegistryConsistencySpec extends AnyFunSuite {

  /** Queries whose results are rows-only checked by design; adding a
    * key here requires a documented reason in SURVEY §8. Empty since
    * r15 — an engine-specific capability belongs OUT of the registry
    * (def + spec certification), not in it with an uncheckable row.
    */
  private val rowsOnlyAllowlist = Set.empty[String]

  private lazy val queryKeys = SparkEntry.queries.keySet
  private lazy val oracleKeys = SparkEntry.oracleSql.keySet

  test("every queries key has an oracle or a named rows-only reason") {
    val missing = queryKeys -- oracleKeys -- rowsOnlyAllowlist
    assert(missing.isEmpty,
      s"queries without oracleSql and not on the rows-only allowlist: " +
        s"${missing.toSeq.sorted.mkString(", ")}")
  }

  test("no dangling oracles (oracleSql key without an implementation)") {
    val dangling = oracleKeys -- queryKeys
    assert(dangling.isEmpty,
      s"oracleSql entries with no queries implementation: " +
        s"${dangling.toSeq.sorted.mkString(", ")}")
  }

  test("rows-only allowlist is live (no stale entries)") {
    val stale = rowsOnlyAllowlist -- queryKeys
    assert(stale.isEmpty, s"allowlist names absent from queries: $stale")
    val shadowed = rowsOnlyAllowlist.intersect(oracleKeys)
    assert(shadowed.isEmpty,
      s"allowlist names that HAVE an oracle now (remove from allowlist): $shadowed")
  }

  // --- SURVEY §8 coverage ------------------------------------------------

  /** First-cell names of §8 table rows: either a full key
    * (`q23_titlecase_expr`) or a numeric range (`q50-q54`). */
  private lazy val section8Names: Seq[String] = {
    val src = scala.io.Source.fromFile("SURVEY.md", "UTF-8")
    val lines = try src.getLines().toVector finally src.close()
    val start = lines.indexWhere(_.startsWith("## 8."))
    assert(start >= 0, "SURVEY.md has no '## 8.' section")
    val end = lines.indexWhere(_.startsWith("## "), start + 1)
    lines.slice(start, if (end < 0) lines.length else end)
      .filter(l => l.startsWith("| q") || l.startsWith("| Q"))
      .map(_.stripPrefix("|").split("\\|")(0).trim)
  }

  private def num(key: String): Option[Int] =
    "^q(\\d+)".r.findFirstMatchIn(key).map(_.group(1).toInt)

  /** Is `key` covered by a §8 row? Exact name, or inside a qA-qB range. */
  private def covered(key: String, names: Seq[String]): Boolean = {
    val n = num(key)
    names.exists { cell =>
      cell == key || cell.split("[,;]").map(_.trim).contains(key) || {
        "^q(\\d+)-q(\\d+)$".r.findFirstMatchIn(cell) match {
          case Some(m) =>
            n.exists(k => k >= m.group(1).toInt && k <= m.group(2).toInt)
          case None => false
        }
      }
    }
  }

  test("every queries key >= q23 has a SURVEY §8 row") {
    val names = section8Names
    assert(names.size > 100, s"§8 parse looks broken: ${names.size} rows")
    val missing = queryKeys
      .filter(k => num(k).exists(_ >= 23))
      .filterNot(k => covered(k, names))
    assert(missing.isEmpty,
      s"queries with no SURVEY §8 row: ${missing.toSeq.sorted.mkString(", ")}")
  }

  test("the §8 net actually fires on a missing row (negative control)") {
    assert(!covered("q999_synthetic_missing", section8Names),
      "coverage check failed to flag a fabricated key — the net is vacuous")
    assert(covered("q50_text_stats_hypothetical", Seq("q50-q54")),
      "range-row parsing broke")
  }
}
