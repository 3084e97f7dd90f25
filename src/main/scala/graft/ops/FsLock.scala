package graft.ops

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** Single-flight PID lock file for store-maintenance jobs (compaction,
  * re-quantization) — the ONE spelling of the acquire/steal/release
  * idiom, shared by `EventStream.compactSignatureStore` and
  * `RegisterStore.compact`.
  *
  * Acquisition is ATOMIC with its content (r16 ADVICE — the previous
  * in-line form had two holes):
  *
  *  - On the local filesystem, Hadoop's `fs.create(lock, false)` is an
  *    exists-then-create (ChecksumFileSystem checks and then creates —
  *    two concurrent compactors could both "win"). Here the pid is
  *    written to a temp file and hard-LINKED into place: link(2) is an
  *    atomic fail-if-exists syscall AND the lock carries its owner pid
  *    from the instant it exists — there is no empty-lock window at
  *    all on the path the tests and the local deployment exercise.
  *  - On HDFS (and other remote FSes without link support), create
  *    with overwrite=false IS atomic at the NameNode, but a crash
  *    between create() and the pid write can leave an EMPTY lock. An
  *    unparseable/empty lock therefore no longer blocks forever: past
  *    a grace window (generous for any live writer's create→write gap)
  *    it is treated as dead and stolen; within the window the caller
  *    is told to retry — never a permanent wedge requiring manual
  *    deletion.
  *
  * A parseable owner pid is stolen iff that process is gone (the
  * crashed-compactor recovery contract: re-running the maintenance
  * call IS the recovery).
  */
object FsLock {

  /** How long an empty/unparseable lock may exist before it is deemed
    * a crashed creator's debris. Any live writer links/writes within
    * milliseconds; 30 s is orders beyond a GC pause.
    */
  private val GraceMs = 30000L

  private def pid = ProcessHandle.current().pid()

  def withLock[A](fs: FileSystem, lock: HPath, what: String)(body: => A): A = {
    acquire(fs, lock, what)
    try body
    finally fs.delete(lock, false)
  }

  private def isLocal(fs: FileSystem): Boolean =
    fs.getUri.getScheme == null || fs.getUri.getScheme == "file"

  private def tryAcquire(fs: FileSystem, lock: HPath): Boolean =
    if (isLocal(fs)) {
      import java.nio.file.{Files, Paths}
      val target = Paths.get(lock.toUri.getPath)
      // Tmp name unique per ATTEMPT (pid + thread + nanos): a pid-only
      // name is shared by two threads of one JVM, and the loser's
      // cleanup could delete the winner's tmp mid-link, turning a
      // clean "contended" result into a raw NoSuchFileException.
      val tmp = target.resolveSibling(
        s"${lock.getName}.tmp.$pid.${Thread.currentThread().getId}.${System.nanoTime()}")
      Files.createDirectories(target.getParent)
      Files.write(tmp, pid.toString.getBytes("UTF-8"))
      try { Files.createLink(target, tmp); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
      finally Files.deleteIfExists(tmp)
    } else {
      val created = try {
        val out = fs.create(lock, false)
        try out.writeBytes(pid.toString)
        finally out.close()
        true
      } catch { case _: java.io.IOException => false }
      // Fencing read-back: a grace-window steal can take an EMPTY lock
      // from a LIVE writer stalled in its create→write gap (GC pause,
      // NN failover). That writer's stream keeps writing into the
      // renamed-aside inode, so the lock PATH no longer carries its
      // pid — only the process whose pid the path holds owns the lock.
      created && (try {
        val in = fs.open(lock)
        try scala.io.Source.fromInputStream(in).mkString.trim == pid.toString
        finally in.close()
      } catch { case scala.util.control.NonFatal(_) => false })
    }

  private def acquire(fs: FileSystem, lock: HPath, what: String): Unit = {
    if (tryAcquire(fs, lock)) return
    val owner = try {
      val in = fs.open(lock)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => -1L }
    if (owner > 0) {
      require(ProcessHandle.of(owner).isEmpty,
        s"$what: another maintenance run (pid $owner) holds $lock — " +
          "single-flight; retry after it finishes")
    } else {
      // Empty/unreadable: either HDFS's create→write crash window or a
      // writer mid-gap. Steal only past the grace age.
      val age = try
        System.currentTimeMillis() - fs.getFileStatus(lock).getModificationTime
      catch {
        // The lock vanished between tryAcquire and here (its holder
        // finished) — treat as contended-but-released and race again.
        case _: java.io.FileNotFoundException => GraceMs + 1
      }
      require(age > GraceMs,
        s"$what: found an ownerless lock $lock younger than ${GraceMs}ms — " +
          "a concurrent acquirer may be mid-write; retry shortly")
    }
    // ATOMIC steal via rename-aside, never delete-then-acquire: two
    // runs that both adjudicated the same lock dead would otherwise
    // both delete and both acquire (the second delete removes the
    // first stealer's FRESH lock). Rename has exactly one winner — the
    // loser's rename returns false (source gone) and it falls through
    // to a fresh acquire attempt, failing loudly below if the winner
    // got there first.
    val stale = new HPath(lock.getParent,
      s"${lock.getName}.stale.$pid.${System.nanoTime()}")
    if (fs.rename(lock, stale)) fs.delete(stale, false)
    require(tryAcquire(fs, lock), s"$what: lost the lock race on $lock")
  }
}
