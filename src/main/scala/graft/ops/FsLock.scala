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
  *    deletion. Remote acquires additionally FENCE with a pid
  *    read-back: a writer whose empty lock was grace-stolen mid-stall
  *    resumes writing into a renamed-aside inode, so only the process
  *    whose pid the lock PATH carries owns the lock.
  *
  * A parseable owner pid is stolen iff that process is gone (the
  * crashed-compactor recovery contract: re-running the maintenance
  * call IS the recovery). The steal itself is single-winner: the dead
  * lock is renamed to a marker whose NAME is derived from the dead
  * instance's identity (owner pid + mtime) via a NO-REPLACE rename
  * (nio move locally, old-API rename on HDFS) that fails
  * when the destination exists — so a slow rival that adjudicated the
  * SAME dead instance cannot rename away the winner's freshly
  * re-created lock (its destination marker already exists, held until
  * the winner releases). The residual window — a rival acting on an
  * adjudication so stale that a full steal + compaction + release +
  * re-acquire happened inside its read→rename gap — requires a
  * multi-second maintenance run to complete inside a millisecond gap.
  */
object FsLock {

  /** How long an empty/unparseable lock may exist before it is deemed
    * a crashed creator's debris. Any live writer links/writes within
    * milliseconds; 30 s is orders beyond a GC pause.
    */
  private val GraceMs = 30000L

  private def pid = ProcessHandle.current().pid()

  def withLock[A](fs: FileSystem, lock: HPath, what: String)(body: => A): A = {
    val staleMarker = acquire(fs, lock, what)
    try body
    finally {
      fs.delete(lock, false)
      // The steal marker outlives the steal on purpose (it is what
      // blocks a slow rival stealer while we run); it is debris once
      // the lock is released.
      staleMarker.foreach(fs.delete(_, false))
    }
  }

  private def isLocal(fs: FileSystem): Boolean =
    fs.getUri.getScheme == null || fs.getUri.getScheme == "file"

  /** Lock-file content, or None when it cannot be read (missing file,
    * transient IO) — the one spelling shared by the fencing read-back
    * and the owner adjudication.
    */
  private def readLock(fs: FileSystem, lock: HPath): Option[String] =
    try {
      val in = fs.open(lock)
      try Some(scala.io.Source.fromInputStream(in).mkString.trim)
      finally in.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Rename that FAILS when the destination exists, on every backend.
    * HDFS's old-API rename already behaves that way; local POSIX
    * rename(2) silently REPLACES an existing destination (which would
    * let a slow steal rival overwrite the winner's marker), so the
    * local branch goes through nio `Files.move` without
    * REPLACE_EXISTING.
    */
  private def renameNoReplace(fs: FileSystem, src: HPath, dst: HPath): Boolean =
    if (isLocal(fs)) {
      import java.nio.file.{Files, Paths}
      try {
        Files.move(Paths.get(src.toUri.getPath), Paths.get(dst.toUri.getPath))
        true
      } catch { case _: java.io.IOException => false }
    } else fs.rename(src, dst)

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
      // Retry transient read failures, and on persistent failure
      // DELETE our own creation before reporting failure: we are live
      // and our write completed, so the path can only hold our pid or
      // a stealer's (and a stealer cannot have adjudicated a lock that
      // carries a live pid) — leaving it behind would wedge every
      // later run on "pid <us> holds the lock".
      created && {
        val fenced = (1 to 3).iterator
          .map(_ => readLock(fs, lock))
          .collectFirst { case Some(content) => content == pid.toString }
        fenced match {
          case Some(ok) => ok
          case None => fs.delete(lock, false); false
        }
      }
    }

  /** Acquire or die loudly. Returns the steal marker to delete on
    * release, when the acquisition went through a steal.
    */
  private def acquire(fs: FileSystem, lock: HPath, what: String): Option[HPath] = {
    if (tryAcquire(fs, lock)) return None
    val status = try Some(fs.getFileStatus(lock))
    catch { case _: java.io.FileNotFoundException => None }
    val marker = status.flatMap { st =>
      val owner = readLock(fs, lock)
        .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(-1L)
      if (owner > 0) {
        require(ProcessHandle.of(owner).isEmpty,
          s"$what: another maintenance run (pid $owner) holds $lock — " +
            "single-flight; retry after it finishes")
      } else {
        // Empty/unreadable: either HDFS's create→write crash window or
        // a writer mid-gap. Steal only past the grace age.
        val age = System.currentTimeMillis() - st.getModificationTime
        require(age > GraceMs,
          s"$what: found an ownerless lock $lock younger than ${GraceMs}ms — " +
            "a concurrent acquirer may be mid-write; retry shortly")
      }
      // ATOMIC single-winner steal: rename the dead lock to a marker
      // DETERMINISTICALLY named by the dead instance (owner + mtime).
      // Exactly one of N rivals adjudicating this instance wins the
      // rename — every later rival's rename fails on dest-exists, even
      // after the winner has re-created a fresh live lock at the path
      // (the delete-then-acquire shape both could win; a unique-named
      // rename could grab the winner's FRESH lock). The marker stays
      // until release — see withLock.
      val stale = new HPath(lock.getParent,
        s"${lock.getName}.stale.$owner.${st.getModificationTime}")
      if (renameNoReplace(fs, lock, stale)) Some(stale) else None
    }
    // Lock vanished, or we won (or lost) the steal — one fresh attempt
    // decides it; losing here is the loud single-flight failure. A
    // marker we created is NOT deleted on the losing path: it keeps
    // protecting whoever did acquire from other stale rivals, and a
    // future steal (of a future dead instance) uses a different
    // (owner, mtime) name — the leftover is a few bytes of debris,
    // never a wedge.
    if (tryAcquire(fs, lock)) marker
    else throw new IllegalArgumentException(
      s"requirement failed: $what: lost the lock race on $lock")
  }
}
