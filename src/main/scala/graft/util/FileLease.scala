package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** Cross-process exclusive lease on a Hadoop-FS lock path — the
  * O_EXCL-claim / mtime-staleness / tombstone-break discipline the
  * Registry's writer lock evolved through reviews r6–r13, extracted
  * (r14) so the parquet online store's table-scoped writer lease and
  * any future mutating component share ONE implementation instead of
  * re-deriving the TOCTOU fixes.
  *
  * Protocol:
  *  - CLAIM: `create(lock, overwrite = false)` with a per-acquisition
  *    UUID token written into the file. Exclusive create is the atomic
  *    primitive that exists on local FS, HDFS and precondition-capable
  *    object stores.
  *  - STALENESS: a lock older than `staleMs` (file mtime vs the
  *    observer's clock) is presumed crashed. Breaking is by ATOMIC
  *    RENAME to a unique tombstone after a re-observe confirmation
  *    window, identified by TOKEN CONTENT (bytes survive renames;
  *    mtime does not on copy-rename object stores) — exactly one
  *    breaker wins, and a fresh lock captured by mistake is restored.
  *  - RELEASE: also by atomic rename-to-tombstone; ours → delete,
  *    someone else's (we were broken and replaced mid-section) →
  *    restore, or drop the tombstone if the path was re-claimed.
  *
  * LEASE ASSUMPTIONS (stated rather than silently relied on): this is
  * an mtime lease, not a heartbeat-consensus lock. It is sound when
  * (a) writer clocks and the filesystem's clock agree to well under
  * `staleMs` and (b) no holder's critical section approaches `staleMs`
  * — OR the holder runs with `heartbeat = true`, which re-touches the
  * lock's mtime every staleMs/3 from a daemon thread so an arbitrarily
  * long critical section (a Spark job merging store buckets) stays
  * visibly alive and a crashed holder's lock still expires within
  * staleMs of the crash. If a breaker DOES capture a live-but-expired
  * holder's lock, the break/release tombstone discipline keeps the
  * failure at last-writer-wins on the guarded resource, never a torn
  * lock file.
  *
  * KNOWN DEGRADED MODE (ADVICE r13, accepted + documented): in the
  * release path, when the captured lock is NOT ours we restore it —
  * if the true holder attempted its own release during our capture
  * window (its rename saw a missing lock and no-opped), the restored
  * file has no live holder and blocks writers until the full staleMs
  * expiry (~one stale window of writer stall, self-healing). The
  * alternative — deleting a lock we cannot prove is dead — reopens
  * the two-writers-enter cascade, which is strictly worse; operators
  * seeing a one-off `staleMs` writer stall after process churn are in
  * this mode, not deadlocked.
  */
object FileLease {

  /** Run `body` holding an exclusive lease at `lock`. Throws
    * java.io.IOException when the lease cannot be acquired within the
    * acquisition budget: `acquireMs` when ≥ 0, else `staleMs` + 5 s
    * (a crashed holder's lock only becomes breakable after `staleMs`,
    * so the budget must outlast at least one full window). Callers
    * whose CONTENDERS should wait behind a live heartbeat-extended
    * holder (the store writer lease: a micro-batch upsert queuing
    * behind a long backfill merge) must pass an `acquireMs` sized to
    * the longest legitimate critical section — the default budget
    * assumes short sections and would otherwise throw at ~staleMs+5 s
    * while the holder is alive and unbreakable (review r14). */
  def withLock[A](fs: FileSystem, lock: Path, staleMs: Long,
      heartbeat: Boolean = false, acquireMs: Long = -1L)(body: => A): A = {
    val token = java.util.UUID.randomUUID().toString
    def readToken(at: Path): Option[String] =
      try {
        // full read, never a single read() — InputStream legally
        // returns short on remote filesystems, and a short-read token
        // mismatch made release leak its own live lock
        val in = fs.open(at)
        try Some(new String(
          org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8"))
        finally in.close()
      } catch { case _: java.io.IOException => None }

    // On the LOCAL filesystem Hadoop's create(overwrite = false) is an
    // exists()-then-create TOCTOU, NOT atomic — two same-box claimants
    // (or two threads of one JVM) can both "win" and the second's
    // write clobbers the first's token (caught red by the two-writer
    // upsert stress, r14; VersionedTable.claimAndWrite documents the
    // same hole). java.io.File.createNewFile (O_CREAT|O_EXCL) is the
    // real atomic primitive there; HDFS and precondition-capable
    // stores enforce exclusive create server-side, so fs.create(false)
    // stays correct for them.
    def claim(): Boolean = fs match {
      case _: org.apache.hadoop.fs.LocalFileSystem |
           _: org.apache.hadoop.fs.RawLocalFileSystem =>
        val f = new java.io.File(lock.toUri.getPath)
        Option(f.getParentFile).foreach(_.mkdirs())
        if (!f.createNewFile()) false
        else {
          // failure-atomic: a token write failing AFTER the O_EXCL
          // create would strand an ownerless empty-token lock nobody —
          // including us — can re-claim until the full stale expiry
          // (review r14); we still own the slot here, so delete it
          // before surfacing the error
          try {
            val out = new java.io.FileOutputStream(f)
            try out.write(token.getBytes("UTF-8")) finally out.close()
          } catch { case e: Throwable => f.delete(); throw e }
          true
        }
      case _ =>
        // the SAME failure-atomicity as the local branch (ADVICE r14):
        // after the exclusive create we own the slot, so a token
        // write/close failing on a remote filesystem must delete the
        // lock before rethrowing — a stranded partial-token lock is
        // ownerless and blocks every writer (ourselves included) until
        // the full stale expiry
        val out = fs.create(lock, false)
        try {
          out.write(token.getBytes("UTF-8")); out.close()
        } catch {
          case e: Throwable =>
            try out.close() catch { case _: Throwable => () }
            try fs.delete(lock, false) catch { case _: java.io.IOException => () }
            throw e
        }
        true
    }
    // Break a stale lock from a crashed holder. Delete-based breaking
    // was TOCTOU-racy (two breakers, one deletes the other's fresh
    // lock); rename-to-unique-tombstone makes exactly one breaker win,
    // and token content identifies what was actually captured (see
    // object Scaladoc).
    def breakIfStale(): Unit =
      try {
        val st = fs.getFileStatus(lock)
        if (System.currentTimeMillis() - st.getModificationTime > staleMs) {
          val staleToken = readToken(lock)
          // CONFIRMATION WINDOW: the status read and the token read
          // are not atomic — re-observe after a pause; the same token
          // under the same stale mtime across both looks can only be
          // the crashed holder's lock (a replacement is CREATED fresh,
          // failing the stale check).
          Thread.sleep(100L)
          val stillStale =
            try {
              val st2 = fs.getFileStatus(lock)
              st2.getModificationTime == st.getModificationTime &&
                System.currentTimeMillis() - st2.getModificationTime > staleMs &&
                readToken(lock) == staleToken
            } catch { case _: java.io.FileNotFoundException => false }
          val tomb = new Path(
            lock.toString + ".breaking-" +
              java.util.UUID.randomUUID().toString.take(8))
          if (staleToken.isDefined && stillStale && fs.rename(lock, tomb)) {
            if (readToken(tomb) == staleToken)
              fs.delete(tomb, false) // confirmed the stale lock: broken
            else if (!fs.rename(tomb, lock))
              fs.delete(tomb, false)
          }
        }
      } catch { case _: java.io.FileNotFoundException => () }

    val budget = if (acquireMs >= 0) acquireMs else staleMs + 5000L
    val deadline = System.currentTimeMillis() + budget
    var attempt = 0
    var held = false
    while (!held && System.currentTimeMillis() < deadline) {
      attempt += 1
      held =
        try {
          // a false claim (O_EXCL loss) and a thrown claim (remote-FS
          // exclusive-create rejection) are the same outcome: someone
          // holds the slot — check staleness, back off, retry
          if (claim()) true
          else { breakIfStale(); Thread.sleep(50L); false }
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException |
               _: java.nio.file.FileAlreadyExistsException |
               _: java.io.IOException =>
            breakIfStale()
            Thread.sleep(50L)
            false
        }
    }
    if (!held) throw new java.io.IOException(
      s"FileLease: could not acquire $lock after $attempt attempts " +
        s"over $budget ms")

    // mtime heartbeat: keeps a long critical section's lock visibly
    // fresh so no breaker's stale check ever fires on a LIVE holder.
    // setTimes failures are swallowed — a filesystem without it
    // degrades to the plain mtime lease (short-sections-only contract).
    val beat: Option[Thread] =
      if (!heartbeat) None
      else {
        val t = new Thread(() => {
          try {
            var mine = true
            while (mine && !Thread.currentThread().isInterrupted) {
              Thread.sleep(math.max(250L, staleMs / 3))
              // verify ownership BEFORE touching (ADVICE r14): a holder
              // stalled past staleMs (GC/VM suspend) whose lock was
              // broken and re-claimed must not heartbeat the
              // REPLACEMENT's lock — if that replacement then crashes,
              // our beats would keep its dead lock's mtime fresh
              // forever, wedging all writers past the documented
              // expires-within-staleMs bound. A foreign token means we
              // were presumed dead: log once and stop beating (the
              // body finishes on the degraded last-writer-wins terms
              // the object Scaladoc documents). A missing/unreadable
              // lock is a mid-break/mid-release window — skip this
              // touch and re-check next beat.
              // The check-then-touch pair is NOT atomic (ADVICE r15): a
              // break+reclaim landing between readToken and setTimes
              // still refreshes the replacement's lock for ONE beat.
              // Re-verify the token AFTER the touch and stop on a
              // foreign one: the residual exposure is bounded at that
              // single touch (the replacement holder's next heartbeat
              // re-freshens its own mtime anyway, so one foreign touch
              // only delays ITS breaker by <= one beat — never the
              // pre-r14 forever-wedge).
              readToken(lock) match {
                case Some(tk) if tk == token =>
                  try fs.setTimes(lock, System.currentTimeMillis(), -1L)
                  catch { case _: java.io.IOException => () }
                  if (!readToken(lock).forall(_ == token)) {
                    System.err.println(s"[graft] lease heartbeat $lock: " +
                      "lock was re-claimed mid-touch; stopping heartbeat")
                    mine = false
                  }
                case Some(_) =>
                  System.err.println(s"[graft] lease heartbeat $lock: " +
                    "lock was broken and re-claimed by another holder; " +
                    "stopping heartbeat")
                  mine = false
                case None => ()
              }
            }
          } catch { case _: InterruptedException => () }
        }, s"graft-lease-heartbeat-${lock.getName}")
        t.setDaemon(true); t.start(); Some(t)
      }
    try body finally {
      beat.foreach { t => t.interrupt(); t.join(2000L) }
      // RELEASE BY ATOMIC RENAME: the old read-token-then-delete was
      // itself a TOCTOU — capture atomically instead; ours → released,
      // someone else's → restore (or drop the tombstone if the path
      // was re-claimed meanwhile — the documented degraded mode).
      val tomb = new Path(
        lock.toString + ".release-" + java.util.UUID.randomUUID().toString.take(8))
      try {
        if (fs.rename(lock, tomb)) {
          if (readToken(tomb).contains(token)) fs.delete(tomb, false)
          else if (!fs.rename(tomb, lock)) fs.delete(tomb, false)
        }
      } catch { case _: java.io.IOException => () } // gone already: no-op
    }
  }
}
