package graft.log

import org.apache.hadoop.fs.{FileSystem, Path}

/** Reusable filesystem lease lock — [[TopicLog]]'s `_publish.lock`
  * discipline extracted for other single-writer artifacts (the
  * standing [[graft.operators.LshIndex]]'s generation publish, r10
  * verdict ask #2). Semantics, kept identical to the topic lock:
  *
  *  - acquisition is an atomic create-if-absent (`O_EXCL` via
  *    `File.createNewFile` on the local scheme — Hadoop's local
  *    `create(path, overwrite=false)` is check-then-create and two
  *    racers can both "win"; HDFS/object-store committers make
  *    `create(_, false)` itself atomic);
  *  - each acquisition writes a UNIQUE TOKEN into the lock file, so a
  *    stale-break is a compare-and-delete on (mtime, token) — mtime
  *    alone has filesystem-tick granularity, and a lock broken and
  *    re-acquired within one tick could otherwise be mistaken for the
  *    stale one and wrongly deleted;
  *  - a daemon refreshes the lock mtime IN PLACE every `leaseMs / 3`,
  *    CAPPED at [[TopicLog.RenewalCapMs]] — staleness is judged by
  *    each observer's own floor, so a holder configured with a long
  *    lease must still renew fast enough for a default-config peer;
  *  - staleness floors at `2 × RenewalCapMs` so a mis-configured tiny
  *    lease cannot break a live, renewing holder.
  *
  * Unlike the topic lock there is no sidecar to reconcile on a stale
  * break — callers pass `onStaleBreak` when breaking a dead holder's
  * lock must first repair the artifact it was mid-way through writing
  * BEFORE the break frees other waiters to build on it. The LshIndex
  * deliberately passes NONE: its repair runs post-acquisition
  * (`validatedManifestLocked` re-checks the signature watermark as
  * the first act under any fresh lease), which covers the stale-break
  * path and every other entry equally — LshIndexSpec's stale-lock
  * test pins that a broken dead holder's half-written state is
  * repaired by the breaker before it appends.
  *
  * A stale break means a SLOW holder may still be alive (GC pause, FS
  * hang past the staleness floor) and now believes it holds a lock it
  * lost. [[FsLease.Held.stillHeld]] is the fence: re-read the lock
  * token immediately before the irreversible step (the LshIndex
  * checks it before its manifest write and generation-marker rename)
  * and abort if the token is no longer ours. `release()` is likewise
  * a compare-and-delete on the token. BOTH are best-effort
  * check-then-act on a plain filesystem, not atomic CAS: a steal can
  * land between the token read and the following write/delete, so a
  * fenced-out holder can still (rarely) free a thief's fresh lock or
  * rename past a just-lost lease. The backstops are last-writer-wins
  * atomic renames on the artifact side plus retry re-validation (a
  * holder whose lock vanished re-acquires and re-reads published
  * state; the thief's own next fence catches a killed lock) —
  * injected-steal specs pin both windows.
  */
final class FsLease(fs: FileSystem, lockPath: Path,
    leaseMs: Long = 5 * 60 * 1000L, onStaleBreak: () => Unit = () => ()) {

  private def staleAfterMs: Long = math.max(leaseMs, 2 * TopicLog.RenewalCapMs)

  /** The observer-side staleness floor this instance judges other
    * holders by — exposed so callers that approximate "is a writer
    * alive" from the lock mtime alone use the SAME window as the
    * lease itself (a divergent hardcoded window could judge a live,
    * renewing holder dead). */
  def staleAfterMillis: Long = staleAfterMs

  private def tryCreate(token: String): Boolean =
    if (fs.getScheme == "file") {
      val f = new java.io.File(lockPath.toUri.getPath)
      f.getParentFile.mkdirs()
      val won = f.createNewFile()
      if (won)
        try java.nio.file.Files.writeString(f.toPath, token)
        catch { case _: java.io.IOException => () }
      won
    } else {
      try {
        val out = fs.create(lockPath, false) // throws if the lock exists
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch { case _: java.io.IOException => false }
    }

  private def readToken(): String =
    try {
      val in = fs.open(lockPath)
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } catch { case _: java.io.IOException => "" }

  /** Compare-and-delete of a lock OBSERVED as stale: `onStaleBreak`
    * (the artifact repair) may take seconds, so only delete if the
    * lock is still the exact (mtime, token) we judged dead — another
    * waiter may have broken it and a live holder re-acquired. */
  private def breakStale(observedMod: Long, observedToken: String): Unit = {
    onStaleBreak()
    try {
      if (fs.getFileStatus(lockPath).getModificationTime == observedMod &&
          readToken() == observedToken)
        fs.delete(lockPath, false)
    } catch { case _: java.io.IOException => () } // already released
  }

  /** Break the lock iff it is OBSERVED stale right now — the
    * open/recover path: heal a dead holder's leftovers (running
    * `onStaleBreak` first, exactly like a waiter's break) WITHOUT
    * acquiring. A fresh lock — a live holder in another process — is
    * left alone to complete its own commit. */
  def breakIfStale(): Unit = {
    val mod =
      try {
        if (fs.exists(lockPath)) fs.getFileStatus(lockPath).getModificationTime
        else -1L
      } catch { case _: java.io.IOException => -1L }
    if (mod >= 0 && System.currentTimeMillis() - mod > staleAfterMs)
      breakStale(mod, readToken())
  }

  /** Blocks until the lease is held; returns a handle whose `release()`
    * stops renewal and frees the lock. Default wait outlasts a live
    * holder's full lease plus margin — giving up earlier than the
    * lease can expire turns a slow-but-alive holder into a spurious
    * failure. */
  def acquire(timeoutMs: Long = -1L): FsLease.Held = {
    val waitMs = if (timeoutMs > 0) timeoutMs else staleAfterMs + 60 * 1000L
    val deadline = System.currentTimeMillis() + waitMs
    val token = java.util.UUID.randomUUID().toString
    while (!tryCreate(token)) {
      val mod =
        try fs.getFileStatus(lockPath).getModificationTime
        catch { case _: java.io.IOException => -1L } // just released
      if (mod >= 0 && System.currentTimeMillis() - mod > staleAfterMs)
        breakStale(mod, readToken())
      else if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"timed out after ${waitMs}ms waiting for lease on $lockPath")
      else Thread.sleep(25)
    }
    new FsLease.Held(fs, lockPath, leaseMs, token)
  }

  /** Run `body` under the lease, releasing on all paths. */
  def withLease[T](body: => T): T = withLeaseHeld(_ => body)

  /** [[withLease]] handing `body` the [[FsLease.Held]] handle, for
    * callers that fence an irreversible step on [[FsLease.Held.stillHeld]]. */
  def withLeaseHeld[T](body: FsLease.Held => T): T = {
    val held = acquire()
    try body(held) finally held.release()
  }
}

object FsLease {
  /** Thrown by consumers whose [[Held.stillHeld]] fence failed before
    * an irreversible commit step: the lease was stale-broken (renewal
    * starvation) and a thief may be mid-write — abort without touching
    * published state and let the caller's retry re-validate. */
  final class FencedException(msg: String) extends IllegalStateException(msg)

  /** A held lease: renewal daemon + release. Renewal refreshes mtime
    * IN PLACE (a delete-and-recreate would open a just-released window
    * in which a waiter's create-if-absent succeeds → two holders).
    * Stop signalling is a latch, not interruption — Hadoop's local-FS
    * calls can swallow the interrupt flag. */
  final class Held private[log] (fs: FileSystem, lockPath: Path,
      leaseMs: Long, token: String) {
    private val done = new java.util.concurrent.CountDownLatch(1)
    private val t = new Thread(() => {
      val interval =
        math.min(math.max(leaseMs / 3, 50L), TopicLog.RenewalCapMs)
      while (!done.await(interval, java.util.concurrent.TimeUnit.MILLISECONDS)) {
        try fs.setTimes(lockPath, System.currentTimeMillis(), -1L)
        catch { case _: java.io.IOException => () } // transient: retry next tick
      }
    })
    t.setDaemon(true)
    t.setName(s"graft-lease-renewal-$lockPath")
    t.start()

    private def tokenOnDisk(): String =
      try {
        val in = fs.open(lockPath)
        try new String(in.readAllBytes(), "UTF-8") finally in.close()
      } catch { case _: java.io.IOException => "" }

    /** Pre-publish fence: true iff the lock file still carries OUR
      * token. False means a waiter judged us dead and token-CAS-broke
      * the lock (renewal starved past the staleness floor) — the
      * caller must abort its irreversible step and retry from the
      * re-validated artifact under a fresh acquisition. */
    def stillHeld(): Boolean = tokenOnDisk() == token

    /** Stop renewal and free the lock — compare-and-delete on our
      * token: if the lock was stale-broken and re-acquired by another
      * writer, deleting it here would kill the LIVE holder's lease,
      * so a fenced-out loser leaves it untouched. Best-effort, not
      * atomic (see the class scaladoc): a steal landing between the
      * token read and the delete still loses its lock here — the
      * thief's own pre-publish fence catches the kill and it retries,
      * so exactly-once survives (injection-spec'd). */
    def release(): Unit = {
      done.countDown(); t.join()
      try {
        if (tokenOnDisk() == token) {
          FsLease.testBeforeReleaseDelete()
          fs.delete(lockPath, false)
        }
      } catch { case _: java.io.IOException => () }
    }
  }

  /** Test-only injection point inside `release()`'s check-then-act
    * window — after the token compared equal, before the delete —
    * letting a spec steal the lock at the exact instant the doc above
    * documents and prove the system self-heals. */
  private[graft] var testBeforeReleaseDelete: () => Unit = () => ()
}
