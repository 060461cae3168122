package graft.core

import java.io.{FileNotFoundException, IOException}

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import graft.streaming.AttributeLogFamily

/** Storage-level serialization of transaction commits — the analog of the
  * reference's single transaction-manager observer that all coordinators'
  * commits flow through (reference: direct/transaction-manager/.../
  * TransactionLogObserver.java:81; clients never validate locally, they
  * send requests through one serialized log consumer).
  *
  * Two layers, both keyed by STORAGE identity (never by coordinator
  * instance):
  *
  *  - an in-JVM monitor per [[AttributeLogFamily.commitLockToken]] —
  *    coordinators in one JVM over the same storage serialize here, no
  *    filesystem round-trips;
  *  - a cross-process marker-file lease for families exposing a
  *    [[AttributeLogFamily.commitLockPath]] (path-backed storages a second
  *    JVM can reach): atomic `create(overwrite = false)` claims the lock —
  *    atomic on local filesystems and HDFS; a holder crash is healed by
  *    lease expiry (a waiter breaks locks older than `leaseMs`).
  *
  * The lease carries the standard lease caveat: a holder stalled past
  * `leaseMs` (GC pause mid-commit) can lose exclusivity. A heartbeat
  * thread refreshes the marker's mtime at `leaseMs / 4` while the commit
  * runs, so a commit is only preempted when its whole JVM stalls longer
  * than the lease (not merely because a bulk append outlives one lease
  * interval); a broken lease is logged loudly on both sides. Storages
  * with a real conditional-put (object stores) would arbitrate there
  * instead.
  */
object CommitArbiter {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private val monitors = TrieMap.empty[String, Object]

  /** Tokens held by the current thread. The in-JVM monitor is reentrant by
    * construction (`synchronized`), but the marker-file lease is not — a
    * transaction commit that holds the lock and then appends through a
    * storage whose `append` also takes the lock must not re-claim the
    * marker against itself (it would spin until its own lease is broken).
    */
  private val held = new ThreadLocal[Set[String]] {
    override def initialValue(): Set[String] = Set.empty
  }

  /** Run `f` as the storage's exclusive committer. Reentrant: a thread
    * already holding the token runs `f` directly.
    */
  def withCommitLock[T](family: AttributeLogFamily)(f: => T): T = {
    val token = family.commitLockToken
    if (held.get().contains(token)) f
    else {
      val mon = monitors.getOrElseUpdate(token, new Object)
      mon.synchronized {
        held.set(held.get() + token)
        try {
          family.commitLockPath match {
            case Some(p) =>
              withMarkerLock(family.spark.sparkContext.hadoopConfiguration, p)(f)
            case None => f
          }
        } finally held.set(held.get() - token)
      }
    }
  }

  /** Cross-process mutex via atomic marker-file creation with lease expiry.
    * The marker holds a random claim token so release only ever deletes the
    * caller's own claim (a waiter that broke our expired lease and claimed
    * is not clobbered).
    *
    * Atomicity of the claim: on local filesystems Hadoop's
    * `create(overwrite = false)` is exists-check-then-open (a TOCTOU
    * window two claimants can both pass), so local paths claim through
    * NIO `CREATE_NEW` — a single O_CREAT|O_EXCL syscall. Non-local
    * schemes keep the Hadoop create, which IS atomic where it matters
    * (HDFS arbitrates at the namenode).
    */
  private[graft] def withMarkerLock[T](conf: Configuration, lockPath: String,
      leaseMs: Long = 60000L, pollMs: Long = 25L,
      timeoutMs: Long = 300000L)(f: => T): T = {
    val p = new Path(lockPath)
    val fs = FileSystem.get(p.toUri, conf)
    val claim = java.util.UUID.randomUUID().toString
    val local = p.toUri.getScheme == null || p.toUri.getScheme == "file"
    def tryClaim(): Boolean =
      if (local) {
        val np = java.nio.file.Paths.get(p.toUri.getPath)
        try {
          Option(np.getParent).foreach(java.nio.file.Files.createDirectories(_))
          java.nio.file.Files.write(np, claim.getBytes("UTF-8"),
            java.nio.file.StandardOpenOption.CREATE_NEW,
            java.nio.file.StandardOpenOption.WRITE)
          true
        } catch { case _: IOException => false }
      } else {
        try {
          val out = fs.create(p, false)
          out.writeBytes(claim)
          out.close()
          true
        } catch { case _: IOException => false }
      }
    // Whether the marker still holds OUR claim token (not a waiter's
    // re-claim after breaking our lease). Three-valued: None means the
    // check itself failed (transient I/O) — only a SUCCESSFUL read of a
    // different token proves the lease was taken, so an indeterminate
    // answer must not stop the heartbeat (a hiccup-killed heartbeat would
    // silently revert the commit to unprotected pre-heartbeat behavior).
    // A missing or short file IS determinate: our complete claim was
    // replaced.
    def stillOurs(): Option[Boolean] =
      try {
        val in = fs.open(p)
        try {
          val buf = new Array[Byte](claim.length)
          var off = 0
          var n = 0
          while (off < buf.length && n >= 0) {
            n = in.read(buf, off, buf.length - off)
            if (n > 0) off += n
          }
          Some(off == buf.length && new String(buf, "UTF-8") == claim)
        } finally in.close()
      } catch {
        case _: FileNotFoundException => Some(false)
        case _: IOException           => None
      }

    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      if (System.currentTimeMillis() > deadline)
        throw new IllegalStateException(
          s"commit lock $lockPath not acquired within ${timeoutMs}ms")
      if (tryClaim()) acquired = true
      else {
        try {
          val st = fs.getFileStatus(p)
          if (System.currentTimeMillis() - st.getModificationTime > leaseMs) {
            // stale holder: break the lease, re-claim. With the holder-side
            // heartbeat this means a JVM dead (or stalled) for a full lease
            // interval — loud by design, silent lease breaks reintroduce
            // the concurrent-append clobbering this lock exists to prevent.
            log.warn("Breaking commit lease {} last refreshed {}ms ago " +
              "(lease {}ms) — holder presumed dead", lockPath,
              Long.box(System.currentTimeMillis() - st.getModificationTime),
              Long.box(leaseMs))
            fs.delete(p, false)
          } else Thread.sleep(pollMs)
        } catch { case _: FileNotFoundException => () }
      }
    }
    // heartbeat: refresh the marker mtime while the commit runs, so a bulk
    // append outliving one lease interval is not preempted by a waiter.
    // Scheduled on ONE shared daemon scheduler (appends can be frequent —
    // a thread per acquisition would churn thousands of threads whose only
    // job is to sleep). The claim check keeps a heartbeat that lost its
    // lease anyway (whole-JVM stall > leaseMs) from refreshing the new
    // holder's marker: only a successful read of a DIFFERENT token stops
    // the beat; an indeterminate check retries next interval.
    val stopped = new java.util.concurrent.atomic.AtomicBoolean(false)
    lazy val beat: java.util.concurrent.ScheduledFuture[_] =
      beatPool.scheduleWithFixedDelay(() => {
        if (!stopped.get) stillOurs() match {
          case Some(true) =>
            try fs.setTimes(p, System.currentTimeMillis(), -1)
            catch { case _: IOException => () } // transient; next beat retries
          case Some(false) =>
            log.error("Commit lease {} was broken while held (claim token " +
              "replaced) — a concurrent writer may be committing; this " +
              "holder's commit is no longer exclusive", lockPath)
            stopped.set(true)
            beat.cancel(false)
          case None => () // indeterminate (transient I/O): retry next beat
        }
      }, math.max(leaseMs / 4, 1L), math.max(leaseMs / 4, 1L),
        java.util.concurrent.TimeUnit.MILLISECONDS)
    beat // force scheduling
    try f
    finally {
      stopped.set(true)
      beat.cancel(false)
      try {
        if (stillOurs().contains(true)) fs.delete(p, false)
      } catch { case _: FileNotFoundException => () }
    }
  }

  /** One shared daemon scheduler for every lease heartbeat in the JVM. */
  private lazy val beatPool: java.util.concurrent.ScheduledExecutorService =
    java.util.concurrent.Executors.newSingleThreadScheduledExecutor(r => {
      val t = new Thread(r, "graft-commit-lease-heartbeat")
      t.setDaemon(true)
      t
    })
}
