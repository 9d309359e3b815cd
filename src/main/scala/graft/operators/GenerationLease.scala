package graft.operators

import org.apache.spark.sql.SparkSession

/** Single-writer lease on a layout table's generation chain (SURVEY
  * §2.I): every verb that stages a new generation or reclaims old ones
  * ([[MergeOps.applyToLayout]], [[MergeOps.rebucket]],
  * [[MergeOps.compactGenerations]], [[MergeOps.vacuum]]) runs inside
  * [[withLease]], so two concurrent appliers — two
  * [[graft.streaming.StreamingMerge]] queries, or a compactor racing an
  * applier, possibly in DIFFERENT JVMs — serialize instead of both
  * staging the same `_vN` and corrupting the chain. Crash recovery was
  * already filesystem-forward (CrashRecoverySpec); this closes
  * CONTENTION, the other half of multi-writer safety.
  *
  * Mechanics (local filesystem; on an object store the same protocol
  * rides conditional PUTs, as Delta/Iceberg commit services do):
  *
  *  - the lease is one file `<layoutRoot>/<table>_LEASE`, taken with an
  *    atomic create-new; the content is the holder token (pid@host/uuid)
  *    for diagnosis;
  *  - while held, a daemon heartbeat touches the file's mtime every
  *    leaseMs/3, so a LIVE holder never looks stale no matter how long
  *    its apply runs;
  *  - a lease whose mtime is older than leaseMs is STALE (holder died —
  *    halt() leaves no cleanup). Takeover is rename-then-delete: rename
  *    to a unique tomb name is atomic, so exactly one contender reclaims
  *    a given stale lease; everyone then re-races the create;
  *  - release deletes the file only while the heartbeat still owns it —
  *    a holder that lost its lease to a (mis-tuned) stale takeover must
  *    not delete the new holder's lease;
  *  - REENTRANT per thread: applyToLayout holds the lease while its
  *    sizing policy folds in a rebucket, which would otherwise deadlock
  *    against itself. A thread-local held-set makes nested acquires
  *    no-ops.
  *
  * Waiters poll (50 ms): chain maintenance is seconds-granular, not a
  * hot lock. [[LeaseMsKey]]/[[WaitMsKey]] tune the staleness horizon and
  * the acquire deadline; acquire past the deadline throws rather than
  * proceeding unfenced.
  */
object GenerationLease {

  /** Session conf: lease staleness horizon (ms). A holder heartbeats at
    * a third of this, so only a DEAD holder's lease crosses it.
    */
  val LeaseMsKey = "spark.graft.merge.leaseMs"

  /** Session conf: max time an acquire waits before throwing (ms). */
  val WaitMsKey = "spark.graft.merge.leaseWaitMs"

  private val DefaultLeaseMs = 60000L
  private val DefaultWaitMs = 600000L

  private val held = new ThreadLocal[scala.collection.mutable.Set[String]] {
    override def initialValue() = scala.collection.mutable.Set.empty[String]
  }

  private def leasePath(s: SparkSession, corpusDir: String,
                        table: String): java.nio.file.Path =
    java.nio.file.Paths.get(MergeOps.layoutRoot(s, corpusDir), s"${table}_LEASE")

  /** Run `body` holding the single-writer lease for (corpus, table).
    * Reentrant within a thread; throws IllegalStateException when the
    * lease cannot be acquired before the wait deadline.
    */
  def withLease[T](s: SparkSession, corpusDir: String, table: String)
                  (body: => T): T = {
    val path = leasePath(s, corpusDir, table)
    val key = path.toAbsolutePath.normalize.toString
    if (held.get.contains(key)) return body // reentrant: already fenced
    val leaseMs = s.conf.getOption(LeaseMsKey).map(_.toLong)
      .getOrElse(DefaultLeaseMs)
    val waitMs = s.conf.getOption(WaitMsKey).map(_.toLong)
      .getOrElse(DefaultWaitMs)
    val token = s"${java.lang.ProcessHandle.current.pid}@" +
      s"${java.net.InetAddress.getLocalHost.getHostName}/" +
      java.util.UUID.randomUUID.toString
    acquire(path, token, leaseMs, waitMs)
    val beat = heartbeat(path, token, leaseMs)
    held.get += key
    try body finally {
      held.get -= key
      beat.interrupt()
      beat.join(2000)
      // delete only our own lease: a stale takeover (mis-tuned horizon)
      // may have replaced it with another holder's file
      try {
        if (java.nio.file.Files.exists(path) &&
            new String(java.nio.file.Files.readAllBytes(path),
              "UTF-8") == token)
          java.nio.file.Files.deleteIfExists(path)
      } catch { case _: java.io.IOException => () }
    }
  }

  private def acquire(path: java.nio.file.Path, token: String,
                      leaseMs: Long, waitMs: Long): Unit = {
    val deadline = System.nanoTime() + waitMs * 1000000L
    var attempt = 0
    while (true) {
      try {
        // atomic create-new + content in two steps: CREATE_NEW decides
        // the winner; the token lands before anyone could judge the
        // file stale (mtime is fresh by construction)
        java.nio.file.Files.write(path, token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        return
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          try {
            val age = System.currentTimeMillis() -
              java.nio.file.Files.getLastModifiedTime(path).toMillis
            // dead-pid fast path: a holder that halt()ed on THIS host is
            // stale immediately — CrashRecovery's replay must not sit
            // out the whole time horizon waiting for a corpse
            val deadLocal = scala.util.Try {
              val holder = new String(
                java.nio.file.Files.readAllBytes(path), "UTF-8")
              val pid = holder.takeWhile(_ != '@').toLong
              val host = holder.dropWhile(_ != '@').drop(1).takeWhile(_ != '/')
              host == java.net.InetAddress.getLocalHost.getHostName &&
                java.lang.ProcessHandle.of(pid)
                  .map[java.lang.Boolean](p => p.isAlive)
                  .orElse(java.lang.Boolean.FALSE) == java.lang.Boolean.FALSE
            }.getOrElse(false)
            if (age > leaseMs || deadLocal) {
              // stale: holder died. Rename-then-delete so exactly one
              // contender reclaims THIS lease incarnation; the rename
              // fails for everyone else and they re-race the create.
              val tomb = path.resolveSibling(
                s"${path.getFileName}.tomb.${java.util.UUID.randomUUID}")
              java.nio.file.Files.move(path, tomb)
              java.nio.file.Files.deleteIfExists(tomb)
            }
          } catch { case _: java.io.IOException => () } // lost a race — loop
          if (System.nanoTime() > deadline)
            throw new IllegalStateException(
              s"generation lease at $path not acquired within ${waitMs}ms " +
                s"(holder: ${scala.util.Try(new String(
                  java.nio.file.Files.readAllBytes(path), "UTF-8"))
                  .getOrElse("<gone>")})")
          attempt += 1
          Thread.sleep(50)
      }
    }
  }

  private def heartbeat(path: java.nio.file.Path, token: String,
                        leaseMs: Long): Thread = {
    val t = new Thread(() => {
      try {
        while (!Thread.currentThread.isInterrupted) {
          Thread.sleep(math.max(50L, leaseMs / 3))
          // touch only while the file is still ours
          if (new String(java.nio.file.Files.readAllBytes(path),
              "UTF-8") == token)
            java.nio.file.Files.setLastModifiedTime(path,
              java.nio.file.attribute.FileTime.fromMillis(
                System.currentTimeMillis()))
        }
      } catch {
        case _: InterruptedException => ()
        case _: java.io.IOException => ()
      }
    }, s"graft-lease-heartbeat-${path.getFileName}")
    t.setDaemon(true)
    t.start()
    t
  }
}
