package graft.streaming

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, FileAlreadyExistsException}

/** Cross-process mutual exclusion for the ledger's check-then-append
  * critical section — the missing half of the reference's atomic
  * `try_mark_start` (clickhouse_client.py:536-613). The reference gets
  * atomicity from ClickHouse executing INSERT-with-subquery as one
  * statement; a parquet-append ledger has no transactional insert, so
  * the equivalent primitive is an exclusive-create lock file:
  * `Files.createFile` is atomic on POSIX and object-store FUSE mounts
  * alike (O_CREAT|O_EXCL), making "read ledger → check running →
  * append open record" a single critical section across processes.
  *
  * The lock guards only that sub-second gate, NOT the batch itself —
  * long-lived mutual exclusion is still the open ledger record (R8),
  * exactly like the reference. A crash INSIDE the critical section
  * leaves a stale lock; callers then time out with a message naming
  * the lock path — the operator-intervention story mirrors the
  * reference's stuck-open-record + force takeover. The lock file lives
  * NEXT TO the ledger directory (`<ledgerDir>.lock`) so the parquet
  * reader never sees it.
  */
object LedgerLock {

  final class LockTimeout(msg: String) extends RuntimeException(msg)

  private def lockPath(ledgerDir: String): Path = {
    val p = Paths.get(ledgerDir + ".lock")
    Option(p.getParent).foreach(Files.createDirectories(_))
    p
  }

  /** Run `f` holding the exclusive lock for `ledgerDir`; waits up to
    * `timeoutMs` (polling) then throws [[LockTimeout]]. */
  def withLock[T](ledgerDir: String, timeoutMs: Long = 30000L)(f: => T): T = {
    val path = lockPath(ledgerDir)
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      try {
        Files.createFile(path)
        // holder breadcrumb for operators diagnosing a stale lock
        Files.write(path,
          s"pid=${ProcessHandle.current().pid()} epochMs=${System.currentTimeMillis()}"
            .getBytes(StandardCharsets.UTF_8))
        acquired = true
      } catch {
        case _: FileAlreadyExistsException =>
          if (System.currentTimeMillis() >= deadline)
            throw new LockTimeout(
              s"could not acquire ledger lock $path within ${timeoutMs}ms — " +
                "a concurrent mark-start is in flight, or a previous one " +
                "crashed mid-gate (stale lock: inspect and remove the file)")
          Thread.sleep(10L)
      }
    }
    try f
    finally Files.deleteIfExists(path)
  }
}
