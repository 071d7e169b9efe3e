package graft.cdc

import java.nio.file.{FileSystems, Path, Paths, StandardWatchEventKinds, WatchService}
import java.util.concurrent.TimeUnit

/** Event-driven CDC wakeup — the JVM WatchService equivalent of the
  * reference's fsnotify gate (triggers.go:122-162): watch the database
  * file's DIRECTORY, react only to events on the db file itself and (in
  * WAL mode) its `-wal`/`-shm` siblings, ignore attribute-only changes
  * (fsnotify Chmod parity — WatchService doesn't surface chmod as
  * create/modify/delete, so that filter is structural here).
  *
  * Used by [[CdcEngine]] to gate its poll loop: instead of sleeping a
  * fixed interval between drains, the loop blocks until a relevant file
  * event arrives (or the interval elapses — the poll remains as a
  * fallback so a missed event can only add latency, never lose data;
  * delivery is driven by the log contents, not by the events).
  */
trait Wakeup extends AutoCloseable {
  /** Block until a wakeup signal or `timeoutMs`. Returns true if woken
    * by a signal. Spurious wakeups are allowed. */
  def await(timeoutMs: Long): Boolean
  def close(): Unit
}

object Wakeup {
  /** Fixed-interval fallback: await blocks on an interruptible gate
    * instead of a bare sleep, so `close()` (engine shutdown / SIGINT)
    * is observed immediately rather than after the interval expires —
    * the same immediate-stop behavior [[FileWakeup]] has. One instance
    * per engine: close is terminal (engines are single-use). */
  final class Poll extends Wakeup {
    private val closed = new java.util.concurrent.CountDownLatch(1)
    override def await(timeoutMs: Long): Boolean =
      closed.await(timeoutMs, TimeUnit.MILLISECONDS)
    override def close(): Unit = closed.countDown()
  }

  /** Fresh poll gate — the default wakeup for a new engine. */
  def poll(): Wakeup = new Poll
}

/** Watches `dbFile`'s parent directory for create/modify/delete events on
  * the db file, `<db>-wal`, and `<db>-shm` (reference watchTargets,
  * triggers.go:126-131). */
class FileWakeup(dbFile: String, wal: Boolean = true) extends Wakeup {
  private val path: Path = Paths.get(dbFile).toAbsolutePath
  private val dir: Path = path.getParent
  private val names: Set[String] = {
    val base = path.getFileName.toString
    if (wal) Set(base, s"$base-wal", s"$base-shm") else Set(base)
  }
  private val ws: WatchService = FileSystems.getDefault.newWatchService()
  dir.register(ws, StandardWatchEventKinds.ENTRY_CREATE,
    StandardWatchEventKinds.ENTRY_MODIFY, StandardWatchEventKinds.ENTRY_DELETE)

  override def await(timeoutMs: Long): Boolean = try {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var woken = false
    var remainingMs = timeoutMs
    while (!woken && remainingMs > 0) {
      val key = ws.poll(remainingMs, TimeUnit.MILLISECONDS)
      if (key == null) remainingMs = 0
      else {
        val it = key.pollEvents().iterator()
        while (it.hasNext && !woken) {
          val ev = it.next()
          ev.context() match {
            case p: Path if names.contains(p.getFileName.toString) => woken = true
            case _ => () // unrelated file in the same directory
          }
        }
        key.reset()
        remainingMs = (deadline - System.nanoTime()) / 1000000L
      }
    }
    woken
  } catch {
    // close() during a blocked poll — treat as a wakeup so the caller's
    // loop re-checks its stop flag immediately
    case _: java.nio.file.ClosedWatchServiceException => true
  }

  override def close(): Unit = ws.close()
}
