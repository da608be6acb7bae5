package graft.app

/** The ONE background-poller loop shared by the timer scheduler, alarm
  * monitor, and pending-node sweeper. Contract:
  *  - a failing `body` is logged and the loop paces on (sleep is outside
  *    the body's try — a persistent failure never busy-loops);
  *  - termination is FLAG-based, not interrupt-flag-based: Spark jobs
  *    running inside `body` may consume/clear the thread's interrupt, so
  *    `stop()` sets the volatile flag, interrupts (to cut a sleep short),
  *    and joins briefly — an in-flight body finishes its tick and the
  *    loop then observes the flag and exits, never orphaning a poller.
  */
final class DaemonPoller(name: String, body: () => Unit) {

  @volatile private var running = false
  @volatile private var thread: Thread = null

  def start(pollMillis: Long): Unit = synchronized {
    if (running) return
    running = true
    thread = new Thread(() => {
      val self = Thread.currentThread()
      // `thread eq self` ties the loop to the CURRENT generation: a
      // stop() that timed out mid-tick followed by start() must not
      // leave the superseded thread looping alongside the new one
      // (running is true again, but `thread` now names the successor)
      while (running && (thread eq self)) {
        try body()
        catch {
          case e: Throwable =>
            System.err.println(s"[$name] poll failed: ${e.getMessage}")
        }
        try Thread.sleep(pollMillis)
        catch { case _: InterruptedException => () } // re-check the flag
      }
    }, name)
    thread.setDaemon(true)
    thread.start()
  }

  def stop(joinMillis: Long = 5000): Unit = synchronized {
    if (!running) return
    running = false
    val t = thread
    thread = null
    t.interrupt()
    t.join(joinMillis)
    if (t.isAlive)
      System.err.println(s"[$name] still finishing its last tick after " +
        s"${joinMillis}ms; it will exit at the next flag check")
  }
}
