package graft.ops

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit, TimeoutException}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, Encoders}

/** External-CLI adapter (S9/S11): the engine-side seam for the
  * reference's shell-outs — pdftotext/pdftoppm/tesseract per file
  * (04_convert_contracts_to_text.py:265-392) and camelot under a
  * 10 s/page SIGALRM guard (06_extract_tables.py:51-65,197-205) —
  * re-expressed as executor-side process management under
  * `mapPartitions`.
  *
  * Two modes:
  *  - `reuseProcess = true` (default): ONE worker process per
  *    partition speaking a line protocol (one input line in → one
  *    output line out). This is the 100 TB shape: tool/model startup
  *    is amortized across the whole partition, like the reference's
  *    per-directory batching. A record that times out kills the
  *    worker (the SIGALRM analogue) and the next record gets a fresh
  *    one — one poisoned file never stalls the partition.
  *  - `reuseProcess = false`: one process per record, payload on
  *    stdin, `waitFor(timeout)` + `destroyForcibly` — the literal
  *    shape of the reference's per-file subprocess calls.
  *
  * Failure semantics mirror the reference's quarantine counters
  * (04:334-340): a timeout or tool crash yields a row with
  * `ok = false` instead of failing the Spark task, so one bad payload
  * out of millions costs one row, not a stage retry.
  *
  * The line protocol carries STRINGS (paths or text payloads — the
  * reference pipes file paths the same way); binary payloads belong
  * in per-record mode or an encoding chosen by the caller.
  */
object ExternalTool {

  /** @param command  argv of the tool (e.g. `Seq("/bin/sh", script)`)
    * @param timeoutMs per-RECORD guard, the camelot SIGALRM analogue
    * @param reuseProcess one worker per partition vs one per record */
  final case class ToolConf(command: Seq[String], timeoutMs: Long = 10000L,
      reuseProcess: Boolean = true)

  /** One row per input record, ok or not; `worker_pid` exposes
    * process identity so reuse is observable (and testable). */
  final case class ToolResult(id: Long, ok: Boolean, timed_out: Boolean,
      out: String, worker_pid: Long)

  /** Pipe each (id, payload-line) through the tool. Lazily spawns the
    * worker on first record; restarts it after a timeout/crash;
    * reaps it when the partition iterator is exhausted. */
  def pipe(ds: Dataset[(Long, String)], conf: ToolConf): Dataset[ToolResult] = {
    implicit val enc = Encoders.product[ToolResult]
    ds.mapPartitions { it =>
      if (conf.reuseProcess) reusingIterator(it, conf)
      else it.map(r => runOnce(r._1, r._2, conf))
    }
  }

  // ---- per-record mode -------------------------------------------------

  private def runOnce(id: Long, payload: String, conf: ToolConf): ToolResult = {
    val pb = new ProcessBuilder(conf.command.asJava)
      .redirectErrorStream(true)
    var proc: Process = null
    try {
      proc = pb.start()
      val pid = proc.pid()
      // stdout is drained on a helper thread so a tool writing more
      // than one pipe buffer can't deadlock against our waitFor
      val in = proc.getInputStream
      val drain = pool.submit(new java.util.concurrent.Callable[String] {
        override def call(): String = new String(in.readAllBytes(), "UTF-8")
      })
      val w = proc.getOutputStream
      w.write(payload.getBytes("UTF-8")); w.close()
      if (!proc.waitFor(conf.timeoutMs, TimeUnit.MILLISECONDS)) {
        proc.destroyForcibly().waitFor()
        ToolResult(id, ok = false, timed_out = true, out = "", pid)
      } else {
        val out = drain.get(conf.timeoutMs, TimeUnit.MILLISECONDS)
        ToolResult(id, proc.exitValue() == 0, timed_out = false,
          out.stripLineEnd, pid)
      }
    } catch {
      case _: Exception =>
        if (proc != null) proc.destroyForcibly().waitFor()
        ToolResult(id, ok = false, timed_out = false, out = "",
          if (proc != null) proc.pid() else -1L)
    }
  }

  // ---- per-partition worker mode ---------------------------------------

  // daemon pool for timeout-guarded reads: executor JVMs must not be
  // kept alive by a reader blocked on a dead tool's pipe
  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-external-tool")
      t.setDaemon(true); t
    }
  })

  private def reusingIterator(it: Iterator[(Long, String)],
      conf: ToolConf): Iterator[ToolResult] = new Iterator[ToolResult] {
    private var proc: Process = _
    private var reader: java.io.BufferedReader = _
    private var writer: java.io.BufferedWriter = _
    private var closed = false

    private def ensureWorker(): Unit =
      if (proc == null || !proc.isAlive) {
        kill()
        proc = new ProcessBuilder(conf.command.asJava)
          .redirectErrorStream(true).start()
        reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        writer = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
      }

    private def kill(): Unit = if (proc != null) {
      proc.destroyForcibly().waitFor()
      proc = null; reader = null; writer = null
    }

    private def cleanup(): Unit = if (!closed) { closed = true; kill() }

    override def hasNext: Boolean = {
      val h = it.hasNext
      if (!h) cleanup()
      h
    }

    override def next(): ToolResult = {
      val (id, payload) = it.next()
      try {
        ensureWorker()
        val pid = proc.pid()
        writer.write(payload); writer.write("\n"); writer.flush()
        val rd = reader
        val line = pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = rd.readLine()
        })
        try {
          val out = line.get(conf.timeoutMs, TimeUnit.MILLISECONDS)
          if (out == null) { // tool died mid-record
            kill()
            ToolResult(id, ok = false, timed_out = false, out = "", pid)
          } else ToolResult(id, ok = true, timed_out = false, out, pid)
        } catch {
          case _: TimeoutException =>
            // the SIGALRM analogue: kill the worker; the NEXT record
            // transparently gets a fresh one via ensureWorker()
            kill()
            ToolResult(id, ok = false, timed_out = true, out = "", pid)
        }
      } catch {
        case _: Exception =>
          val pid = if (proc != null) proc.pid() else -1L
          kill()
          ToolResult(id, ok = false, timed_out = false, out = "", pid)
      }
    }
  }
}
