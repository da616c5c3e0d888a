package graft.ops

import java.util.concurrent.{Executors, ThreadFactory, TimeUnit, TimeoutException}

import scala.jdk.CollectionConverters._

import org.apache.spark.TaskContext
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
  * Robustness invariants (each spec-pinned or load-bearing):
  *  - stdin writes happen on the helper pool, never the task thread,
  *    so a tool that stalls WITHOUT consuming stdin (the classic
  *    poisoned-startup case) still hits the timeout even when the
  *    payload exceeds the OS pipe buffer;
  *  - worker cleanup is registered as a TaskCompletionListener, so a
  *    `limit(n)`, downstream exception, or task kill that abandons
  *    the iterator cannot leak a live external process;
  *  - the worker line protocol REJECTS payloads containing newlines
  *    (ok = false) rather than writing them: a multi-line payload
  *    would desynchronize the one-line-in/one-line-out pairing and
  *    silently attribute answers to wrong records. Sanitize upstream
  *    (see MultimodalOps) or use per-record mode for raw payloads.
  */
object ExternalTool {

  /** @param command  argv of the tool (e.g. `Seq("/bin/sh", script)`)
    * @param timeoutMs per-RECORD guard, the camelot SIGALRM analogue
    * @param reuseProcess one worker per partition vs one per record
    * @param proxies   proxy URLs for network-bound tools (the S15
    *   seam of reference proxyhandler.py:15-44): exported to the tool
    *   as `GRAFT_PROXIES` (comma-joined, for tools that rotate
    *   themselves; per-ATTEMPT rotation belongs to
    *   [[graft.crz.Retry.retryRotating]]) plus the conventional
    *   `http_proxy`/`https_proxy` pair, which curl/wget-style fetchers
    *   honor without any flag plumbing. The conventional pair ROTATES
    *   per spawn — per-record mode seeds the choice with the MIXED
    *   record id ([[mixSeed]]: raw `id % n` pins stride- or
    *   parity-correlated id patterns, e.g. all-even ids with 2
    *   proxies, to one entry), worker mode with the mixed partition
    *   id advanced LINEARLY on every respawn (the +1 is after the
    *   mix, so the replacement of a timed-out worker is guaranteed
    *   the next proxy, never a hash collision back onto the same
    *   one) — so concurrent workers spread across the list and a
    *   timeout-killed worker's replacement tries the next proxy, all
    *   without tool cooperation. The network side stays external by
    *   contract — the engine only carries the configuration to the
    *   seam. */
  final case class ToolConf(command: Seq[String], timeoutMs: Long = 10000L,
      reuseProcess: Boolean = true, proxies: Seq[String] = Nil)

  /** Fibonacci-hash seed mixer for proxy rotation: correlated id
    * patterns (all even, fixed stride) must still spread across the
    * proxy list, which a bare `id % n` does not do. Exposed to the
    * spec so expectations derive from the same function. */
  private[graft] def mixSeed(x: Long): Long =
    java.lang.Long.hashCode(x * 0x9E3779B97F4A7C15L).toLong

  /** `position` is a ROTATION POSITION, not a raw seed: callers mix
    * ids/partition ids through [[mixSeed]] first, and worker respawns
    * add their spawn count AFTER the mix so "next spawn → next proxy"
    * stays literal. */
  /** Whether `setsid` (util-linux) is usable here. When it is, every
    * tool is spawned as its OWN process-group leader so a timeout kill
    * can signal the whole group atomically (see [[killTree]]); when it
    * is not (non-Linux dev box), spawn falls back to a bare start and
    * kill falls back to the snapshot sweep. Probed once per JVM. */
  private lazy val setsidAvailable: Boolean =
    try {
      val p = new ProcessBuilder("setsid", "--version")
        .redirectError(ProcessBuilder.Redirect.DISCARD)
        .redirectOutput(ProcessBuilder.Redirect.DISCARD)
        .start()
      p.waitFor(2, TimeUnit.SECONDS) && p.exitValue() == 0
    } catch { case _: Exception => false }

  private def spawn(conf: ToolConf, position: Long): Process = {
    val command =
      if (setsidAvailable) "setsid" +: conf.command else conf.command
    // stderr is DISCARDED, never merged into stdout: in worker mode a
    // single diagnostic line on stderr would be read as some record's
    // answer and desynchronize every later record/answer pairing — the
    // exact silent misattribution the newline-rejection invariant
    // guards against. Tools that need diagnostics keep them on stderr
    // (their own logs); the protocol owns stdout exclusively.
    val pb = new ProcessBuilder(command.asJava)
      .redirectError(ProcessBuilder.Redirect.DISCARD)
    if (conf.proxies.nonEmpty) {
      val env = pb.environment()
      env.put("GRAFT_PROXIES", conf.proxies.mkString(","))
      val n = conf.proxies.size
      val chosen = conf.proxies((((position % n) + n) % n).toInt)
      env.put("http_proxy", chosen)
      env.put("https_proxy", chosen)
    }
    pb.start()
  }

  /** Kill a process AND its descendants: destroyForcibly alone reaches
    * only the direct child (typically /bin/sh), orphaning the real
    * tool — the very process a timeout kill exists to stop — which
    * would keep burning CPU and hold the stdout pipe open. */
  private def killTree(p: Process): Unit = {
    // Primary path: the tool was spawned under setsid, so it LEADS its
    // own process group (pgid = pid) and `kill -9 -pgid` signals every
    // member atomically — including a child forked at the very moment
    // of the kill, which no snapshot-then-sweep can catch (the old
    // snapshot+re-check left exactly that fork-during-kill orphan
    // window: a child forked after the re-check but before the parent
    // was reaped escaped both passes). The group id survives member
    // reaping, so there is no read-then-act race to lose.
    if (setsidAvailable) {
      try {
        val k = new ProcessBuilder("kill", "-9", s"-${p.pid()}")
          .redirectError(ProcessBuilder.Redirect.DISCARD)
          .start()
        k.waitFor(2, TimeUnit.SECONDS)
      } catch { case _: Exception => () }
    }
    // Fallback sweep (also harmless belt-and-braces after a group
    // kill): snapshot BEFORE the parent dies — once killed and reaped
    // its children reparent to init and p.descendants() goes empty —
    // then kill the parent (dead, it cannot fork), then the snapshot
    // and one re-check for children forked between snapshot and
    // parent death. waitFor is bounded — an unkillable (e.g. D-state)
    // process must not hang the executor task thread.
    val snapshot = p.descendants().iterator().asScala.toList
    p.destroyForcibly()
    snapshot.foreach(h => { h.destroyForcibly(); () })
    p.descendants().forEach(h => { h.destroyForcibly(); () })
    p.waitFor(5, TimeUnit.SECONDS)
    ()
  }

  /** One row per input record, ok or not; `worker_pid` exposes
    * process identity so reuse is observable (and testable). */
  final case class ToolResult(id: Long, ok: Boolean, timed_out: Boolean,
      out: String, worker_pid: Long)

  /** Pipe each (id, payload-line) through the tool. Lazily spawns the
    * worker on first record; restarts it after a timeout/crash;
    * reaps it when the partition ends — normally or not. */
  def pipe(ds: Dataset[(Long, String)], conf: ToolConf): Dataset[ToolResult] = {
    implicit val enc = Encoders.product[ToolResult]
    ds.mapPartitions { it =>
      if (conf.reuseProcess) reusingIterator(it, conf)
      else it.map(r => runOnce(r._1, r._2, conf))
    }
  }

  // daemon pool for timeout-guarded pipe I/O: executor JVMs must not
  // be kept alive by a thread blocked on a dead tool's pipe
  private lazy val pool = Executors.newCachedThreadPool(new ThreadFactory {
    override def newThread(r: Runnable): Thread = {
      val t = new Thread(r, "graft-external-tool")
      t.setDaemon(true); t
    }
  })

  private def submit[T](body: => T) =
    pool.submit(new java.util.concurrent.Callable[T] {
      override def call(): T = body
    })

  // ---- per-record mode -------------------------------------------------

  private def runOnce(id: Long, payload: String, conf: ToolConf): ToolResult = {
    var proc: Process = null
    try {
      // the MIXED record id seeds the proxy choice: per-record
      // processes spread deterministically across the list even when
      // ids are parity- or stride-correlated (ADVICE r6)
      proc = spawn(conf, mixSeed(id))
      val pid = proc.pid()
      val in = proc.getInputStream
      val w = proc.getOutputStream
      // BOTH pipe directions on helper threads: a tool that neither
      // reads stdin nor writes stdout must still hit waitFor's
      // timeout below (a task-thread write would block forever on a
      // payload larger than the pipe buffer)
      val t0 = System.nanoTime()
      val drain = submit(new String(in.readAllBytes(), "UTF-8"))
      submit {
        // EPIPE here is legitimate: a tool may exit successfully
        // without consuming all input (head-like extractors)
        try { w.write(payload.getBytes("UTF-8")); w.close() }
        catch { case _: java.io.IOException => () }
      }
      if (!proc.waitFor(conf.timeoutMs, TimeUnit.MILLISECONDS)) {
        killTree(proc)
        ToolResult(id, ok = false, timed_out = true, out = "", pid)
      } else {
        try {
          // the drain gets the REMAINING budget, not a fresh one —
          // waitFor + a stalled drain must never hold the task thread
          // for 2× the documented per-record guard
          val left = conf.timeoutMs -
            (System.nanoTime() - t0) / 1000000L
          val out = drain.get(math.max(left, 1L), TimeUnit.MILLISECONDS)
          ToolResult(id, proc.exitValue() == 0, timed_out = false,
            out.stripLineEnd, pid)
        } catch {
          case _: TimeoutException => // exited but stdout never closed
            killTree(proc)
            ToolResult(id, ok = false, timed_out = true, out = "", pid)
        }
      }
    } catch {
      // task kill arrives as an interrupt: kill the tool, restore the
      // flag, and let the task DIE — converting it into an ok=false
      // row would keep a cancelled multi-hour partition running
      case ie: InterruptedException =>
        if (proc != null) killTree(proc)
        Thread.currentThread().interrupt()
        throw ie
      case _: Exception =>
        if (proc != null) killTree(proc)
        ToolResult(id, ok = false, timed_out = false, out = "",
          if (proc != null) proc.pid() else -1L)
    }
  }

  // ---- per-partition worker mode ---------------------------------------

  private def reusingIterator(it: Iterator[(Long, String)],
      conf: ToolConf): Iterator[ToolResult] = new Iterator[ToolResult] {
    private var proc: Process = _
    private var reader: java.io.BufferedReader = _
    private var writer: java.io.BufferedWriter = _
    private var closed = false
    // proxy rotation: the MIXED partition id spreads concurrent
    // workers across the list (correlated partition ids spread like
    // correlated record ids); the spawn count is added AFTER the mix
    // so a respawned worker is guaranteed the NEXT proxy — mixing the
    // sum instead could hash two consecutive spawns onto the same one
    private var spawns = 0
    private val partSeed: Long = mixSeed(
      Option(TaskContext.get()).map(_.partitionId().toLong).getOrElse(0L))

    // a limit(n)/take/downstream exception abandons this iterator
    // without draining it — the task-completion hook still reaps the
    // worker (same reason Spark's own PipedRDD registers one)
    Option(TaskContext.get())
      .foreach(_.addTaskCompletionListener[Unit](_ => cleanup()))

    private def ensureWorker(): Unit =
      if (proc == null || !proc.isAlive) {
        kill()
        proc = spawn(conf, partSeed + spawns)
        spawns += 1
        reader = new java.io.BufferedReader(
          new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
        writer = new java.io.BufferedWriter(
          new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
      }

    private def kill(): Unit = if (proc != null) {
      killTree(proc)
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
      // a payload with an embedded newline would desynchronize the
      // line protocol for every LATER record — refuse it instead
      if (payload.indexOf('\n') >= 0 || payload.indexOf('\r') >= 0)
        return ToolResult(id, ok = false, timed_out = false, out = "",
          worker_pid = if (proc != null) proc.pid() else -1L)
      try {
        ensureWorker()
        val pid = proc.pid()
        val wr = writer; val rd = reader
        // write + read both under the timeout, off the task thread: a
        // worker that stalls without consuming stdin must not hang
        // the task on a pipe-buffer-sized payload
        val answer = submit {
          wr.write(payload); wr.write("\n"); wr.flush()
          rd.readLine()
        }
        try {
          val out = answer.get(conf.timeoutMs, TimeUnit.MILLISECONDS)
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
        // task kill: reap the worker, restore the flag, die — see the
        // per-record handler for why this must not become a row
        case ie: InterruptedException =>
          kill()
          Thread.currentThread().interrupt()
          throw ie
        case _: Exception =>
          val pid = if (proc != null) proc.pid() else -1L
          kill()
          ToolResult(id, ok = false, timed_out = false, out = "", pid)
      }
    }
  }
}
