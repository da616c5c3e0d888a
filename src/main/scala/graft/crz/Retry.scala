package graft.crz

/** The S15 HTTP retry/backoff envelope
  * (03_download_contracts.py:114-153, applied at every fetch site as
  * `@retry(ConnectionError, tries=6, delay=3, backoff=2)`): a pure,
  * testable attempt schedule plus a generic retry wrapper for the
  * `foreachPartition` fetch seam (ops/Relational.scala S15 shell).
  *
  * Semantics match the reference decorator exactly: `tries` total
  * attempts; after each of the first `tries - 1` failures sleep the
  * current delay, then double it (`backoff`); the LAST attempt is
  * unguarded — its exception propagates. Retries happen per record
  * inside the executor task, never via Spark task re-execution (a
  * stage retry would refetch the whole partition — the reference
  * retries one URL).
  */
object Retry {

  /** tries=6, delay=3 s, backoff=2 — the reference's constants. */
  final case class Policy(tries: Int = 6, initialDelayMs: Long = 3000L,
      backoff: Double = 2.0) {
    require(tries >= 1, "tries must be >= 1")
    // a negative delay would surface as Thread.sleep's
    // IllegalArgumentException from inside the retry catch block,
    // masking the original failure — validate at construction instead
    require(initialDelayMs >= 0, "initialDelayMs must be >= 0")
    require(backoff > 0, "backoff must be > 0")
  }

  /** Sleeps between attempts: `tries - 1` entries, exponentially
    * growing — Policy() yields [3000, 6000, 12000, 24000, 48000]. */
  def schedule(p: Policy): Seq[Long] =
    (0 until p.tries - 1).map(i =>
      (p.initialDelayMs * math.pow(p.backoff, i.toDouble)).toLong)

  /** Run `body` under the policy. `retryOn` mirrors the decorator's
    * ExceptionToCheck: anything else propagates immediately. `sleep`
    * is injectable so specs assert the schedule without waiting.
    * (The proxy-less case of [[retryRotating]] — one retry loop, one
    * set of invariants to maintain.) */
  def retry[T](p: Policy = Policy(),
      retryOn: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
      sleep: Long => Unit = Thread.sleep)(body: => T): T =
    retryRotating(p, Nil, retryOn, sleep)(_ => body)

  /** The proxy seam of the fetch envelope (reference
    * proxyhandler.py:15-44, consumed by 03_download_contracts.py:250-
    * 272 as a `proxy_on`/`proxy_object` pair on every download): the
    * reference routes each request through a user-validated proxy;
    * the engine generalizes the single proxy to a LIST rotated
    * round-robin across retry attempts — attempt `i` uses
    * `proxies(i % size)` — so a proxy that caused the failure is not
    * the one retried through. `body` receives the attempt's proxy
    * (None when the list is empty = direct connection), and applies
    * it to whatever HTTP client the deployment plugs into the S15
    * shell; the network side stays external by contract, exactly like
    * [[graft.ops.ExternalTool.ToolConf.proxies]]. */
  def retryRotating[T](p: Policy = Policy(), proxies: Seq[String] = Nil,
      retryOn: Throwable => Boolean = _.isInstanceOf[java.io.IOException],
      sleep: Long => Unit = Thread.sleep)(body: Option[String] => T): T = {
    def proxyFor(attempt: Int): Option[String] =
      if (proxies.isEmpty) None
      else Some(proxies(attempt % proxies.size))
    val delays = schedule(p)
    var attempt = 0
    while (attempt < p.tries - 1) {
      try return body(proxyFor(attempt))
      catch {
        case e: Throwable if retryOn(e) =>
          sleep(delays(attempt))
          attempt += 1
      }
    }
    body(proxyFor(attempt)) // last attempt: unguarded
  }
}
