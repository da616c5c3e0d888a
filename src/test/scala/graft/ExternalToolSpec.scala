package graft

import org.apache.spark.sql.functions._

import graft.ops.{ExternalTool, MultimodalOps}
import graft.ops.ExternalTool.ToolConf

/** External-CLI adapter (S9/S11 seam): process reuse, timeout-kill,
  * per-record mode, and the q33 feature-flag wiring — all against the
  * stub scripts in fixtures/tools/ (the container ships no real
  * codecs; the adapter mechanics are what's under test). */
class ExternalToolSpec extends SparkSpec {
  import spark.implicits._

  private val tools =
    new java.io.File("fixtures/tools").getAbsolutePath

  test("worker mode reuses ONE process per partition and transforms " +
      "every line") {
    val ds = spark.createDataset((1L to 12L).map(i => (i, s"rec$i")))
      .repartition(2)
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/upper_worker.sh")))
      .cache()
    assert(res.count() == 12)
    assert(res.where(!$"ok").count() == 0)
    // the worker echoes "<its pid> <UPPERCASED>": the payload-embedded
    // pid must equal the reported worker_pid (we really read THAT
    // process's answer), and distinct pids ≤ partitions ≪ records
    res.collect().foreach { r =>
      assert(r.out == s"${r.worker_pid} REC${r.id}")
    }
    assert(res.select("worker_pid").distinct().count() <= 2)
    res.unpersist()
  }

  test("worker stderr is discarded, never read as an answer: a " +
      "diagnostic-per-record tool keeps every pairing aligned") {
    val ds = spark.createDataset((1L to 6L).map(i => (i, s"rec$i")))
      .coalesce(1)
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/noisy_worker.sh")))
      .collect().sortBy(_.id)
    assert(res.length == 6)
    res.foreach { r =>
      assert(r.ok)
      // a merged stderr line would surface as out == "diag: ..." and
      // shift every later record's answer by one
      assert(r.out == s"ok:rec${r.id}", r.out)
    }
  }

  test("a poisoned record is timeout-killed; the NEXT record gets a " +
      "fresh worker and still succeeds") {
    val ds = Seq((1L, "alpha"), (2L, "SLEEP"), (3L, "beta")).toDS()
      .coalesce(1).sortWithinPartitions("_1")
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/sleepy_worker.sh"),
        timeoutMs = 500L))
      .collect().sortBy(_.id)
    assert(res(0).ok && res(0).out == "ok:alpha")
    assert(res(1).timed_out && !res(1).ok)
    assert(res(2).ok && res(2).out == "ok:beta")
    // the stalled worker was killed — record 3 ran in a NEW process
    assert(res(2).worker_pid != res(0).worker_pid)
  }

  test("timeout kill reaches FORKED descendants: a worker that spawns " +
      "a grandchild mid-record leaves no orphan behind") {
    val pidfile = java.nio.file.Files
      .createTempFile("graft_fork_pids", ".txt")
    val ds = Seq((1L, "alpha"), (2L, s"SLEEP:$pidfile"), (3L, "beta"))
      .toDS().coalesce(1).sortWithinPartitions("_1")
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/forking_worker.sh"),
        timeoutMs = 500L))
      .collect().sortBy(_.id)
    assert(res(1).timed_out && !res(1).ok)
    assert(res(0).ok && res(2).ok)
    // the worker recorded its grandchild's pid before stalling; after
    // the timeout kill that grandchild (a backgrounded sleep 300, NOT
    // a direct child of the killed shell's wait) must be gone too
    val pids = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(pidfile)).asScala
      .map(_.trim).filter(_.nonEmpty)
    assert(pids.nonEmpty, "fixture never forked — test is vacuous")
    def alive(pid: Long): Boolean =
      ProcessHandle.of(pid).map[Boolean](h => h.isAlive).orElse(false)
    pids.foreach { pid =>
      // bounded grace for the signal to land, then hard-assert dead
      var waited = 0
      while (alive(pid.toLong) && waited < 2000) {
        Thread.sleep(100); waited += 100
      }
      assert(!alive(pid.toLong),
        s"grandchild $pid survived the timeout kill")
    }
    java.nio.file.Files.deleteIfExists(pidfile)
  }

  test("per-record mode: one process per record, timeout quarantines " +
      "only the slow one") {
    val ds = Seq((1L, "abc"), (2L, "SLEEP please"), (3L, "xyz")).toDS()
      .coalesce(1).sortWithinPartitions("_1")
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/once_upper.sh"),
        timeoutMs = 500L, reuseProcess = false))
      .collect().sortBy(_.id)
    assert(res(0).ok && res(0).out == "ABC")
    assert(res(1).timed_out && !res(1).ok)
    assert(res(2).ok && res(2).out == "XYZ")
    assert(res.map(_.worker_pid).distinct.length == 3)
  }

  test("a tool that never reads stdin still times out on an " +
      "over-pipe-buffer payload (both modes)") {
    val big = "x" * (1 << 20) // ~1 MB >> any OS pipe buffer
    val ds = Seq((1L, big)).toDS()
    for (reuse <- Seq(true, false)) {
      val res = ExternalTool.pipe(ds,
        ToolConf(Seq("/bin/sh", s"$tools/no_read.sh"),
          timeoutMs = 500L, reuseProcess = reuse)).collect()
      assert(res.length == 1 && res(0).timed_out, s"reuse=$reuse")
    }
  }

  test("payloads with embedded newlines are rejected, not written — " +
      "later records stay correctly paired") {
    val ds = Seq((1L, "good"), (2L, "bad\npayload"), (3L, "also good"))
      .toDS().coalesce(1).sortWithinPartitions("_1")
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/upper_worker.sh")))
      .collect().sortBy(_.id)
    assert(res(0).ok && !res(1).ok && !res(1).timed_out && res(2).ok)
    // no protocol desync: record 3 gets ITS OWN answer
    assert(res(2).out == s"${res(2).worker_pid} ALSO GOOD")
  }

  test("task completion reaps the worker when the iterator is " +
      "abandoned early (limit/head)") {
    val ds = spark.createDataset((1L to 100L).map(i => (i, s"r$i")))
      .coalesce(1)
    val first = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/upper_worker.sh")))
      .head() // stops consuming after one row
    val proc = new java.io.File(s"/proc/${first.worker_pid}")
    val deadline = System.currentTimeMillis + 5000
    while (proc.exists && System.currentTimeMillis < deadline)
      Thread.sleep(100)
    assert(!proc.exists, "worker process leaked past task completion")
  }

  test("ToolConf.proxies exports GRAFT_PROXIES and rotates the " +
      "conventional http(s)_proxy pair per spawn") {
    // per-record mode seeds the proxy choice with the MIXED record
    // id: mixSeed(2) % 2 = 0, mixSeed(3) % 2 = 1 — spawns spread
    // across the list instead of all pinning .head
    val ds = Seq((2L, "ping"), (3L, "pong")).toDS().coalesce(1)
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/env_echo.sh"),
        reuseProcess = false,
        proxies = Seq("http://10.0.0.1:3128", "http://10.0.0.2:3128")))
      .collect().sortBy(_.id)
    assert(res.forall(_.ok))
    assert(res(0).out ==
      "http://10.0.0.1:3128,http://10.0.0.2:3128|" +
        "http://10.0.0.1:3128|http://10.0.0.1:3128")
    assert(res(1).out ==
      "http://10.0.0.1:3128,http://10.0.0.2:3128|" +
        "http://10.0.0.2:3128|http://10.0.0.2:3128")
    // no proxies configured → the adapter sets nothing of its own
    // (only GRAFT_PROXIES is asserted: http_proxy may legitimately be
    // inherited from the host environment on a proxied machine)
    val bare = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/env_echo.sh"),
        reuseProcess = false))
      .collect()
    assert(bare(0).ok && bare(0).out.split("\\|", -1)(0) == "")
  }

  test("correlated (all-even) record ids still spread across the " +
      "proxy list — the seed is mixed before the modulo") {
    // the ADVICE r6 scenario: every id even, 2 proxies — raw id % 2
    // would pin ALL records to proxies(0); the Fibonacci mix spreads
    // them (and the expectations derive from the same mixSeed the
    // adapter uses, not hardcoded hash values)
    val proxies = Seq("http://10.0.0.1:3128", "http://10.0.0.2:3128")
    val ids = Seq(2L, 4L, 6L, 8L)
    val ds = ids.map(i => (i, "ping")).toDS().coalesce(1)
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/env_echo.sh"),
        reuseProcess = false, proxies = proxies))
      .collect().sortBy(_.id)
    assert(res.forall(_.ok))
    val chosen = res.map(_.out.split("\\|", -1)(1))
    val expected = ids.map { i =>
      val m = ExternalTool.mixSeed(i)
      proxies((((m % 2) + 2) % 2).toInt)
    }
    assert(chosen.toSeq == expected)
    // the point of the mix: both proxies are actually used
    assert(chosen.toSet == proxies.toSet)
  }

  test("worker mode: a timeout-killed worker's replacement sees the " +
      "NEXT proxy in http_proxy") {
    // one partition (partition id 0): worker generation 0 gets
    // proxies(mixSeed(0) % 2) = proxies(0); the SLEEP record forces a
    // timeout kill, so record 3 is served by generation 1, which must
    // see the NEXT entry — proxies(1) — not a re-roll onto the same
    val proxies = Seq("http://10.0.0.1:3128", "http://10.0.0.2:3128")
    val ds = Seq((1L, "alpha"), (2L, "SLEEP"), (3L, "beta")).toDS()
      .coalesce(1).sortWithinPartitions("_1")
    val res = ExternalTool
      .pipe(ds, ToolConf(Seq("/bin/sh", s"$tools/proxy_worker.sh"),
        timeoutMs = 500L, proxies = proxies))
      .collect().sortBy(_.id)
    assert(res(0).ok && res(0).out == proxies(0))
    assert(res(1).timed_out && !res(1).ok)
    assert(res(2).ok && res(2).out == proxies(1))
    // and it really was a respawn, not the same process
    assert(res(2).worker_pid != res(0).worker_pid)
  }

  test("q33 feature flag routes decode through the external tool") {
    spark.conf.set("spark.graft.media.cmd",
      s"/bin/sh $tools/sleepy_worker.sh")
    try {
      val feats = MultimodalOps.mediaFeatures(spark, sf0001)
      val docs = Tables.documents(spark, sf0001)
        .select($"doc_id", length($"text").cast("long").as("orig_len"))
      val joined = feats.join(docs, "doc_id").cache()
      assert(joined.count() == docs.count())
      // no corpus text contains "SLEEP" — nothing quarantined
      assert(joined.where($"media_type".endsWith("!quarantine")).count() == 0)
      // features were computed over the TOOL's output ("ok:" + text),
      // not the raw payload: every n_bytes is exactly 3 longer
      assert(joined.where($"n_bytes" =!= $"orig_len" + 3L).count() == 0)
      joined.unpersist()
    } finally spark.conf.unset("spark.graft.media.cmd")
  }
}
