package graft.etl

import java.nio.file.Files

import graft.SparkSpec
import graft.model.Graph

/** Drives the full PG → statements → transport path of [[NeoLoader]]
  * (reference: src/ketl/io/neoloader.py pg_jsonl_neo_loader tests in
  * tests/ketl/io/test_neoloader.py): phase ordering, batch/element
  * accounting, transient-error retries, done-flag skips, and the CLI.
  */
class NeoLoaderSpec extends SparkSpec {
  import spark.implicits._

  private def triples = Seq(
    ("N1", Graph.TypeKey, "TestNode"), ("N1", "name", "\"n one\""),
    ("N2", Graph.TypeKey, "TestNode"),
    ("N3", Graph.TypeKey, "TestNode"),
    ("E1", Graph.FromKey, "N1"), ("E1", Graph.ToKey, "N2"),
    ("E1", Graph.TypeKey, "links"),
    ("E2", Graph.FromKey, "N2"), ("E2", Graph.ToKey, "N3"),
    ("E2", Graph.TypeKey, "links")
  ).toDF("id", "key", "value")

  private def pg = PgGraph.toPg(triples)

  test("loader config parses the reference's config layout (from_config)") {
    // tests/resources/test-config.yml, reference test_neoloader_config
    val conf = graft.io.Config.parse(
      """neoloader:
        |  default_property_config:
        |    multi_value_mode: multiple
        |  property_configs:
        |    has_pvalue:
        |      multi_value_mode: single
        |  loader_batch_size: 3000
        |  max_transaction_retries: 3
        |  max_retry_pause:
        |    seconds: 10
        |    minutes: 0
        |""".stripMargin)
    val cfg = NeoLoader.Config.fromConf(conf)
    assert(cfg.batchSize === 3000)
    assert(cfg.maxRetries === 3)
    assert(cfg.retryBackoffMs === 10000L)
    assert(cfg.propertyConfig.default === NeoCypher.Multiple)
    assert(cfg.propertyConfig.modeOf("has_pvalue") === NeoCypher.Single)
    assert(cfg.propertyConfig.modeOf("anything_else") === NeoCypher.Multiple)
    // graft's flat historical keys still work
    val flat = NeoLoader.Config.fromConf(Map(
      "neoloader.batch_size" -> "7", "neoloader.max_retries" -> "1",
      "neoloader.retry_backoff_ms" -> "5"))
    assert(flat.batchSize === 7 && flat.maxRetries === 1 && flat.retryBackoffMs === 5L)
    // unknown modes fail loud
    assertThrows[IllegalArgumentException] {
      NeoCypher.PropertyConfig.parseMode("both")
    }
  }

  test("load runs nodes, index, then edges with batch accounting") {
    RecordingTransport.reset(failFirst = 0)
    // single partition so batch counts are deterministic in the assertions
    val report = NeoLoader.load(pg.coalesce(1), new RecordingTransport,
      NeoLoader.Config(batchSize = 2))
    assert(report.nodes === 3)
    assert(report.edges === 2)
    assert(report.nodeBatches === 2) // 3 nodes / batchSize 2, one partition
    assert(report.edgeBatches === 1)
    assert(report.retries === 0)
    val stmts = RecordingTransport.snapshot
    val idxPos = stmts.indexOf(NeoCypher.NodeIndexStatement)
    assert(idxPos >= 0)
    val (before, after) = stmts.splitAt(idxPos)
    assert(before.forall(_.contains("AS node_js")))
    assert(after.tail.forall(_.contains("AS edge_js")))
    assert(before.size === 2)
    assert(after.tail.size === 1)
  }

  test("transient failures are retried with bounded attempts") {
    RecordingTransport.reset(failFirst = 2)
    val report = NeoLoader.load(pg, new RecordingTransport,
      NeoLoader.Config(batchSize = 10, maxRetries = 3))
    assert(report.retries === 2)
    assert(report.nodes === 3 && report.edges === 2)
    // a persistently-failing transport exhausts maxRetries and errors out
    RecordingTransport.reset(failFirst = Int.MaxValue)
    intercept[org.apache.spark.SparkException] {
      NeoLoader.load(pg, new RecordingTransport,
        NeoLoader.Config(batchSize = 10, maxRetries = 2))
    }
  }

  test("done flags skip completed phases (ref done_base_path semantics)") {
    RecordingTransport.reset(failFirst = 0)
    val base = Files.createTempDirectory("neoload").resolve("kg").toString
    val first = NeoLoader.load(pg, new RecordingTransport,
      NeoLoader.Config(batchSize = 10, doneBasePath = Some(base)))
    assert(!first.nodesSkipped && !first.edgesSkipped)
    val ran = RecordingTransport.snapshot.size
    val second = NeoLoader.load(pg, new RecordingTransport,
      NeoLoader.Config(batchSize = 10, doneBasePath = Some(base)))
    assert(second.nodesSkipped && second.edgesSkipped)
    assert(second.nodes === 0 && second.edges === 0)
    assert(RecordingTransport.snapshot.size === ran) // nothing re-ran
    // a phase-suffixed base is normalised, as in the reference
    val third = NeoLoader.load(pg, new RecordingTransport,
      NeoLoader.Config(batchSize = 10, doneBasePath = Some(base + ".nodes")))
    assert(third.nodesSkipped && third.edgesSkipped)
  }

  test("async load: >= 2 batches in flight, phases still strictly ordered (ref async_pg_jsonl_neo_loader)") {
    // a corpus wide enough for many single-element batches per phase
    val wide = ((1 to 12).flatMap(i => Seq(
      (s"N$i", Graph.TypeKey, "TestNode"))) ++
      (1 to 12).flatMap(i => Seq(
        (s"E$i", Graph.FromKey, s"N$i"), (s"E$i", Graph.ToKey, s"N${i % 12 + 1}"),
        (s"E$i", Graph.TypeKey, "links")))).toDF("id", "key", "value")
    val widePg = PgGraph.toPg(wide).coalesce(1) // one partition: overlap must
    // come from the transport pool, not from Spark task parallelism
    ProbeTransport.reset()
    val report = NeoLoader.loadAsync(widePg, new ProbeTransport(sleepMs = 120),
      NeoLoader.Config(batchSize = 1), maxConcurrency = 4)
    assert(report.nodes === 12 && report.edges === 12)
    assert(report.nodeBatches === 12 && report.edgeBatches === 12)

    // concurrency: the probe saw at least 2 statements in flight at once
    assert(ProbeTransport.maxInFlight.get() >= 2,
      s"no overlap observed (max in flight = ${ProbeTransport.maxInFlight.get()})")

    // ordered completion: every node batch FINISHED before the index
    // statement started, and the index finished before any edge batch
    // STARTED — the phase barrier holds despite the async submission
    val ev = ProbeTransport.snapshot
    val nodeEnd = ev.collect { case ("node", _, end) => end }.max
    val idxStart = ev.collect { case ("index", start, _) => start }.min
    val idxEnd = ev.collect { case ("index", _, end) => end }.max
    val edgeStart = ev.collect { case ("edge", start, _) => start }.min
    assert(nodeEnd <= idxStart, "an edge-phase prerequisite ran before node batches drained")
    assert(idxEnd <= edgeStart, "an edge batch started before the id index existed")

    // same element totals as the sync path on the same input
    RecordingTransport.reset(failFirst = 0)
    val sync = NeoLoader.load(widePg, new RecordingTransport,
      NeoLoader.Config(batchSize = 1))
    assert((sync.nodes, sync.edges) === ((report.nodes, report.edges)))
  }

  test("async load retries transient collisions inside in-flight tasks") {
    RecordingTransport.reset(failFirst = 3)
    val report = NeoLoader.loadAsync(pg, new RecordingTransport,
      NeoLoader.Config(batchSize = 1, maxRetries = 3), maxConcurrency = 2)
    assert(report.retries === 3)
    assert(report.nodes === 3 && report.edges === 2)
    // terminal failure still fails the load (Spark wraps the task failure)
    RecordingTransport.reset(failFirst = Int.MaxValue)
    intercept[org.apache.spark.SparkException] {
      NeoLoader.loadAsync(pg, new RecordingTransport,
        NeoLoader.Config(batchSize = 1, maxRetries = 2), maxConcurrency = 2)
    }
  }

  test("CLI loads a JSONL.pg file through the config-driven path") {
    RecordingTransport.reset(failFirst = 0)
    val dir = Files.createTempDirectory("neocli")
    val jsonl = dir.resolve("kg.jsonl").toString
    PgGraph.toJsonl(pg).coalesce(1).write.text(jsonl)
    val confPath = dir.resolve("loader.yml")
    Files.writeString(confPath,
      """neoloader:
        |  batch_size: 2
        |  max_retries: 5
        |""".stripMargin)
    val code = NeoLoaderCli.run(
      Array(jsonl, "--config", confPath.toString,
        "--done-path", dir.resolve("done").toString),
      new RecordingTransport)
    assert(code === 0)
    val stmts = RecordingTransport.snapshot
    assert(stmts.count(_.contains("AS node_js")) === 2) // 3 nodes @ batch 2
    assert(stmts.count(_.contains("AS edge_js")) === 1)
    assert(Files.exists(dir.resolve("done.nodes")))
    assert(Files.exists(dir.resolve("done.edges")))
    assert(NeoLoaderCli.run(Array.empty, new RecordingTransport) === 2) // no source
  }
}

/** Executor-side recording transport — single-JVM test double; state lives
  * in the companion so local-mode tasks and the driver share it.
  */
class RecordingTransport extends NeoLoader.CypherTransport {
  override def run(statement: String): Unit = {
    if (RecordingTransport.failCounter.getAndIncrement() < RecordingTransport.failFirst)
      throw new NeoLoader.TransientCypherError("simulated transaction collision")
    RecordingTransport.statements.add(statement)
  }
}

object RecordingTransport {
  val statements = new java.util.concurrent.CopyOnWriteArrayList[String]()
  val failCounter = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var failFirst: Int = 0
  def reset(failFirst: Int): Unit = {
    statements.clear(); failCounter.set(0); this.failFirst = failFirst
  }
  def snapshot: List[String] = {
    import scala.jdk.CollectionConverters._
    statements.asScala.toList
  }
}

/** Serializable concurrency probe: records per-statement (kind, start, end)
  * nanos and the high-water mark of simultaneously in-flight statements.
  * State lives in the companion so local-mode tasks and the driver share it.
  */
class ProbeTransport(sleepMs: Long) extends NeoLoader.CypherTransport {
  override def run(statement: String): Unit = {
    val inFlight = ProbeTransport.inFlight.incrementAndGet()
    ProbeTransport.maxInFlight.getAndUpdate(m => math.max(m, inFlight))
    val start = System.nanoTime()
    Thread.sleep(sleepMs)
    val kind =
      if (statement.startsWith("CREATE INDEX")) "index"
      else if (statement.contains("AS edge_js")) "edge"
      else "node"
    ProbeTransport.events.add((kind, start, System.nanoTime()))
    ProbeTransport.inFlight.decrementAndGet()
  }
}

object ProbeTransport {
  val events = new java.util.concurrent.CopyOnWriteArrayList[(String, Long, Long)]()
  val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
  def reset(): Unit = { events.clear(); inFlight.set(0); maxInFlight.set(0) }
  def snapshot: List[(String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    events.asScala.toList
  }
}
