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
