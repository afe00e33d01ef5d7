package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Graph

/** Graph-database loading facade (reference: src/ketl/io/neoloader.py:563-744
  * pg_jsonl_neo_loader / pg_jsonl_neo_loader_cli).
  *
  * The reference drives a live Neo4j bolt driver with async batching; no
  * database exists in this container, so the load is re-expressed
  * Spark-first: the statement stream from [[NeoCypher]] is executed per
  * partition through a pluggable [[CypherTransport]] — the executor-side
  * `foreachPartition` shape a real bolt transport would plug into
  * unchanged. Everything the reference's orchestrator does around the
  * driver is here: node phase → id index → edge phase ordering
  * (reference: src/ketl/io/neoloader.py:384-394, 478-560), bounded
  * transient-error retries with backoff (reference: neoloader.py:398-410),
  * `.nodes`/`.edges` done-flag skip logic (reference: neoloader.py:452-463,
  * 487-498), and per-phase element/batch accounting.
  *
  * Scale notes: statements are generated and executed inside one
  * distributed pass per phase (no driver materialisation of elements);
  * accounting aggregates one small row per batch. Parallel edge batches
  * colliding on transactions is exactly the transient case the retry path
  * covers, as in the reference.
  */
object NeoLoader {

  /** Executor-side Cypher endpoint. Implementations must be serializable —
    * they ship to executors. Throw [[TransientCypherError]] for failures
    * that deserve a retry (lock/transaction collisions); anything else
    * fails the load.
    */
  trait CypherTransport extends Serializable {
    def run(statement: String): Unit
  }

  /** Retryable failure (the reference retries neo4j TransientError only —
    * reference: src/ketl/io/neoloader.py:402-405).
    */
  final class TransientCypherError(msg: String) extends RuntimeException(msg)

  /** In-container default transport: accepts every statement (the
    * statement text itself is oracle-checked elsewhere); a bolt-backed
    * implementation would replace exactly this class.
    */
  final class NoopTransport extends CypherTransport {
    override def run(statement: String): Unit = ()
  }

  final case class Config(
      batchSize: Int = 2500, // reference: src/ketl/io/neoloader.py:131
      maxRetries: Int = 3,
      retryBackoffMs: Long = 0L,
      doNodes: Boolean = true,
      doEdges: Boolean = true,
      doneBasePath: Option[String] = None,
      propertyConfig: NeoCypher.PropertyConfig = NeoCypher.PropertyConfig())

  object Config {

    /** Builds the loader configuration from a parsed config file — the
      * reference's NeoLoaderConfig.from_config (neoloader.py:170-199,
      * tests/resources/test-config.yml layout). Accepts the reference's key
      * names (`loader_batch_size`, `max_transaction_retries`,
      * `max_retry_pause.minutes/seconds`) plus graft's flat historical ones
      * (`batch_size`, `max_retries`, `retry_backoff_ms`); per-property
      * multi-value modes parse through
      * [[NeoCypher.PropertyConfig.fromConf]].
      */
    def fromConf(conf: Map[String, String], prefix: String = "neoloader."): Config = {
      def get(keys: String*): Option[String] =
        keys.flatMap(k => conf.get(prefix + k)).headOption
      val pauseMs =
        get("retry_backoff_ms").map(_.toLong).orElse {
          val mins = get("max_retry_pause.minutes").map(_.toLong)
          val secs = get("max_retry_pause.seconds").map(_.toLong)
          if (mins.isEmpty && secs.isEmpty) None
          else Some((mins.getOrElse(0L) * 60 + secs.getOrElse(0L)) * 1000)
        }
      Config(
        batchSize = get("loader_batch_size", "batch_size").map(_.toInt).getOrElse(2500),
        maxRetries = get("max_transaction_retries", "max_retries").map(_.toInt).getOrElse(3),
        retryBackoffMs = pauseMs.getOrElse(0L),
        propertyConfig = NeoCypher.PropertyConfig.fromConf(conf, prefix))
    }
  }

  final case class Report(
      nodes: Long, edges: Long,
      nodeBatches: Long, edgeBatches: Long,
      retries: Long,
      nodesSkipped: Boolean, edgesSkipped: Boolean)

  /** Loads a PG DataFrame through `transport`. Runs the node phase, creates
    * the node-id index, then the edge phase — the ordering edges depend on.
    */
  def load(pg: DataFrame, transport: CypherTransport,
           config: Config = Config()): Report = {
    val nodesDone = flagExists(config, "nodes")
    val edgesDone = flagExists(config, "edges")

    val skipNodes = !config.doNodes || nodesDone
    // as in the reference: a done-flag skips edges only if nodes were not
    // just reloaded (reference: src/ketl/io/neoloader.py:487-490)
    val skipEdges = !config.doEdges || (edgesDone && nodesDone)

    var nodes = 0L; var nodeBatches = 0L
    var edges = 0L; var edgeBatches = 0L
    var retries = 0L

    if (!skipNodes) {
      val (n, b, r) = runPhase(pg, Graph.NodeType, transport, config)
      nodes = n; nodeBatches = b; retries += r
      // index node ids between the phases (reference: neoloader.py:384-394)
      transport.run(NeoCypher.NodeIndexStatement)
      writeFlag(config, "nodes")
    }
    if (!skipEdges) {
      val (n, b, r) = runPhase(pg, Graph.EdgeType, transport, config)
      edges = n; edgeBatches = b; retries += r
      writeFlag(config, "edges")
    }
    Report(nodes, edges, nodeBatches, edgeBatches, retries, skipNodes, skipEdges)
  }

  /** Async variant (reference: src/ketl/io/neoloader.py:226
    * `async_pg_jsonl_neo_loader`): same phase orchestration as [[load]] —
    * nodes, id index, edges, done-flags — but within each partition up to
    * `maxConcurrency` batch statements are IN FLIGHT at once through the
    * transport (the reference's `loader_max_concurrency` event-loop
    * bound, default 8 as in its test config, neoloader.py:195).
    * Submission is semaphore-backpressured, so at most `maxConcurrency`
    * statement strings are materialised per partition however large the
    * stream — the reference's islice-batched memory bound. Retries run
    * inside each in-flight task (the reference puts tenacity ON the batch
    * loader coroutine, neoloader.py:399-410).
    *
    * Phase ordering survives the concurrency because each partition task
    * awaits ALL its in-flight batches before completing, and the Spark
    * action is a barrier across partitions — so every node batch has
    * finished (cluster-wide) before the index statement runs, and every
    * edge batch starts after it. The first terminal failure in any
    * in-flight task rethrows and fails the load, as in [[load]].
    */
  def loadAsync(pg: DataFrame, transport: CypherTransport,
                config: Config = Config(), maxConcurrency: Int = 8): Report = {
    require(maxConcurrency >= 1, "maxConcurrency must be >= 1")
    val nodesDone = flagExists(config, "nodes")
    val edgesDone = flagExists(config, "edges")
    val skipNodes = !config.doNodes || nodesDone
    val skipEdges = !config.doEdges || (edgesDone && nodesDone)

    var nodes = 0L; var nodeBatches = 0L
    var edges = 0L; var edgeBatches = 0L
    var retries = 0L

    if (!skipNodes) {
      val (n, b, r) = runPhaseAsync(pg, Graph.NodeType, transport, config, maxConcurrency)
      nodes = n; nodeBatches = b; retries += r
      transport.run(NeoCypher.NodeIndexStatement)
      writeFlag(config, "nodes")
    }
    if (!skipEdges) {
      val (n, b, r) = runPhaseAsync(pg, Graph.EdgeType, transport, config, maxConcurrency)
      edges = n; edgeBatches = b; retries += r
      writeFlag(config, "edges")
    }
    Report(nodes, edges, nodeBatches, edgeBatches, retries, skipNodes, skipEdges)
  }

  /** One async phase: per partition, a fixed pool of `maxConcurrency`
    * workers drains the statement stream with semaphore backpressure;
    * the partition emits its (elements, batches, retries) totals only
    * after every in-flight batch completed.
    */
  private def runPhaseAsync(pg: DataFrame, elementType: String,
                            transport: CypherTransport, config: Config,
                            maxConcurrency: Int): (Long, Long, Long) = {
    val spark = pg.sparkSession
    import spark.implicits._
    val maxRetries = config.maxRetries
    val backoffMs = config.retryBackoffMs
    val acc = NeoCypher.statementsWithCounts(pg, elementType,
        config.batchSize, config.propertyConfig)
      .mapPartitions { it =>
        val pool = java.util.concurrent.Executors.newFixedThreadPool(maxConcurrency)
        try {
          val sem = new java.util.concurrent.Semaphore(maxConcurrency)
          val futures = scala.collection.mutable.ArrayBuffer
            .empty[java.util.concurrent.Future[(Long, Long, Long)]]
          it.foreach { case (stmt, nElems) =>
            sem.acquire() // backpressure: bounds in-flight AND materialised statements
            futures += pool.submit(
              new java.util.concurrent.Callable[(Long, Long, Long)] {
                override def call(): (Long, Long, Long) = try {
                  var attempt = 1
                  var done = false
                  while (!done) {
                    try { transport.run(stmt); done = true }
                    catch { case e: TransientCypherError =>
                      if (attempt > maxRetries) throw e
                      if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
                      attempt += 1
                    }
                  }
                  (nElems.toLong, 1L, (attempt - 1).toLong)
                } finally sem.release()
              })
          }
          // await everything; unwrap the executor's wrapper so callers see
          // the transport's own exception, as in the sync path
          val totals = futures.map { f =>
            try f.get()
            catch { case e: java.util.concurrent.ExecutionException => throw e.getCause }
          }
          Iterator.single((totals.map(_._1).sum, totals.map(_._2).sum,
            totals.map(_._3).sum))
        } finally pool.shutdown()
      }
      .toDF("elems", "batches", "retries")
      .agg(coalesce(sum("elems"), lit(0L)), coalesce(sum("batches"), lit(0L)),
        coalesce(sum("retries"), lit(0L)))
      .head()
    (acc.getLong(0), acc.getLong(1), acc.getLong(2))
  }

  /** One element-kind phase: statements stream per partition through the
    * transport with bounded retries; returns (elements, batches, retries)
    * aggregated distributively.
    */
  private def runPhase(pg: DataFrame, elementType: String,
                       transport: CypherTransport, config: Config): (Long, Long, Long) = {
    val spark = pg.sparkSession
    import spark.implicits._
    val maxRetries = config.maxRetries
    val backoffMs = config.retryBackoffMs
    val acc = NeoCypher.statementsWithCounts(pg, elementType,
        config.batchSize, config.propertyConfig)
      .mapPartitions { it =>
        it.map { case (stmt, nElems) =>
          var attempt = 1
          var done = false
          while (!done) {
            try { transport.run(stmt); done = true }
            catch { case e: TransientCypherError =>
              if (attempt > maxRetries) throw e
              if (backoffMs > 0) Thread.sleep(backoffMs * attempt)
              attempt += 1
            }
          }
          (nElems.toLong, 1L, (attempt - 1).toLong)
        }
      }
      .toDF("elems", "batches", "retries")
      .agg(coalesce(sum("elems"), lit(0L)), coalesce(sum("batches"), lit(0L)),
        coalesce(sum("retries"), lit(0L)))
      .head()
    (acc.getLong(0), acc.getLong(1), acc.getLong(2))
  }

  private def flagPath(config: Config, suffix: String): Option[java.nio.file.Path] =
    config.doneBasePath.map { base =>
      // a base already carrying a phase suffix is normalised, as in the
      // reference (src/ketl/io/neoloader.py:454-457)
      val trimmed = base.stripSuffix(".nodes").stripSuffix(".edges")
      Paths.get(trimmed + "." + suffix)
    }

  private def flagExists(config: Config, suffix: String): Boolean =
    flagPath(config, suffix).exists(Files.exists(_))

  private def writeFlag(config: Config, suffix: String): Unit =
    flagPath(config, suffix).foreach { p =>
      Files.writeString(p, s"$suffix loaded on ${java.time.Instant.now()}\n")
    }
}

/** Config-driven CLI for [[NeoLoader]] (reference:
  * src/ketl/io/neoloader.py:640-744 pg_jsonl_neo_loader_cli): reads a
  * JSONL.pg source, applies `--no-nodes`/`--no-edges`/`--done-path`
  * /`--batch-size`, and takes loader settings from a [[graft.io.Config]]
  * file (`neoloader.batch_size`, `neoloader.max_retries`,
  * `neoloader.retry_backoff_ms`). With no database in the container the
  * transport is the no-op one; a bolt transport would be selected here from
  * `neo4j.uri` exactly as the reference builds its driver from config.
  */
object NeoLoaderCli {
  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String],
          transport: NeoLoader.CypherTransport = new NeoLoader.NoopTransport): Int = {
    var source: Option[String] = None
    var doNodes = true
    var doEdges = true
    var donePath: Option[String] = None
    var batchSize: Option[Int] = None
    var configPath: Option[String] = None
    var usageError = false
    var i = 0
    while (i < args.length && !usageError) {
      args(i) match {
        case "--no-nodes" => doNodes = false
        case "--no-edges" => doEdges = false
        case "--done-path" => i += 1; donePath = Some(args(i))
        case "--batch-size" => i += 1; batchSize = Some(args(i).toInt)
        case "--config" => i += 1; configPath = Some(args(i))
        case other if !other.startsWith("--") => source = Some(other)
        case other => System.err.println(s"unknown option $other"); usageError = true
      }
      i += 1
    }
    if (source.isEmpty) { System.err.println("missing <source>"); usageError = true }
    if (usageError) 2
    else try {
      val fileConf = configPath.map(p =>
        graft.io.Config.parse(Files.readString(Paths.get(p)))).getOrElse(Map.empty)
      val conf = NeoLoader.Config.fromConf(fileConf).copy(
        doNodes = doNodes, doEdges = doEdges, doneBasePath = donePath)
      val conf2 = batchSize.fold(conf)(b => conf.copy(batchSize = b))
      val spark = org.apache.spark.sql.SparkSession.builder()
        .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val report = NeoLoader.load(PgGraph.fromJsonl(spark, source.get), transport, conf2)
      println(s"[neoloader] $report")
      0
    } catch {
      case e: Throwable => System.err.println(s"[neoloader] loading failed: ${e.getMessage}"); 1
    }
  }
}
