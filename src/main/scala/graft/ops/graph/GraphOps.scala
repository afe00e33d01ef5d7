package graft.ops.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Graph

/** GraphX-backed graph processing over graft's triple/PG data and dedup
  * output (reference context: the KG built by the ETL ends up in a graph
  * database; bulk graph analytics on the way there run on GraphX's
  * Pregel-style distributed engine, not on the DB).
  */
object GraphOps {

  /** Connected components of an undirected pair graph (e.g. near-duplicate
    * pairs from graft.ops.dedup): every member is assigned the minimum id
    * of its component — the canonical-representative step that turns
    * pairwise dedup output into dedup *clusters*.
    *
    * GraphX connectedComponents is an iterative Pregel computation —
    * label propagation over partitioned edge/vertex RDDs, linear per
    * iteration, no driver-side graph.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = XGraph.fromEdges(edges, defaultValue = ())
    graph.connectedComponents().vertices
      .toDF("id", "component")
      .orderBy("id")
  }

  /** Static PageRank over a PG edge set via GraphX's Pregel implementation
    * (fixed iteration count, reset 0.15). Returns (node, rank) for every
    * node appearing in an edge. The GraphOpsSpec cross-validates this
    * against an independent DataFrame power iteration.
    */
  def pageRank(pgEdges: DataFrame, iterations: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = pgEdges.select(col("from"), col("to"))
      .where(col("from").isNotNull && col("to").isNotNull)
    val ids = e.select(col("from").as("node")).union(e.select(col("to")))
      .distinct()
    val edges = e.select(xxhash64(col("from")), xxhash64(col("to")))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val ranks = XGraph.fromEdges(edges, ())
      .staticPageRank(iterations).vertices.toDF("vid", "rank")
    ids.withColumn("vid", xxhash64(col("node")))
      .join(ranks, "vid")
      .select(col("node"), col("rank"))
      .orderBy("node")
  }

  /** Node degrees of a PG edge set (triples with `@from`/`@to`), via
    * GraphX degree aggregation. Isolated nodes (no edges) are absent, as
    * in GraphX semantics.
    */
  def degrees(pgEdges: DataFrame): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    // map string node ids to longs via hashing for GraphX vertex ids
    val e = pgEdges.select(col("from"), col("to"))
      .where(col("from").isNotNull && col("to").isNotNull)
    val ids = e.select(col("from").as("node")).union(e.select(col("to")))
      .distinct()
    val edges = e.select(xxhash64(col("from")), xxhash64(col("to")))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val degs = XGraph.fromEdges(edges, ()).degrees.toDF("vid", "degree")
    ids.withColumn("vid", xxhash64(col("node")))
      .join(degs, "vid")
      .select(col("node"), col("degree"))
      .orderBy("node")
  }
}
