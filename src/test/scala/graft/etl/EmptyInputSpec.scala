package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.ops.dedup.Dedup

/** Degenerate-input behaviour: every operator must return an empty result
  * of the right schema, not throw — at pipeline scale empty partitions and
  * empty sources are routine.
  */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType), StructField("text", StringType))))

  test("tabmap of an empty frame yields empty triples") {
    val t = Triples.nodes(Seq.empty[(String, String)].toDF("id", "name"),
      col("id"), Seq(Prop.column("name"), Prop.tpe("X")))
    assert(t.columns.toSeq === Seq("id", "key", "value"))
    assert(t.count() === 0)
  }

  test("toPg and toJsonl of empty triples are empty") {
    val pg = PgGraph.toPg(Seq.empty[(String, String, String)].toDF("id", "key", "value"))
    assert(pg.count() === 0)
    assert(PgGraph.toJsonl(pg).count() === 0)
  }

  test("dedup operators tolerate an empty corpus") {
    assert(Dedup.exact(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccard(emptyDocs, 0.5).count() === 0)
    assert(Dedup.minhashLsh(emptyDocs, 0.5).count() === 0)
    assert(Dedup.simhash(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccardPrefix(emptyDocs, 0.5).count() === 0)
    assert(Dedup.ngramJaccardPigeonhole(emptyDocs, 0.5).count() === 0)
    assert(Dedup.ngramJaccardAdaptive(emptyDocs, 0.5).count() === 0)
    assert(Dedup.contamination(emptyDocs, lit(true)).count() === 0)
  }

  test("trigram training tolerates an empty or unlabelled-empty corpus") {
    val emptyLabelled = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("lang", StringType), StructField("text", StringType))))
    val trained = graft.ops.text.TextOps.trainTrigramProfiles(emptyLabelled)
    assert(trained.columns.toSeq === Seq("lang", "rank", "trigram", "tf", "share"))
    assert(trained.count() === 0)
    assert(graft.ops.text.TextOps.collectTrigramProfiles(trained).isEmpty)
  }

  test("workflow runner rejects an empty step table loudly") {
    val e = intercept[IllegalArgumentException] {
      Workflow.run(spark, Map("unrelated.key" -> "x"))
    }
    assert(e.getMessage.contains("no steps"))
  }

  test("sampling and packing tolerate an empty corpus") {
    assert(graft.ops.sample.Sampling.sampleByHash(emptyDocs, "doc_id", 0.5).count() === 0)
    assert(graft.ops.text.TextOps.packSequences(emptyDocs, 100).count() === 0)
    assert(graft.ops.text.TextOps
      .packSequences(emptyDocs, 100, partitions = Some(4)).count() === 0)
  }

  test("single-token and empty-string docs don't break shingling") {
    val tiny = Seq((1L, "word"), (2L, "")).toDF("doc_id", "text")
    assert(Dedup.ngramJaccard(tiny, 0.5).count() === 0)
    assert(Dedup.simhash(tiny, maxHamming = 0).count() >= 0)
  }

  test("round-6 operators tolerate empty and degenerate inputs") {
    import graft.ops.text.TextOps
    // empty corpus through every new text/sample/dedup op
    assert(TextOps.repetition(emptyDocs).count() === 0)
    assert(Dedup.containmentRef(
      emptyDocs.withColumn("source", lit("x")), col("source") === "ref", 0.5).count() === 0)
    assert(graft.ops.sample.Sampling
      .stratifiedSample(emptyDocs.withColumn("lang", lit("en")), "lang", "doc_id", 0.2)
      .count() === 0)
    // a reference side with no counterpart corpus (and vice versa)
    val onlyRef = Seq((1L, "a b c", "ref")).toDF("doc_id", "text", "source")
    assert(Dedup.containmentRef(onlyRef, col("source") === "ref", 0.5).count() === 0)
    assert(Dedup.containmentRef(onlyRef, col("source") === "nope", 0.5).count() === 0)
    // repetition on 1-token and empty-string docs: defined, null-free
    val tiny = TextOps.repetition(Seq((1L, "word"), (2L, "")).toDF("doc_id", "text"))
      .collect()
    assert(tiny.length === 2)
    assert(tiny.forall(r => !r.anyNull))
    // graph ops on an empty edge set
    val emptyEdges = Seq.empty[(String, String)].toDF("from", "to")
    assert(graft.ops.graph.GraphOps.triangles(emptyEdges).count() === 0)
    assert(graft.ops.graph.GraphOps.bfsDistances(emptyEdges, Seq("s")).count() === 0)
    // bfs from a seed that is not in the graph
    val edges = Seq(("a", "b")).toDF("from", "to")
    assert(graft.ops.graph.GraphOps.bfsDistances(edges, Seq("zz")).count() === 0)
  }
}
