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
}
