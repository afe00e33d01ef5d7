package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.dedup.Dedup

/** Incremental SimHash dedup ([[Dedup.simhashIndex]] +
  * [[Dedup.simhashIncrement]]): the per-batch result must equal the
  * FULL-CORPUS [[Dedup.simhash]] pass restricted to pairs touching the
  * batch — the contract `minhashLshIncrement` (C3b), `winnowIncrement`
  * (C85), and `cosineIncrement` (C5b) honour for their families.
  * One-sided probing loses nothing because chunk agreement is symmetric;
  * the equality below is the executable form of that argument.
  */
class SimhashIncrementSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def rows(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("increment == full simhash pass restricted to the batch") {
    val batch = docs.where(col("source") === "src0")
    val rest = docs.where(col("source") =!= "src0")
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    val inc = rows(Dedup.simhashIncrement(batch,
      Dedup.simhashIndex(rest).localCheckpoint(), maxHamming = 3))
    val full = rows(Dedup.simhash(docs, maxHamming = 3))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(full.nonEmpty, "fixture must yield at least one batch pair")
    assert(inc === full)
    // index-only pairs are the previous runs' output — never re-reported
    assert(inc.forall(p => batchIds(p._1) || batchIds(p._2)))
  }

  test("planted near-dups: new x old and new x new certify, distant text does not") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 3
    val index = Dedup.simhashIndex(Seq(
      (1L, base),
      (2L, "completely different content about spark shuffles and joins"))
      .toDF("doc_id", "text"))
    val batch = Seq(
      (10L, base),                       // identical -> hamming 0 vs doc 1
      (11L, base + " tail"),             // near-dup  -> small hamming
      (12L, "unrelated short row"))      // far from everything
      .toDF("doc_id", "text")
    val got = rows(Dedup.simhashIncrement(batch, index, maxHamming = 3))
    val pairs = got.map(p => (p._1, p._2))
    assert(pairs.contains((1L, 10L)))
    assert(pairs.contains((10L, 11L)) || pairs.contains((1L, 11L)),
      s"the near-dup batch doc must certify against its family: $pairs")
    assert(!pairs.exists(p => p._1 == 12L || p._2 == 12L))
    assert(!pairs.contains((1L, 2L)), "old x old must never re-report")
    // the identical pair is hamming 0
    assert(got.exists(p => p._1 == 1L && p._2 == 10L && p._3 == 0L))
  }
}
