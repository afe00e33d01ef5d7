package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ann.Ann

/** Incremental embedding dedup ([[Ann.srpIndex]] + [[Ann.cosineIncrement]]):
  * the per-batch result must equal the FULL-CORPUS multi-probe SRP-LSH pair
  * pass restricted to pairs touching the batch — the same contract
  * `minhashLshIncrement` (C3b) and `winnowIncrement` (C85) honour for
  * their families. One-sided probing loses nothing because Hamming ≤ 1 is
  * symmetric; the equality below is the executable form of that argument.
  */
class CosineIncrementSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  private def rows(df: DataFrame): Set[(Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("increment == full multi-probe LSH pass restricted to the batch") {
    val batch = embs.where(pmod(col("vec_id"), lit(10)) === 0)
    val rest = embs.where(pmod(col("vec_id"), lit(10)) =!= 0)
    val batchIds = batch.select("vec_id").as[Long].collect().toSet
    // planes pinned EQUAL on both sides: the index auto-sizes from ITS
    // corpus and the full pass from the total, so the restriction equality
    // is a per-plane-count statement
    val inc = rows(Ann.cosineIncrement(batch,
      Ann.srpIndex(rest, planes = 6).localCheckpoint(), minCosine = 0.45))
    val full = rows(Ann.cosinePairsLsh(embs, 0.45, planes = 6, multiProbe = true))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(full.nonEmpty, "fixture must yield at least one batch pair")
    assert(inc === full)
    // index-only pairs are the previous runs' output — never re-reported
    assert(inc.forall(p => batchIds(p._1) || batchIds(p._2)))
  }

  test("bootstrap: an EMPTY index auto-sizes from the batch and still finds new x new pairs") {
    // the natural first state of the persist-at-ingest workflow — must not
    // throw on the 1-row metadata read, and the first batch's own
    // duplicates must still certify. With nothing indexed the increment is
    // exactly a full multi-probe pass over the batch (same auto-sizing).
    val vA = Array.tabulate(8)(i => (i + 1).toFloat)
    val batch = Seq((10L, vA), (11L, vA),
      (12L, Array.tabulate(8)(i => if (i == 7) 5f else 0f)))
      .toDF("vec_id", "embedding")
    val empty = Ann.srpIndex(embs.where(lit(false)))
    val inc = rows(Ann.cosineIncrement(batch, empty, minCosine = 0.99))
    // both sides auto-size from the same 3-row corpus, so the increment is
    // literally the full pass here
    val full = rows(Ann.cosinePairsLsh(batch, 0.99, multiProbe = true))
    assert(inc === full)
    assert(inc.map(p => (p._1, p._2)) === Set((10L, 11L)))
  }

  test("planted duplicates: new x old and new x new certify, orthogonal does not") {
    val vA = Array.tabulate(8)(i => (i + 1).toFloat)
    val vB = Array.tabulate(8)(i => if (i == 0) 1f else 0f)
    val index = Seq((1L, vA), (2L, vB)).toDF("vec_id", "embedding")
    val batch = Seq((10L, vA), (11L, vA),
      (12L, Array.tabulate(8)(i => if (i == 7) 5f else 0f)))
      .toDF("vec_id", "embedding")
    val got = rows(Ann.cosineIncrement(batch, Ann.srpIndex(index, planes = 4),
      minCosine = 0.99))
    // identical vectors share every band bucket: exactly the two new x old
    // copies and the new x new copy, all at cosine 1; the orthogonal batch
    // vector and the old x old pair never appear
    assert(got.map(p => (p._1, p._2)) === Set((1L, 10L), (1L, 11L), (10L, 11L)))
    assert(got.forall(_._3 == 1.0))
  }
}
