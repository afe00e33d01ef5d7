package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.dedup.Dedup

/** Incremental winnowing dedup ([[Dedup.winnowIndex]] +
  * [[Dedup.winnowIncrement]]): the per-batch result must equal the
  * FULL-CORPUS winnow pair pass restricted to pairs touching the batch —
  * the same contract `minhashLshIncrement` honours for the minhash family.
  */
class WinnowIncrementSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  /** Full-corpus reference: every doc presented as "new" against an empty
    * index IS the whole pair pass (df guard and sizes over the full
    * corpus, all pairs involve a new doc).
    */
  private def fullCorpus(d: DataFrame, minOverlap: Double): DataFrame =
    Dedup.winnowIncrement(d, Dedup.winnowIndex(d.where(lit(false))),
      minOverlap = minOverlap)

  test("increment == full-corpus pairs restricted to the batch") {
    val batch = docs.where(col("source") === "src0")
    val rest = docs.where(col("source") =!= "src0")
    val batchIds = batch.select("doc_id").as[Long].collect().toSet

    val inc = rows(Dedup.winnowIncrement(batch,
      Dedup.winnowIndex(rest).localCheckpoint(), minOverlap = 0.3))
    val full = rows(fullCorpus(docs, minOverlap = 0.3))
      .filter(p => batchIds(p._1) || batchIds(p._2))
    assert(full.nonEmpty, "fixture must yield at least one batch pair")
    assert(inc === full)
    // and index-only pairs are NOT re-reported
    assert(inc.forall(p => batchIds(p._1) || batchIds(p._2)))
  }

  test("planted shared substring across batch/index is certified; unrelated is not") {
    // winnow defaults k=5, w=4: any shared run >= k+w-1 = 8 chars yields
    // at least one identical fingerprint in both docs
    val shared = "zqxjkvbwp mfgylthzn"
    val index = Seq(
      (1L, s"left padding $shared right padding"),
      (2L, "completely different content with no overlap here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, s"other intro $shared other outro"),
      (11L, "nothing in common with anything else at all")
    ).toDF("doc_id", "text")
    val got = rows(Dedup.winnowIncrement(batch, Dedup.winnowIndex(index),
      minOverlap = 0.05))
    assert(got.exists(p => p._1 == 1L && p._2 == 10L),
      s"planted pair (1,10) missing from $got")
    assert(!got.exists(p => p._1 == 11L || p._2 == 11L))
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("df guard drops boilerplate fingerprints from both sides") {
    // the same text in MANY index docs exceeds maxDf -> its fingerprints
    // are guarded out and a matching batch doc reports no pair
    val boiler = "standard disclaimer text repeated verbatim everywhere"
    val index = (1L to 10L).map(i => (i, boiler)).toDF("doc_id", "text")
    val batch = Seq((100L, boiler)).toDF("doc_id", "text")
    val got = Dedup.winnowIncrement(batch, Dedup.winnowIndex(index),
      minOverlap = 0.1, maxDf = 5)
    assert(got.count() === 0L)
    // with the guard relaxed the pairs reappear
    val relaxed = Dedup.winnowIncrement(batch, Dedup.winnowIndex(index),
      minOverlap = 0.1, maxDf = 50)
    assert(relaxed.count() === 10L)
  }
}
