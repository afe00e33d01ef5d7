package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom semi-join reduction: exactness (no false negatives), bounded
  * false-positive rate, and partitioning-invariant filter bits.
  */
class BloomSpec extends SparkSpec {

  import spark.implicits._

  private lazy val lineitem =
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
  private lazy val orders =
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .where(col("o_orderpriority") === "1-URGENT")

  test("bloom prefilter + exact join == exact join (no false negatives)") {
    val exact = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    val pre = DataFrames.bloomSemiJoin(
      lineitem, col("l_orderkey"), orders, col("o_orderkey"),
      bits = 1 << 16, numHashes = 7)
    val viaBloom = pre.join(orders, col("l_orderkey") === col("o_orderkey"))
      .select("l_orderkey", "l_linenumber")
    assert(exact.count() > 0)
    assert(DataFrames.areEqual(exact, viaBloom))
  }

  test("false-positive rate stays near theory for disjoint probes") {
    // keys 0..999 in the filter; probe 10k disjoint keys. bits=2^14,
    // k=7, n=1000 → theoretical fpr (1 - e^(-7000/16384))^7 ≈ 0.09%
    val keys = (0L until 1000L).toDF("k")
    val probes = (100000L until 110000L).toDF("k")
    val fp = DataFrames.bloomSemiJoin(probes, col("k"), keys, col("k"),
      bits = 1 << 14, numHashes = 7).count()
    assert(fp < 100, s"false positives: $fp of 10000") // 100x theory headroom
  }

  test("filter bits are identical under any partitioning (mergeable by OR)") {
    graft.functions.GraftFunctions.register(spark)
    def bloomOf(parts: Int): Seq[Long] = {
      val keys = (0L until 5000L).toDF("k").repartition(parts)
      keys.agg(call_function("graft_bloom_agg",
          xxhash64(col("k")), lit(1 << 14), lit(7)).as("b"))
        .collect().head.getSeq[Long](0)
    }
    assert(bloomOf(1) === bloomOf(16))
  }

  test("empty key set filters everything (all-zero words, no crash)") {
    val none = DataFrames.bloomSemiJoin(
      lineitem, col("l_orderkey"), orders.where(lit(false)), col("o_orderkey"),
      bits = 1 << 10, numHashes = 3)
    assert(none.count() === 0)
  }
}
