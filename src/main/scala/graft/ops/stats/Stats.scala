package graft.ops.stats

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distribution diagnostics for keyed data — the measurements that DRIVE
  * the scale decisions elsewhere in the library (salt factor for
  * [[graft.io.Bucketing.saltedJoin]], shuffle-partition sizing, whether a
  * dimension is broadcastable).
  *
  * Scale notes (100 TB):
  *  - skewReport: one map-side-combined keyed shuffle to per-key counts
  *    (output = |keys|, not |rows|), then a tiny global agg broadcast back
  *    over the top-k slice. No row-level data survives the first exchange.
  *  - percentiles: exact distributed percentiles via Spark's sort-based
  *    `percentile` aggregate — one keyed shuffle; right for bounded group
  *    counts (per-source corpus reporting). For percentiles OVER THE WHOLE
  *    100 TB corpus use `approx_percentile` instead: the exact aggregate
  *    materialises each group's values, and a single global group is the
  *    degenerate case that does not scale.
  */
object Stats {

  /** Per-key skew diagnostics: the `topK` heaviest keys of `keyCol` with
    * row count, share of total rows, and skew ratio (count / mean count
    * per key — the factor by which the hottest partitions exceed the
    * average, i.e. the lower bound on straggler slowdown for an unsalted
    * shuffle on this key). Deterministic tie-break on the key value.
    */
  def skewReport(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame = {
    require(topK >= 1, s"topK must be >= 1 (got $topK)")
    val perKey = df.groupBy(col(keyCol).as("key")).agg(count(lit(1)).as("cnt"))
    // global stats over per-key counts: |keys| rows in, one row out
    val totals = perKey.agg(
      sum(col("cnt")).as("total_rows"),
      count(lit(1)).as("n_keys"))
    perKey.orderBy(col("cnt").desc, col("key")).limit(topK)
      .crossJoin(broadcast(totals))
      .select(
        col("key"),
        col("cnt"),
        round(col("cnt").cast("double") / col("total_rows"), 6).as("share"),
        // double BEFORE the multiply: cnt·n_keys overflows long at corpus scale
        round(col("cnt").cast("double") * col("n_keys") / col("total_rows"), 6).as("skew_ratio"),
        col("n_keys"),
        col("total_rows"))
  }

  /** Exact percentiles of `valueCol` per `groupCol` (linear interpolation,
    * the ANSI PERCENTILE_CONT semantics both Spark's `percentile` and
    * DuckDB's `quantile_cont` implement).
    */
  def percentilesBy(df: DataFrame, groupCol: String, valueCol: Column,
                    pcts: Seq[Double]): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 0 && p <= 1),
      "pcts must be non-empty fractions in [0, 1]")
    val aggs = pcts.map { p =>
      // setScale before stripping: 0.9·100 is 90.00000000000001 in binary
      val label = "p" + BigDecimal(p * 100).setScale(4, BigDecimal.RoundingMode.HALF_UP)
        .underlying.stripTrailingZeros.toPlainString.replace(".", "_")
      round(percentile(col("__v"), lit(p)), 6).as(label)
    }
    df.select(col(groupCol), valueCol.cast("double").as("__v"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n"), aggs: _*)
  }
}
