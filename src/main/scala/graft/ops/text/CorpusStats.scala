package graft.ops.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level token statistics for training-data pipelines. */
object CorpusStats {

  /** EXACT per-group heavy hitters — every (group, token) whose count
    * strictly exceeds n_group/k — via the classic sketch-then-verify plan:
    *
    *  1. one pass aggregates a bounded Misra–Gries candidate sketch per
    *     group (`graft_mg_items`, capacity 2k ≥ k−1 so the candidate set
    *     provably contains every true heavy hitter) alongside the exact
    *     group token total;
    *  2. one recount pass joins the token stream against the (tiny,
    *     broadcast) exploded candidate set and counts exactly;
    *  3. the threshold filter `cnt · k > n` keeps the true heavy hitters.
    *
    * Why not just groupBy(group, token)? That shuffles the FULL distinct
    * (group, token) space — at 100 TB the token vocabulary is billions of
    * keys, nearly all of them below threshold. Here the big shuffle is
    * replaced by an O(groups × 2k) sketch (map-side partial aggregation
    * does almost all the work) and the only per-token work left is a
    * broadcast-semi-join recount on candidates. Same exact answer, a
    * vocabulary-sized shuffle removed.
    */
  def heavyHitters(docs: DataFrame, k: Int,
                   groupCol: String = "source", textCol: String = "text")
      : DataFrame = {
    require(k > 1, "heavyHitters: k must be > 1")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val toks = docs.select(col(groupCol).as("grp"),
      explode(TextOps.tokens(col(textCol))).as("token"))
    val sketches = toks.groupBy("grp").agg(
      call_function("graft_mg_items", col("token"), lit(2 * k)).as("cands"),
      count(lit(1)).as("n_tokens"))
    val candidates = sketches.select(col("grp"), col("n_tokens"),
      explode(col("cands")).as("token"))
    toks.join(broadcast(candidates), Seq("grp", "token"))
      .groupBy(col("grp").as(groupCol), col("token"), col("n_tokens"))
      .agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * k > col("n_tokens"))
      .select(col(groupCol), col("token"), col("cnt"), col("n_tokens"))
      .orderBy(groupCol, "token")
  }
}
