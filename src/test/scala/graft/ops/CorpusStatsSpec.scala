package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.text.CorpusStats

/** Misra–Gries heavy hitters: the sketch-then-recount plan must be EXACT
  * (equal to the naive full groupBy) even when the sketch capacity is far
  * below the vocabulary and the stream is split across partitions (so both
  * the update-decrement path and the merge-decrement path run).
  */
class CorpusStatsSpec extends SparkSpec {

  import spark.implicits._

  // skewed corpus: per group, token "hot" ~40%, "warm" ~20%, the rest a
  // long tail of one-off tokens (vocabulary >> sketch capacity)
  private def skewed(grp: String, seed: Int): Seq[(String, String)] = {
    val words =
      Seq.fill(200)("hot") ++ Seq.fill(100)("warm") ++
        (0 until 200).map(i => s"tail_${seed}_$i")
    // deterministic interleave so partial aggregates see mixed order
    words.sortBy(w => (w.hashCode * 31 + seed) & Int.MaxValue)
      .grouped(25).map(ws => (grp, ws.mkString(" "))).toSeq
  }

  private lazy val docs =
    (skewed("g1", 1) ++ skewed("g2", 2)).toDF("source", "text").repartition(7)

  private def exact(k: Int): Set[(String, String, Long)] = {
    val toks = docs.select(col("source"), explode(split(col("text"), " ")).as("token"))
    val n = toks.groupBy("source").agg(count(lit(1)).as("n"))
    toks.groupBy("source", "token").agg(count(lit(1)).as("cnt"))
      .join(n, "source")
      .where(col("cnt") * k > col("n"))
      .select("source", "token", "cnt")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
  }

  test("sketch-then-recount equals the naive groupBy at several k") {
    for (k <- Seq(3, 4, 10)) {
      val got = CorpusStats.heavyHitters(docs, k)
        .select("source", "token", "cnt")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(got === exact(k), s"k=$k")
      assert(got.nonEmpty, s"k=$k produced no heavy hitters — weak test")
    }
  }

  test("the MG candidate set is a superset of true heavy hitters at tiny capacity") {
    graft.functions.GraftFunctions.register(spark)
    // capacity 5 << vocabulary ~400: decrements must fire, hot survives
    val cands = docs.select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source")
      .agg(call_function("graft_mg_items", col("token"), lit(5)).as("cands"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap
    assert(cands("g1").contains("hot"))
    assert(cands("g2").contains("hot"))
    assert(cands.values.forall(_.size <= 5))
  }

  test("heavy hitters on an empty corpus is empty, not an error") {
    val empty = Seq.empty[(String, String)].toDF("source", "text")
    assert(CorpusStats.heavyHitters(empty, 10).count() === 0L)
  }
}
