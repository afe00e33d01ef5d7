package graft.ops.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding merge training — the tokenizer-vocab
  * induction step of a training-data pipeline (Sennrich et al. 2016).
  *
  * Shape: the corpus is scanned ONCE into a (word, freq) vocabulary table
  * (the classic BPE trick — all further work is per distinct word,
  * weighted by frequency, so iterations never touch the corpus again).
  * Each merge round is then
  *   1. adjacent-pair counts: one keyed aggregate over the vocab table
  *      (map-side partials; overlapping occurrences count, per the
  *      reference algorithm's get_stats),
  *   2. the argmax pair: a 1-row reduce (ties broken lexicographically so
  *      every engine picks the same pair),
  *   3. the merge applied to every word: a narrow scan-speed fold with the
  *      winning pair as a LITERAL — greedy left-to-right, so a run of
  *      overlapping occurrences merges at the 1st, 3rd, … position.
  * At 100 TB the vocab table is millions of rows against a trillion-token
  * corpus; the per-round cost is O(|vocab|), the driver holds only the
  * k-row merge table, and nothing ever shuffles corpus-sized data after
  * the first aggregate.
  */
object Bpe {

  /** Learns up to `k` merges; returns (rank, lhs, rhs, merged,
    * pair_count), rank 1-based in learned order. Stops early if the vocab
    * runs out of adjacent pairs (every remaining word is one symbol).
    */
  def bpeTrain(docs: DataFrame, k: Int, textCol: String = "text"): DataFrame =
    bpeTrainFull(docs, k, textCol)._1

  /** [[bpeTrain]] plus the segmented vocabulary it ends with — (merges,
    * vocab (word, freq, symbols)). The vocab IS the tokenizer: corpus
    * tokenization is a word join against it ([[fertility]]), never a
    * re-segmentation of raw text.
    */
  def bpeTrainFull(docs: DataFrame, k: Int, textCol: String = "text")
      : (DataFrame, DataFrame) = {
    require(k >= 1, s"bpeTrain: k must be >= 1 (got $k)")
    val spark = docs.sparkSession
    // corpus -> vocabulary: the only corpus-sized pass
    var words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("symbols"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (merges.length < k && !exhausted) {
      val top = words
        .where(size(col("symbols")) > 1)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("symbols")) - 1),
          j => struct(element_at(col("symbols"), j).as("l"),
            element_at(col("symbols"), j + 1).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, c))
        words = words
          .withColumn("symbols", mergePair(col("symbols"), l, r))
          .localCheckpoint()
      }
    }
    import spark.implicits._
    val mergesDf = merges.toSeq.zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, l + r, c) }
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
    (mergesDf, words.select(col("w"), col("freq"), col("symbols")))
  }

  /** Per-group tokenizer fertility under the trained vocab: BPE tokens per
    * whitespace word — the tokenizer-efficiency metric a multilingual
    * pipeline tracks per language. Corpus words join the SEGMENTED VOCAB
    * (a dictionary lookup — never a re-segmentation of text), then one
    * keyed aggregate.
    *
    * The vocab join is deliberately UNHINTED: a trained vocab from a small
    * merge budget broadcasts fine, but at web scale |distinct whitespace
    * words| is hundreds of millions of rows (URLs, typos, numbers) and a
    * forced broadcast OOMs the driver. Left to AQE, the join picks
    * broadcast-hash below `spark.sql.autoBroadcastJoinThreshold` and a
    * plain keyed shuffle on `w` above it — the word-explode side shuffles
    * by `w` at most once either way.
    */
  def fertility(docs: DataFrame, vocab: DataFrame, groupCol: String,
                textCol: String = "text"): DataFrame = {
    val ws = docs
      .select(col(groupCol), explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
    ws.join(vocab.select(col("w"), size(col("symbols")).as("nt")), "w")
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_words"),
        sum(col("nt")).as("n_tokens"),
        round(sum(col("nt")).cast("double") / count(lit(1)), 6).as("fertility"))
  }

  /** Greedy left-to-right merge of adjacent (l, r) into l+r — a fold whose
    * accumulator tail decides: just-merged symbols compare as the merged
    * STRING, so they never re-merge within the same round (a,a,a under
    * (a,a) becomes [aa, a], exactly the reference algorithm).
    */
  private def mergePair(symbols: Column, l: String, r: String): Column =
    aggregate(symbols, typedlit(Seq.empty[String]), (acc, s) =>
      when(size(acc) > 0 && element_at(acc, -1) === lit(l) && s === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
        .otherwise(concat(acc, array(s))))
}
