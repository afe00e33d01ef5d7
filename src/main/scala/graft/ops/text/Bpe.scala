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

  /** Batched BPE training — [[bpeTrainFull]]'s scale path: the sequential
    * trainer costs one driver round-trip + one |vocab| aggregate PER
    * MERGE, which a real 32k-merge vocabulary cannot afford. Here each
    * round learns up to `batch` merges from ONE aggregate, and the
    * accepted batch is PROVABLY identical to running the sequential
    * algorithm merge-by-merge — this is exact batching, not an
    * approximation. A sorted candidate prefix (count desc, then (l, r) —
    * the sequential tie-break) is accepted greedily; candidate i is
    * accepted only while ALL of:
    *
    *  1. its symbols are disjoint from every accepted pair's symbols and
    *     merged strings (disjoint merges commute, and neither count can
    *     be changed by the other's application);
    *  2. its count strictly exceeds B_i, the largest count any pair
    *     CREATED by the accepted merges could have — bounded exactly by
    *     the per-pair neighbor maxima computed in the same aggregate
    *     (every created pair (x, lr)/(lr, y)/(l₁r₁, l₂r₂) occurrence is
    *     an occurrence of an accepted pair with that neighbor, so its
    *     count ≤ the accepted pair's hottest single neighbor);
    *  3. its merged string is not an existing alphabet symbol (a
    *     provenance collision — e.g. learning ("ab","c") when "abc"
    *     already exists — would let created occurrences inflate an
    *     existing pair's count past the bound in 2). The alphabet is
    *     tracked driver-side: initial distinct symbols + learned merges.
    *     The FIRST candidate of a round is exempt (like guard 2): the
    *     sequential algorithm merges the top pair regardless, conflating
    *     the collision identically — the exemption both preserves the
    *     equivalence proof and guarantees progress (a colliding top pair
    *     would otherwise accept zero merges and loop forever). A
    *     colliding first merge ends its round so counts are recomputed
    *     under the conflation before further prefix reasoning.
    *
    * Acceptance stops at the FIRST violation (prefix, never skip-and-
    * continue): every pair sorted above an accepted p_j is then itself
    * accepted, so at p_j's sequential turn no original pair outranks it
    * (originals only lose count), no created pair reaches c_j (guard 2),
    * and ties resolve in the same sorted order — hence merge list, ranks,
    * recorded counts, and final vocab all coincide with sequential. The
    * worst case (every round degenerates to batch=1) IS the sequential
    * algorithm.
    *
    * MEASURED acceptance honesty: exactness is corpus-dependent and
    * inherently serial when merges contend — on a zipfian hex-word corpus
    * (3k vocab, 270k tokens) the guards accept 2–6 pairs/round (k=256 in
    * ~100 rounds, ~2.5× fewer than sequential), because the top pair's
    * hottest-neighbor bound genuinely reaches the next candidates'
    * counts: sequential BPE would really interleave the created pairs.
    * That is a property of the ALGORITHM's serial dependency, not of this
    * implementation. For a production 32k-merge budget where bit-exact
    * sequential rank order is not required, `exact = false` switches to
    * the standard synchronous approximation (cf. parallel tokenizer
    * trainers): every pairwise-disjoint candidate in the top-`batch` is
    * accepted (skip-and-continue, no count guard), giving ~⌈k/batch⌉
    * rounds unconditionally; merge ORDER may then locally deviate from
    * sequential where counts contend, while each accepted pair was still
    * a true top-`batch` pair of its round (vocab quality is equivalent —
    * the fertility spec pins it).
    *
    * Cost: rounds × (one vocab-token-sized quad aggregate + one narrow
    * merge-map fold). Returns the same (merges, vocab) pair as
    * [[bpeTrainFull]].
    */
  def bpeTrainBatched(docs: DataFrame, k: Int, batch: Int = 32,
                      textCol: String = "text",
                      exact: Boolean = true): (DataFrame, DataFrame) = {
    require(k >= 1, s"bpeTrainBatched: k must be >= 1 (got $k)")
    require(batch >= 1, s"bpeTrainBatched: batch must be >= 1 (got $batch)")
    val spark = docs.sparkSession
    var words = docs
      .select(explode(split(col(textCol), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("freq"))
      .select(col("w"), col("freq"), split(col("w"), "").as("symbols"))
      .localCheckpoint()
    // driver-side alphabet for guard 3: initial symbols are single chars
    val alphabet = scala.collection.mutable.Set.empty[String]
    words.select(explode(col("symbols")).as("s")).distinct().collect()
      .foreach(r => alphabet += r.getString(0))
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    while (merges.length < k && !exhausted) {
      // one pass: pair counts + the hottest left/right neighbor per pair
      // ONE corpus-vocab-sized shuffle per round: occurrences reduce to
      // (l, r, ln, rn) quads first; counts and both neighbor bounds then
      // derive from the quad table (|distinct quads| rows, cheap)
      val quads = words
        .where(size(col("symbols")) > 1)
        .select(col("freq"), explode(transform(
          sequence(lit(1), size(col("symbols")) - 1),
          j => struct(
            element_at(col("symbols"), j).as("l"),
            element_at(col("symbols"), j + 1).as("r"),
            when(j > 1, element_at(col("symbols"), j - 1)).as("ln"),
            when(j + 2 <= size(col("symbols")),
              element_at(col("symbols"), j + 2)).as("rn")))).as("p"))
        .groupBy(col("p.l"), col("p.r"), col("p.ln"), col("p.rn"))
        .agg(sum("freq").as("f"))
        .localCheckpoint()
      val counts = quads.groupBy("l", "r").agg(sum("f").as("c"))
      def nbBound(nCol: String) = quads.where(col(nCol).isNotNull)
        .groupBy(col("l"), col("r"), col(nCol).as("nb"))
        .agg(sum("f").as("nc"))
        .groupBy("l", "r").agg(max("nc").as(nCol + "b"))
      val top = counts
        .join(nbBound("ln"), Seq("l", "r"), "left")
        .join(nbBound("rn"), Seq("l", "r"), "left")
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(math.min(batch, k - merges.length))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2),
          math.max(if (r.isNullAt(3)) 0L else r.getLong(3),
            if (r.isNullAt(4)) 0L else r.getLong(4))))
      if (top.isEmpty) exhausted = true
      else {
        val accepted = acceptPrefix(top, alphabet, exact)
        merges ++= accepted
        if (sys.env.contains("GRAFT_BPE_DEBUG"))
          println(s"[bpe] round: accepted ${accepted.length}/${top.length} " +
            s"(total ${merges.length}/$k)")
        accepted.foreach { case (l, r, _) => alphabet += l + r }
        words = words
          .withColumn("symbols",
            mergePairs(col("symbols"), accepted.map(a => (a._1, a._2)).toSeq))
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

  /** Candidate-acceptance prefix for one [[bpeTrainBatched]] round.
    * `top` is the sorted candidate list (count desc, then (l, r) — the
    * sequential tie-break) as (l, r, count, hottest-neighbor bound);
    * returns the accepted (l, r, count) prefix. Factored out so the
    * guard logic — including the first-candidate waiver below — is
    * directly unit-testable (a corpus that organically puts a colliding
    * pair on TOP could not be found in an 800k-corpus search; the waiver
    * is defensive).
    *
    * Exact mode guards (candidate i accepted only while ALL hold):
    * disjointness (guard 1), count > created-pair bound (guard 2),
    * merged string not already an alphabet symbol (guard 3). Guards 2
    * and 3 are WAIVED for the first candidate of a round: accepting the
    * top pair alone IS the sequential step (sequential BPE merges it
    * regardless, conflating a provenance collision identically). Without
    * the waiver a colliding top pair would accept zero merges, leave
    * `words` unchanged, and re-run the identical aggregate forever — a
    * livelock. A colliding first merge still ENDS its round (returns a
    * 1-element prefix): occurrences of the collided symbol are conflated
    * from that point on, so counts must be recomputed before any further
    * prefix reasoning holds.
    */
  private[ops] def acceptPrefix(top: Seq[(String, String, Long, Long)],
                                 alphabet: scala.collection.Set[String],
                                 exact: Boolean): Seq[(String, String, Long)] = {
    val accepted = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val used = scala.collection.mutable.Set.empty[String]
    var bound = 0L // B_i: max created-pair count over accepted merges
    var open = true
    def accept(l: String, r: String, c: Long, nb: Long): Unit = {
      accepted += ((l, r, c))
      used += l; used += r; used += l + r
      bound = math.max(bound, nb)
    }
    for ((l, r, c, nb) <- top if open) {
      val merged = l + r
      val disjoint = // guard 1 (also required by the one-fold apply)
        !used.contains(l) && !used.contains(r) && !used.contains(merged)
      if (exact) {
        val first = accepted.isEmpty
        val collides = alphabet.contains(merged) // guard 3
        val ok = disjoint && (first || (!collides && c > bound))
        // prefix semantics: never skip-and-continue
        if (ok) {
          accept(l, r, c, nb)
          if (first && collides) open = false
        } else open = false
      } else if (disjoint) {
        // approximate: every disjoint top-`batch` pair merges this
        // round; conflicting candidates are skipped, not a stop — the
        // round always accepts the top pair, so progress is guaranteed
        accept(l, r, c, nb)
      }
    }
    accepted.toSeq
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

  /** One-pass application of a BATCH of pairwise-disjoint merges: the
    * accepted pairs become a literal lookup map keyed "l␀r" and the same
    * greedy left-to-right fold as [[mergePair]] consults it once per
    * symbol — one expression regardless of batch size. Disjointness
    * guarantees no chaining (a just-merged token can never be the l of
    * another accepted pair), so simultaneous application equals any
    * sequential order of the batch.
    */
  private def mergePairs(symbols: Column, pairs: Seq[(String, String)]): Column = {
    val m = typedlit(pairs.map { case (l, r) => (l + "\u0000" + r) -> (l + r) }.toMap)
    aggregate(symbols, typedlit(Seq.empty[String]), (acc, s) => {
      val key = concat(element_at(acc, -1), lit("\u0000"), s)
      val hit = element_at(m, key)
      when(size(acc) > 0 && hit.isNotNull,
          concat(slice(acc, lit(1), size(acc) - 1), array(hit)))
        .otherwise(concat(acc, array(s)))
    })
  }
}
