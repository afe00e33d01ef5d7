package graft.ops.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.text.TextOps

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB):
  *  - exact: one hash-partition shuffle on the normalisation key.
  *  - ngramJaccard: exact set-similarity join via inverted index on
  *    shingles — candidate pairs only for docs sharing ≥1 shingle, so the
  *    crossproduct never materialises. (Prefix filtering would prune
  *    further; the shuffle key is the shingle, so frequency-skewed shingles
  *    are handled by AQE skew splitting.)
  *  - minhash: signatures are a narrow map (no shuffle); only the tiny
  *    band-bucket join shuffles, then candidates are verified exactly.
  *  - simhash: 64-bit signature as a narrow map; pigeonhole banding on four
  *    16-bit chunks finds all pairs with hamming ≤ 3 without O(n²).
  */
object Dedup {

  /** Exact dedup on a normalisation key (here: first `prefixTokens` tokens).
    * Emits one row per duplicate group: md5 of the key, canonical (min) id,
    * group size, sorted member ids.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text",
            prefixTokens: Int = 10): DataFrame = {
    val key = concat_ws(" ", slice(split(col(textCol), " "), 1, prefixTokens))
    docs.select(col(idCol).as("id"), md5(key).as("key_hash"))
      .groupBy("key_hash")
      .agg(min("id").as("canonical_id"), count(lit(1)).as("n_dups"),
        array_join(array_sort(collect_list(col("id").cast("string"))), ",").as("members"))
      .where(col("n_dups") > 1)
      .orderBy("canonical_id")
  }

  /** Exact bigram-shingle Jaccard similarity join: all pairs with
    * `J(a,b) >= minJaccard`. Inverted-index candidate generation keeps this
    * exact AND sub-quadratic: a qualifying pair must share a shingle.
    */
  def ngramJaccard(docs: DataFrame, minJaccard: Double,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("id"), TextOps.bigrams(col(textCol)).as("sh"))
    val sizes = base.select(col("id"), size(col("sh")).as("n"))
    val inv = base.select(col("id"), explode(col("sh")).as("sh"))
    val candidates = inv.as("x").join(inv.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"))
      .agg(count(lit(1)).as("inter"))
    candidates
      .join(sizes.withColumnRenamed("id", "a").withColumnRenamed("n", "na"), "a")
      .join(sizes.withColumnRenamed("id", "b").withColumnRenamed("n", "nb"), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** MinHash signature: `numHashes` minima of xxhash64(seed, shingle) —
    * computed as a per-row expression, zero shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      s => array_min(transform(shingles, sh => xxhash64(s, sh))))

  /** MinHash + LSH banding near-dup detection, verified exactly.
    * `bands` bands of `numHashes/bands` rows; candidates from band-signature
    * equality are re-checked with true Jaccard, so the output equals
    * [[ngramJaccard]] up to (vanishingly unlikely) LSH misses.
    */
  def minhashLsh(docs: DataFrame, minJaccard: Double,
                 numHashes: Int = 16, bands: Int = 4,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val rows = numHashes / bands
    val base = docs
      .select(col(idCol).as("id"), TextOps.bigrams(col(textCol)).as("sh"))
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    val banded = base.select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bandsig") === col("y.bandsig")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sh").as("sha"), col("y.sh").as("shb"))
      .dropDuplicates("a", "b")
    candidates
      .select(col("a"), col("b"),
        (size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb")))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** 64-bit SimHash as an array of per-bit vote sums (±1 per token),
    * folded over the token stream as a per-row expression.
    */
  def simhashBits(tokens: Column): Column =
    aggregate(tokens,
      array_repeat(lit(0L), 64),
      (acc, w) => {
        val h = xxhash64(w)
        // variable-distance bit test without shift-by-column: AND with 2^i
        // (exact as double for i ≤ 62; bit 63 is the sign)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => {
            val isSet = when(i === 63, h < 0)
              .otherwise(h.bitwiseAND(pow(lit(2.0), i).cast("long")) =!= 0)
            a + when(isSet, 1L).otherwise(-1L)
          })
      })

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤ 31).
    * Pigeonhole banding: the 64 sign bits split into the smallest
    * power-of-two chunk count strictly above `maxHamming` — a pair within
    * the threshold must then agree on ≥1 full chunk, so the join on
    * (chunk index, chunk code) is exhaustive. Verified with the true
    * hamming distance.
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val bits = simhashBits(TextOps.tokens(col(textCol)))
    val base = docs.select(col(idCol).as("id"),
      transform(bits, b => when(b > 0, 1L).otherwise(0L)).as("bits"))
    // chunk codes: sum bit_i * 2^i within the chunk (exact in long)
    val chunks = base.select(col("id"), col("bits"),
      posexplode(transform(sequence(lit(0), lit(nChunks - 1)), c => {
        val chunkBits = slice(col("bits"), c * chunkLen + 1, lit(chunkLen))
        aggregate(zip_with(chunkBits, sequence(lit(0), lit(chunkLen - 1)),
          (b, i) => b * pow(lit(2.0), i).cast("long")), lit(0L), (acc, x) => acc + x)
      })).as(Seq("cidx", "code")))
    val candidates = chunks.as("x").join(chunks.as("y"),
        col("x.cidx") === col("y.cidx") && col("x.code") === col("y.code")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.bits").as("ba"), col("y.bits").as("bb"))
      .dropDuplicates("a", "b")
    candidates
      .select(col("a"), col("b"),
        aggregate(zip_with(col("ba"), col("bb"), (x, y) => when(x =!= y, 1L).otherwise(0L)),
          lit(0L), (acc, x) => acc + x).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }
}
