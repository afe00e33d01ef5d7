package graft.ops.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ops.text.TextOps

/** Deduplication operators for training-data pipelines.
  *
  * Scale notes (100 TB):
  *  - exact: one hash-partition shuffle on the normalisation key.
  *  - ngramJaccard: exact pairs via broadcast + native merge-scan intersect
  *    (dense/bucketed corpora); ngramJaccardSparse: exact pairs via
  *    inverted-index shuffle on the shingle key (zipfian corpora, AQE
  *    handles hot-shingle skew).
  *  - minhash: signatures are a narrow map (native one-pass expression, no
  *    shuffle); only the small band-bucket join shuffles, then candidates
  *    are verified exactly — the default at corpus scale.
  *  - simhash: 64-bit signature as a narrow map (native expression);
  *    pigeonhole chunk banding finds all pairs within the hamming
  *    threshold without O(n²).
  *  - clusters: pair output feeds GraphX connectedComponents
  *    (graft.ops.graph) for canonical-representative assignment.
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
    * `J(a,b) >= minJaccard`. Shingle sets travel as SORTED arrays of
    * xxhash64 keys; pair enumeration is a broadcast nested-loop join and the
    * intersection size comes from the native merge-scan expression
    * graft_intersect_count — no shuffle at all, O(n²·d) with tiny constants
    * (tight primitive loops, zero per-pair allocation).
    *
    * Scale notes: the broadcast loop is right when one side fits in memory
    * (dedup within a partition/bucket, or a dense small-vocab corpus where
    * inverted indexes degenerate). For large zipfian corpora use
    * [[ngramJaccardSparse]] (shuffle on the shingle key, cost Σ df²); at
    * 100 TB use [[minhashLsh]] — same verified output, cheapest by far.
    */
  def ngramJaccard(docs: DataFrame, minJaccard: Double,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = docs.select(col(idCol).as("id"),
        array_sort(transform(TextOps.bigrams(col(textCol)), sh => xxhash64(sh))).as("sh"))
      .withColumn("n", size(col("sh")))
      .where(col("n") > 0) // shingle-less docs can't be near-dups (and would 0-divide)
    // spread the probe side across all cores: the source is often a single
    // input split, which would otherwise serialise the whole O(n²) loop
    val a = base.select(col("id").as("a"), col("sh").as("sha"), col("n").as("na"))
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    val b = base.select(col("id").as("b"), col("sh").as("shb"), col("n").as("nb"))
    // size-ratio prefilter: J >= t forces min(na,nb)/max(na,nb) >= t, so
    // mismatched sizes are rejected before any intersection work
    a.join(broadcast(b), col("a") < col("b") &&
        col("na") * minJaccard <= col("nb") && col("nb") * minJaccard <= col("na"))
      .withColumn("inter",
        call_function("graft_intersect_count", col("sha"), col("shb")).cast("long"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** Inverted-index variant of [[ngramJaccard]] — identical output, shuffle
    * on the shingle key instead of a broadcast loop. The right choice when
    * the shingle vocabulary is large and zipfian (most shingles rare →
    * co-occurrence volume Σ df² ≪ n²); on dense small-vocab corpora the
    * broadcast path wins. Both are exact; pick by corpus shape.
    */
  def ngramJaccardSparse(docs: DataFrame, minJaccard: Double,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val base = docs.select(col(idCol).as("id"),
      transform(TextOps.bigrams(col(textCol)), sh => xxhash64(sh)).as("sh"))
    val inv = base.select(col("id"), size(col("sh")).as("n"), explode(col("sh")).as("h"))
    val pairs = inv.as("x").join(inv.as("y"),
        col("x.h") === col("y.h") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("a"), col("y.id").as("b"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** MinHash signature: `numHashes` minima of seeded hashes, via the native
    * one-pass expression graft.functions.MinHashCodes — a per-row
    * computation, zero shuffle.
    */
  def minhashSignature(shingles: Column, numHashes: Int): Column =
    call_function("graft_minhash_codes", shingles, lit(numHashes))

  /** MinHash + LSH banding near-dup detection, verified exactly.
    * `bands` bands of `numHashes/bands` rows; candidates from band-signature
    * equality are re-checked with true Jaccard, so the output equals
    * [[ngramJaccard]] up to (vanishingly unlikely) LSH misses.
    */
  def minhashLsh(docs: DataFrame, minJaccard: Double,
                 numHashes: Int = 16, bands: Int = 4,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val rows = numHashes / bands
    // shingles as sorted hash arrays: signatures AND the exact verification
    // both run over longs (merge-scan intersect, no per-pair hash sets)
    val base = docs
      .select(col(idCol).as("id"), TextOps.bigrams(col(textCol)).as("shs"))
      .select(col("id"), array_sort(transform(col("shs"), sh => xxhash64(sh))).as("sh"),
        minhashSignature(col("shs"), numHashes).as("sig"))
      .withColumn("n", size(col("sh")))
    val banded = base.select(col("id"), col("sh"), col("n"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => slice(col("sig"), b * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
    val candidates = banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bandsig") === col("y.bandsig")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.sh").as("sha"), col("y.sh").as("shb"),
        col("x.n").as("na"), col("y.n").as("nb"))
      .dropDuplicates("a", "b")
    candidates
      .withColumn("inter",
        call_function("graft_intersect_count", col("sha"), col("shb")).cast("long"))
      .select(col("a"), col("b"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("a", "b")
  }

  /** SimHash near-dup pairs with hamming distance ≤ `maxHamming` (≤ 31).
    *
    * The 64-bit signature comes from the native codegen expression
    * graft.functions.SimHash64 (one pass over the tokens — the interpreted
    * HOF formulation cost tokens×64 lambda calls per row). Pigeonhole
    * banding: the 64 bits split into the smallest power-of-two chunk count
    * strictly above `maxHamming` — a pair within the threshold must agree
    * on ≥1 full chunk, so the join on (chunk index, chunk code) is
    * exhaustive. Chunk extraction and the final hamming check are plain
    * bit ops (`shiftrightunsigned`/`bit_count`), all codegen'd.
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3,
              idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val mask = (1L << chunkLen) - 1
    val base = docs.select(col(idCol).as("id"),
      call_function("graft_simhash64", TextOps.tokens(col(textCol))).as("code64"))
    val chunks = base.select(col("id"), col("code64"),
      posexplode(array((0 until nChunks).map(c =>
        shiftrightunsigned(col("code64"), c * chunkLen).bitwiseAND(mask)): _*))
        .as(Seq("cidx", "code")))
    val candidates = chunks.as("x").join(chunks.as("y"),
        col("x.cidx") === col("y.cidx") && col("x.code") === col("y.code")
          && col("x.id") < col("y.id"))
      .select(col("x.id").as("a"), col("y.id").as("b"),
        col("x.code64").as("ca"), col("y.code64").as("cb"))
      .dropDuplicates("a", "b")
    candidates
      .select(col("a"), col("b"),
        bit_count(col("ca").bitwiseXOR(col("cb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .orderBy("a", "b")
  }
}
