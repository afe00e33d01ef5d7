package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.ann.Ann
import graft.ops.dedup.Dedup
import graft.ops.multimodal.Multimodal

/** Cross-validates the non-SQL-expressible pipeline ops against their exact
  * counterparts on the driver-generated documents/embeddings tables.
  */
class PipelineOpsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$dir/documents.parquet")
  private lazy val embs = spark.read.parquet(s"$dir/embeddings.parquet")

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Reference Levenshtein for brute-force twins. */
  private def levRef(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("dense (broadcast+merge-scan) and sparse (inverted-index) jaccard joins agree") {
    val dense = pairs(Dedup.ngramJaccard(docs, 0.5))
    val sparse = pairs(Dedup.ngramJaccardSparse(docs, 0.5))
    assert(dense.nonEmpty)
    assert(dense === sparse)
  }

  test("prefix-filtered (PPJoin) jaccard join is exact at multiple thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      val dense = pairs(Dedup.ngramJaccard(docs, t))
      val prefix = pairs(Dedup.ngramJaccardPrefix(docs, t))
      assert(prefix === dense, s"threshold $t")
    }
  }

  test("PPJoin+ suffix filter prunes candidates the positional filter keeps — never a true pair") {
    import spark.implicits._
    // planted shape: pair (2i, 2i+1) shares a 3-word head unique to it
    // (two df = 2 bigrams — the rare band, heading both rarity-ordered
    // prefixes, so the posting join emits the pair), while the 5-word
    // tails come from a pool of sequences reused by several NON-partner
    // docs (bigram df ≥ 3 keeps tails out of the prefix) and partners get
    // different sequences — disjoint tails. When the matched prefix run
    // sits at the rank floor the positional bound degenerates to the
    // unbeatable n−1, so these pairs survive it at any t ≤ (n−1)/(n+1);
    // only a suffix probe can see the tails never intersect.
    val pool = (0 until 4).map(k => (0 until 5).map(j => s"s${k}w$j").mkString(" "))
    val m = 40
    val docsP = (0 until m).map { i =>
      (i.toLong, s"h${i / 2}a h${i / 2}b h${i / 2}c ${pool((i + i / 2) % 4)}")
    }.toDF("doc_id", "text")
    val baseP = Dedup.shingledStaged(docsP)
    val posOnly = Dedup.prefixCandidates(baseP, 0.75, suffix = Some(false)).count()
    val withSuf = Dedup.prefixCandidates(baseP, 0.75).count()
    assert(withSuf < posOnly,
      s"t=0.75: suffix filter pruned nothing ($withSuf of $posOnly)")
    // exactness: the filtered route still finds exactly the brute pairs
    for (t <- Seq(0.5, 0.75))
      assert(pairs(Dedup.ngramJaccardPrefix(docsP, t)) ===
        pairs(Dedup.ngramJaccard(docsP, t)), s"t=$t")
    // and on the driver corpus the (forced-on) filter only ever shrinks
    val base = Dedup.shingledStaged(docs)
    assert(Dedup.prefixCandidates(base, 0.5, suffix = Some(true)).count() <=
      Dedup.prefixCandidates(base, 0.5, suffix = Some(false)).count())
  }

  test("edit-distance dedup: pigeonhole candidates find every pair a brute force finds") {
    import spark.implicits._
    val rows = Seq(
      (1L, "the quick brown fox jumps over it"),   // 32+ chars
      (2L, "the quick crown fox jumps over it"),   // 1 substitution vs 1
      (3L, "the quick brown fax jumps over itx"),  // 2 edits vs 1 (sub in chunk 2 + tail)
      (4L, "xhe quick brown fox jumps over iz"),   // 2 subs vs 1, FIRST and LAST chunk touched
      (5L, "a completely different sentence here"),
      (6L, "short key one"),                       // short-key band (< 24 chars)
      (7L, "short key oneX"),                      // 1 insertion vs 6
      (8L, "the quickbrown fox jumps over it")     // deletion at chunk boundary vs 1
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(rows, maxDist = 2, keyLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute-force twin over the same normalised keys
    val keys = rows.collect().map(r => r.getLong(0) ->
      r.getString(1).toLowerCase.take(32)).toMap
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val brute = (for {
      (a, ka) <- keys; (b, kb) <- keys if a < b && lev(ka, kb) <= 2
    } yield (a, b, lev(ka, kb).toLong)).toSet
    assert(got === brute)
    // the planted shapes are all found (distances on the TRUNCATED
    // 32-char keys): substitution (1-2), first-chunk edit (1-4, the
    // trailing z falls off the key), boundary deletion (1-8: the lost
    // space shifts the tail, costing a second edit at the cut), and the
    // short-key band (6-7)
    assert(Set((1L, 2L, 1L), (1L, 4L, 1L), (1L, 8L, 2L), (6L, 7L, 1L)).subsetOf(got))
    assert(got.contains((1L, 3L, 1L)))
    // nothing within distance 2 of the unrelated doc
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("edit-distance dedup: short-key corpus (200 titles < 24 chars) — banded recall equals brute force") {
    import spark.implicits._
    // the population the operator is motivated by: titles/URLs shorter
    // than (maxDist+1)*chunkLen = 24 chars, which all route through the
    // length-band branch. Recall must equal brute force, and the branch
    // must plan a keyed join (PlanAuditSpec locks the no-BNL shape).
    val titles = (0 until 200).map { i =>
      val base = s"product ${('a' + i % 7).toChar} no ${i / 7}"
      // every 10th title gets a 1-edit twin at id+1000
      (i.toLong, base)
    } ++ (0 until 200 by 10).map { i =>
      (1000L + i, s"product ${('a' + i % 7).toChar} nX ${i / 7}")
    }
    val docs = titles.toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 2, keyLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val keys = titles.map { case (id, t) => id -> t.toLowerCase.take(32) }.toMap
    val brute = (for {
      (a, ka) <- keys; (b, kb) <- keys
      if a < b && math.abs(ka.length - kb.length) <= 2
      d = levRef(ka, kb) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got === brute, s"missing=${brute -- got} spurious=${got -- brute}")
    assert(got.size >= 20, s"fixture should plant >= 20 twin pairs, got ${got.size}")
  }

  test("edit-distance dedup: pairs straddling the long/short band boundary are found") {
    import spark.implicits._
    // boundary = (maxDist+1)*chunkLen = 24. Pairs with one key just below
    // and one at/just above the cut (len 23 vs 24/25) sit in neither the
    // pigeonhole (short member has no maxDist+1 intact chunks) nor a
    // short-only band — the widened band right side must catch them.
    val docs = Seq(
      (1L, "abcdefghij klmnopqr uvw"),    // len 23 (short)
      (2L, "abcdefghij klmnopqr uvwx"),   // len 24 (long) — 1 insertion vs 1
      (3L, "abcdefghij klmnopqr uvwxy"),  // len 25 (long) — 2 insertions vs 1
      (4L, "abcdefghij klmnopqr uvwxyz"), // len 26 — 3 edits vs 1: excluded
      (5L, "zzzzzzzzzz zzzzzzzz zzz")     // len 23, unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 2, keyLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val keys = Map(1L -> "abcdefghij klmnopqr uvw", 2L -> "abcdefghij klmnopqr uvwx",
      3L -> "abcdefghij klmnopqr uvwxy", 4L -> "abcdefghij klmnopqr uvwxyz",
      5L -> "zzzzzzzzzz zzzzzzzz zzz")
    val brute = (for {
      (a, ka) <- keys; (b, kb) <- keys
      if a < b; d = levRef(ka, kb) if d <= 2
    } yield (a, b, d.toLong)).toSet
    assert(got === brute, s"missing=${brute -- got} spurious=${got -- brute}")
    // the cross-boundary pairs specifically (1-2 short-long, 1-3 short-long)
    assert(Set((1L, 2L, 1L), (1L, 3L, 2L), (2L, 3L, 1L)).subsetOf(got), got.toString)
  }

  test("edit-distance dedup survives a template corpus: hot shared chunk, exact recall via rare tails") {
    import spark.implicits._
    // every key opens with the same hot chunk ("TEMPLATE" x60); tails are
    // rare. The rarity guard indexes only tail chunks, so the hot chunk's
    // df^2 posting list never forms — and the planted near-pair must
    // still surface through its intact rare tail chunks.
    // tails are a 2-letter code repeated 4 times, so any two template docs
    // differ in >= 4 tail positions — never within distance 2 of each other
    val docs = ((0 until 58).map { i =>
      val code = s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}"
      (i.toLong, f"TEMPLATE doc$i%04d ${code * 4} x")
    } ++
      Seq((100L, "TEMPLATE aaaa bbbb cccc dddd eee"),
          (101L, "TEMPLATE aaaa bbbb cccc dddd eeZ"))).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, maxDist = 2, keyLen = 32)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.contains((100L, 101L, 1L)), s"planted pair lost: $got")
    // no spurious pairs among the template docs (tails all differ by > 2)
    assert(got.filterNot(_ == ((100L, 101L, 1L))).forall(p => p._1 >= 100L),
      s"spurious template pairs: $got")
  }

  test("suffix filter is GATED: off below SuffixGate, on at/above it") {
    import spark.implicits._
    val tiny = Seq((1L, "a b c d e f"), (2L, "a b c d e g")).toDF("doc_id", "text")
    val base = Dedup.shingledStaged(tiny)
    def joins(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.size
    // below the gate (the zipf query's t=0.5) the default route plans the
    // forced-OFF shape — no signature joins
    assert(joins(Dedup.prefixCandidates(base, 0.5)) ===
      joins(Dedup.prefixCandidates(base, 0.5, suffix = Some(false))))
    // at/above the gate the default route plans the forced-ON shape, which
    // carries strictly more joins (the two signature re-attaches)
    val on75 = joins(Dedup.prefixCandidates(base, 0.75, suffix = Some(true)))
    val off75 = joins(Dedup.prefixCandidates(base, 0.75, suffix = Some(false)))
    assert(joins(Dedup.prefixCandidates(base, 0.75)) === on75)
    assert(on75 > off75)
    assert(Dedup.SuffixGate === 0.6)
  }

  test("dedup queries at scale never plan a broadcast all-pairs loop") {
    // (the GUARDED below-cutoff routes of dedup_ngram_jaccard and
    // dedup_embedding legitimately pick an exact broadcast all-pairs loop on
    // small/dense corpora — their above-guard scale routes are asserted
    // here and in the adaptive-routing test)
    val minhashPlan = graft.SparkEntry.queries("dedup_minhash")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!minhashPlan.contains("BroadcastNestedLoopJoin"),
      s"dedup_minhash plans a broadcast nested loop:\n$minhashPlan")
    // dense corpus ABOVE the exact-join guards: the adaptive join must fall
    // back to the LSH+verify plan, not ship the quadratic bitmap loop
    val overGuard = Dedup.ngramJaccardAdaptive(docs, 0.5, maxExactDocs = 10)
      .queryExecution.executedPlan.toString
    assert(!overGuard.contains("BroadcastNestedLoopJoin"),
      s"guard-exceeded adaptive join plans a broadcast nested loop:\n$overGuard")
    // the minhash signatures are materialised under the staged base, so the
    // plan's LSH marker is the band-bucket join, not the signature expression
    assert(overGuard.toLowerCase.contains("bandsig"))
    val lshPlan = Ann.cosinePairsAdaptive(embs, 0.45, maxExactRows = 10)
      .queryExecution.executedPlan.toString
    assert(!lshPlan.contains("BroadcastNestedLoopJoin"),
      s"embedding LSH route plans a broadcast nested loop:\n$lshPlan")
  }

  test("adaptive jaccard join routes by corpus density and stays exact") {
    // this synthetic corpus is dense (931-shingle vocab, avg df 275):
    // expect the vocabulary-indexed bitmap path, and exact pairs
    val onDense = Dedup.ngramJaccardAdaptive(docs, 0.5)
    assert(onDense.queryExecution.executedPlan.toString.toLowerCase.contains("graft_bitmap"))
    assert(pairs(onDense) === pairs(Dedup.ngramJaccard(docs, 0.5)))
    // a zipfian corpus — every doc mostly unique tokens, two planted dups —
    // must route to the PPJoin prefix path and also be exact
    val corpus = zipfianCorpus(300)
    val onZipf = Dedup.ngramJaccardAdaptive(corpus, 0.5)
    assert(!onZipf.queryExecution.executedPlan.toString.toLowerCase.contains("graft_bitmap"))
    assert(pairs(onZipf) === pairs(Dedup.ngramJaccard(corpus, 0.5)))
    assert(pairs(onZipf).nonEmpty)
    // dense above the guards with exactness demanded: refuse, don't degrade
    assertThrows[IllegalArgumentException] {
      Dedup.ngramJaccardAdaptive(docs, 0.5, maxExactDocs = 10,
        allowApproximate = false)
    }
  }

  test("C2c: dedup_ngram_fallback rides the router's LSH fallback at fixture scale") {
    // the driver query parameterizes the router past the guard
    // (density thresholds zeroed, maxExactDocs=64 < every fixture's
    // 500..50k docs) — assert it actually lands on the minhashLsh branch,
    // not the exact bitmap loop, and that the branch's output IS
    // minhashLsh's on the same corpus/threshold
    val viaRouter = graft.SparkEntry.queries("dedup_ngram_fallback")(spark, dir)
    val plan = viaRouter.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("bandsig"), "expected the LSH banding join")
    assert(!plan.contains("graft_bitmap"), "must not take the dense exact loop")
    assert(pairs(viaRouter) === pairs(Dedup.minhashLsh(docs, 0.5)))
    assert(pairs(viaRouter).nonEmpty)
  }

  /** n docs of 30 mostly-unique tokens each, with two planted duplicates. */
  private def zipfianCorpus(n: Int): org.apache.spark.sql.DataFrame = {
    val zipf = spark.range(n).select(col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 30).map(i => concat(lit("t"), col("id"), lit(s"_$i"))): _*)
        .as("text"))
    val dup = zipf.where(col("doc_id") < 2)
      .select(col("doc_id") + 1000000, col("text"))
      .toDF("doc_id", "text")
    zipf.union(dup)
  }

  test("pigeonhole jaccard join is exact on both corpus shapes, at multiple thresholds") {
    for (t <- Seq(0.3, 0.5, 0.8)) {
      assert(pairs(Dedup.ngramJaccardPigeonhole(docs, t)) ===
        pairs(Dedup.ngramJaccard(docs, t)), s"dense corpus, threshold $t")
    }
    val corpus = zipfianCorpus(200)
    assert(pairs(Dedup.ngramJaccardPigeonhole(corpus, 0.5)) ===
      pairs(Dedup.ngramJaccard(corpus, 0.5)), "zipfian corpus")
  }

  test("routing probe is unbiased by data layout (dense head, zipfian tail)") {
    // a corpus whose LEADING rows are dense template docs and whose tail is
    // zipfian: a head-limit probe would see only the dense prefix and pick
    // the bitmap route, but corpus-wide the right plan is PPJoin. The
    // hash-ordered sample reads across the whole corpus.
    val denseHead = spark.range(300).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 30).map(i => lit(s"tmpl_${i % 8}")): _*).as("text"))
    val zipfTail = spark.range(3000).select((col("id") + 1000).as("doc_id"),
      concat_ws(" ",
        (0 until 30).map(i => concat(lit("t"), col("id"), lit(s"_$i"))): _*)
        .as("text"))
    val clustered = denseHead.union(zipfTail).coalesce(1) // one split: head IS the scan order
    // the head alone is unambiguously dense...
    assert(Dedup.jaccardRoute(denseHead, "doc_id", "text", 100, 16.0) === "dense")
    // ...but the hash-ordered sample sees the true shape and routes sparse
    assert(Dedup.jaccardRoute(clustered, "doc_id", "text", 100, 16.0) === "prefix")
    // the adaptive join itself (full-corpus stats over the staged arrays)
    // must also route this layout-clustered corpus to the prefix path
    val plan = Dedup.ngramJaccardAdaptive(clustered, 0.5)
      .queryExecution.executedPlan.toString.toLowerCase
    assert(!plan.contains("graft_bitmap"))
  }

  test("trained trigram profiles classify at least as well as the fixed ones") {
    import graft.ops.text.TextOps
    val labelled = docs.select(col("lang"), col("text"))
    val trained = TextOps.collectTrigramProfiles(
      TextOps.trainTrigramProfiles(docs, topK = 10, minCount = 5))
    // every language present in the data gets a trained profile (the fixed
    // set is missing zh entirely — data-derived training closes that gap)
    assert(trained.map(_._1).toSet ===
      labelled.select("lang").distinct().collect().map(_.getString(0)).toSet)
    def accuracy(pred: org.apache.spark.sql.Column): Long =
      labelled.where(pred === col("lang")).count()
    val trainedAcc = accuracy(TextOps.trigramPredictFrom(col("text"), trained))
    val fixedAcc = accuracy(TextOps.trigramPredict(col("text")))
    assert(trainedAcc >= fixedAcc,
      s"trained $trainedAcc < fixed $fixedAcc of ${labelled.count()}")
  }

  test("contamination hot-gram guard bounds candidate volume, keeps real signal") {
    import spark.implicits._
    val boiler = (1 to 8).map(i => s"b$i").mkString(" ")           // in every doc
    val shared = (1 to 8).map(i => s"u$i").mkString(" ")           // only e1 and t1
    def filler(tag: String) = (1 to 8).map(i => s"$tag$i").mkString(" ")
    val corpus = (
      Seq((100L, s"${filler("e1f")} $boiler $shared", true),
          (101L, s"${filler("e2f")} $boiler", true)) ++
      (1 to 5).map(i => (200L + i, s"${filler(s"t${i}f")} $boiler" +
        (if (i == 1) s" $shared" else ""), false))
    ).toDF("doc_id", "text", "is_eval")
    def result(maxDf: Long) =
      Dedup.contamination(corpus, col("is_eval"), n = 8, maxGramDf = maxDf)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // unguarded: the boilerplate gram links EVERY eval doc to EVERY train
    // doc — 10 pairs, the quadratic-bucket shape
    val unguarded = result(100000L)
    assert(unguarded.size === 10)
    assert(unguarded((100L, 201L)) === 9) // shared suffix: 9 grams of 16 tokens
    assert(unguarded((101L, 205L)) === 1) // boilerplate-only link
    // guarded (df cap below the boilerplate's df=7): only the genuinely
    // shared suffix survives, minus its df-7 boilerplate gram
    val guarded = result(5L)
    assert(guarded === Map((100L, 201L) -> 8L))
    // the broadcast semi-join reduction changes the plan, never the output:
    // forcing the fallback (no broadcast) yields the identical result
    val noBroadcast = Dedup.contamination(corpus, col("is_eval"), n = 8,
        maxGramDf = 100000L, maxBroadcastGrams = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(noBroadcast === unguarded)
    // and the default plan really takes the reduction: the train-side
    // postings pass a broadcast join before any exchange
    val plan = Dedup.contamination(corpus, col("is_eval"), n = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("minhash LSH finds exactly the exact-Jaccard pairs") {
    val exact = pairs(Dedup.ngramJaccard(docs, 0.5))
    val lsh = pairs(Dedup.minhashLsh(docs, 0.5))
    assert(exact.nonEmpty)
    assert(lsh === exact)
  }

  test("corpus_dsir ranks target-like raw docs above raw-typical ones; gramless docs score 0") {
    import spark.implicits._
    // planted domains: src0 (target) speaks "alpha beta", the raw pool
    // speaks "zeta omega" — a raw doc quoting the target's bigrams must
    // get a higher importance weight than a raw-typical doc
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir").toString
    val planted =
      (1L to 10L).map(i => (i, "src0", "alpha beta alpha beta alpha")) ++ Seq(
        (100L, "src1", "alpha beta alpha beta"), // target-like raw doc
        (101L, "src1", "zeta omega zeta omega"), // raw-typical doc
        (102L, "src1", "solo"))                  // no bigrams at all
    planted.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.queries.Pipeline.corpusDsir(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got.keySet === Set(100L, 101L, 102L))
    assert(got(100L)._2 > got(101L)._2,
      s"target-like ${got(100L)} must outrank raw-typical ${got(101L)}")
    assert(got(102L) === ((0L, 0.0)))
  }

  test("RAKE keywords score degree/frequency over stopword-split phrases") {
    import spark.implicits._
    // "big data the big data pipeline a fast run" splits into phrases
    // [big data], [big data pipeline], [fast run]; degree/freq: big 5/2,
    // data 5/2, pipeline 3/1, fast 2/1, run 2/1 — so the phrase scores
    // are 8.0, 5.0, 4.0 in that rank order
    val d = Seq((1L, "big data the big data pipeline a fast run"))
      .toDF("doc_id", "text")
    val got = graft.ops.text.TextOps.rakeKeywords(d).collect()
      .map(r => (r.getLong(1), r.getString(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, "big data pipeline", 8.0), (2L, "big data", 5.0), (3L, "fast run", 4.0)))
  }

  test("reliable staging mode gives identical dedup results and writes real checkpoints") {
    val local = pairs(Dedup.minhashLsh(docs, 0.5))
    val ckDir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    spark.sparkContext.setCheckpointDir(ckDir)
    spark.conf.set(graft.io.DataFrames.ReliableStagingKey, "true")
    try {
      val reliable = pairs(Dedup.minhashLsh(docs, 0.5))
      assert(reliable === local)
      // the reliable path must have actually materialised to the dir —
      // otherwise this spec would pass with the flag silently ignored
      def files(d: java.io.File): Seq[java.io.File] = {
        val cs = Option(d.listFiles).map(_.toSeq).getOrElse(Nil)
        cs.filter(_.isFile) ++ cs.filter(_.isDirectory).flatMap(files)
      }
      assert(files(new java.io.File(ckDir)).nonEmpty, s"no checkpoint files under $ckDir")
    } finally spark.conf.set(graft.io.DataFrames.ReliableStagingKey, "false")
  }

  test("simhash catches most planted near-identical pairs") {
    val sim = pairs(Dedup.simhash(docs, maxHamming = 3))
    // simhash is token-frequency based: near-identical shingle SETS usually
    // land within a few bits, but repetition-heavy dups can drift — expect
    // high coverage, not containment (and extra frequency-profile pairs are
    // its legitimate semantics, not errors).
    val planted = pairs(Dedup.ngramJaccard(docs, 0.95))
    assert(planted.nonEmpty)
    val coverage = (planted intersect sim).size.toDouble / planted.size
    assert(coverage >= 0.6, s"coverage $coverage below 0.6")
  }

  test("exact dedup groups contain genuinely identical normalisation keys") {
    val groups = Dedup.exact(docs, prefixTokens = 10).collect()
    assert(groups.nonEmpty)
    assert(groups.forall(_.getAs[Long]("n_dups") >= 2))
  }

  test("LSH cosine pairs: subset of exact pairs with high recall") {
    val exact = pairs(Ann.cosinePairs(embs, 0.45))
    val lsh = pairs(Ann.cosinePairsLsh(embs, 0.45))
    assert(exact.nonEmpty)
    assert(lsh.subsetOf(exact)) // exact verification → no false positives
    val recall = (exact intersect lsh).size.toDouble / exact.size
    assert(recall >= 0.6, s"recall $recall below 0.6")
    // the adaptive route picks the exact path at this size
    assert(pairs(Ann.cosinePairsAdaptive(embs, 0.45)) === exact)
    // and the LSH path above a tiny cutoff
    assert(pairs(Ann.cosinePairsAdaptive(embs, 0.45, maxExactRows = 10)) === lsh)
    // multi-probe (Hamming ≤ 1 per band): still no false positives, and
    // the candidate set SUPERSETS single-probe — recall can only rise
    val mp = pairs(Ann.cosinePairsLsh(embs, 0.45, multiProbe = true))
    assert(mp.subsetOf(exact))
    assert(lsh.subsetOf(mp),
      "multi-probe must find every single-probe pair (own bucket is probed too)")
    val mpRecall = (exact intersect mp).size.toDouble / exact.size
    assert(mpRecall >= recall, s"multi-probe recall $mpRecall below single-probe $recall")
    // knob is plumbed through the adaptive router
    assert(pairs(Ann.cosinePairsAdaptive(embs, 0.45, maxExactRows = 10,
      multiProbe = true)) === mp)
  }

  test("IVF ANN reaches decent recall of brute-force top-5") {
    val q = embs.where(col("vec_id") < 20)
    val c = embs.where(col("vec_id") >= 20)
    val exact = Ann.bruteForceTopK(q, c, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.ivfTopK(q, c, 5, nCells = 8, nProbe = 4)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall below 0.4")
  }

  test("knownCount threading: dedup driver queries construct without count jobs") {
    import graft.queries.{Pipeline, Tables}
    val sf = dir
    // footer-derived total equals the scanned count, once, cached
    assert(Tables.rowCount(spark, sf, "embeddings") === embs.count())
    // warm the fingerprint-keyed caches (first contact may pay one
    // bounded filtered count — priced and cached)
    Pipeline.dedupEmbedding(spark, sf)
    Pipeline.dedupEmbeddingInc(spark, sf)

    val n = embs.count()
    val callSites = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        callSites.add(Option(js.properties)
          .map(_.getProperty("callSite.short", "")).getOrElse(""))
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      // CONSTRUCTION ONLY — no action on the returned frames
      Pipeline.dedupEmbedding(spark, sf)
      Pipeline.dedupEmbeddingInc(spark, sf)
      Ann.cosinePairsAdaptive(embs, 0.45, knownCount = n)
      Ann.srpIndex(embs, knownCount = 42L)
      // the listener bus is async; constructions above are synchronous,
      // so a short drain window suffices for their job-start events
      Thread.sleep(1000)
    } finally spark.sparkContext.removeSparkListener(listener)
    val counts = callSites.toArray.map(_.toString).filter(_.startsWith("count at"))
    assert(counts.isEmpty,
      s"count jobs at construction: ${counts.mkString(", ")}")
    // the warm inc construction's only jobs are the index checkpoint
    // materialisation + the 1-row planes lookup, never a count
  }

  test("ivfAdd: add == rebuild-assign at pinned centroids; planted boundary batch fires the alarms") {
    val base = embs.where(col("vec_id") >= 20 && col("vec_id") % 7 =!= 0)
    val batch = embs.where(col("vec_id") >= 20 && col("vec_id") % 7 === 0)
    val (cells, cents) = Ann.ivfBuild(base, nCells = 8)
    val (updated, drift) = Ann.ivfAdd(cells, cents, batch)
    // 1) incremental add is EXACTLY assigning afresh at the same pinned
    // centroids — no Lloyd re-run means no assignment can move
    def cellOf(df: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      df.select("cid", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (rebuilt, _) = Ann.ivfAdd(cells.limit(0), cents, base.unionByName(batch))
    assert(cellOf(updated) === cellOf(rebuilt))
    // 2) telemetry accounting: every row lands somewhere, exactly once
    assert(drift.columns.toSeq === Seq("cell", "n_before", "n_added", "growth"))
    val d = drift.collect()
    assert(d.map(_.getLong(1)).sum === base.count())
    assert(d.map(_.getLong(2)).sum === batch.count())

    // 3) planted drift: vectors seeded NEAR CELL BOUNDARIES (mixtures of
    // cross-cell base pairs) — each query's true neighbours straddle two
    // cells, so under-probed recall regresses while the full probe stays
    // exact: the C97-style recall re-check is the rebuild alarm
    def mix(w: Double, x: Seq[Double], y: Seq[Double]): Seq[Double] =
      x.zip(y).map { case (a, b) => w * a + (1 - w) * b }
    val byCell = cellOf(cells)
    val vecs = base.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toSeq).toMap
    val ids = vecs.keys.toSeq.sorted
    val crossPairs = (for {
      x <- ids.take(50); y <- ids.take(50)
      if x < y && byCell(x) != byCell(y)
    } yield (x, y)).take(5)
    assert(crossPairs.size === 5, "fixture must span multiple cells")
    import spark.implicits._
    val planted = crossPairs.zipWithIndex.flatMap { case ((x, y), i) => Seq(
      (100000L + 2 * i, mix(0.9, vecs(x), vecs(y))),
      (100001L + 2 * i, mix(0.1, vecs(x), vecs(y)))) }
      .toDF("vec_id", "embedding")
    val queries = crossPairs.zipWithIndex.map { case ((x, y), i) =>
      (i.toLong, mix(0.5, vecs(x), vecs(y))) }.toDF("vec_id", "embedding")
    val (updated2, drift2) = Ann.ivfAdd(updated, cents, planted)
    assert(drift2.collect().map(_.getLong(2)).sum === 10L)
    def toD(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      expr("transform(embedding, x -> cast(x AS double))").as("embedding"))
    val all = toD(base).unionByName(toD(batch)).unionByName(planted)
    def hits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = hits(Ann.bruteForceTopK(queries, all, 2))
    val under = hits(Ann.ivfSearch(updated2, cents, queries, k = 2, nProbe = 1))
    val full = hits(Ann.ivfSearch(updated2, cents, queries, k = 2, nProbe = 8))
    assert(full === exact, "probing every cell must equal brute force")
    val recall = (exact intersect under).size.toDouble / exact.size
    assert(recall < 1.0,
      s"boundary-planted batch must regress under-probed recall (got $recall)")
  }

  test("LSH ANN reaches decent recall of brute-force top-5") {
    val q = embs.where(col("vec_id") < 20)
    val c = embs.where(col("vec_id") >= 20)
    val exact = Ann.bruteForceTopK(q, c, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(q, c, 5)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall $recall below 0.4")
  }

  test("multimodal feature-extract composes with ANN search") {
    val withBin = Multimodal.withMediaMetadata(docs.limit(50), "doc_id", "text")
    val embedded = Multimodal.fakeEmbed(withBin, "media", dims = 16)
      .select(col("doc_id").as("vec_id"), col("embedding"))
    val q = embedded.where(col("vec_id") < 5)
    val c = embedded.where(col("vec_id") >= 5)
    val topk = graft.ops.ann.Ann.bruteForceTopK(q, c, k = 3).collect()
    assert(topk.length === 5 * 3)
    // determinism: same bytes → same embedding → same neighbours on re-run
    val again = graft.ops.ann.Ann.bruteForceTopK(q, c, k = 3).collect()
    assert(topk.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("areEqual helper (ref areDataFramesEqual)") {
    val a = docs.limit(20)
    val b = docs.limit(20).orderBy(org.apache.spark.sql.functions.col("doc_id").desc)
    assert(graft.io.DataFrames.areEqual(a, b))
    assert(!graft.io.DataFrames.areEqual(a, docs.limit(19)))
  }

  test("minhash sketch aggregate estimates group-level jaccard") {
    import org.apache.spark.sql.functions._
    val est = graft.queries.Pipeline.sourceSimilarity(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    // exact token-set jaccard per source pair
    val sets = docs.select(col("source"), col("text")).collect()
      .groupBy(_.getString(0))
      .map { case (s, rows) => s -> rows.flatMap(_.getString(1).split(" ")).toSet }
    val exact = for {
      (a, sa) <- sets; (b, sb) <- sets if a < b
    } yield (a, b) -> (sa.intersect(sb).size.toDouble / sa.union(sb).size)
    assert(est.nonEmpty && est.size === exact.size)
    exact.foreach { case (k, j) =>
      assert(math.abs(est(k) - j) <= 0.25, s"pair $k: estimate ${est(k)} vs exact $j")
    }
  }

  test("multimodal frame sampling and resize keep the binary contract") {
    val withBin = Multimodal.withMediaMetadata(docs.limit(10), "doc_id", "text")
    val frames = Multimodal.sampleFrames(withBin, "doc_id", "media",
      frameBytes = 16, stride = 2)
    assert(frames.columns.toSeq === Seq("doc_id", "frame_idx", "frame"))
    val f = frames.collect()
    assert(f.nonEmpty)
    assert(f.forall(_.getAs[Array[Byte]]("frame").length == 16))
    val resized = Multimodal.resize(withBin, "media", factor = 4).collect()
    resized.foreach { r =>
      assert(r.getAs[Array[Byte]]("resized").length ===
        r.getAs[Array[Byte]]("media").length / 4)
    }
  }

  test("multimodal seam survives NULL payloads — poison rows degrade, never NPE") {
    import spark.implicits._
    val media = Seq((1L, "some text long enough to window " * 8), (2L, null))
      .toDF("doc_id", "text")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
    // frames: the NULL payload yields none, the real one yields some
    val frames = Multimodal.sampleFrames(media, "doc_id", "media",
      frameBytes = 16, stride = 2).collect()
    assert(frames.nonEmpty && frames.forall(_.getLong(0) == 1L))
    // decode: NULL decodes like empty (stub, n_bytes 0) instead of failing
    val meta = Multimodal.decodeMedia(media, "media").collect()
      .map(r => r.getLong(0) -> r.getStruct(2).getLong(0)).toMap
    assert(meta(2L) === 0L && meta(1L) > 0L)
    // embed + resize: both rows survive
    assert(Multimodal.fakeEmbed(media, "media", dims = 4).count() === 2L)
    val rz = Multimodal.resize(media, "media", factor = 4).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("resized").length).toMap
    assert(rz(2L) === 0)
    // and the near-dup pipeline end-to-end: completing without an
    // exception is the contract; one doc can't pair with itself
    val pairs = Multimodal.frameNearDup(media, "doc_id", "media").collect()
    assert(pairs.isEmpty)
  }

  test("dHash: hand-computed grids; frameNearDup pairs perturbed copies, not strangers") {
    import spark.implicits._
    // ascending bytes: every right neighbour brighter => all 64 bits set;
    // constant bytes: none
    val asc = Array.tabulate(72)(i => (10 + i).toByte)
    assert(graft.functions.DHash64.hash(asc) === -1L)
    assert(graft.functions.DHash64.hash(Array.fill(72)(7.toByte)) === 0L)
    // swapping two adjacent mid-frame bytes flips exactly the one
    // comparison whose orientation reverses
    def swap4041(f: Array[Byte]) = {
      val g = f.clone(); val t = g(40); g(40) = g(41); g(41) = t; g
    }
    assert(java.lang.Long.bitCount(
      graft.functions.DHash64.hash(asc) ^
        graft.functions.DHash64.hash(swap4041(asc))) === 1)
    // planted media: A = two distinct frames; B = the same frames each
    // perturbed within hamming 1 (md5-EXACT dedup would see nothing);
    // C = flat frames, far from both
    val alt = Array.tabulate(72)(i => (if (i % 2 == 0) 40 else 90).toByte)
    val a = asc ++ alt
    val b = swap4041(asc) ++ swap4041(alt)
    val c = Array.fill(144)(7.toByte)
    val media = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "media")
    val got = graft.ops.multimodal.Multimodal
      .frameNearDup(media, "doc_id", "media").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((1L, 2L, 2L)))
  }

  test("audio fingerprint: in-band permutation is code-identical where md5 differs; " +
      "amplitude tweak stays near; strangers and non-WAV payloads never pair") {
    import graft.ops.multimodal.Multimodal
    import spark.implicits._
    val hdr = Multimodal.wavHeaderStreaming()
    // the header IS a well-formed stream: pcmSection finds data at 44
    assert(Multimodal.pcmSection(hdr ++ Array.fill(10)(1.toByte)) === Some((44, 10)))
    assert(Multimodal.pcmSection("not audio at all".getBytes) === None)
    // base window: varied "PCM" (one 288-sample window, 4-sample bands)
    val base = Array.tabulate(288)(i => (128 + 60 * math.sin(i / 3.0)).toByte)
    // pitch-preserving micro-jitter: permute samples INSIDE one band
    // (indices 40..43 are one 4-sample band) — the band's energy (a
    // multiset statistic) is unchanged
    val perm = { val g = base.clone(); g(40) = base(43); g(43) = base(40); g }
    assert(!java.util.Arrays.equals(base, perm), "md5 would differ")
    assert(graft.functions.AudioFp64.hash(base) === graft.functions.AudioFp64.hash(perm),
      "in-band permutation must be fingerprint-invariant")
    // small amplitude tweak on one band: few bits move
    val tweak = { val g = base.clone(); g(80) = (g(80) + 6).toByte; g }
    assert(java.lang.Long.bitCount(
      graft.functions.AudioFp64.hash(base) ^ graft.functions.AudioFp64.hash(tweak)) <= 3)
    // end-to-end: A and its permuted copy pair; flat silence does not;
    // a payload without a WAV header emits no windows at all
    val silence = Array.fill(288)(128.toByte)
    val media = Seq(
      (1L, hdr ++ base), (2L, hdr ++ perm), (3L, hdr ++ silence),
      (4L, base ++ base) /* no header: never fingerprinted */)
      .toDF("doc_id", "media")
    val got = Multimodal.audioNearDup(media, "doc_id", "media", minShared = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("rebalancePlan: hand case, conservation, greedy transfer bound, already-balanced empties") {
    import spark.implicits._
    import graft.ops.sample.Sampling
    // counts (10, 0, 2, 4) over 4 shards: total 16, targets all 4 ->
    // surpluses: s0=+6; deficits: s1=-4, s2=-2. Greedy pour in shard
    // order: 0->1 x4, 0->2 x2.
    val plan = Sampling.rebalancePlan(
        Seq((0, 10L), (1, 0L), (2, 2L), (3, 4L)).toDF("shard", "n_docs"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(plan.toSeq === Seq((0, 1, 4L), (0, 2, 2L)))
    // uneven total: 7 over 3 shards -> targets (3, 2, 2) in shard order
    val p2 = Sampling.rebalancePlan(
        Seq((0, 0L), (1, 0L), (2, 7L)).toDF("shard", "n_docs"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    assert(p2.toSeq === Seq((2, 0, 3L), (2, 1, 2L)))
    // conservation + the greedy bound on a skewed 8-shard manifest
    val counts = Seq((0, 31L), (1, 1L), (2, 17L), (3, 0L), (4, 9L),
      (5, 2L), (6, 0L), (7, 4L))
    val p3 = Sampling.rebalancePlan(counts.toDF("shard", "n_docs"))
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val total = counts.map(_._2).sum
    val targets = counts.indices.map(i =>
      total / 8 + (if (i < total % 8) 1L else 0L))
    val surplus = counts.map(_._2).zip(targets).map { case (n, t) => n - t }
    // every src sends exactly its surplus, every dst receives its deficit
    surplus.zipWithIndex.filter(_._1 > 0).foreach { case (s, i) =>
      assert(p3.filter(_._1 == i).map(_._3).sum === s, s"src $i") }
    surplus.zipWithIndex.filter(_._1 < 0).foreach { case (d, i) =>
      assert(p3.filter(_._2 == i).map(_._3).sum === -d, s"dst $i") }
    assert(p3.forall(_._3 > 0), "no zero-sized transfers")
    val nSur = surplus.count(_ > 0); val nDef = surplus.count(_ < 0)
    assert(p3.length <= nSur + nDef - 1, "greedy transfer-count optimum")
    // an already-balanced manifest plans nothing
    assert(Sampling.rebalancePlan(
      Seq((0, 3L), (1, 3L), (2, 3L)).toDF("shard", "n_docs")).count() === 0L)
  }

  test("ivfProbeCurve: every curve point equals ivfSearch at that depth; recall monotone in probes") {
    val queries = embs.where(col("vec_id") < 10)
    val corpus = embs.where(col("vec_id") >= 10)
    val (cells, cents) = Ann.ivfBuild(corpus)
    val curve = Ann.ivfProbeCurve(cells, cents, queries, k = 5,
        probes = Seq(1, 2, 4, 8)).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4)))
    // the sweep is a VIEW of one scoring pass: each depth's rows must be
    // bit-identical to an independent ivfSearch at that nProbe
    Seq(1, 4, 8).foreach { p =>
      val sw = Ann.ivfSearch(cells, cents, queries, k = 5, nProbe = p)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
      val cv = curve.filter(_._1 == p).map(t => (t._2, t._3, t._4, t._5)).toSet
      assert(cv === sw, s"probe depth $p")
    }
    // recall against brute force never decreases with probe depth
    val truth = Ann.bruteForceTopK(queries, corpus, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recalls = Seq(1, 2, 4, 8).map { p =>
      curve.filter(_._1 == p).count(t => truth((t._2, t._3)))
    }
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a }, recalls)
  }

  test("motionProfile: closed-form pair distances incl. the 255 wraparound, short-video drop") {
    import spark.implicits._
    // graft_bytediff: unsigned L1, missing bytes count as change (pad-0)
    assert(graft.functions.ByteDiff64.diff(
      Array[Byte](0, 127, -1), Array[Byte](1, 127, 0)) === 256L) // 1+0+255
    assert(graft.functions.ByteDiff64.diff(
      Array[Byte](10, 20), Array[Byte](10)) === 20L)
    // len("ab cd") = 5: w=6, h=12, f=4, ds = ((18+3)//4)*4*12 = 240,
    // fills 5,6,7,8 -> 3 pairs each |1|·240 = 240
    // a 253-byte text: fills 253,254,255,0,... includes the 255->0
    // wraparound pair at distance 255·ds
    val long253 = "x" * 253 // w = 1+253%16 = 14, h = 1+(253*31)%12 = 8,
                            // f = 1+(253*7)%8 = 4, ds = ((42+3)//4)*4*8 = 352
    val df = Seq((1L, Some("ab cd")), (2L, Some(long253)),
      (3L, None: Option[String])).toDF("doc_id", "text")
    val got = Multimodal.motionProfile(
        Multimodal.syntheticAvi(df, "doc_id", "text"), "doc_id", "media")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got(1L) === ((3L, 720L, 240L, 240.0)))
    // fills 254,255,0,1: pairs |1|,|255|,|1| times ds=352
    assert(got(2L) === ((3L, 352L + 352L * 255 + 352L, 352L * 255, {
      val tot = (352L + 352L * 255 + 352L).toDouble
      math.floor(tot / 3 * 1e6 + 0.5) / 1e6
    })))
    assert(!got.contains(3L), "NULL text has no frames, no motion row")
  }

  test("audioStats: hand-computed sample stats, silence/clipping reads, door rules") {
    import spark.implicits._
    val hdr = Multimodal.wavHeaderStreaming()
    // hand-checkable clip: samples 128,130,126,128,255,0 centre to
    // d = 0,2,-2,0,127,-128 — energy 0+4+4+0+16129+16384 = 32521,
    // peak 128, crossings: (2,-2) and (127,-128) flip sign; zeros at the
    // boundaries are NOT crossings (0·x = 0, the strict-product rule)
    val clip = Array(128, 130, 126, 128, 255, 0).map(_.toByte)
    val silence = Array.fill(10)(128.toByte)
    val media = Seq(
      (1L, hdr ++ clip), (2L, hdr ++ silence),
      (3L, clip ++ clip) /* no RIFF header: dropped at the door */,
      (4L, null.asInstanceOf[Array[Byte]]))
      .toDF("doc_id", "media")
    val got = Multimodal.audioStats(media, "doc_id", "media").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), Option(r.get(5)).map(_.asInstanceOf[Double])))).toMap
    assert(got.keySet === Set(1L, 2L), "non-WAV and NULL payloads drop")
    assert(got(1L)._1 === 6L)
    assert(got(1L)._2 === 32521L, "energy")
    assert(got(1L)._3 === 128L, "peak (the most negative sample)")
    assert(got(1L)._4 === 2L, "strict sign flips only")
    assert(got(1L)._5 === Some(math.floor(
      math.sqrt(32521.0 / 6) * 1e6 + 0.5) / 1e6))
    // silence: all zeros, rms 0.0 (defined, not NULL — n > 0)
    assert(got(2L) === ((10L, 0L, 0L, 0L, Some(0.0))))
  }

  test("fixture invariant: every document long enough to emit a media frame is ASCII") {
    // the C43/C87 oracles frame by CHARACTERS while the engine frames the
    // UTF-8 BYTES of encode(text) — exact only while every doc that can
    // emit a frame (>= 64 bytes, the smaller of the two ops' thresholds)
    // has byte length == char length. A generator change that ships long
    // non-ASCII docs must fail HERE, not as a silent oracle divergence
    // (tools/robustness_check.py asserts the same invariant on its fixture).
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
      .where(col("text").isNotNull &&
        octet_length(col("text")) >= 64 &&
        octet_length(col("text")) =!= length(col("text")))
    assert(d.count() === 0L,
      "non-ASCII document >= 64 bytes: C43/C87 char-framed oracles would diverge")
  }

  test("product quantization: codes bounded, cross-product spans beyond one codebook, fits sane") {
    val got = Ann.pqAssign(embs, m = 2, nCells = 8, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
    assert(got.length === embs.count())
    assert(got.forall { case (_, c0, f0, c1, f1) =>
      c0 >= 0 && c0 < 8 && c1 >= 0 && c1 < 8 &&
        f0 >= -1.0 && f0 <= 1.0 && f1 >= -1.0 && f1 <= 1.0 })
    // the PQ point: the (code_0, code_1) cross-product addresses more
    // cells than either 8-codeword codebook alone
    val pairs = got.map(g => (g._2, g._4)).distinct.length
    assert(pairs > 8, s"cross-product collapsed to $pairs cells")
    // codewords fit their own blocks reasonably (cosine to the assigned
    // centroid should usually beat 0 — a degenerate codebook would not)
    assert(got.count(g => g._3 > 0 && g._5 > 0) > got.length / 2)
  }

  test("real codec seam: javax.imageio decodes a PNG end-to-end, stub fallback otherwise") {
    import spark.implicits._
    // a real 17×9 PNG, generated in-JVM (no container media libs needed)
    val img = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 17).foreach(x => img.setRGB(x, x % 9, 0xff00ff))
    val baos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", baos))
    val png = baos.toByteArray
    val notAnImage = "just some text bytes".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, notAnImage)).toDF("media_id", "media")

    // real codec ON (explicit): the PNG header is decoded, foreign bytes
    // degrade per-row to the deterministic stub
    val real = Multimodal.decodeMedia(df, "media", realCodec = Some(true))
      .select("media_id", "meta.*").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getInt(3), r.getString(4)))
      .toMap
    assert(real(1L) === ((png.length.toLong, 17, 9, "img/png")))
    assert(real(2L)._4 === "img/fake")

    // same through the session-conf flag (the production switch)
    spark.conf.set("graft.multimodal.realCodec", "true")
    try {
      val viaConf = Multimodal.decodeMedia(df, "media")
        .select("meta.format").as[String].collect().toSet
      assert(viaConf === Set("img/png", "img/fake"))
    } finally spark.conf.unset("graft.multimodal.realCodec")

    // flag off (default): every row takes the stub — the oracle contract
    val stub = Multimodal.decodeMedia(df, "media")
      .select("meta.format").as[String].collect().toSet
    assert(stub === Set("img/fake"))

    // degenerate payloads never throw — the per-row fallback contract
    assert(Multimodal.decodeImage(Array.empty[Byte]).isEmpty)
    assert(Multimodal.decodeImage(Array[Byte](0, 1, 2, 3)).isEmpty)
  }

  test("real codec seam: WAV/RIFF headers sniff sample rate and channels, pure JVM") {
    import spark.implicits._
    // a REAL wav file written by the JDK's own encoder (javax.sound.sampled)
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 2, true, false)
    val pcm = new Array[Byte](8000 * 2 * 2) // 1 second of silence, stereo 16-bit
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, 8000)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val wav = baos.toByteArray

    val meta = Multimodal.decodeWav(wav)
    assert(meta.isDefined, "JDK-written WAV not recognised")
    val m = meta.get
    assert(m.getLong(0) === wav.length.toLong)
    assert(m.getInt(1) === 8000)   // width := sample rate
    assert(m.getInt(2) === 2)      // height := channels
    assert(m.getString(3) === "audio/wav")

    // through the dataframe seam with the real codec: a mixed column of
    // PNG + WAV + foreign bytes resolves per row
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val ibaos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", ibaos)
    val df = Seq((1L, ibaos.toByteArray), (2L, wav),
      (3L, "neither".getBytes("UTF-8"))).toDF("media_id", "media")
    val formats = Multimodal.decodeMedia(df, "media", realCodec = Some(true))
      .select("media_id", "meta.format").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(formats === Map(1L -> "img/png", 2L -> "audio/wav", 3L -> "img/fake"))

    // degenerate/truncated RIFF never throws: fallback contract holds
    assert(Multimodal.decodeWav("RIFF".getBytes("US-ASCII")).isEmpty)
    assert(Multimodal.decodeWav(wav.take(20)).isEmpty)
    // adversarial chunk walk: unknown first chunk claiming a 4 GiB size —
    // the Long-arithmetic walk steps past the buffer and returns None
    // instead of looping or overflowing into a bogus offset
    val evil = wav.clone()
    evil(12) = 'x'.toByte
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1
    assert(Multimodal.decodeWav(evil).isEmpty)
  }

  test("real codec seam: synthetic BMPs round-trip through the in-JDK ImageIO reader") {
    import spark.implicits._
    // the builder's bytes are a REAL file: the JDK's own reader must
    // recover the dimensions from the header (this is the codec path
    // media_image_meta exercises — not the arithmetic that built them)
    val bmp = Multimodal.bmpBytes(7, 5)
    val m = Multimodal.decodeImage(bmp).get
    assert(m.getLong(0) === bmp.length.toLong)
    assert((m.getInt(1), m.getInt(2), m.getString(3)) === ((7, 5, "img/bmp")))
    // closed-form size: 54 + rowSize*h, rowSize = ((3*7+3)/4)*4 = 24
    assert(bmp.length === 54 + 24 * 5)
    // and ImageIO itself agrees end-to-end
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth === 7 && img.getHeight === 5)

    // the frame builder: NULL text -> NULL payload -> stub zeros through
    // the decode seam (the C12/C89 poison-row stance); headerless bytes
    // (not a BMP) also degrade to the stub, never throw
    val df = Seq((1L, Some("ab cd")), (2L, None: Option[String])).toDF("doc_id", "text")
    val got = Multimodal.decodeMedia(
        Multimodal.syntheticBmp(df, "doc_id", "text"), "media",
        realCodec = Some(true))
      .select(col("doc_id"), col("meta.width"), col("meta.height"), col("meta.format"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    // len("ab cd") = 5: w = 1 + 5 % 64 = 6, h = 1 + 155 % 48 = 12
    assert(got === Set((1L, 6, 12, "img/bmp"), (2L, 0, 0, "img/fake")))
  }

  test("real codec seam: synthetic PNGs round-trip through the in-JDK ImageIO reader") {
    import spark.implicits._
    // the builder's bytes are a REAL file — CRC32 chunk trailers, a valid
    // zlib IDAT (stored blocks + adler32) — and the JDK's own PNG reader
    // must both sniff the header AND fully decode the pixel data
    val png = Multimodal.pngBytes(7, 5)
    val m = Multimodal.decodeImage(png).get
    assert(m.getLong(0) === png.length.toLong)
    assert((m.getInt(1), m.getInt(2), m.getString(3)) === ((7, 5, "img/png")))
    // closed-form size: raw = 5*(7+1) = 40 -> 63 + 5*1 + 40
    assert(png.length === 63 + 5 + 40)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth === 7 && img.getHeight === 5)
    assert((img.getRGB(0, 0) & 0xffffff) === 0) // zero scanlines decode black
    // a raw size past one stored block (65535) splits correctly and the
    // closed form still prices it: 600*(200+1) = 120600 -> 2 blocks
    val big = Multimodal.pngBytes(200, 600)
    assert(big.length === 63 + 5 * 2 + 120600)
    val bigImg = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(big))
    assert(bigImg.getWidth === 200 && bigImg.getHeight === 600)

    // NULL text -> NULL payload -> stub zeros (the C12/C89/C90 stance)
    val df = Seq((1L, Some("ab cd")), (2L, None: Option[String])).toDF("doc_id", "text")
    val got = Multimodal.decodeMedia(
        Multimodal.syntheticPng(df, "doc_id", "text"), "media",
        realCodec = Some(true))
      .select(col("doc_id"), col("meta.width"), col("meta.height"), col("meta.format"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSet
    assert(got === Set((1L, 6, 12, "img/png"), (2L, 0, 0, "img/fake")))
  }

  test("real container seam: synthetic AVIs parse back through the RIFF chunk walk") {
    import spark.implicits._
    // the builder's bytes are a REAL container: RIFF('AVI ') -> LIST(hdrl)
    // -> avih walked by declared sizes, not sniffed by magic number
    val avi = Multimodal.aviBytes(7, 5, 3, usPerFrame = 40000)
    val hdr = Multimodal.aviHeader(avi)
    assert(hdr === Some((7, 5, 3, 40000L)))
    // closed-form size: ds = ((3*7+3)/4)*4*5 = 24*5 = 120 -> 224 + 3*128
    assert(avi.length === 224 + 3 * (8 + 120))
    // generic decode seam recognises it behind image/wav
    val m = Multimodal.decodeAvi(avi).get
    assert((m.getLong(0), m.getInt(1), m.getInt(2), m.getString(3)) ===
      ((avi.length.toLong, 7, 5, "video/avi")))

    // degenerate/truncated/adversarial bytes never throw, never parse:
    // a RIFF that is not an AVI ('WAVE' form), a truncated header, and a
    // first chunk claiming a 4 GiB size all walk off the end to None
    assert(Multimodal.aviHeader(Multimodal.wavHeaderStreaming()).isEmpty)
    assert(Multimodal.aviHeader(avi.take(20)).isEmpty)
    val evil = avi.clone()
    evil(12) = 'x'.toByte // unknown first chunk...
    evil(16) = -1; evil(17) = -1; evil(18) = -1; evil(19) = -1 // ...claiming 4 GiB
    assert(Multimodal.aviHeader(evil).isEmpty)
    // a truncated-but-well-formed header still parses (the pcmSection
    // clamp stance: a 4 GiB hdrl size clamps to the buffer, the avih
    // inside is intact) — tolerance is per-chunk, not per-file
    val clamped = avi.clone()
    clamped(16) = -1; clamped(17) = -1; clamped(18) = -1; clamped(19) = -1
    assert(Multimodal.aviHeader(clamped) === Some((7, 5, 3, 40000L)))

    // frame builder + wide-schema decode: NULL text -> NULL payload ->
    // stub zeros with zero frames (the C90/C91 poison-row stance)
    val df = Seq((1L, Some("ab cd")), (2L, None: Option[String])).toDF("doc_id", "text")
    val got = Multimodal.aviMeta(
        Multimodal.syntheticAvi(df, "doc_id", "text"), "doc_id", "media")
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getLong(5), r.getString(6))).toSet
    // len("ab cd") = 5: w = 1+5%16 = 6, h = 1+155%12 = 12, f = 1+35%8 = 4,
    // uspf = 10000*(1+5%5) = 10000
    assert(got === Set((1L, 6, 12, 4, 10000L, "video/avi"),
      (2L, 0, 0, 0, 0L, "img/fake")))

    // movi frame extraction: the walk recovers every frame payload, in
    // order, with the declared BI_RGB plane size and the planted fill
    val filled = Multimodal.aviBytes(7, 5, 3, 40000, fill = 250)
    val frames = Multimodal.aviMoviFrames(filled)
    assert(frames.size === 3)
    assert(frames.forall(_.length === 120)) // ds = 24*5
    // frame f fills with (250+f) mod 256: 250, 251, 252
    assert(frames.zipWithIndex.forall { case (fb, i) =>
      fb.forall(b => (b & 0xff) === ((250 + i) % 256)) })
    // non-AVI and truncated payloads yield no frames, never throw
    assert(Multimodal.aviMoviFrames(Multimodal.wavHeaderStreaming()).isEmpty)
    assert(Multimodal.aviMoviFrames(filled.take(200)).isEmpty)
    // a movi truncated mid-frame clamps: the partial frame is returned
    // with the bytes it has (the pcmSection clamp stance)
    val cut = filled.take(filled.length - 60)
    val cutFrames = Multimodal.aviMoviFrames(cut)
    assert(cutFrames.size === 3 && cutFrames.last.length === 60)
  }

  test("tabmap scan prunes to the mapped columns only") {
    val plan = graft.queries.GraphEtl.tabmapNodes(spark, dir)
      .queryExecution.executedPlan.toString
    // part has 6 columns; the mapper references 5 — p_type must not be read
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("p_type"), s"unpruned scan:\n$plan")
  }

  test("sequence packing covers every doc exactly once within budget") {
    import org.apache.spark.sql.functions._
    val budget = 200
    val packed = graft.ops.text.TextOps.packSequences(docs, budget)
    val sizes = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seqs = packed.collect()
    val packedIds = seqs.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids"))
    assert(packedIds.sorted.toSeq === sizes.keys.toSeq.sorted) // exactly once
    seqs.foreach { s =>
      val ids = s.getAs[scala.collection.Seq[Long]]("doc_ids")
      val tot = s.getAs[Long]("total_tokens")
      assert(tot === ids.map(sizes).sum)
      // within budget unless a single oversized doc
      assert(tot <= budget || ids.size === 1)
    }
  }

  test("sequence packing survives NULL text and NULL ids (poison-row stance)") {
    import spark.implicits._
    val poisoned = Seq((Some(1L), "a b c"), (Some(2L), null), (None, "x y"))
      .toDF("doc_id", "text")
    val seqs = graft.ops.text.TextOps
      .packSequences(poisoned, tokenBudget = 10, partitions = Some(1)).collect()
    val ids = seqs.flatMap(_.getAs[scala.collection.Seq[Long]]("doc_ids")).sorted
    // null text packs as 0 tokens; the unidentifiable null-id row drops
    assert(ids.toSeq === Seq(1L, 2L))
    assert(seqs.map(_.getAs[Long]("total_tokens")).sum === 3L)
  }

  test("hash split/sample: reproducible, near-weight fractions, monotone samples") {
    import graft.ops.sample.Sampling
    val assigned = docs.select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts.keySet === Set("train", "val", "test"))
    assert(math.abs(counts("train") / n - 0.8) < 0.1)
    // re-evaluation reproduces the identical assignment
    val again = docs.select(col("doc_id"),
      Sampling.splitAssign(col("doc_id"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).as("split"))
    assert(assigned.exceptAll(again).isEmpty)
    // fractional samples are monotone: sample(0.3) is a subset of sample(0.6)
    val s3 = Sampling.sampleByHash(docs, "doc_id", 0.3).select("doc_id")
    val s6 = Sampling.sampleByHash(docs, "doc_id", 0.6).select("doc_id")
    assert(s3.exceptAll(s6).isEmpty)
    assert(s3.count() < s6.count())
    // a different salt draws a genuinely different sample
    val salted = Sampling.sampleByHash(docs, "doc_id", 0.3, salt = "v2").select("doc_id")
    assert(s3.exceptAll(salted).count() > 0)
  }

  test("chunking covers every document exactly to its end with bounded chunks") {
    import graft.ops.text.TextOps
    val chunkT = 32; val stride = 16
    val sizes = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val byDoc = TextOps.chunk(docs, chunkT, stride).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"), r.getAs[Long]("chunk_tokens")))
      .groupBy(_._1)
    assert(byDoc.keySet === sizes.keySet)
    byDoc.foreach { case (id, chunks) =>
      val n = sizes(id)
      val expected = math.max(1, math.ceil((n - chunkT).toDouble / stride).toInt + 1)
      assert(chunks.length === expected, s"doc $id")
      chunks.foreach { case (_, idx, ct) =>
        assert(ct <= chunkT)
        assert(idx * stride + ct <= n)
      }
      // the final chunk reaches the document's last token
      val (_, lastIdx, lastCt) = chunks.maxBy(_._2)
      assert(lastIdx * stride + lastCt === n, s"doc $id tail uncovered")
    }
  }

  test("feature-hash embedding matches a reference implementation and powers text ANN") {
    import graft.ops.text.TextOps
    graft.functions.GraftFunctions.register(spark)
    val dims = 32
    val embedded = docs.select(col("doc_id"), split(col("text"), " ").as("toks"),
      TextOps.hashEmbed(col("text"), dims).as("embedding"))
    // the 5-line reference implementation of the hashing trick
    def fnv(s: String): Long = {
      var h = 0xcbf29ce484222325L
      s.getBytes("UTF-8").foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
      h
    }
    embedded.collect().take(50).foreach { r =>
      val v = new Array[Double](dims)
      r.getAs[scala.collection.Seq[String]]("toks").foreach { t =>
        val h = fnv(t)
        val bkt = ((((h >>> 1) % dims) + dims) % dims).toInt
        v(bkt) += (if ((h & 1L) == 1L) 1.0 else -1.0)
      }
      assert(r.getAs[scala.collection.Seq[Double]]("embedding").toSeq === v.toSeq,
        s"doc ${r.getLong(0)}")
    }
    // identical token bags embed identically; unrelated text stays apart
    import spark.implicits._
    val planted = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six")).toDF("doc_id", "text")
      .select(col("doc_id").as("vec_id"), TextOps.hashEmbed(col("text"), dims).as("embedding"))
    val pairs99 = graft.ops.ann.Ann.cosinePairs(planted, 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs99 === Set((1L, 2L)))
  }

  test("RAG composition: chunk -> hash-embed -> ANN retrieves the duplicate's chunk") {
    import graft.ops.text.TextOps
    // pick one exact-dup pair: canonical doc and a duplicate of it
    val grp = Dedup.exact(docs, prefixTokens = 10).orderBy("canonical_id").limit(1).collect()(0)
    val canonical = grp.getAs[Long]("canonical_id")
    val dup = grp.getAs[String]("members").split(",").map(_.toLong)
      .filter(_ != canonical).head
    // index = chunks of every doc but the duplicate; queries = the dup's chunks
    val chunks = TextOps.chunk(docs, chunkTokens = 32, stride = 16)
      .select((col("doc_id") * 1000 + col("chunk_idx")).as("vec_id"),
        col("doc_id"),
        TextOps.hashEmbed(col("chunk"), 64).as("embedding"))
    val corpus = chunks.where(col("doc_id") =!= dup)
    val queries = chunks.where(col("doc_id") === dup)
    val top1 = Ann.bruteForceTopK(queries.drop("doc_id"), corpus.drop("doc_id"), k = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(top1.nonEmpty)
    // the duplicate's first chunk hits a chunk of its dup group at cosine ~1
    // (exact dedup keys on the first 10 tokens, so chunk 0 is shared text)
    val (qid, cid, cos) = top1.minBy(_._1)
    assert(qid === dup * 1000)
    assert(cid / 1000 === canonical, s"retrieved doc ${cid / 1000}, expected $canonical")
    assert(cos > 0.95, s"cosine $cos")
  }

  test("containment finds the quote pair that a jaccard threshold structurally misses") {
    import spark.implicits._
    val quote = "alpha beta gamma delta epsilon zeta"
    val host = quote + " " + (1 to 60).map(i => s"filler$i").mkString(" ")
    val other = (1 to 40).map(i => s"noise$i").mkString(" ")
    val corpus = Seq((1L, quote, "ref"), (2L, host, "web"), (3L, other, "web"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.containmentRef(corpus, col("source") === "ref", 0.9).collect()
    assert(got.length === 1)
    assert(got.head.getLong(0) === 1L && got.head.getLong(1) === 2L)
    assert(got.head.getDouble(2) === 1.0)
    // the same pair is invisible to the symmetric join at any useful
    // threshold: jaccard = |quote|/(|host|) ≈ 0.08
    assert(pairs(Dedup.ngramJaccard(corpus, 0.5)).isEmpty)
  }

  test("stratified sample: exact ceil(frac*n) per stratum, layout- and salt-stable") {
    import graft.ops.sample.Sampling
    val n = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.2)
    val gotN = got.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotN === n.view.mapValues(c => math.ceil(c * 0.2).toLong).toMap)
    // deterministic under a different partitioning
    val again = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id", 0.2)
    assert(got.select("doc_id").collect().map(_.getLong(0)).toSet ===
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a salted draw is a different (same-sized) selection
    val salted = Sampling.stratifiedSample(docs, "lang", "doc_id", 0.2, salt = "v2")
    assert(salted.count() === got.count())
    assert(salted.select("doc_id").collect().map(_.getLong(0)).toSet !==
      got.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("top principal component recovers a planted dominant direction, partition-invariant") {
    import spark.implicits._
    // points spread along u=(0.6,0.8) with tiny orthogonal noise — the
    // power iteration must recover u (sign-fixed positive at the largest
    // loading) with a variance share near 1
    val rows = (1 to 40).map { i =>
      val a = (i % 21) - 10.0
      val b = ((i % 5) - 2.0) * 0.1
      (i.toLong, Seq((a * 0.6 - b * 0.8).toFloat, (a * 0.8 + b * 0.6).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Ann.topPrincipalComponent(emb).collect()
    assert(math.abs(out(0).getDouble(1) - 0.6) < 0.01 &&
      math.abs(out(1).getDouble(1) - 0.8) < 0.01, out.mkString(","))
    assert(out.head.getDouble(3) > 0.99)
    // decimal accumulation: bit-identical under a different layout
    val again = Ann.topPrincipalComponent(emb.repartition(7)).collect()
    assert(again.map(_.toSeq).toSeq === out.map(_.toSeq).toSeq)
    // zero-variance input: the iterate never moves (no 0/0), zero share
    val flat = (1 to 8).map(i => (i.toLong, Seq(1f, 2f))).toDF("vec_id", "embedding")
    val z = Ann.topPrincipalComponent(flat).collect()
    assert(z.forall(r => r.getDouble(2) === 0.0 && r.getDouble(3) === 0.0))
    assert(z.forall(r => r.getDouble(1) === 0.707107))
  }

  test("all-but-the-top strips the mean and the dominant direction, partition-invariant") {
    import spark.implicits._
    // the planted-direction fixture of the top-PC test, shifted by a
    // common mean: whitening must remove BOTH the shift and the u-axis
    val rows = (1 to 40).map { i =>
      val a = (i % 21) - 10.0
      val b = ((i % 5) - 2.0) * 0.1
      (i.toLong, Seq((3.0 + a * 0.6 - b * 0.8).toFloat, (-1.0 + a * 0.8 + b * 0.6).toFloat))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = Ann.allButTop(emb).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out.size === 80)
    // residuals have (near-)zero projection on the recovered direction
    // u ~= (0.6, 0.8) and near-zero per-dim mean; what survives is the
    // small orthogonal noise component b*(-0.8, 0.6)
    val ids = rows.map(_._1)
    val maxProj = ids.map(id => math.abs(out((id, 0)) * 0.6 + out((id, 1)) * 0.8)).max
    assert(maxProj < 2e-3, s"projection on stripped direction survives: $maxProj")
    val meanX = ids.map(id => out((id, 0))).sum / ids.size
    val meanY = ids.map(id => out((id, 1))).sum / ids.size
    assert(math.abs(meanX) < 1e-3 && math.abs(meanY) < 1e-3)
    ids.foreach { i =>
      val b = ((i % 5) - 2.0) * 0.1
      assert(math.abs(out((i, 0)) - (-b * 0.8)) < 0.01, s"vec $i x-residual")
      assert(math.abs(out((i, 1)) - b * 0.6) < 0.01, s"vec $i y-residual")
    }
    // decimal accumulation + round-once: bit-identical under another layout
    val again = Ann.allButTop(emb.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(again === out)

    // second PC by deflation: the top PC of the whitened cloud is the
    // orthogonal noise direction (-0.8, 0.6) sign-fixed positive at the
    // largest loading, and it explains ~all the deflated variance
    val whitened = Ann.allButTop(emb)
      .groupBy("vec_id")
      .agg(org.apache.spark.sql.functions.transform(
        array_sort(collect_list(struct(col("pos"), col("wx")))),
        s => s.getField("wx")).as("embedding"))
    val pc2 = Ann.topPrincipalComponent(whitened).collect()
    val (l0, l1) = (pc2(0).getDouble(1), pc2(1).getDouble(1))
    assert(math.abs(math.abs(l0) - 0.8) < 0.02 && math.abs(math.abs(l1) - 0.6) < 0.02,
      s"pc2 loadings ($l0, $l1)")
    assert(l0 * l1 < 0, "noise direction has opposite-sign components")
    assert(pc2.head.getDouble(3) > 0.95, "deflated variance concentrated in one direction")
  }

  test("label noise: planted mislabel flagged by the kNN vote, duplicates don't starve k") {
    import spark.implicits._
    // two tight clusters near e1 and e2; vec 5 sits IN the e1 cluster but
    // carries the e2 cluster's label — the planted annotation error
    def v(x: Double, y: Double) = Seq(x.toFloat, y.toFloat)
    val rows = Seq(
      (1L, v(1.0, 0.00), 0), (2L, v(1.0, 0.01), 0), (3L, v(1.0, 0.02), 0),
      (4L, v(0.99, 0.03), 0), (5L, v(1.0, 0.015), 1),
      (10L, v(0.0, 1.0), 1), (11L, v(0.01, 1.0), 1), (12L, v(0.02, 1.0), 1),
      (13L, v(0.03, 0.99), 1), (14L, v(0.015, 1.0), 1),
      // exact duplicate of vec 1: self-exclusion must still leave k voters
      (20L, v(1.0, 0.00), 0))
    val emb = rows.toDF("vec_id", "embedding", "label")
    val out = Ann.labelNoise(emb, emb, k = 5).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    assert(out.size === rows.size)
    // the planted error: own label 1, neighbourhood votes 0
    val (l5, m5, n5, f5) = out(5L)
    assert(l5 === 1 && m5 === 0 && f5, s"planted mislabel not flagged: ${out(5L)}")
    assert(n5 === 5L) // all 5 nearest are cluster-0 members
    // clean rows are not flagged
    Seq(1L, 2L, 10L, 11L, 20L).foreach { id =>
      assert(!out(id)._4, s"clean vec $id flagged: ${out(id)}") }
    // vec 1 and its duplicate 20 both see a majority-0 panel (the dup
    // votes for its twin, the twin's self never does)
    assert(out(1L)._2 === 0 && out(20L)._2 === 0)
    val again = Ann.labelNoise(emb.repartition(5), emb.repartition(3), k = 5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(again === out.view.mapValues(_._4).toMap) // partition-invariant
  }

  test("centroid cosine flags the planted outlier and is partition-invariant") {
    import spark.implicits._
    // label 0 clusters near e1 with one vector pointing the other way;
    // label 1 clusters near e2
    def v(x: Double, y: Double, noise: Double) = Array(x.toFloat, y.toFloat, noise.toFloat)
    val rows = (0 until 20).map(i => (i.toLong, 0, v(1.0, 0.02 * i, 0.01 * i))) ++
      Seq((20L, 0, v(-1.0, 0.0, 0.0))) ++
      (21 until 40).map(i => (i.toLong, 1, v(0.01 * i, 1.0, 0.0)))
    val emb = rows.toDF("vec_id", "label", "embedding")
    val out = Ann.centroidCosine(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val inliers = (0 until 20).map(out(_))
    assert(out(20L) < 0, s"outlier cosine ${out(20L)} should be negative")
    assert(inliers.forall(_ > 0.9), s"inliers too far from centroid: $inliers")
    // decimal-summed centroids: identical output under a different layout
    val again = Ann.centroidCosine(emb.repartition(7)).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(again === out)
  }

  test("multimodal metadata is deterministic from bytes") {
    val out = Multimodal.withMediaMetadata(docs, "doc_id", "text")
    val r = out.orderBy("doc_id").limit(1).collect()(0)
    val bytes = r.getAs[Array[Byte]]("media")
    val meta = r.getStruct(r.fieldIndex("meta"))
    assert(meta.getLong(0) === bytes.length.toLong)
    assert(meta.getInt(1) === (bytes.length % 640))
    assert(meta.getInt(2) === ((bytes.length.toLong * 31) % 480).toInt)
    assert(meta.getString(3) === "img/fake")
  }

  test("incremental dedup: new-vs-index equals the full join restricted to new-side pairs") {
    val isNew = col("source") === "src0"
    val out = Dedup.minhashLshIncrement(
      docs.where(isNew), Dedup.minhashIndex(docs.where(!isNew)), 0.5)
    // the full-corpus near-dup set, restricted to pairs with a new member
    val newIds = docs.where(isNew).select("doc_id").collect().map(_.getLong(0)).toSet
    val expected = pairs(Dedup.ngramJaccard(docs, 0.5))
      .filter { case (a, b) => newIds(a) || newIds(b) }
    assert(pairs(out) === expected)
    assert(pairs(out).nonEmpty)
    // index-x-index pairs (previous runs' output) are NOT re-found
    assert(pairs(out).forall { case (a, b) => newIds(a) || newIds(b) })
    // the probe broadcasts the batch, not the index: no index-side
    // all-pairs shape in the plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("zero-norm vectors rank last with cosine 0.0 instead of crashing (ANSI 0/0)") {
    import spark.implicits._
    val corpus = Seq(
      (100L, Array(1f, 0f, 0f, 0f)),
      (101L, Array(0f, 0f, 0f, 0f)), // zero vector: unguarded cosine throws
      (102L, Array(0.9f, 0.1f, 0f, 0f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1f, 0f, 0f, 0f))).toDF("vec_id", "embedding")
    val out = Ann.bruteForceTopK(queries, corpus, k = 3)
      .select("cid", "cosine").as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(100L, 102L, 101L), "zero vector ranks last")
    assert(out.find(_._1 == 101L).get._2 === 0.0)
  }

  test("int8 quantization: bounded reconstruction error, cosine fidelity, zero-vector safe") {
    import spark.implicits._
    val q = Ann.quantizeInt8(embs)
    val joined = embs.select(col("vec_id"), Ann.vec(col("embedding")).as("v"))
      .join(q, "vec_id")
      .withColumn("dq", Ann.dequantizeInt8(col("qvec"), col("scale")))
    // per-component error <= scale/254 (half a quantization step)
    val worst = joined.select(max(expr(
      "aggregate(zip_with(v, dq, (a, b) -> abs(a - b) / (scale / 254.0)), 0.0D, (m, x) -> greatest(m, x))")))
      .head().getDouble(0)
    assert(worst <= 1.0 + 1e-9, s"component error $worst half-steps")
    // cosine between original and dequantized stays ~1 at 64 dims
    val minCos = joined.select(min(
      Ann.cosine(col("v"), col("dq"), Ann.norm(col("v")), Ann.norm(col("dq")))))
      .head().getDouble(0)
    assert(minCos > 0.995, s"min cosine $minCos")
    // a zero vector quantizes to zeros with scale 0, no NaN/divide
    val z = Seq((1L, Array.fill(4)(0f))).toDF("vec_id", "embedding")
    val zr = Ann.quantizeInt8(z).collect()(0)
    assert(zr.getDouble(1) === 0.0)
    assert(zr.getSeq[Byte](2).forall(_ == 0))

    // the quantized store works END-TO-END: exact top-5 over dequantized
    // int8 vectors recovers most of the float top-5
    def topk(e: org.apache.spark.sql.DataFrame) = Ann.bruteForceTopK(
        e.where(col("vec_id") < 20), e.where(col("vec_id") >= 20), k = 5)
      .select("qid", "cid").as[(Long, Long)].collect().toSet
    val deq = q.select(col("vec_id"),
      Ann.dequantizeInt8(col("qvec"), col("scale")).as("embedding"))
    val exactTop = topk(embs)
    val qTop = topk(deq)
    val overlap = (exactTop & qTop).size.toDouble / exactTop.size
    assert(overlap >= 0.8, s"int8 ANN overlap $overlap")
  }

  test("jlProject: norms preserved in expectation, deterministic, zero maps to zero") {
    import spark.implicits._
    val p = Ann.jlProject(embs, dimOut = 16)
    // JL: E[‖proj‖²] = ‖v‖² with variance O(1/dimOut) — per-vector ratios
    // stay in a wide band and their mean is tight around 1
    val ratios = embs.select(col("vec_id"), Ann.vec(col("embedding")).as("v"))
      .join(p, "vec_id")
      .select((Ann.dot(col("proj"), col("proj")) / Ann.dot(col("v"), col("v"))).as("r"))
      .collect().map(_.getDouble(0))
    assert(ratios.nonEmpty)
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    assert(ratios.forall(r => r > 0.2 && r < 3.0), s"worst ratios ${ratios.min} ${ratios.max}")
    // the matrix is a hash stream: identical output under any partitioning
    val a = Ann.jlProject(embs.repartition(1), 16).collect().map(_.toSeq).toSet
    val b = Ann.jlProject(embs.repartition(7), 16).collect().map(_.toSeq).toSet
    assert(a === b)
    // zero vector projects to the zero vector
    val z = Seq((1L, Array.fill(64)(0f))).toDF("vec_id", "embedding")
    assert(Ann.jlProject(z, 16).head.getSeq[Double](1).forall(_ == 0.0))
  }

  test("mixToBudget: shares respected, monotone in budget, layout-invariant") {
    import graft.ops.sample.Sampling
    val tokens = size(split(col("text"), " "))
    val weight = lit(1.0) + (substring(col("source"), 4, 10).cast("int") % 3).cast("double")
    def mix(budget: Long, df: org.apache.spark.sql.DataFrame = docs) =
      Sampling.mixToBudget(df, "source", "doc_id", tokens, weight, budget)

    val out = mix(2000)
    val bySource = out.groupBy("source")
      .agg(max("cum_tokens").as("got"), max("n_tokens").as("maxDoc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(bySource.nonEmpty)
    // per-source totals reach the share and overshoot by at most the one
    // boundary-crossing document
    val sumW = docs.select(col("source"), weight.as("w")).distinct()
      .agg(sum("w")).head().getDouble(0)
    val wBySrc = docs.select(col("source"), weight.as("w")).distinct()
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    for ((src, got, maxDoc) <- bySource) {
      val target = math.floor(2000 * wBySrc(src) / sumW).toLong
      assert(got < target + maxDoc, s"$src: $got vs target $target (+doc $maxDoc)")
    }

    // monotone: a larger budget only ADDS documents, never swaps them
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    val idsBigger = mix(4000).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(idsBigger))
    assert(idsBigger.size > ids.size)

    // layout-invariant: a different partitioning selects the same mixture
    val again = mix(2000, docs.repartition(7)).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(again === ids)

    // degenerate inputs fail loud, not with an NPE or a silent empty frame
    val empty = docs.where(lit(false))
    assertThrows[IllegalArgumentException](mix(2000, empty))
    assertThrows[IllegalArgumentException](
      Sampling.mixToBudget(docs, "source", "doc_id", tokens, lit(0.0), 2000))
  }

  test("bpeTrain matches an independent in-memory BPE on toy and real corpora") {
    import graft.ops.text.Bpe
    import spark.implicits._
    // independent reference: the Sennrich et al. algorithm, driver-side
    def refBpe(texts: Seq[String], k: Int): Seq[(String, String, Long)] = {
      def merge(s: List[String], a: String, b: String): List[String] = s match {
        case x :: y :: rest if x == a && y == b => (a + b) :: merge(rest, a, b)
        case x :: rest => x :: merge(rest, a, b)
        case Nil => Nil
      }
      var vocab: Map[List[String], Long] = texts.flatMap(_.split("\\s+"))
        .filter(_.nonEmpty).groupBy(identity)
        .map { case (w, ws) => w.split("").toList -> ws.size.toLong }
      val out = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
      var done = false
      while (out.length < k && !done) {
        val counts = scala.collection.mutable.Map.empty[(String, String), Long]
          .withDefaultValue(0L)
        vocab.foreach { case (syms, f) =>
          syms.zip(syms.drop(1)).foreach(p => counts(p) += f)
        }
        if (counts.isEmpty) done = true
        else {
          val ((a, b), c) = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }
          out += ((a, b, c))
          vocab = vocab.map { case (syms, f) => merge(syms, a, b) -> f }
        }
      }
      out.toSeq
    }
    def learned(df: org.apache.spark.sql.DataFrame, k: Int) =
      Bpe.bpeTrain(df, k).orderBy("rank")
        .collect().map(r => (r.getString(1), r.getString(2), r.getLong(4))).toSeq

    // the classic toy corpus: first merges are driven by 'newest'/'widest'
    val toy = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val toyDf = toy.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    assert(learned(toyDf, 10) === refBpe(toy, 10))
    // ... including early exhaustion (every word collapses to one symbol)
    val tiny = Seq("ab", "ab", "cd")
    val tinyDf = tiny.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val ex = learned(tinyDf, 50)
    assert(ex === refBpe(tiny, 50) && ex.length < 50)

    // the real documents table
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    assert(learned(docs, 8) === refBpe(texts, 8))
  }

  test("bpeTrainBatched is merge-for-merge identical to the sequential trainer") {
    import graft.ops.text.Bpe
    import spark.implicits._
    def merges(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("rank").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    def vocab(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[String](2).toList)).toSet

    // the Sennrich toy corpus — the published reference trace
    val toy = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (sm, sv) = Bpe.bpeTrainFull(toy, k = 10)
    val (bm, bv) = Bpe.bpeTrainBatched(toy, k = 10, batch = 8)
    assert(merges(bm) === merges(sm))
    assert(vocab(bv) === vocab(sv))

    // the real documents table: zipfian counts, ties, punctuation — the
    // guards (neighbor bound, prefix stop, alphabet collision) all fire
    val (sm2, sv2) = Bpe.bpeTrainFull(docs, k = 12)
    val (bm2, bv2) = Bpe.bpeTrainBatched(docs, k = 12, batch = 5)
    assert(merges(bm2) === merges(sm2))
    assert(vocab(bv2) === vocab(sv2))
    // batch=1 degenerates to the sequential algorithm by construction
    val (bm3, _) = Bpe.bpeTrainBatched(toy, k = 6, batch = 1)
    assert(merges(bm3) === merges(sm).take(6))
  }

  test("approximate batched BPE: every merge was a true top-batch pair; quality matches exact") {
    import graft.ops.text.Bpe
    import spark.implicits._
    // approximate mode trades sequential rank order for unconditional
    // ~k/batch rounds; with batch=1 no reordering is possible, so it must
    // still equal the sequential trace exactly
    val toy = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "text")
    val (sm, _) = Bpe.bpeTrainFull(toy, k = 10)
    val (am1, _) = Bpe.bpeTrainBatched(toy, k = 10, batch = 1, exact = false)
    def rows(df: org.apache.spark.sql.DataFrame) = df.orderBy("rank").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4))).toSeq
    assert(rows(am1) === rows(sm))
    // with a real batch the POINT is compression quality, not rank order:
    // the vocab's weighted fertility (tokens per word occurrence) must
    // match the exact trainer's at the same k on the real documents table
    def fert(vocab: org.apache.spark.sql.DataFrame): Double = {
      val r = vocab.agg(
        sum(col("freq") * size(col("symbols"))).cast("double"),
        sum(col("freq")).cast("double")).head
      r.getDouble(0) / r.getDouble(1)
    }
    val (_, ev) = Bpe.bpeTrainBatched(docs, k = 12, batch = 5, exact = true)
    val (_, av) = Bpe.bpeTrainBatched(docs, k = 12, batch = 5, exact = false)
    val (fe, fa) = (fert(ev), fert(av))
    assert(math.abs(fe - fa) / fe < 0.05,
      s"approximate fertility $fa drifted > 5% from exact $fe")
    // determinism: identical rerun
    val (am2, _) = Bpe.bpeTrainBatched(docs, k = 12, batch = 5, exact = false)
    val (am3, _) = Bpe.bpeTrainBatched(docs, k = 12, batch = 5, exact = false)
    assert(rows(am2) === rows(am3))
    // monotone merge budget: a bigger k never learns FEWER merges. (The
    // smaller trace is NOT always a prefix of the larger: the final
    // round's `limit(k - learned)` truncates the candidate window, which
    // changes skip-and-continue decisions — e.g. with the window cut to 2
    // a conflicting candidate hides the disjoint one ranked 3rd, and the
    // next round's recount then prefers the pair the merge just created.)
    val (am4, _) = Bpe.bpeTrainBatched(docs, k = 24, batch = 5, exact = false)
    assert(am4.count() >= am2.count())
  }

  test("acceptPrefix: colliding top candidate accepts alone and ends the round (no livelock)") {
    import graft.ops.text.Bpe
    // r11 advisor finding: if a round's FIRST sorted candidate fails
    // guard 3 (its merged string already in the alphabet), the old code
    // accepted ZERO merges and re-ran the identical aggregate forever.
    // The waiver accepts the top pair alone — exactly the sequential
    // step, which conflates the collision the same way — and ends the
    // round so counts are recomputed under the conflation. (No corpus
    // that organically puts a colliding pair on top was found in an
    // 800k-corpus search; the prefix function is tested directly.)
    val alphabet = Set("a", "b", "c", "ab", "abc")
    // top candidate ("a","bc")→"abc" collides; a non-colliding runner-up
    // with a count above the bound would be accepted in a normal round
    val top = Seq(("a", "bc", 90L, 10L), ("x", "y", 80L, 5L))
    val got = Bpe.acceptPrefix(top, alphabet, exact = true)
    assert(got === Seq(("a", "bc", 90L)),
      "colliding first candidate must be accepted ALONE (round ends)")
    // non-colliding top: normal prefix acceptance continues past it
    val top2 = Seq(("p", "q", 90L, 10L), ("x", "y", 80L, 5L), ("u", "v", 9L, 1L))
    assert(Bpe.acceptPrefix(top2, alphabet, exact = true) ===
      Seq(("p", "q", 90L), ("x", "y", 80L)),
      "guard 2 stops at u,v (count 9 <= bound 10) after accepting two")
    // collision at a NON-first position still ends the round before it
    val top3 = Seq(("p", "q", 90L, 10L), ("ab", "c", 80L, 5L))
    assert(Bpe.acceptPrefix(top3, alphabet, exact = true) === Seq(("p", "q", 90L)))
    // approximate mode skips the collision question entirely (no guard 3)
    assert(Bpe.acceptPrefix(top, alphabet, exact = false).map(_._1) === Seq("a", "x"))
  }

  test("weightedSample: inclusion monotone in weight, exact WOR, deterministic, top-k plan") {
    import graft.ops.sample.Sampling
    import spark.implicits._
    // planted: 200 light (w=1) + 200 heavy (w=10) rows; over many salted
    // draws of 40, heavy rows must be included far more often
    val df = ((0 until 200).map(i => (i.toLong, 1.0)) ++
      (200 until 400).map(i => (i.toLong, 10.0))).toDF("doc_id", "w")
    val draws = (0 until 30).map { s =>
      Sampling.weightedSample(df, "doc_id", col("w"), n = 40, salt = s.toString)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    draws.foreach(d => assert(d.size === 40)) // exact WOR: no duplicates, exact n
    val heavyRate = draws.map(_.count(_ >= 200L)).sum.toDouble / (30 * 40)
    assert(heavyRate > 0.75, s"heavy inclusion rate $heavyRate not > 0.75")
    // deterministic: same salt, different layout -> identical sample
    val again = Sampling.weightedSample(df.repartition(7), "doc_id", col("w"),
      n = 40, salt = "3").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again === draws(3))
    // zero/negative weights carry no mass
    val z = df.withColumn("w", when(col("doc_id") < 200, -1.0).otherwise(col("w")))
    assert(Sampling.weightedSample(z, "doc_id", col("w"), 40)
      .where(col("doc_id") < 200).count() === 0L)
    // scale shape: distributed top-k, never a global sort
    val plan = Sampling.weightedSample(df, "doc_id", col("w"), 40)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("ppsSample: exact offset intervals, multiplicity, per-stratum k conservation, poison rows drop") {
    import graft.ops.sample.Sampling
    import spark.implicits._
    // one stratum, W = 20, k = 4 -> offsets floor(20(2j+1)/8) = 2, 7, 12, 17
    // intervals (id order): id1 [0,2) none; id2 [2,6) o0; id3 [6,12) o1;
    // id4 [12,20) o2+o3
    val df = Seq(("s", 1L, 2L), ("s", 2L, 4L), ("s", 3L, 6L), ("s", 4L, 8L))
      .toDF("src", "id", "w")
    val got = Sampling.ppsSample(df, "src", "id", col("w"), k = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got === Map(2L -> 1L, 3L -> 1L, 4L -> 2L))
    // a row heavier than W/k is drawn with multiplicity
    val heavy = Seq(("s", 1L, 1L), ("s", 2L, 99L)).toDF("src", "id", "w")
    val h = Sampling.ppsSample(heavy, "src", "id", col("w"), k = 10)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(h === Map(2L -> 10L))
    // k picks are conserved per stratum, strata are independent, layout-free
    val multi = ((1 to 37).map(i => ("a", i.toLong, (i * 7 % 13 + 1).toLong)) ++
      (1 to 23).map(i => ("b", i.toLong, (i * 5 % 11 + 1).toLong)))
      .toDF("src", "id", "w")
    val m = Sampling.ppsSample(multi.repartition(7), "src", "id", col("w"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(m.filter(_._1 == "a").map(_._3).sum === 5L)
    assert(m.filter(_._1 == "b").map(_._3).sum === 5L)
    val m2 = Sampling.ppsSample(multi, "src", "id", col("w"), k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3)))
    assert(m.toSet === m2.toSet)
    // NULL stratum/id and non-positive weights drop at the door
    val poison = Seq((null, 1L, 5L), ("s", 2L, 0L), ("s", 3L, -4L), ("s", 4L, 5L))
      .toDF("src", "id", "w")
    val p = Sampling.ppsSample(poison, "src", "id", col("w"), k = 2)
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(p === Map(4L -> 2L))
  }

  test("hllDistinct: within theoretical error of exact, registers merge by max") {
    import graft.ops.stats.Stats
    val t = docs.select(col("source"), explode(split(col("text"), " ")).as("token"))
    val est = Stats.hllDistinct(t, "source", col("token"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val exact = t.groupBy("source").agg(countDistinct(col("token")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === exact.keySet && est.nonEmpty)
    // 1.04/sqrt(64) = 13% standard error; allow 3 sigma
    exact.foreach { case (src, n) =>
      assert(math.abs(est(src) - n) <= 0.39 * n + 3,
        s"$src: est ${est(src)} vs exact $n")
    }
    // mergeability: register tables of two disjoint halves, unioned and
    // re-aggregated by max, equal the whole-corpus registers
    val (a, b) = (t.where(col("token") < "m"), t.where(col("token") >= "m"))
    val merged = Stats.hllRegisters(a, "source", col("token"))
      .union(Stats.hllRegisters(b, "source", col("token")))
      .groupBy("source", "j").agg(max("mj").as("mj"))
    val whole = Stats.hllRegisters(t, "source", col("token"))
    def regSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(regSet(merged) === regSet(whole))
  }

  test("flagAgreement: cells partition the corpus, one scan, planted redundancy shows") {
    import graft.ops.stats.Stats
    import spark.implicits._
    val df = Seq((1, 1, 1), (1, 1, 0), (0, 0, 1), (1, 0, 0), (0, 0, 0))
      .toDF("fa", "fb", "fc")
    val out = Stats.flagAgreement(df, Seq("fa", "fb", "fc"))
    val rows = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))
    assert(rows.length === 3)
    // every pair's four cells partition the 5 rows
    rows.foreach { case (_, _, bb, ao, ob, nn, ag) =>
      assert(bb + ao + ob + nn === 5L)
      assert(ag >= 0.0 && ag <= 1.0)
    }
    // planted: fa/fb agree on 4 of 5; fb/fc on 3 of 5 (1 both + 2 neither)
    val m = rows.map(r => (r._1, r._2) -> r._7).toMap
    assert(m(("fa", "fb")) === 0.8)
    assert(m(("fb", "fc")) === 0.6)
    // single-scan shape: no exchange below the final one-row aggregate
    val plan = Stats.flagAgreement(df, Seq("fa", "fb", "fc"))
      .queryExecution.executedPlan.toString
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("bpe fertility: merges strictly compress vs character-level, floor at 1") {
    import graft.ops.text.Bpe
    val (_, vocab) = Bpe.bpeTrainFull(docs, k = 8)
    val fert = Bpe.fertility(docs, vocab, "lang").collect()
    assert(fert.nonEmpty)
    // char-level fertility (avg word length) is the 0-merge ceiling
    val charLevel = docs
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .where(length(col("w")) > 0)
      .agg(avg(length(col("w")))).head().getDouble(0)
    fert.foreach { r =>
      val f = r.getDouble(3)
      assert(f >= 1.0 && f < charLevel,
        s"${r.getString(0)}: fertility $f outside [1, $charLevel)")
    }
    // tokens conservation: vocab segmentation concatenates back to the word
    import spark.implicits._
    val broken = vocab.where(concat_ws("", col("symbols")) =!= col("w")).count()
    assert(broken === 0L)
  }

  test("temperatureMix flattens toward uniform as alpha shrinks, stays budget-monotone") {
    import graft.ops.sample.Sampling
    import spark.implicits._
    // planted skew: domain "big" has 16x the token mass of "small"
    val df = ((0 until 320).map(i => (i.toLong, "big", "t " * 10)) ++
      (1000 until 1020).map(i => (i.toLong, "small", "t " * 10)))
      .toDF("doc_id", "src", "text")
    val tokens = size(split(col("text"), " "))
    def selectedShare(alpha: Double, budget: Long = 1200): Double = {
      val out = Sampling.temperatureMix(df, "src", "doc_id", tokens, alpha, budget)
        .groupBy("src").agg(sum("n_tokens").as("tok"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      out.getOrElse("small", 0L).toDouble / (out.values.sum max 1L)
    }
    // natural share of "small" is 1/17; alpha-flattening must raise it,
    // monotonically as alpha drops (sqrt share ratio 1:4 at 0.5)
    val s10 = selectedShare(1.0)
    val s05 = selectedShare(0.5)
    val s02 = selectedShare(0.2)
    assert(s05 > s10, s"alpha=0.5 share $s05 should beat natural $s10")
    assert(s02 > s05, s"alpha=0.2 share $s02 should beat $s05")
    // budget monotonicity carries over from mixToBudget
    val ids = Sampling.temperatureMix(df, "src", "doc_id", tokens, 0.5, 1200)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val more = Sampling.temperatureMix(df, "src", "doc_id", tokens, 0.5, 2400)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.subsetOf(more) && more.size > ids.size)
    assertThrows[IllegalArgumentException](
      Sampling.temperatureMix(df, "src", "doc_id", tokens, 1.5, 1200))
  }

  test("tokenBudget: hand arithmetic, epochs read as repetition factors, views of one mixture agree") {
    import graft.ops.sample.Sampling
    import spark.implicits._
    // 16:1 token skew, alpha 0.5 → weight ratio 4:1, shares 0.8/0.2
    val df = ((0 until 320).map(i => (i.toLong, "big", "t " * 10)) ++
      (1000 until 1020).map(i => (i.toLong, "small", "t " * 10)))
      .toDF("doc_id", "src", "text")
    val tokens = size(split(col("text"), " "))
    val out = Sampling.tokenBudget(df, "src", tokens, alpha = 0.5, totalBudget = 1100)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))).toMap
    // natural: big = 320·11, small = 20·11 (split of "t "*10 has a
    // trailing empty token — 11 per doc, both engines agree)
    assert(out("big")._1 === 3520L && out("small")._1 === 220L)
    // weights: sqrt(16/17) and sqrt(1/17) rounded 6 dp; shares 4:1
    assert(math.abs(out("big")._2 / out("small")._2 - 4.0) < 1e-4)
    // allocation splits the budget by weight share: 880/220
    assert(out("big")._3 === 879L || out("big")._3 === 880L)
    assert(out("small")._3 === 219L || out("small")._3 === 220L)
    // epochs: small is UP-SAMPLED (≈1 epoch), big subsampled (≈0.25)
    assert(out("small")._4 > 0.9 && out("small")._4 <= 1.05)
    assert(out("big")._4 < 0.3)
    // the two views of one mixture agree: per-source selected tokens from
    // temperatureMix land within one document of tokenBudget's allocation
    val sel = Sampling.temperatureMix(df, "src", "doc_id", tokens, 0.5, 1100)
      .groupBy("src").agg(sum("n_tokens").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(sel("big") - out("big")._3) <= 11L)
    assert(math.abs(sel("small") - out("small")._3) <= 11L)
    assertThrows[IllegalArgumentException](
      Sampling.tokenBudget(df, "src", tokens, alpha = 0.0, totalBudget = 1100))
  }

  test("annIvf: persisted index is data-fingerprinted, rebuilt on regeneration, " +
      "and equals the self-contained build") {
    import java.nio.file.Files
    val tmp = Files.createTempDirectory("graft-ivf").toString
    embs.write.parquet(s"$tmp/embeddings.parquet")
    def ivfTables: Set[String] = spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("graft_ivf_cells_")).toSet

    val before = ivfTables
    val viaCache = graft.queries.Pipeline.annIvf(spark, tmp).collect()
    val fresh = Ann.ivfTopK(embs.where(col("vec_id") < 20),
        embs.where(col("vec_id") >= 20), k = 5)
      .withColumnRenamed("rank", "rnk").collect()
    assert(viaCache.nonEmpty)
    assert(viaCache.toSeq === fresh.toSeq,
      "cached-index probe must equal the self-contained build (same data, same seed)")
    val after1 = ivfTables
    assert((after1 -- before).size === 1, "first run persists one cells table")

    // a SECOND run on unchanged data reuses the index: no new tables
    graft.queries.Pipeline.annIvf(spark, tmp).collect()
    assert(ivfTables === after1, "unchanged data must reuse the persisted index")

    // regenerate the dataset under the SAME path (new layout/mtimes):
    // the data fingerprint changes, so a FRESH index is built — the
    // dir.hashCode scheme this replaces would silently serve the stale one
    embs.repartition(3).write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    graft.queries.Pipeline.annIvf(spark, tmp).collect()
    assert((ivfTables -- after1).size === 1,
      "regenerated data must trigger an index rebuild under a new fingerprint")
  }

  test("shard shuffle: exact partition into shards, dense positions, layout- and salt-stable") {
    import graft.ops.sample.Sampling
    val got = Sampling.shardShuffle(docs, "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every document exactly once, all shards in range and populated
    assert(got.map(_._1).toSet.size === got.length)
    assert(got.length === docs.count())
    val byShard = got.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 8).toSet) && byShard.size === 8)
    // positions are 1..n_shard dense within each shard
    byShard.foreach { case (s, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq, s"shard $s")
    }
    // identical assignment under a different input partitioning
    val again = Sampling.shardShuffle(docs.repartition(7), "doc_id", nShards = 8)
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
    // a salted epoch is a different order of the same corpus
    val salted = Sampling.shardShuffle(docs, "doc_id", nShards = 8, salt = "epoch2")
      .select("doc_id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(salted.map(_._1).toSet === got.map(_._1).toSet)
    assert(salted.sortBy(_._1).toSeq !== got.sortBy(_._1).toSeq)
  }

  test("shard manifest: consistent with the shard assignment, layout-stable, one flipped byte flips the fp") {
    import spark.implicits._
    import graft.ops.sample.Sampling
    val corpus = Seq((1L, Some("alpha")), (2L, Some("beta")), (3L, Some("gamma")),
      (4L, None: Option[String]), (5L, Some("delta")))
      .toDF("doc_id", "text")
    val poisoned = corpus.union(
      Seq((Option.empty[java.lang.Long], Some("orphan")))
        .toDF("doc_id", "text").select(col("doc_id").cast("long"), col("text")))
    val m = Sampling.shardManifest(poisoned, "doc_id", "text", nShards = 4).collect()
    // totals: the NULL-id row dropped, NULL text counted as 0 bytes
    assert(m.map(_.getAs[Long]("n_docs")).sum === 5L)
    assert(m.map(_.getAs[Long]("n_bytes")).sum === "alphabetagammadelta".length.toLong)
    // shards agree with shardShuffle's assignment (same md5, same salt)
    val assign = Sampling.shardShuffle(corpus, "doc_id", nShards = 4)
      .select("shard").distinct().collect().map(_.getInt(0)).toSet
    assert(m.map(_.getAs[Int]("shard")).toSet === assign)
    // layout-stable: identical manifest from a different partitioning
    val again = Sampling.shardManifest(poisoned.repartition(3), "doc_id", "text", 4).collect()
    assert(again.map(_.toSeq).toSeq === m.map(_.toSeq).toSeq)
    // one changed byte in one document flips exactly that shard's fp
    val mutated = poisoned.withColumn("text",
      when(col("doc_id") === 2L, lit("betA")).otherwise(col("text")))
    val m2 = Sampling.shardManifest(mutated, "doc_id", "text", 4).collect()
    val changed = m.map(_.toSeq).toSet diff m2.map(_.toSeq).toSet
    assert(changed.size === 1, s"expected exactly one shard row to change: $changed")
  }

  test("novelty: first occurrence wins, later copies score their unseen fraction only") {
    import spark.implicits._
    import graft.ops.text.TextOps
    val corpus = Seq(
      (1L, "a b c"),   // "a b", "b c" — both first here
      (2L, "a b x"),   // "a b" seen, "b x" novel
      (3L, "a b"),     // nothing new
      (4L, "z")        // too short for a bigram
    ).toDF("doc_id", "text")
    val got = TextOps.novelty(corpus).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq === Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 1L, 0.5), (3L, 1L, 0L, 0.0), (4L, 0L, 0L, 0.0)))
    // attribution is by min doc_id, not arrival order: invariant under layout
    val again = TextOps.novelty(corpus.repartition(5)).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(again.toSeq === got.toSeq)
  }

  test("semantic dedup: families form within a cluster only; LSH route agrees with exact") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat, 0.1f)
    val rows = Seq(
      (1L, 0, v(1.0, 0.0)), (2L, 0, v(1.0, 0.001)),   // label-0 near-dup pair
      (3L, 0, v(0.0, 1.0)),                           // label 0, unrelated
      (4L, 1, v(1.0, 0.0)),                           // IDENTICAL direction, other label
      (5L, 1, v(0.0, -1.0)))
      .toDF("vec_id", "label", "embedding")
    val got = Ann.semanticDedup(rows, minCosine = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // 1 and 2 form a family surviving at min id 1; 4 matches them in
    // DIRECTION but sits in another cluster — the restriction that makes
    // this op different from corpus-wide dedup_embedding
    assert(got.toSeq === Seq((1L, 1L, true), (2L, 1L, false)))
    // the grouped-LSH scale route returns the same families (identical-
    // direction dups: per-pair LSH miss probability ~0 at cosine ≈ 1)
    val viaLsh = Ann.semanticDedup(rows, minCosine = 0.95, maxExactRows = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(viaLsh.toSeq === got.toSeq)
  }

  test("snapshot diff reports exactly the delta, never unchanged rows") {
    import spark.implicits._
    val old = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("doc_id", "text")
    val neu = Seq((2L, "two"), (3L, "three CHANGED"), (4L, "four")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(old, neu).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === Set((1L, "removed"), (3L, "changed"), (4L, "added")))
    // identical snapshots produce an empty delta
    assert(Dedup.snapshotDiff(old, old).count() === 0)
  }

  test("events anomaly: z only over full-enough trailing windows, flags require |z| > 2") {
    val got = graft.queries.Relational.eventsAnomaly(spark, dir).collect()
    assert(got.nonEmpty)
    val zIdx = 3; val flagIdx = 4
    got.foreach { r =>
      if (r.isNullAt(zIdx)) assert(!r.getBoolean(flagIdx), "null z must not flag")
      else assert(r.getBoolean(flagIdx) === (math.abs(r.getDouble(zIdx)) > 2))
    }
    // one row per (hour bucket, type): same cardinality as the window agg
    assert(got.length === graft.queries.Relational.eventsWindow(spark, dir).count())
  }

  test("winnowing: deque selection equals the per-window definition, incl. rightmost ties") {
    import graft.ops.text.TextOps
    import spark.implicits._
    val k = 5; val w = 4
    // repeated text forces equal-hash windows, exercising the tie-break
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "abcabcabcabcabcabc"), // period-3 grams: every window full of ties
      (3L, "short"), // len < k+w-1: must emit nothing
      (4L, "xyzxyzxy")) // exactly k+w-1: exactly one window
    val got = TextOps.winnow(texts.toDF("doc_id", "text"), k, w).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // naive reference: per window, min hash with RIGHTMOST occurrence
    def h(g: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(g.getBytes("UTF-8"))
      ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    }
    val expected = texts.flatMap { case (id, t) =>
      if (t.length < k + w - 1) Seq.empty
      else {
        val hs = (0 to t.length - k).map(i => h(t.substring(i, i + k)))
        (0 to hs.length - w).map { s =>
          val win = (s until s + w).map(i => (hs(i), i))
          val best = win.minBy { case (hh, i) => (hh, -i) } // min hash, rightmost
          (id, best._2 + 1L, best._1)
        }.distinct
      }
    }.toSet
    assert(got === expected)
    assert(!got.exists(_._1 == 3L) && got.count(_._1 == 4L) === 1)
  }

  test("winnowing guarantee: a shared substring >= k+w-1 chars fingerprints identically at any offset") {
    import graft.ops.text.TextOps
    import spark.implicits._
    val shared = "identical passage text here"
    val docs = Seq(
      (1L, s"AAAA $shared BBBB"),
      (2L, s"completely different prefix material $shared and a different suffix"),
      (3L, "nothing in common with the others at all")).toDF("doc_id", "text")
    val fps = TextOps.winnow(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(fps(1L).intersect(fps(2L)).nonEmpty, "shared passage produced no common fingerprint")
    assert(fps(1L).intersect(fps(3L)).isEmpty && fps(2L).intersect(fps(3L)).isEmpty)
    // density: winnowing keeps ~2/(w+1) of grams, never more than the window count
    val doc2 = docs.where(col("doc_id") === 2L).head().getString(1)
    assert(fps(2L).size <= doc2.length - 5 + 1 - 3)
  }

  test("winnowing preserves the caller's id type (string ids fingerprint like long ids)") {
    import graft.ops.text.TextOps
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again"
    val asLong = TextOps.winnow(Seq((7L, text)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val strDf = TextOps.winnow(Seq(("doc-seven", text)).toDF("doc_id", "text"))
    // id column keeps its string type end-to-end — no silent cast-to-long
    assert(strDf.schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)
    val asStr = strDf.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(asStr.forall(_._1 == "doc-seven"))
    assert(asStr.map(t => (t._2, t._3)).toSet === asLong)
  }

  test("adaptive cosine pairs with allowApproximate=false refuse the silent LSH downgrade") {
    val e = intercept[IllegalArgumentException] {
      Ann.cosinePairsAdaptive(embs, 0.45, maxExactRows = 10,
        allowApproximate = false).collect()
    }
    assert(e.getMessage.contains("maxExactRows"))
    // below the cutoff the flag is inert: the exact route runs either way
    val small = embs.where(col("vec_id") < 8)
    val exact = Ann.cosinePairs(small, 0.45).collect().map(_.toSeq).toSet
    val flagged = Ann.cosinePairsAdaptive(small, 0.45,
      allowApproximate = false).collect().map(_.toSeq).toSet
    assert(flagged === exact)
  }

  test("PQ remainder dims: the last sub-space absorbs dim % m instead of dropping it") {
    import spark.implicits._
    // 5-dim vectors, m=2 → blocks are dims 1-2 and 3-5. The pair below is
    // identical except in dim 5; with the old floor(dim/m) slices both
    // blocks ignored dim 5 entirely, making the two vectors
    // PQ-indistinguishable (identical codes AND fits).
    val vecs = Seq(
      (0L, Array(0f, 1f, 0f, 0f, 1f)),
      (1L, Array(0f, 1f, 0f, 0f, -1f)),
      (2L, Array(1f, 0f, 1f, 0f, 0f)),
      (3L, Array(0f, 1f, 1f, 1f, 0f))).toDF("vec_id", "embedding")
    val got = Ann.pqAssign(vecs, m = 2, nCells = 2, iters = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    // block 0 (dims 1-2) identical → identical code_0/fit_0...
    assert(got(0L)._1 === got(1L)._1 && got(0L)._2 === got(1L)._2)
    // ...but the remainder-bearing block 1 sees dim 5 and distinguishes
    assert(got(0L)._3 != got(1L)._3 || got(0L)._4 != got(1L)._4,
      "dim 5 is still invisible to PQ — remainder dropped")
  }

  test("IVFADC: full probing equals pqSearch exactly; pruning stays within probed cells") {
    val queries = embs.where(col("vec_id") < 5)
    // nProbe = nCells → the coarse level filters nothing: ADC results must
    // be EXACTLY pqSearch's (same deterministic codebooks, same scores)
    val full = Ann.ivfPqSearch(queries, embs, k = 8,
        nCells = 4, nProbe = 4, ivfIters = 1, m = 2, pqCells = 8, pqIters = 1)
      .collect().map(_.toSeq).toSeq
    val plain = Ann.pqSearch(queries, embs, k = 8,
        m = 2, nCells = 8, iters = 1)
      .collect().map(_.toSeq).toSeq
    assert(full === plain)
    // nProbe = 1: every candidate must come from its query's single best
    // coarse cell — the pruning is real, not cosmetic
    val (coarse, cents) = Ann.ivfBuild(embs, nCells = 4, iters = 1)
    val cellOf = coarse.select("cid", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pruned = Ann.ivfPqSearch(queries, embs, k = 8,
      nCells = 4, nProbe = 1, ivfIters = 1, m = 2, pqCells = 8, pqIters = 1)
    val rows = pruned.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.nonEmpty)
    val probedCell = rows.groupBy(_._1).view.mapValues(_.map(p => cellOf(p._2)).toSet)
    // all candidates of one query share one cell (the probed one)
    probedCell.foreach { case (q, cs) =>
      assert(cs.size === 1, s"query $q drew candidates from cells $cs under nProbe=1")
    }
    // and fewer candidates are reachable than the full scan ranks
    assert(rows.length <= full.length)
    intercept[IllegalArgumentException] {
      Ann.ivfPqSearch(queries, embs, k = 1, nCells = 4, nProbe = 9)
    }
  }

  test("ADC/PQ search: a corpus member queried against the corpus scores itself maximal") {
    val n = embs.count().toInt
    val got = Ann.pqSearch(embs.where(col("vec_id") < 5), embs, k = n,
      m = 2, nCells = 8, iters = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val byQ = got.groupBy(_._1)
    assert(byQ.keySet === Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._4)
      // ranks contiguous, scores non-increasing, every corpus vector scored
      assert(sorted.map(_._4).toSeq === (1 to n))
      assert(sorted.sliding(2).forall(p => p.head._3 >= p.last._3))
      // the query's own code maximises every per-block LUT entry (the
      // quantizer argmaxes the same rounded cosine the LUT stores), so the
      // self row's ADC equals the global maximum
      val self = sorted.find(_._2 == q).get
      assert(self._3 === sorted.head._3, s"query $q: self adc ${self._3} < top ${sorted.head._3}")
    }
  }

  test("bitvecPairs: sign codes, first-shared-band single claim, lossless band tiers") {
    import spark.implicits._
    def vec(signs: Int => Float): Array[Float] = Array.tabulate(64)(signs)
    val fixture = Seq(
      (1L, vec(_ => 1.0f)),                                  // all-positive
      (2L, vec(i => if (i == 5 || i == 40) -1.0f else 1.0f)), // hamming 2 from v1
      (3L, vec(i => if (i % 2 == 0) 1.0f else -1.0f)),        // hamming 32 from v1
      (4L, vec(_ => 0.0f)),                                   // zero vector -> code 0
      (5L, vec(_ => -0.0f)),                                  // negative zero == zero
      (6L, null.asInstanceOf[Array[Float]])                   // dropped at the door
    ).toDF("vec_id", "embedding")
    val out = Dedup.bitvecPairs(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // exactly one row per qualifying pair even though (4,5) share ALL bands
    // (the first-shared-band filter replaces a distinct)
    assert(out.toSeq === Seq((1L, 2L, 2L, 60.0 / 64.0), (4L, 5L, 0L, 1.0)))
    // the 4-bit high-recall tier is a superset whose h<=3 slice is identical
    val wide = Dedup.bitvecPairs(fixture, maxHamming = 15, bandBits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(wide.filter(_._3 <= 3).toSeq === out.map(t => (t._1, t._2, t._3)).toSeq)
    assert(wide.map(t => (t._1, t._2)).toSet ===
      Set((1L, 2L), (4L, 5L))) // v3 is 32 away from everything sign-structured
    // lossless banding is enforced, not assumed
    intercept[IllegalArgumentException] {
      Dedup.bitvecPairs(fixture, maxHamming = 4, bandBits = 16) }
    intercept[IllegalArgumentException] {
      Dedup.bitvecPairs(fixture, maxHamming = 3, bandBits = 7) }
    // the candidate-volume guard refuses a priced-out audit tier loudly
    // (count-free via knownCount), and maxCandidates = 0 opts out
    intercept[IllegalArgumentException] {
      Dedup.bitvecPairs(fixture, maxHamming = 15, bandBits = 4,
        knownCount = 1000000L) }
    assert(Dedup.bitvecPairs(fixture, maxHamming = 15, bandBits = 4,
      maxCandidates = 0L).collect().nonEmpty)
  }

  test("pack_efficiency: grid packs from one count pass, overfull docs flagged, exact fill") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-packeff").toString
    def words(n: Int) = Seq.fill(n)("w").mkString(" ")
    // ids congruent mod 8 -> one part, packed in id order: 100,100,100,200
    Seq((0L, words(100)), (8L, words(100)), (16L, words(100)), (24L, words(200)))
      .toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Pipeline.packEfficiency(spark, tmp).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    // m=128: three singleton bins + the 200-doc alone and OVERFULL
    // m=256: next-fit gives [100+100], [100], [200]
    // m=512: everything in one bin
    assert(out.toSeq === Seq(
      (128, 4L, 500L, math.floor(500.0 / 512 * 1e6 + 0.5) / 1e6, 1L),
      (256, 3L, 500L, math.floor(500.0 / 768 * 1e6 + 0.5) / 1e6, 0L),
      (512, 1L, 500L, math.floor(500.0 / 512 * 1e6 + 0.5) / 1e6, 0L)))
  }

  test("hardNegatives: same-label neighbors never rank, nearest cross-label pairs do, NULL labels drop") {
    import spark.implicits._
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val fixture = Seq[(Long, Array[Float], Integer)](
      (1L, v(1, 0), 0),                    // the query (audit) vector, label 0
      (2L, v(1, 0.01), 0),                 // nearest of all — but SAME label
      (3L, v(1, 0.1), 1),                  // nearest cross-label
      (4L, v(1, 0.5), 1),                  // second cross-label
      (5L, v(-1, 0), 1),                   // opposite direction, rank 3
      (6L, v(1, 0.05), null)               // unlabeled: can't serve
    ).toDF("vec_id", "embedding", "label")
    val out = Ann.hardNegatives(fixture.where(col("vec_id") === 1), fixture, k = 3)
      .collect().map(r => (r.getLong(2), r.getInt(5)))
    // ranks are exactly the cross-label vectors by cosine, nothing else
    assert(out.toSeq === Seq((3L, 1), (4L, 2), (5L, 3)))
  }

  test("doc_langmix: chunk-level votes catch the code-switched doc the whole-doc argmax misses") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-langmix").toString
    def block(word: String) = Seq.fill(32)(word).mkString(" ")
    Seq(
      // doc 1: 32 English tokens then 32 German — HALF mixed (votes 1/1,
      // majority tie broken to the lexicographically smaller language)
      (1L, block("the") + " " + block("und")),
      // doc 2: pure English across 3 chunks
      (2L, block("the") + " " + block("of") + " " + block("is")),
      // doc 3: 3 English chunks, 1 German — 75% share sits exactly ON the
      // boundary and is NOT mixed (share < 0.75 strict)
      (3L, block("the") + " " + block("of") + " " + block("is") + " " + block("der")),
      (4L, null.asInstanceOf[String]) // NULL text: no chunks, no row
    ).toDF("doc_id", "text").write.parquet(s"$tmp/documents.parquet")
    val out = graft.queries.Pipeline.docLangmix(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getDouble(3), r.getBoolean(4)))
    assert(out.toSeq === Seq(
      (1L, 2L, "de", 0.5, true),
      (2L, 3L, "en", 1.0, false),
      (3L, 4L, "en", 0.75, false)))
  }
}
