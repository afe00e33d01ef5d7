package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.dedup.Dedup

/** Guard ordering and edge-case semantics for the dedup operators. */
class GuardSpec extends SparkSpec {

  import spark.implicits._

  test("ngramJaccardBitmap rejects a huge vocabulary BEFORE building the index") {
    // ~3 unique bigrams per doc x 300 docs = ~900-bigram vocabulary,
    // far above 2 x maxBits=32 — must be rejected by the HLL pre-check
    // (message carries the '~' estimate marker), whose control flow runs
    // before vocabIndex's single-task sort can start
    val docs = (1 to 300)
      .map(i => (i.toLong, s"w${i}a w${i}b w${i}c w${i}d"))
      .toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.ngramJaccardBitmap(docs, 0.5, maxBits = 32)
    }
    assert(e.getMessage.contains("vocabulary ~"),
      s"the HLL pre-check, not the post-index exact count, must fire: ${e.getMessage}")
  }

  test("ngramJaccardBitmap still accepts a genuinely dense corpus") {
    // 2 near-identical docs over a tiny vocabulary pass both guards
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "a b c d e g"), (3L, "x y z x y z"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardBitmap(docs, 0.5, maxBits = 64)
      .select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("salted zipfian corpus takes the adaptive router's PREFIX branch and stays exact") {
    val salted = graft.queries.Pipeline.saltedDocs(spark, "/root/testdata/sf0.001")
    // the router's own predicate over the full corpus: avg document
    // frequency below the dense threshold -> ngramJaccardPrefix branch
    val stats = salted
      .select(explode(transform(graft.ops.text.TextOps.bigrams(col("text")),
        sh => xxhash64(sh))).as("h"))
      .agg(count(lit(1)).cast("double").as("postings"),
        approx_count_distinct("h").as("vocab"))
      .head()
    val avgDf = stats.getDouble(0) / stats.getLong(1)
    assert(avgDf < 16.0,
      s"salting must make the corpus sparse (avg df $avgDf) so the router picks prefix")

    // the prefix join on it equals the exact broadcast join — and the
    // adaptive entry (which routes by exactly the predicate above) agrees
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.ngramJaccard(salted, 0.5))
    assert(exact.nonEmpty)
    assert(pairs(Dedup.ngramJaccardPrefix(salted, 0.5)) === exact)
    assert(pairs(Dedup.ngramJaccardAdaptive(salted, 0.5, allowApproximate = false)) === exact)
  }

  test("segment-replicated dense corpus routes past the bitmap branch (relative-density guard) and stays exact") {
    // 55 vocabulary-disjoint segments of 20 near-identical docs: absolute
    // avg df stays ~18 (the pre-r10 guard alone would route BITMAP and pay
    // n²·vocab/64 across segments) while relative density 18/1100 < 0.02
    // sends it to the posting-list route, whose work is linear in segments
    val docs = (for { k <- 1 to 55; i <- 1 to 20 } yield {
      val base = ('a' to 'k').map(c => s"g$k$c").mkString(" ")
      (k * 100L + i, if (i == 1) s"$base z$k" else base)
    }).toDF("doc_id", "text")
    val stats = docs
      .select(explode(transform(graft.ops.text.TextOps.bigrams(col("text")),
        sh => xxhash64(sh))).as("h"))
      .agg(count(lit(1)).cast("double").as("postings"),
        approx_count_distinct("h").as("vocab"))
      .head()
    val avgDf = stats.getDouble(0) / stats.getLong(1)
    assert(avgDf >= 16.0, s"fixture must look dense in ABSOLUTE df (got $avgDf)")
    assert(avgDf < 0.02 * 1100, "…but sparse RELATIVE to the corpus")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    val exact = pairs(Dedup.ngramJaccard(docs, 0.5))
    assert(exact.size >= 55 * 190 / 2)
    assert(pairs(Dedup.ngramJaccardAdaptive(docs, 0.5, allowApproximate = false)) === exact)
  }

  test("one-token docs never pair: jaccard, minhash, and incremental agree with " +
      "the len(sh)>0-filtered oracles") {
    // the degenerate fixture the oracle NaN fix targets: one-token docs on
    // both sides plus one genuine near-dup pair — every route must emit
    // exactly that pair (the unfixed oracle emitted NaN rows for the
    // empty-shingle pairs; the engine must emit none)
    val docs = Seq(
      (1L, "src0", "solo"), (2L, "src0", "a b c d e f"),
      (3L, "src1", "a b c d e g"), (4L, "src1", "lonely"), (5L, "src1", "x"))
      .toDF("doc_id", "source", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a", "b").as[(Long, Long)].collect().toSet
    assert(pairs(Dedup.ngramJaccard(docs, 0.5)) === Set((2L, 3L)))
    assert(pairs(Dedup.minhashLsh(docs, 0.5)) === Set((2L, 3L)))
    assert(pairs(Dedup.minhashLshIncrement(
      docs.where(col("source") === "src0"),
      Dedup.minhashIndex(docs.where(col("source") =!= "src0")), 0.5)) === Set((2L, 3L)))
  }

  test("cosine LSH candidate budget: over-budget multi-probe degrades to EXACTLY the single-probe output") {
    // 200 vectors, auto planes p=4 (200/32 -> clamp 4): priced volumes are
    // single 200*12.5*16 = 40k, multi 40k*5 = 200k. A budget between the
    // two must degrade multi-probe to single-probe — and the degraded
    // result must BE the single-probe result, not some third behavior.
    val emb = (0 until 200).map { i =>
      val s = if (i >= 100) i - 100 else i // planted dups: i ~ i+100
      (i.toLong, Array.tabulate(8)(j => math.sin(s * 8 + j + 1).toFloat))
    }.toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = rows(graft.ops.ann.Ann.cosinePairsLsh(emb, 0.9,
      multiProbe = false, maxCandidates = 0L))
    assert(single.nonEmpty, "planted duplicates must pair")
    val degraded = rows(graft.ops.ann.Ann.cosinePairsLsh(emb, 0.9,
      multiProbe = true, maxCandidates = 100000L))
    assert(degraded === single)
    // under budget the guard is silent: multi-probe output identical to
    // the unpriced (maxCandidates=0) multi-probe run
    assert(rows(graft.ops.ann.Ann.cosinePairsLsh(emb, 0.9,
      multiProbe = true, maxCandidates = 200000000L)) ===
      rows(graft.ops.ann.Ann.cosinePairsLsh(emb, 0.9,
        multiProbe = true, maxCandidates = 0L)))
  }

  test("cosine LSH candidate budget: refuses when even single-probe volume exceeds it") {
    val emb = (0 until 200).map(i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      graft.ops.ann.Ann.cosinePairsLsh(emb, 0.9,
        multiProbe = true, maxCandidates = 10000L)
    }
    assert(e.getMessage.contains("even single-probe"),
      s"the refusal must name the single-probe floor: ${e.getMessage}")
    // and the adaptive entry threads the budget through its LSH route
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.ann.Ann.cosinePairsAdaptive(emb, 0.9, maxExactRows = 10,
        maxCandidates = 10000L)
    }
    assert(e2.getMessage.contains("even single-probe"))
  }

  test("cosine increment candidate budget: over-budget multi-probe degrades to the single-probe output") {
    // 60-vector index + 40-vector batch, planes pinned at 4: priced
    // volumes are single 40*6.25*16 = 4000, multi 4000*5 = 20000. A budget
    // between the two must degrade the increment to single-probe exactly.
    def vecs(ids: Range, dup: Boolean) = ids.map { i =>
      val s = if (dup && i % 2 == 0) i / 2 else i + 1000
      (i.toLong, Array.tabulate(8)(j => math.sin(s * 8 + j + 1).toFloat))
    }
    val index = graft.ops.ann.Ann.srpIndex(
      vecs(0 until 60, dup = true).toDF("vec_id", "embedding"), planes = 4)
      .localCheckpoint()
    val batch = vecs(100 until 140, dup = true).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val single = rows(graft.ops.ann.Ann.cosineIncrement(batch, index, 0.9,
      multiProbe = false, maxCandidates = 0L))
    val degraded = rows(graft.ops.ann.Ann.cosineIncrement(batch, index, 0.9,
      multiProbe = true, maxCandidates = 10000L))
    assert(degraded === single)
    // and the refusal names the single-probe floor
    val e = intercept[IllegalArgumentException] {
      graft.ops.ann.Ann.cosineIncrement(batch, index, 0.9,
        multiProbe = true, maxCandidates = 1000L)
    }
    assert(e.getMessage.contains("even single-probe"), e.getMessage)

    // known-count pricing drives the SAME ladder count-free, and the 30M
    // DEFAULT budget routes on it (p is pinned at 4, bands 16, so volumes
    // are exact arithmetic on the fake counts):
    // (a) degrade window — knownBatch=1200, knownIndex=6000: bucket =
    //     7200/16 = 450, volume(1) = 1200·450·16 = 8.64M ≤ 30M <
    //     volume(5) = 43.2M → multi-probe degrades to EXACTLY single
    val degradedKnown = rows(graft.ops.ann.Ann.cosineIncrement(batch, index, 0.9,
      multiProbe = true,
      knownBatchCount = 1200L, knownIndexCount = 6000L))
    assert(degradedKnown === single,
      "fake known counts inside the degrade window must yield the single-probe output")
    // (b) past the single-probe floor — knownBatch=4000, knownIndex=6000:
    //     volume(1) = 4000·625·16 = 40M > 30M → refuse, without ever
    //     counting the real (tiny) inputs
    val e2 = intercept[IllegalArgumentException] {
      graft.ops.ann.Ann.cosineIncrement(batch, index, 0.9,
        multiProbe = true,
        knownBatchCount = 4000L, knownIndexCount = 6000L)
    }
    assert(e2.getMessage.contains("even single-probe"), e2.getMessage)
  }

  test("containment: shingle-less (one-token) docs are excluded on BOTH sides") {
    // doc 1 (ref) and doc 4 (corpus) have a single token -> zero bigrams.
    // Neither may appear in the output (0/0 must not become NaN >= t, the
    // divergence the DuckDB oracle had before its len(sh) > 0 filters).
    val docs = Seq(
      (1L, "ref", "solo"),
      (2L, "ref", "a b c d"),
      (3L, "other", "a b c z"),
      (4L, "other", "lonely"))
      .toDF("doc_id", "source", "text")
    val out = Dedup.containmentRef(docs, isRef = col("source") === "ref",
      minContainment = 0.5).collect()
    assert(out.forall(r => !r.getDouble(2).isNaN))
    assert(!out.exists(r => r.getLong(0) == 1L || r.getLong(1) == 4L))
    // the real pair is still found: doc 3 contains 2 of ref doc 2's 3 bigrams
    assert(out.exists(r => r.getLong(0) == 2L && r.getLong(1) == 3L))
  }
}
