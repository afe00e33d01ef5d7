package graft.ops

import graft.SparkSpec
import graft.ops.dedup.Dedup
import org.apache.spark.sql.functions._

/** Passage REMOVAL invariants ([[Dedup.scrubPassages]]): the scrubbed
  * corpus must carry each shared passage exactly once (globally-first
  * occurrence), untouched documents must round-trip byte-identical, and a
  * re-run of the DETECTOR over the scrubbed output must find nothing —
  * the idempotence that makes the op safe to run unconditionally in a
  * curation pipeline.
  */
class ScrubSpec extends SparkSpec {

  import spark.implicits._

  // 'aaaa' is a CDC boundary under divisor 7: (97*256 + 4) % 7 == 0 —
  // placing it before and at the end of the passage pins the passage to
  // its own chunk at ANY embedding offset
  private val passage = "s1x s2x s3x s4x s5x s6x s7x aaaa"
  private val other = "p1y p2y p3y p4y p5y aaaa"

  private def corpus = Seq(
    1L -> s"f1 f2 aaaa $passage tail1 tail2 tail3 tail4 tail5",
    2L -> s"g1 g2 g3 g4 g5 g6 aaaa $passage end1 end2 end3 end4 end5",
    3L -> s"h1 h2 h3 aaaa $passage aaaa $other trail1 trail2 trail3 trail4",
    4L -> s"k1 k2 k3 aaaa $other coda1 coda2 coda3 coda4 coda5",
    5L -> "plain words nothing shared here at all six seven eight nine",
    6L -> passage // whole doc IS the shared passage
  ).toDF("doc_id", "text")

  test("keeps the globally-first occurrence, scrubs every other copy") {
    val out = Dedup.scrubPassages(corpus).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 is the keeper of `passage` (lowest doc_id) — passage survives
    assert(out(1L)._1.contains("s1x s2x s3x"))
    assert(out(1L)._2 === 0L)
    // docs 2, 3, 6 lose it
    assert(!out(2L)._1.contains("s1x"))
    assert(!out(3L)._1.contains("s1x"))
    // doc 3 is the keeper of `other`; doc 4 loses it
    assert(out(3L)._1.contains("p1y p2y"))
    assert(!out(4L)._1.contains("p1y"))
    // non-shared content survives verbatim around the scrubbed spans
    assert(out(2L)._1.startsWith("g1 g2 g3 g4 g5 g6 aaaa"))
    assert(out(2L)._1.endsWith("end1 end2 end3 end4 end5"))
    // untouched doc round-trips byte-identical
    assert(out(5L)._1 === "plain words nothing shared here at all six seven eight nine")
    assert(out(5L)._2 === 0L)
  }

  test("a fully-shared document keeps its row, scrubbed to empty") {
    val out = Dedup.scrubPassages(corpus).where(col("doc_id") === 6L).collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "")
    assert(out(0).getLong(2) === 1L)
  }

  test("scrubbing is idempotent: the detector finds nothing afterwards") {
    val scrubbed = Dedup.scrubPassages(corpus)
      .select(col("doc_id"), col("text_scrubbed").as("text"))
    assert(Dedup.sharedPassages(scrubbed).count() === 0L)
    // and a second scrub changes nothing
    val twice = Dedup.scrubPassages(scrubbed)
    assert(twice.agg(sum("n_dropped")).head.getLong(0) === 0L)
  }

  test("drop accounting: Σ n_dropped == Σ (n_occ − 1) over shared fingerprints") {
    val expected = Dedup.sharedPassages(corpus)
      .agg(sum(col("n_occ") - 1)).head.getLong(0)
    val got = Dedup.scrubPassages(corpus)
      .agg(sum("n_dropped")).head.getLong(0)
    assert(got === expected)
  }

  test("every input document emits exactly one output row") {
    val out = Dedup.scrubPassages(corpus)
    assert(out.count() === 6L)
    assert(out.select("doc_id").distinct().count() === 6L)
  }

  // ---- scrubWinnow: substring-granularity removal -------------------------

  // a long verbatim run planted at DIFFERENT offsets, deliberately NOT
  // aligned to any CDC boundary — the case scrubPassages cannot act on
  private val run = "zq0 zq1 zq2 zq3 zq4 zq5 zq6 zq7 zq8 zq9"

  private def winnowCorpus = Seq(
    10L -> s"alpha beta $run gamma delta epsilon",
    11L -> s"completely different leading material then $run and more",
    12L -> s"third copy starts now $run trailing words here",
    13L -> "untouched document with no shared substrings at all whatsoever"
  ).toDF("doc_id", "text")

  test("scrubWinnow removes the interior of an unaligned duplicated run, keeps the first copy") {
    val out = Dedup.scrubWinnow(winnowCorpus).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 10 (lowest id) keeps the run verbatim
    assert(out(10L)._1.contains(run))
    assert(out(10L)._2 === 0L)
    // docs 11 and 12 lose its interior — only the outermost ≤ k+w−2 = 7
    // chars of each end can survive (boundary-window slack), so no
    // certifiable (≥ 8 char) fragment of the run remains
    for (id <- Seq(11L, 12L)) {
      val (txt, masked) = out(id)
      assert(masked > (run.length - 2 * 7).toLong, s"doc $id masked only $masked chars")
      assert(!txt.contains(run.substring(4, run.length - 4)), s"doc $id kept the run interior: $txt")
      // non-duplicated surroundings survive
      assert(txt.contains(if (id == 11L) "completely different" else "third copy starts"))
    }
    // untouched doc round-trips byte-identical
    assert(out(13L)._1 === "untouched document with no shared substrings at all whatsoever")
    assert(out(13L)._2 === 0L)
  }

  test("scrubWinnow is idempotent: a second pass masks nothing") {
    val once = Dedup.scrubWinnow(winnowCorpus)
      .select(col("doc_id"), col("text_scrubbed").as("text"))
    val twice = Dedup.scrubWinnow(once)
    assert(twice.agg(sum("n_masked")).head.getLong(0) === 0L)
    // and the texts are unchanged by the second pass
    val a = once.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    val b = twice.orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(a === b)
  }

  test("scrubWinnow emits one row per input doc; n_masked is the exact char count removed") {
    val out = Dedup.scrubWinnow(winnowCorpus).collect()
    assert(out.length === 4)
    out.foreach { r =>
      val orig = winnowCorpus.where(col("doc_id") === r.getLong(0))
        .head().getString(1)
      assert(orig.length - r.getString(1).length === r.getLong(2),
        s"doc ${r.getLong(0)}: length delta != n_masked")
    }
  }

  test("scrubWinnow rejects k <= w (span chaining precondition)") {
    intercept[IllegalArgumentException] {
      Dedup.scrubWinnow(winnowCorpus, k = 4, w = 4)
    }
  }
}
