package graft.ops

import graft.SparkSpec
import graft.ops.events.Events

/** Parameterized CEP ([[Events.matchPattern]]): regex shapes beyond the
  * oracle-checked `vc*p` / `vc+[^P]*$` motifs — alternation, bounded
  * repeats, `+`, anchors — plus the charMap / keepZero / tie-break
  * plumbing, on hand-built sequences with known match counts.
  */
class EventsSpec extends SparkSpec {

  import org.apache.spark.sql.functions._

  /** (user, seq-of-type-names) → events rows with ts = position. */
  private def ev(rows: (Long, Seq[String])*) = {
    import spark.implicits._
    rows.flatMap { case (u, types) =>
      types.zipWithIndex.map { case (t, i) => (u, i.toLong, i.toLong, t) }
    }.toDF("user_id", "ts", "event_id", "event_type")
  }

  private def counts(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap

  private val V = "view"; private val C = "click"
  private val P = "purchase"; private val E = "error"

  test("vc*p counts non-overlapping motif firings, not just presence") {
    // u1: vcp vp → 2; u2: vccc (no p) → 0 (dropped); u3: p v c p → 1
    val df = Events.matchPattern(
      ev(1L -> Seq(V, C, P, V, P), 2L -> Seq(V, C, C, C),
         3L -> Seq(P, V, C, P)), "vc*p")
    assert(counts(df) === Map(1L -> 2L, 3L -> 1L))
  }

  test("alternation (vp|vc) takes the leftmost non-overlapping reading") {
    // u1: v p v c v → matches at 0 (vp) and 2 (vc) = 2
    val df = Events.matchPattern(ev(1L -> Seq(V, P, V, C, V)), "(vp|vc)")
    assert(counts(df) === Map(1L -> 2L))
  }

  test("bounded repeat c{2,3} counts greedy non-overlapping runs") {
    // u1: cccc c → greedy: ccc + (cc impossible from 1 left?) cccc|c:
    // "ccccc" → match ccc at 0, then cc at 3 = 2 matches
    val df = Events.matchPattern(ev(1L -> Seq(C, C, C, C, C)), "c{2,3}")
    assert(counts(df) === Map(1L -> 2L))
  }

  test("+ and end-anchor: abandoned-cart fires at most once per user") {
    // u1: v c c e (clicks, never purchased) → 1
    // u2: v c p (purchased) → 0; u3: v c p v c → abandoned AFTER a
    //   purchase: the default p-encoding still blocks [^p]* crossing it,
    //   but the match starting at the second v reaches $ → 1
    val df = Events.matchPattern(
      ev(1L -> Seq(V, C, C, E), 2L -> Seq(V, C, P), 3L -> Seq(V, C, P, V, C)),
      "vc+[^p]*$")
    assert(counts(df) === Map(1L -> 1L, 3L -> 1L))
  }

  test("charMap overrides the first-char default and keepZero keeps misses") {
    // map error → 'x'; pattern vx fires only if the mapping is honored
    // (default encoding would be 'e')
    val df = Events.matchPattern(ev(1L -> Seq(V, E), 2L -> Seq(V, C)),
      "vx", charMap = Map(E -> "x"), keepZero = true)
    assert(counts(df) === Map(1L -> 1L, 2L -> 0L))
  }

  test("timestamp ties break on the tie column deterministically") {
    import spark.implicits._
    // two events at ts=0: event_id order decides v-before-c vs c-before-v
    val df0 = Seq((1L, 0L, 0L, V), (1L, 0L, 1L, C), (1L, 1L, 2L, P))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(counts(Events.matchPattern(df0, "vcp")) === Map(1L -> 1L))
    val df1 = Seq((1L, 0L, 1L, V), (1L, 0L, 0L, C), (1L, 1L, 2L, P))
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(counts(Events.matchPattern(df1, "vcp", keepZero = true)) ===
      Map(1L -> 0L))
  }

  test("multi-char charMap values are rejected on both builders") {
    intercept[IllegalArgumentException] {
      Events.matchPattern(ev(1L -> Seq(V)), "v", charMap = Map(V -> "vv"))
    }
    intercept[IllegalArgumentException] {
      Events.matchPatternSql("v", charMap = Map(V -> "vv"))
    }
  }

  test("random histories with timestamp ties match a driver-side reference") {
    // cross-checks the DISTRIBUTED pieces (collect_list + struct array_sort
    // + field projection) against plain driver code on adversarial inputs:
    // duplicate timestamps, interleaved users, multiple motif firings
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val types = Vector("view", "click", "purchase", "error", "signup")
    for (pattern <- Seq("vc*p", "(vp|vc)", "c{2,3}", "vc+[^p]*$")) {
      val rows = (0 until 400).map { i =>
        // ts drawn from a SMALL range so ties are common
        (rnd.nextInt(8).toLong, rnd.nextInt(20).toLong, i.toLong,
          types(rnd.nextInt(types.size)))
      }
      val want = rows.groupBy(_._1).map { case (u, es) =>
        val seq = es.sortBy(e => (e._2, e._3)).map(_._4.head).mkString
        val m = java.util.regex.Pattern.compile(pattern).matcher(seq)
        var n = 0L; while (m.find()) n += 1
        (u, seq.length.toLong, n)
      }.filter(_._3 > 0).toSet
      val got = Events.matchPattern(
          rows.toDF("user_id", "ts", "event_id", "event_type"), pattern)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === want, s"pattern $pattern")
    }
  }

  test("motifWithin: strict contiguity, the time bound bites, overlap-in-time counts per start row") {
    import spark.implicits._
    // (user, second, type): u1 fires vcp twice — once inside 10 s, once
    // spanning 100 s (counted but NOT within); u2's v c p has an error
    // wedged in (strict contiguity: no motif); u3 never completes
    val rows = Seq(
      (1L, 0L, V), (1L, 2L, C), (1L, 5L, P),        // span 5 s: within
      (1L, 50L, V), (1L, 60L, C), (1L, 150L, P),    // span 100 s: not within
      (2L, 0L, V), (2L, 1L, C), (2L, 3L, E), (2L, 4L, P),
      (3L, 0L, V), (3L, 1L, C))
    val df = rows.zipWithIndex.map { case ((u, s, t), i) =>
      (u, s * 1000000L, i.toLong, t) }
      .toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val got = Events.motifWithin(df, "vcp", withinUs = 10000000L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(1L -> ((2L, 1L))))

    // overlapping starts each count: v v c p with bound wide open — the
    // first v's window is (v,v,c): no match; second v matches once
    val ov = Seq((9L, 0L, V), (9L, 1L, V), (9L, 2L, C), (9L, 3L, P))
    val ovDf = ov.zipWithIndex.map { case ((u, s, t), i) =>
      (u, s * 1000000L, i.toLong, t) }
      .toDF("user_id", "us", "event_id", "event_type")
      .select(col("user_id"), timestamp_micros(col("us")).as("ts"),
        col("event_id"), col("event_type"))
    val ovGot = Events.motifWithin(ovDf, "vcp", withinUs = 1000000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ovGot === Map(9L -> 1L))

    // the generated oracle embeds the same motif, bound and lead count
    val sql = Events.motifWithinSql("vcp", withinUs = 86400000000L)
    assert(sql.contains("span_us <= 86400000000"))
    assert(sql.contains("lead(ts, 2) OVER win"))
    assert(sql.contains("ch = 'v' AND c1 = 'c' AND c2 = 'p'"))
  }

  test("interval overlap join: bucketized == direct quadratic, boundary pairs counted once") {
    import spark.implicits._
    // crafted shapes: same-bucket overlap, overlap STRADDLING a bucket
    // boundary (the pair appears in 2 shared buckets — must count once),
    // touching endpoints (end exclusive: NOT an overlap), nested
    // intervals, different keys never pair, zero-length dropped
    val rows = Seq(
      ("k1", 1L, 0L, 50L), ("k1", 2L, 40L, 140L),    // overlap straddles bucket 0/1
      ("k1", 3L, 100L, 200L),                        // overlaps 2 (in bucket 1), not 1
      ("k1", 4L, 200L, 300L),                        // touches 3 at 200: NOT overlap
      ("k1", 5L, 210L, 220L),                        // nested inside 4
      ("k2", 6L, 0L, 1000L),                         // other key: alone
      ("k1", 7L, 400L, 400L))                        // zero-length: dropped
      .toDF("key", "id", "s", "e")
    val got = Events.intervalOverlapPairs(rows, "key", "id", "s", "e", bucketUs = 100L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set(("k1", 1L, 2L), ("k1", 2L, 3L), ("k1", 4L, 5L)))

    // property: against random interval sets, bucketized == the direct
    // quadratic reference, at a bucket width both shorter and longer
    // than the typical span
    val rnd = new scala.util.Random(7)
    val rand = (1 to 120).map { i =>
      val s = rnd.nextInt(1000).toLong
      (s"k${rnd.nextInt(4)}", i.toLong, s, s + 1 + rnd.nextInt(150).toLong) }
    val randDf = rand.toDF("key", "id", "s", "e")
    val direct = (for {
      (ka, ia, sa, ea) <- rand; (kb, ib, sb, eb) <- rand
      if ka == kb && ia < ib && sa < eb && sb < ea
    } yield (ka, ia, ib)).toSet
    Seq(64L, 100L, 1024L).foreach { w =>
      val bucketized = Events.intervalOverlapPairs(randDf, "key", "id", "s", "e", w)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(bucketized === direct, s"bucketUs=$w")
    }
  }

  test("generated oracle SQL embeds the same pattern and mapping") {
    val sql = Events.matchPatternSql("vc+[^P]*$", charMap = Map(P -> "P"))
    assert(sql.contains("'vc+[^P]*$'"))
    assert(sql.contains("WHEN event_type = 'purchase' THEN 'P'"))
    assert(sql.contains("ELSE substr(event_type, 1, 1) END"))
    // single quotes in the pattern are escaped, not injected
    assert(Events.matchPatternSql("a'b").contains("'a''b'"))
  }
}
