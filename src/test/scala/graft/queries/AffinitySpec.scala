package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Hand-fixture semantics of the r17 leg-3 additions: B78 market-basket
  * lift, B79 session concurrency sweep, B80 zero-filled autocorrelation,
  * and the C116 calibration audit.
  */
class AffinitySpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("orders_basket: distinct membership, in-row pairs, exact lift, singleton baskets") {
    val dir = Files.createTempDirectory("graft-basket").toString
    Seq((1L, 1L), (1L, 2L), (1L, 3L), // o1: brands {A, B} (dup B collapses)
      (2L, 1L), (2L, 4L),             // o2: {A, C}
      (3L, 1L), (3L, 2L),             // o3: {A, B}
      (4L, 2L))                       // o4: {B} — no pair, but counts in N
      .toDF("l_orderkey", "l_partkey")
      .write.parquet(s"$dir/lineitem.parquet")
    Seq((1L, "BrandA"), (2L, "BrandB"), (3L, "BrandB"), (4L, "BrandC"))
      .toDF("p_partkey", "p_brand")
      .write.parquet(s"$dir/part.parquet")

    val out = Relational.ordersBasket(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5),
          r.getDouble(6), r.getDouble(7), r.getDouble(8)))).toMap
    assert(out.keySet === Set(("BrandA", "BrandB"), ("BrandA", "BrandC")))
    // N = 4 baskets; A in 3, B in 3 (o1's two B-parts count ONCE; the
    // pair-less o4 still counts B's marginal), C in 1
    assert(out(("BrandA", "BrandB")) ===
      ((2L, 3L, 3L, 0.5, math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6,
        math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6,
        math.floor(4.0 * 2 / (3 * 3) * 1e6 + 0.5) / 1e6)))
    assert(out(("BrandA", "BrandC")) ===
      ((1L, 3L, 1L, 0.25, math.floor(1.0 / 3 * 1e6 + 0.5) / 1e6, 1.0,
        math.floor(4.0 / 3 * 1e6 + 0.5) / 1e6)))
  }

  test("events_concurrency: inclusive-touch sweep, session gap split, hourly peaks and closes") {
    val dir = Files.createTempDirectory("graft-conc").toString
    Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")), // u1 session [00:00, 00:10]
      (2L, 1L, ts("2024-01-01 00:10:00")),
      (3L, 1L, ts("2024-01-01 01:00:00")), // gap 50min > 30 -> new session
      (4L, 2L, ts("2024-01-01 00:05:00")), // u2 point session at 00:05
      (5L, 3L, ts("2024-01-01 00:10:00"))) // u3 point session at 00:10 (touch)
      .toDF("event_id", "user_id", "ts")
      .write.parquet(s"$dir/events.parquet")

    val out = Relational.eventsConcurrency(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val h0 = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    val h1 = h0 + 3600L * 1000000L
    // hour 0: 3 starts, 3 ends; peak 2 — u1+u2 overlap at 00:05, and the
    // TOUCH at 00:10 (u1 ending, u3 starting) still counts as concurrent;
    // every session closed by hour end
    assert(out(h0) === ((3L, 3L, 2L, 0L)))
    // hour 1: the second u1 session opens and closes alone
    assert(out(h1) === ((1L, 1L, 1L, 0L)))
    assert(out.size === 2)
  }

  test("events_autocorr: zero-filled spine, exact integer ACF, constant series NULL") {
    val dir = Files.createTempDirectory("graft-acf").toString
    def hour(h: Int) = ts(f"2024-01-01 $h%02d:30:00")
    val a = Seq(1, 2, 1, 2, 1).zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(i => (s"a$h$i", "a", hour(h))) }
    val b = Seq((("b00"), "b", hour(0)), (("b01"), "b", hour(0)),
      (("b20"), "b", hour(2)), (("b21"), "b", hour(2))) // hour 1 is a REAL zero
    val c = Seq((("c0"), "c", hour(0)), (("c1"), "c", hour(1))) // constant 1,1
    (a ++ b ++ c).zipWithIndex
      .map { case ((_, t, time), i) => (i.toLong, t, time) }
      .toDF("event_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val out = Relational.eventsAutocorr(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), if (r.isNullAt(3)) null
          else java.lang.Double.valueOf(r.getDouble(3))))).toMap
    // type a: x = [1,2,1,2,1], dev = 5x-7 = [-2,3,-2,3,-2], den = 30
    assert(out(("a", 1)) === ((5L, java.lang.Double.valueOf(-0.8))))
    assert(out(("a", 2)) === ((5L,
      java.lang.Double.valueOf(math.floor(17.0 / 30 * 1e6 + 0.5) / 1e6))))
    assert(out(("a", 3)) === ((5L, java.lang.Double.valueOf(-0.4))))
    // type b: the empty hour is x=0, NOT a spliced series:
    // x = [2,0,2], dev = 3x-4 = [2,-4,2], den = 24, lag1 = -16/24
    assert(out(("b", 1)) === ((3L,
      java.lang.Double.valueOf(math.floor(-16.0 / 24 * 1e6 + 0.5) / 1e6))))
    assert(out(("b", 2)) === ((3L,
      java.lang.Double.valueOf(math.floor(4.0 / 24 * 1e6 + 0.5) / 1e6))))
    // constant series: den = 0 -> NULL, not a division error
    (1 to 6).foreach(k => assert(out(("c", k)) === ((2L, null))))
    assert(out.size === 18)
  }

  test("events_changepoint: AMOC split on a level shift, tie breaks to the earliest bucket") {
    val dir = Files.createTempDirectory("graft-cpt").toString
    def hour(h: Int) = ts(f"2024-01-01 $h%02d:15:00")
    // a: [1,1,1,5,5] — the shift after hour 2; b: [2,0,0,2] — symmetric,
    // f ties at i=1 and i=3, the argmax must break to the EARLIER bucket;
    // c: [3,3] — constant, reduction exactly 0
    val ev = Seq(1, 1, 1, 5, 5).zipWithIndex.flatMap { case (n, h) =>
        (0 until n).map(i => ("a", hour(h))) } ++
      Seq(("b", hour(0)), ("b", hour(0)), ("b", hour(3)), ("b", hour(3))) ++
      Seq(("c", hour(0)), ("c", hour(0)), ("c", hour(0)),
        ("c", hour(1)), ("c", hour(1)), ("c", hour(1)))
    ev.zipWithIndex.map { case ((t, time), i) => (i.toLong, t, time) }
      .toDF("event_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val out = Relational.eventsChangepoint(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    def bucket(h: Int) =
      Timestamp.valueOf(f"2024-01-01 $h%02d:00:00").getTime * 1000L
    // a: f(3) = 9/3 + 100/2 = 53, f0 = 169/5 = 33.8
    assert(out("a") === ((5L, bucket(2), 3L, 2L, 1.0, 5.0,
      math.floor((53.0 - 33.8) * 1e6 + 0.5) / 1e6)))
    // b: f(1) = f(3) = 16/3; earliest bucket wins the tie
    assert(out("b") === ((4L, bucket(0), 1L, 3L, 2.0,
      math.floor(2.0 / 3 * 1e6 + 0.5) / 1e6,
      math.floor((4.0 + 4.0 / 3 - 4.0) * 1e6 + 0.5) / 1e6)))
    // c: constant — the best split exists but buys exactly nothing
    assert(out("c") === ((2L, bucket(0), 1L, 1L, 3.0, 3.0, 0.0)))
  }

  test("dedup_cross_source: only cross-source pairs aggregate, marginals count whole sources") {
    val dir = Files.createTempDirectory("graft-xsrc").toString
    val dup = "the quick brown fox jumps over the lazy dog again and again"
    Seq(
      (1L, "s1", dup),
      (2L, "s2", dup),                       // cross-source dup with 1 and 5
      (3L, "s2", "unrelated text entirely about something else whatsoever"),
      (4L, "s1", "completely different words live here today my friend"),
      (5L, "s1", dup))                       // in-source dup with 1 (excluded)
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")

    val out = Pipeline.dedupCrossSource(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // pairs (1,2) and (2,5) cross; (1,5) is s1-internal and must NOT count
    assert(out === Map(("s1", "s2") -> ((2L, 3L, 3L, 2L, 0.6))))
  }

  test("events_markov_entropy: per-state entropy and empirical rate, decimal-term determinism") {
    val dir = Files.createTempDirectory("graft-ment").toString
    // u1: a->b, b->a, a->b; u2: a->c  =>  a: {b:2, c:1}, b: {a:1}
    Seq((1L, 1L, "a", "2024-01-01 00:00:00"), (2L, 1L, "b", "2024-01-01 00:01:00"),
      (3L, 1L, "a", "2024-01-01 00:02:00"), (4L, 1L, "b", "2024-01-01 00:03:00"),
      (5L, 2L, "a", "2024-01-01 00:00:00"), (6L, 2L, "c", "2024-01-01 00:01:00"))
      .map { case (id, u, t, s) => (id, u, t, ts(s)) }
      .toDF("event_id", "user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val out = Relational.eventsMarkovEntropy(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))).toMap
    // mirror the engine's arithmetic: per-term DECIMAL(27,10) then round 6
    def dec(v: Double) = BigDecimal(v).setScale(10, BigDecimal.RoundingMode.HALF_UP)
    def r6(v: BigDecimal) = v.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ha = dec(2.0 / 3 * -math.log(2.0 / 3)) + dec(1.0 / 3 * -math.log(1.0 / 3))
    val rate = dec(3.0 / 4 * ha.toDouble) + dec(1.0 / 4 * 0.0)
    assert(out("a") === ((3L, 2L, r6(ha), r6(rate))))
    // a deterministic state: one next type, entropy exactly 0
    assert(out("b") === ((1L, 1L, 0.0, r6(rate))))
    assert(out.keySet === Set("a", "b"))
  }

  test("label_calibration: vote bins are the reliability diagram, exact ECE") {
    val dir = Files.createTempDirectory("graft-calib").toString
    // six identical unit vectors: every query's 5 NN are the other five
    // labels 0,0,0,0,1,1 -> q0..q3 vote {0:3,1:2} maj 0 CORRECT (bin 3);
    // q4,q5 vote {0:4,1:1} maj 0 WRONG (bin 4)
    (0L to 5L).map(i => (i, Seq(1.0f, 0.0f), if (i >= 4) 1 else 0))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")

    val out = Pipeline.labelCalibration(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))).toMap
    val ece = math.floor(16.0 / 30 * 1e6 + 0.5) / 1e6
    assert(out(3L) === ((4L, 4L, 0.6, 1.0, 0.4, ece)))
    assert(out(4L) === ((2L, 0L, 0.8, 0.0, 0.8, ece)))
    assert(out.size === 2)
  }

  test("text_boilerplate: cross-source template detection, small sources exempt, exact flag edge") {
    val dir = Files.createTempDirectory("graft-boiler").toString
    Seq(
      (1L, "s1", "alpha beta visit example now"),
      (2L, "s1", "gamma delta visit example now"),
      (3L, "s1", "epsilon zeta visit example now"),
      (4L, "s1", "visit example now"),
      (5L, "s1", "p q r s visit example"), // exactly 1/5 template -> flag EDGE
      (6L, "s2", "one two three"),          // s2 has 3 docs: below the
      (7L, "s2", "one two three"),          // n_docs >= 4 floor, NOTHING is
      (8L, "s2", "one two three"),          // template however shared
      (9L, "s2", null),                     // NULL text drops
      (10L, "s2", "solo"))                  // no bigram -> drops
      .toDF("doc_id", "source", "text")
      .write.parquet(s"$dir/documents.parquet")

    val out = Pipeline.textBoilerplate(spark, dir).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getBoolean(5)))).toMap
    // "visit example" (df 5) and "example now" (df 4) clear df*2 >= 5
    assert(out(1L) === ((4L, 2L, 0.5, true)))
    assert(out(2L) === ((4L, 2L, 0.5, true)))
    assert(out(3L) === ((4L, 2L, 0.5, true)))
    assert(out(4L) === ((2L, 2L, 1.0, true)))
    // the integer flag edge: 1*5 >= 5 — ratio exactly 0.2 IS flagged
    assert(out(5L) === ((5L, 1L, 0.2, true)))
    // s2: shared by all 3 docs, but 3 < 4 -> no template, nothing flagged
    assert(out(6L) === ((2L, 0L, 0.0, false)))
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L, 7L, 8L))
  }
}
