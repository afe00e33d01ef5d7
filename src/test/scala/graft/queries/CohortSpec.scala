package graft.queries

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

/** Hand-fixture semantics of the B75 cohort retention matrix and the B76
  * monthly growth series: triangular spine, exact month arithmetic,
  * zero-month evidence rows, base-zero growth NULLs.
  */
class CohortSpec extends SparkSpec {

  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s + " 00:00:00")

  test("orders_cohort: triangular spine, offset-0 full retention, zero cells kept") {
    val dir = Files.createTempDirectory("graft-cohort").toString
    Seq(
      // c1 cohort Jan-24, returns in Feb and Apr (skips Mar)
      (1L, ts("2024-01-15"), 10.0), (1L, ts("2024-02-10"), 20.0),
      (1L, ts("2024-04-01"), 30.0),
      // c2 cohort Jan-24, two SAME-month orders — offset 0 counts once
      (2L, ts("2024-01-20"), 5.0), (2L, ts("2024-01-25"), 5.0),
      // c3 cohort Mar-24, never returns
      (3L, ts("2024-03-05"), 7.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val out = Relational.ordersCohort(spark, dir).collect()
      .map(r => (r.getDate(0).toString, r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    // triangular spine: Jan cohort runs to the Apr frontier (offsets 0..3),
    // Mar cohort only to 0..1 — no cells past the frontier, none missing
    assert(out.keySet === Set(
      ("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 2), ("2024-01-01", 3),
      ("2024-03-01", 0), ("2024-03-01", 1)))
    // offset 0 is full retention by construction
    assert(out(("2024-01-01", 0)) === ((2L, 2L, 1.0)))
    assert(out(("2024-03-01", 0)) === ((1L, 1L, 1.0)))
    // c1 back in month 1 and 3; the skipped month is an explicit zero row
    assert(out(("2024-01-01", 1)) === ((1L, 2L, 0.5)))
    assert(out(("2024-01-01", 2)) === ((0L, 2L, 0.0)))
    assert(out(("2024-01-01", 3)) === ((1L, 2L, 0.5)))
    // c3 churned
    assert(out(("2024-03-01", 1)) === ((0L, 1L, 0.0)))
  }

  test("orders_growth: full month spine, exact cents, base-zero growth is NULL") {
    val dir = Files.createTempDirectory("graft-growth").toString
    Seq(
      (1L, ts("2024-01-15"), 10.0), (1L, ts("2024-01-16"), 20.0),
      (2L, ts("2024-01-20"), 30.0),
      (1L, ts("2024-02-10"), 30.0),
      (3L, ts("2024-03-05"), 15.0),
      (2L, ts("2024-04-01"), 30.0),
      // May has NO orders — spine keeps it as a zero row
      (3L, ts("2024-06-20"), 45.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")

    val rows = Relational.ordersGrowth(spark, dir).collect()
    val byMonth = rows.map(r => r.getDate(0).toString ->
      ((r.getLong(1), r.getDouble(2),
        Option(r.get(3)).map(_.asInstanceOf[Double]),
        Option(r.get(4)).map(_.asInstanceOf[Double])))).toMap
    // contiguous spine Jan..Jun, including the empty May
    assert(rows.map(_.getDate(0).toString).toSeq === Seq(
      "2024-01-01", "2024-02-01", "2024-03-01", "2024-04-01",
      "2024-05-01", "2024-06-01"))
    assert(byMonth("2024-01-01") === ((3L, 60.0, None, None)))
    // Feb: 30 vs 60 → −50%; Mar: 15 vs 30 → −50%; Apr: 30 vs 15 → +100%
    assert(byMonth("2024-02-01") === ((1L, 30.0, Some(-0.5), None)))
    assert(byMonth("2024-03-01") === ((1L, 15.0, Some(-0.5), None)))
    assert(byMonth("2024-04-01") === ((1L, 30.0, Some(1.0), None)))
    // empty May: an explicit −100% against April
    assert(byMonth("2024-05-01") === ((0L, 0.0, Some(-1.0), None)))
    // June's base month is the zero May → growth undefined, NULL not ∞
    assert(byMonth("2024-06-01") === ((1L, 45.0, None, None)))
  }

  test("orders_pareto: strict-above-cut shares, exact cents, boundary ties stay out") {
    val dir = Files.createTempDirectory("graft-pareto").toString
    // customers 1..10 with revenue 1..10 dollars
    (1 to 10).map(i => (i.toLong, ts("2024-01-10"), i.toDouble))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
      .write.parquet(s"$dir/orders.parquet")
    val r = Relational.ordersPareto(spark, dir).collect()(0)
    assert(r.getLong(0) === 10L)
    assert(r.getDouble(1) === 55.0)
    // disc p90 of 100..1000 cents = 900; strictly above -> only the 1000
    assert(r.getLong(2) === 1L)
    assert(r.getDouble(3) === math.floor(1000.0 / 5500 * 1e6 + 0.5) / 1e6)
    // disc p99 = 1000 itself: the boundary customer is a TIE and stays out
    assert(r.getLong(4) === 0L)
    assert(r.getDouble(5) === 0.0)
  }
}
