package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** Strict-ordering semantics of the view → click → purchase funnel. */
class FunnelSpec extends SparkSpec {

  import spark.implicits._

  test("funnel stages require strictly increasing event times") {
    val dir = Files.createTempDirectory("graft-funnel").toString
    Seq(
      // user 1: full ordered conversion
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      // user 2: purchase BEFORE the click — must not count as converted
      (2L, "purchase", 5L), (2L, "view", 10L), (2L, "click", 20L),
      // user 3: click ties the view timestamp — strict ordering rejects it
      (3L, "view", 10L), (3L, "click", 10L),
      // user 4: never viewed — in no stage
      (4L, "click", 5L), (4L, "purchase", 10L))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")

    val r = Relational.eventsFunnel(spark, dir).collect()(0)
    assert(r.getLong(0) === 3, "viewers: users 1, 2, 3")
    assert(r.getLong(1) === 2, "clickers after view: users 1, 2 (3 tied)")
    assert(r.getLong(2) === 1, "purchasers after click: user 1 only")
    assert(r.getDouble(3) === 2.0 / 3.0)
    assert(r.getDouble(4) === 0.5)
  }

  test("events_pattern counts non-overlapping motifs with a deterministic tie-break") {
    val dir = Files.createTempDirectory("graft-pattern").toString
    Seq(
      // user 1: vccpvp — leftmost non-overlapping vc*p matches: vccp, vp
      (1L, 10L, 1L, "view"), (1L, 20L, 2L, "click"), (1L, 30L, 3L, "click"),
      (1L, 40L, 4L, "purchase"), (1L, 50L, 5L, "view"), (1L, 60L, 6L, "purchase"),
      // user 2: pvc — no purchase after the view ⇒ no match, excluded
      (2L, 10L, 7L, "purchase"), (2L, 20L, 8L, "view"), (2L, 30L, 9L, "click"),
      // user 3: ts TIE — event_id orders v before p ⇒ "vp", one match
      (3L, 10L, 10L, "view"), (3L, 10L, 11L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .write.parquet(s"$dir/events.parquet")
    val got = Relational.eventsPattern(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(1L -> ((6L, 2L)), 3L -> ((2L, 1L))))
  }

  test("empty stages convert at a defined 0.0, not null/NaN") {
    val dir = Files.createTempDirectory("graft-funnel-empty").toString
    Seq((1L, "view", 10L), (2L, "view", 20L))
      .toDF("user_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val r = Relational.eventsFunnel(spark, dir).collect()(0)
    assert(r.getLong(0) === 2)
    assert(r.getLong(1) === 0)
    assert(r.getLong(2) === 0)
    assert(r.getDouble(3) === 0.0)
    assert(r.getDouble(4) === 0.0)
  }
}
