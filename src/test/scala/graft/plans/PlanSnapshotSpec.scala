package graft.plans

import graft.SparkSpec

/** Frozen physical-plan signatures for every SparkEntry query — the CI
  * tripwire the plan audits can't be: PlanAuditSpec asserts the
  * properties we KNOW matter (broadcasts, partial aggs, TopKPerKey), but
  * a Spark upgrade or an extension-rule change can silently deoptimise a
  * plan in a way nobody wrote an assertion for (a rewrite stops firing, a
  * join flips strategy) while every value oracle stays green. Here each
  * query's executed plan reduces to its pre-order NODE-NAME signature
  * (operator shapes only — no expressions, sizes, or ids, so the
  * signature is stable across runs and machines at the pinned fixture)
  * and is compared against `src/test/resources/plan_signatures.json`.
  *
  * On an INTENDED plan change, regenerate with
  * `GRAFT_REGEN_PLANS=1 sbt "testOnly graft.plans.PlanSnapshotSpec"`
  * and review the diff like any other code change — the diff IS the
  * plan-shape review.
  *
  * Queries whose plan embeds session-lifetime state (the IVF persisted
  * index falls back between warehouse states) are excluded by name.
  */
class PlanSnapshotSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val resource = "src/test/resources/plan_signatures.json"

  // ann_ivf: plan depends on whether the fingerprinted index table is
  // already persisted in the warehouse (build-vs-probe fallback);
  // dedup_incremental shares the same persisted-index seam
  private val excluded = Set("ann_ivf", "dedup_incremental")

  private def signature(name: String): String = {
    // sparkPlan, not executedPlan: the pre-adaptive physical plan is what
    // the optimizer + strategies chose (AQE would wrap it in one opaque
    // AdaptiveSparkPlan node and re-plan at runtime; rule/strategy
    // regressions — the thing this spec guards — land in sparkPlan)
    val plan = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.sparkPlan
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach(p => names += p.nodeName)
    names.mkString(">")
  }

  private def load(): Map[String, String] = {
    val txt = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(resource)),
      "UTF-8")
    // flat {"name":"sig",...} JSON — parsed with the same minimal reader
    // stance as the rest of the repo (no JSON library on the classpath)
    """"([^"]+)"\s*:\s*"([^"]*)"""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2)).toMap
  }

  test("every query's physical plan shape matches its frozen signature") {
    val names = graft.SparkEntry.queries.keySet -- excluded
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      val entries = names.toSeq.sorted
        .map(n => s"""  "$n": "${signature(n)}"""")
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("src/test/resources"))
      java.nio.file.Files.write(java.nio.file.Paths.get(resource),
        entries.mkString("{\n", ",\n", "\n}\n").getBytes("UTF-8"))
      info(s"regenerated ${entries.size} plan signatures")
    } else {
      val want = load()
      // the snapshot must cover exactly the non-excluded query set — a new
      // query without a frozen plan (or a stale entry) fails until regen
      assert(want.keySet === names,
        s"signature file out of sync: missing=${(names -- want.keySet).toSeq.sorted}, " +
          s"stale=${(want.keySet -- names).toSeq.sorted} — regenerate with GRAFT_REGEN_PLANS=1")
      val bad = names.toSeq.sorted.flatMap { n =>
        val got = signature(n)
        if (got == want(n)) None else Some(s"$n:\n  frozen: ${want(n)}\n  got:    $got")
      }
      assert(bad.isEmpty,
        s"${bad.size} plan shape(s) drifted:\n${bad.mkString("\n")}\n" +
          "If intended, regenerate with GRAFT_REGEN_PLANS=1 and review the diff.")
    }
  }
}
