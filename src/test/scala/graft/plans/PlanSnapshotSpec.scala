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
  * index) are snapshotted under PINNED cache states instead of excluded:
  * `ann_ivf@cold` drops the fingerprinted index tables first,
  * `ann_ivf@warm` re-derives the plan immediately after. Because annIvf
  * builds and persists the index EAGERLY during query construction, both
  * variants return the probe-against-catalog-tables plan — byte-equal
  * signatures are the intended assertion (the returned plan is
  * state-INDEPENDENT; if the build ever became lazy, cold would start
  * embedding build nodes and diverge from warm). The historical flake
  * this family actually saw — catalog failure routing to the
  * self-contained ivfTopK — is pinned separately as `ann_ivf@fallback`,
  * which snapshots the exact DataFrame the catch branch constructs.
  */
class PlanSnapshotSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val resource = "src/test/resources/plan_signatures.json"

  // ann_ivf's REGULAR entry is replaced by the two pinned-state variants
  // below — an unpinned snapshot would flap with whatever warehouse state
  // the previous run left behind
  private val excluded = Set("ann_ivf")

  /** Pinned-cache-state variants, evaluated IN ORDER (cold's construction
    * persists the index that warm then probes). dedup_incremental needs no
    * variant: its index is an inline localCheckpoint whose plan shape
    * (Scan ExistingRDD) is construction-deterministic — it holds a regular
    * entry since r13.
    */
  private def pinnedVariants: Seq[(String, () => String)] = {
    def dropIvf(): Unit = {
      val fp = graft.io.Fingerprint.ofPath(spark, s"$dir/embeddings.parquet")
      Seq(s"graft_ivf_cells_v2_$fp", s"graft_ivf_centroids_v2_$fp")
        .foreach(graft.io.Bucketing.dropTable(spark, _))
    }
    // the fallback branch's plan, constructed the way annIvf's catch
    // constructs it (same inputs, same k, same rename) — pinning it here
    // means a deoptimisation of the self-contained route can't hide
    // behind the happy path's green signature
    def fallbackSig(): String = {
      import org.apache.spark.sql.functions.col
      // mirror Pipeline.annIvf's catch branch exactly: plain parquet read
      // (Tables.load), vec_id split, k=5, rank→rnk
      val e = spark.read.parquet(s"$dir/embeddings.parquet")
      val plan = graft.ops.ann.Ann.ivfTopK(
          e.where(col("vec_id") < 20), e.where(col("vec_id") >= 20), k = 5)
        .withColumnRenamed("rank", "rnk")
        .queryExecution.sparkPlan
      val names = scala.collection.mutable.ArrayBuffer.empty[String]
      plan.foreach(p => names += p.nodeName)
      names.mkString(">")
    }
    Seq(
      "ann_ivf@cold" -> (() => { dropIvf(); signature("ann_ivf") }),
      "ann_ivf@warm" -> (() => signature("ann_ivf")),
      "ann_ivf@fallback" -> (() => fallbackSig()))
  }

  private def signature(name: String): String = {
    // sparkPlan, not executedPlan: the pre-adaptive physical plan is what
    // the optimizer + strategies chose (AQE would wrap it in one opaque
    // AdaptiveSparkPlan node and re-plan at runtime; rule/strategy
    // regressions — the thing this spec guards — land in sparkPlan)
    val plan = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.sparkPlan
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    plan.foreach(p => names += p.nodeName)
    // the IVF/bucketed table names embed the DATA fingerprint (file
    // sizes/mtimes) — normalise them so a fixture regeneration can't break
    // the snapshot (r16: the driver's testdata regen flipped the bkt names)
    names.mkString(">")
      .replaceAll("(graft_ivf_[a-z]+_v2_)[0-9a-f]+", "$1FP")
      .replaceAll("(graft_bkt_[a-z]+_)[0-9a-f]+", "$1FP")
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
    // pinned variants are evaluated lazily AND in declaration order — the
    // cold snapshot's side effect (persisting the index) is what makes the
    // warm snapshot's state
    val variantSigs: Seq[(String, () => String)] = pinnedVariants
    val allNames = names ++ variantSigs.map(_._1)
    if (sys.env.contains("GRAFT_REGEN_PLANS")) {
      val regular = names.toSeq.sorted
        .map(n => s"""  "$n": "${signature(n)}"""")
      val pinned = variantSigs.map { case (n, f) => s"""  "$n": "${f()}"""" }
      val entries = (regular ++ pinned).sorted
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get("src/test/resources"))
      java.nio.file.Files.write(java.nio.file.Paths.get(resource),
        entries.mkString("{\n", ",\n", "\n}\n").getBytes("UTF-8"))
      info(s"regenerated ${entries.size} plan signatures")
    } else {
      val want = load()
      // the snapshot must cover exactly the non-excluded query set plus the
      // pinned variants — a new query without a frozen plan (or a stale
      // entry) fails until regen
      assert(want.keySet === allNames,
        s"signature file out of sync: missing=${(allNames -- want.keySet).toSeq.sorted}, " +
          s"stale=${(want.keySet -- allNames).toSeq.sorted} — regenerate with GRAFT_REGEN_PLANS=1")
      val regularBad = names.toSeq.sorted.flatMap { n =>
        val got = signature(n)
        if (got == want(n)) None else Some(s"$n:\n  frozen: ${want(n)}\n  got:    $got")
      }
      val pinnedBad = variantSigs.flatMap { case (n, f) =>
        val got = f()
        if (got == want(n)) None else Some(s"$n:\n  frozen: ${want(n)}\n  got:    $got")
      }
      val bad = regularBad ++ pinnedBad
      assert(bad.isEmpty,
        s"${bad.size} plan shape(s) drifted:\n${bad.mkString("\n")}\n" +
          "If intended, regenerate with GRAFT_REGEN_PLANS=1 and review the diff.")
    }
  }
}
