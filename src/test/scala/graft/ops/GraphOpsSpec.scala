package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.graph.GraphOps

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val edges = Seq(
    ("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c")
  ).toDF("from", "to")

  test("components label every island by its lexicographically smallest node, with sizes") {
    val islands = Seq(
      ("b", "a"), ("b", "c"),           // island {a,b,c} -> labelled "a"
      ("e", "d"),                       // island {d,e}   -> labelled "d"
      ("z", "y"), ("y", "x"), ("x", "z") // cycle {x,y,z} -> labelled "x"
    ).toDF("from", "to")
    val got = GraphOps.components(islands).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(got === Map(
      "a" -> ("a", 3L), "b" -> ("a", 3L), "c" -> ("a", 3L),
      "d" -> ("d", 2L), "e" -> ("d", 2L),
      "x" -> ("x", 3L), "y" -> ("x", 3L), "z" -> ("x", 3L)))
  }

  test("katz agrees with an independent DataFrame recurrence and counts endorsements undiluted") {
    val iters = 8
    val alpha = 0.2
    val graphx = GraphOps.katz(edges, alpha, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // independent recurrence: x0 = 1, x_{k+1}(v) = 1 + alpha * sum of
    // incoming x_k(u) — no out-degree division anywhere
    val nodes = edges.select(col("from").as("node"))
      .union(edges.select(col("to"))).distinct()
    var x: DataFrame = nodes.withColumn("x", lit(1.0))
    for (_ <- 1 to iters) {
      val in = edges
        .join(x.withColumnRenamed("node", "from"), "from")
        .groupBy(col("to").as("node")).agg(sum("x").as("in_sum"))
      x = nodes.join(in, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0) + lit(alpha) * coalesce(col("in_sum"), lit(0.0))).as("x"))
    }
    val manual = x.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(graphx.keySet === manual.keySet)
    graphx.foreach { case (n, v) =>
      assert(math.abs(v - manual(n)) < 1e-6, s"node $n: graphx $v vs manual $manual")
    }
    // the PageRank-vs-Katz distinction this op exists for: "a" endorses
    // two nodes (b, c); Katz credits BOTH fully, so c (in: b, a, d) must
    // outrank b (in: a only) by more than a's split endorsement would give
    assert(graphx("c") > graphx("b"))
    // source-only node: no in-edges, katz = 1 exactly
    assert(graphx("d") === 1.0)
  }

  test("hits agrees with an independent recurrence; hub/authority roles split correctly") {
    val iters = 8
    val got = GraphOps.hits(edges, iters).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap

    // independent recurrence with the same deferred-normalisation design
    val nodes = edges.select(col("from").as("node"))
      .union(edges.select(col("to"))).distinct()
    var hv: DataFrame = nodes.withColumn("h", lit(1.0))
    var av: DataFrame = null
    for (_ <- 1 to iters) {
      val a = edges.join(hv.withColumnRenamed("node", "from"), "from")
        .groupBy(col("to").as("node")).agg(sum("h").as("in_sum"))
      av = nodes.join(a, Seq("node"), "left")
        .select(col("node"), coalesce(col("in_sum"), lit(0.0)).as("a"))
      val h = edges.join(av.withColumnRenamed("node", "to"), "to")
        .groupBy(col("from").as("node")).agg(sum("a").as("out_sum"))
      hv = nodes.join(h, Seq("node"), "left")
        .select(col("node"), coalesce(col("out_sum"), lit(0.0)).as("h"))
    }
    val hs = hv.agg(sum("h")).head.getDouble(0)
    val as = av.agg(sum("a")).head.getDouble(0)
    val hm = hv.collect().map(r => r.getString(0) -> r.getDouble(1) / hs).toMap
    val am = av.collect().map(r => r.getString(0) -> r.getDouble(1) / as).toMap
    assert(got.keySet === hm.keySet)
    got.foreach { case (n, (hub, auth)) =>
      assert(math.abs(hub - hm(n)) < 1e-6, s"hub $n: $hub vs ${hm(n)}")
      assert(math.abs(auth - am(n)) < 1e-6, s"auth $n: $auth vs ${am(n)}")
    }
    // role split: d only endorses (pure hub) — zero authority; no node
    // endorses d, and c is endorsed by everyone — top authority
    assert(got("d")._2 === 0.0)
    assert(got.values.map(_._2).max === got("c")._2)
  }

  test("pageRank agrees with an independent DataFrame power iteration") {
    val iters = 10
    val graphx = GraphOps.pageRank(edges, iters)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // independent implementation: GraphX staticPageRank semantics are
    // rank = 0.15 + 0.85 * sum(incoming rank/outDegree), ranks start at
    // 1.0, final ranks normalised so they sum to n (a no-op on sink-free
    // graphs like this one, visible whenever sinks leak rank mass)
    val out = edges.groupBy("from").agg(count(lit(1)).as("outdeg"))
    val nodes = edges.select(col("from").as("node"))
      .union(edges.select(col("to"))).distinct()
    var ranks: DataFrame = nodes.withColumn("rank", lit(1.0))
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "from"), "from")
        .join(out, "from")
        .groupBy(col("to").as("node"))
        .agg(sum(col("rank") / col("outdeg")).as("in_sum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(0.15) + lit(0.85) * coalesce(col("in_sum"), lit(0.0))).as("rank"))
    }
    val raw = ranks.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val scale = raw.size / raw.values.sum
    val manual = raw.view.mapValues(_ * scale).toMap

    assert(graphx.keySet === manual.keySet)
    graphx.foreach { case (n, r) =>
      assert(math.abs(r - manual(n)) < 1e-6, s"node $n: graphx $r vs manual ${manual(n)}")
    }
    // sink-free cycle members outrank the dangling source
    assert(graphx("c") > graphx("d"))
  }

  test("triangle counts: K4 plus a pendant node, duplicate/reversed edges collapse") {
    import spark.implicits._
    val k4 = for { a <- Seq("a", "b", "c", "d"); b <- Seq("a", "b", "c", "d") if a < b }
      yield (a, b)
    // duplicates + a reversed edge + a pendant: TriangleCount.run must
    // canonicalise all of it to the simple undirected K4 + tail
    val edges = (k4 ++ Seq(("b", "a"), ("a", "b"), ("d", "e"))).toDF("from", "to")
    val got = GraphOps.triangles(edges).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    // each K4 vertex sits in C(3,2)=3 triangles; the pendant in none
    assert(got === Map("a" -> 3, "b" -> 3, "c" -> 3, "d" -> 3, "e" -> 0))
  }

  test("bfs distances: orientation-blind hop counts, unreachable nodes absent") {
    import spark.implicits._
    // path s -> x1 <- x2 -> x3 (mixed orientation) and an island i1 - i2
    val edges = Seq(("s", "x1"), ("x2", "x1"), ("x2", "x3"), ("i1", "i2"))
      .toDF("from", "to")
    val fromS = GraphOps.bfsDistances(edges, Seq("s")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(fromS === Map("s" -> 0, "x1" -> 1, "x2" -> 2, "x3" -> 3))
    // multi-seed: nearest seed wins
    val multi = GraphOps.bfsDistances(edges, Seq("s", "x3")).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(multi === Map("s" -> 0, "x1" -> 1, "x2" -> 1, "x3" -> 0))
    // maxHops truncates the frontier
    val capped = GraphOps.bfsDistances(edges, Seq("s"), maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(capped === Map("s" -> 0, "x1" -> 1))
  }

  test("sssp: min-plus beats hop-count, all-1 weights degrade to BFS, negatives refused") {
    import spark.implicits._
    // triangle a-b (10), a-c (1), c-b (1): the 2-edge path to b is cheaper
    // than the direct edge — BFS would say 1 hop, min-plus must say 2
    val tri = Seq(("a", "b", 10L), ("a", "c", 1L), ("c", "b", 1L))
      .toDF("from", "to", "weight")
    val got = GraphOps.sssp(tri, Seq("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 2L, "c" -> 1L))
    // unreachable island produces no row; determinism across re-runs
    val island = tri.unionByName(Seq(("i1", "i2", 3L)).toDF("from", "to", "weight"))
    val r1 = GraphOps.sssp(island, Seq("a")).collect().map(r => (r.getString(0), r.getLong(1)))
    assert(r1.map(_._1).toSet === Set("a", "b", "c"))
    assert(r1.toSeq === GraphOps.sssp(island, Seq("a")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq)
    // all-1 weights == BFS hop counts (the min-plus/BFS equivalence)
    val edges = Seq(("s", "x1"), ("x2", "x1"), ("x2", "x3")).toDF("from", "to")
    val unit = edges.withColumn("weight", lit(1L))
    val viaSssp = GraphOps.sssp(unit, Seq("s")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaBfs = GraphOps.bfsDistances(edges, Seq("s")).collect()
      .map(r => r.getString(0) -> r.getInt(1).toLong).toMap
    assert(viaSssp === viaBfs)
    // maxHops caps the relaxation depth
    val capped = GraphOps.sssp(unit, Seq("s"), maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("s" -> 0L, "x1" -> 1L))
    // negative weights break min-plus optimal substructure: refuse
    assertThrows[IllegalArgumentException] {
      GraphOps.sssp(Seq(("a", "b", -1L)).toDF("from", "to", "weight"), Seq("a"))
    }
  }

  test("landmarkCloseness: all-landmarks == hand harmonic centrality; k bounds; determinism") {
    import spark.implicits._
    // path a-b-c plus island d-e; with k >= n every node is a landmark, so
    // the score IS classic harmonic centrality (hand-computed)
    val edges = Seq(("a", "b"), ("b", "c"), ("d", "e")).toDF("from", "to")
    val got = GraphOps.landmarkCloseness(edges, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got === Map(
      "a" -> ((3L, 1.5)), "b" -> ((3L, 2.0)), "c" -> ((3L, 1.5)),
      "d" -> ((2L, 1.0)), "e" -> ((2L, 1.0))))
    // k=1: exactly one landmark; every node in its component reaches it,
    // the other island reaches nothing and emits no row
    val one = GraphOps.landmarkCloseness(edges, k = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(one.values.forall(_ == 1L))
    assert(one.keySet === Set("a", "b", "c") || one.keySet === Set("d", "e"))
    // deterministic across re-runs (md5-ordered landmark pick)
    val rerun = GraphOps.landmarkCloseness(edges, k = 1).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(rerun === one)
    // maxHops truncates: with 1 hop, c can never see a's landmark entry
    val capped = GraphOps.landmarkCloseness(edges, k = 10, maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped("b") === 3L && capped("a") === 2L)
  }

  test("landmarkBetweenness: k >= n == hand Brandes on a path; diamond counts sigma=2 paths; k bounds") {
    import spark.implicits._
    def bMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // path a-b-c-d (duplicate + reversed edges must not inflate sigma):
    // hand Brandes over ordered pairs — b interior to (a,c),(a,d),(c,a),
    // (d,a) = 4, c symmetric; endpoints interior to nothing, NO row
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "a"), ("c", "b"))
      .toDF("from", "to")
    assert(bMap(GraphOps.landmarkBetweenness(path, k = 10)) ===
      Map("b" -> 4.0, "c" -> 4.0))
    // diamond x-y1-z, x-y2-z: two shortest x..z paths (sigma = 2) split
    // the dependency — every node scores exactly 1.0 by hand
    val diamond = Seq(("x", "y1"), ("x", "y2"), ("y1", "z"), ("y2", "z"))
      .toDF("from", "to")
    assert(bMap(GraphOps.landmarkBetweenness(diamond, k = 10)) ===
      Map("x" -> 1.0, "y1" -> 1.0, "y2" -> 1.0, "z" -> 1.0))
    // k bounds the sample: with ONE landmark only that source's
    // dependencies accumulate — scores are a subset of the k=all run's
    // per-source contributions and never exceed them
    val one = bMap(GraphOps.landmarkBetweenness(path, k = 1))
    val all = bMap(GraphOps.landmarkBetweenness(path, k = 10))
    assert(one.keySet.subsetOf(all.keySet))
    assert(one.forall { case (n, v) => v <= all(n) })
    // deterministic across re-runs (md5-ordered landmark pick)
    assert(bMap(GraphOps.landmarkBetweenness(path, k = 1)) === one)
  }

  test("landmarkEccentricity: k >= n == true eccentricity; bounds grow toward it; determinism") {
    import spark.implicits._
    // path a-b-c-d plus island x-y: with every node a landmark the bound
    // IS eccentricity (hand values), per component
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("from", "to")
    val full = GraphOps.landmarkEccentricity(g, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(full === Map(
      "a" -> ((4L, 3L)), "b" -> ((4L, 2L)), "c" -> ((4L, 2L)), "d" -> ((4L, 3L)),
      "x" -> ((2L, 1L)), "y" -> ((2L, 1L))))
    // a k=1 sample is a LOWER bound of the full run everywhere it reaches
    val one = GraphOps.landmarkEccentricity(g, k = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(one.forall { case (n, b) => b <= full(n)._2 })
    // deterministic across re-runs (md5-ordered landmark pick)
    assert(GraphOps.landmarkEccentricity(g, k = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap === one)
    // maxHops truncates distances, never inflates the bound
    val capped = GraphOps.landmarkEccentricity(g, k = 10, maxHops = 1).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(capped.forall { case (n, b) => b <= full(n)._2 })
  }

  test("kcore: triangle survives, pendant chain cascades out, multigraph collapses") {
    import spark.implicits._
    // triangle a-b-c with a pendant chain c-d-e: d has degree 2 BEFORE
    // the peel but loses e in round 1 — the cascade is the point
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e"),
      // duplicate + reversed edges must not inflate degrees
      ("b", "a"), ("e", "d")).toDF("from", "to")
    val got = GraphOps.kcore(g, k = 2).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 2L, "b" -> 2L, "c" -> 2L))
    // k=1 keeps everything (after canonicalisation every node has >= 1)
    val all = GraphOps.kcore(g, k = 1).collect().map(_.getString(0)).toSet
    assert(all === Set("a", "b", "c", "d", "e"))
    // k=3: the triangle's degree-2 nodes peel too — empty core
    assert(GraphOps.kcore(g, k = 3).collect().isEmpty)
    // maxIter truncates the cascade: one round removes e (degree 1) but
    // d (still degree 2 pre-peel) survives that single round
    val one = GraphOps.kcore(g, k = 2, maxIter = 1).collect()
      .map(_.getString(0)).toSet
    assert(one === Set("a", "b", "c", "d"))
  }

  test("nodeIndex is a deterministic bijection — distinct nodes never merge") {
    val many = spark.range(5000)
      .select(concat(lit("n"), col("id")).as("from"),
        concat(lit("n"), (col("id") + 1) % 5000).as("to"))
    val idx = GraphOps.nodeIndex(many)
    assert(idx.count() === 5000)
    assert(idx.select("vid").distinct().count() === 5000)   // no collisions
    assert(idx.select("node").distinct().count() === 5000)
    // deterministic across re-evaluation: the join-back branch sees the
    // same assignment as the edge-mapping branch
    val again = GraphOps.nodeIndex(many)
    assert(idx.join(again, Seq("node", "vid")).count() === 5000)
    // degrees on the 5000-cycle: every node has in+out = 2
    val degs = GraphOps.degrees(many).collect()
    assert(degs.length === 5000)
    assert(degs.forall(_.getInt(1) === 2))
  }

  test("node similarity: shared-neighbour jaccard; hub pruning == scoring the pruned graph") {
    import spark.implicits._
    // a and b share {x, y}; c shares {x}; hub h neighbours EVERYONE
    val base = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x"))
    val hub = Seq("a", "b", "c", "x", "y").map(n => (n, "h"))
    def simMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val got = simMap(GraphOps.nodeSimilarity((base ++ hub).toDF("from", "to"), 0.0))
    // a = {x,y,h}, b = {x,y,h}: identical neighbourhoods
    assert(got(("a", "b")) === ((3L, 1.0)))
    // a vs c share {x, h}: 2 / (3 + 2 - 2)
    assert(got(("a", "c")) === ((2L, 2.0 / 3.0)))
    // pruning h (degree 5 > 4) must equal scoring the graph WITHOUT h —
    // hubs leave numerator and denominator together, never a mixed score
    val pruned = simMap(
      GraphOps.nodeSimilarity((base ++ hub).toDF("from", "to"), 0.0, maxHubDegree = 4))
    val manual = simMap(GraphOps.nodeSimilarity(base.toDF("from", "to"), 0.0))
    assert(pruned === manual)
    assert(pruned(("a", "b")) === ((2L, 1.0)))
  }

  test("node similarity auto hub guard: engages on a skewed graph == explicit cap, silent otherwise") {
    import spark.implicits._
    def simMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    // skewed: hub h neighbours 40 spokes (candidate estimate 40·39/2 =
    // 780 through h) plus a small clique-ish cluster of degree ≤ 3
    val spokes = (0 until 40).map(i => (s"s$i", "h"))
    val clique = Seq(("a", "x"), ("a", "y"), ("b", "x"), ("b", "y"), ("c", "x"))
    val skewed = (spokes ++ clique).toDF("from", "to")
    // budget 100 < 780: the auto guard must engage, and at this histogram
    // the largest affordable cap is degree 3 (all non-hub degrees) —
    // equal by definition to the explicit cap at 3
    val auto = simMap(GraphOps.nodeSimilarity(skewed, 0.0, maxCandidates = 100))
    val explicit3 = simMap(GraphOps.nodeSimilarity(skewed, 0.0, maxHubDegree = 3))
    assert(auto === explicit3)
    assert(auto.nonEmpty)
    // generous budget: the guard stays silent and the result is the full
    // unguarded definition
    val silent = simMap(GraphOps.nodeSimilarity(skewed, 0.0))
    val unguarded = simMap(GraphOps.nodeSimilarity(skewed, 0.0, maxCandidates = 0))
    assert(silent === unguarded)
    // the skew actually matters: the hub-mediated pairs exist unguarded
    // and are absent under the engaged guard
    assert(unguarded.keySet.exists { case (p, q) => p.startsWith("s") && q.startsWith("s") })
    assert(!auto.keySet.exists { case (p, q) => p.startsWith("s") && q.startsWith("s") })
  }

  test("node similarity auto hub guard: refuses when no cap fits the budget (never a silent near-empty prune)") {
    import spark.implicits._
    // a 100-cycle: EVERY node has degree 2, so the smallest histogram
    // bucket alone estimates 100 candidates — over a budget of 50 there
    // is no degree cap that keeps anything, and degree-1 pruning would
    // return near-nothing behind a log line. The guard must throw instead.
    val cycle = (0 until 100).map(i => (s"n$i", s"n${(i + 1) % 100}"))
      .toDF("from", "to")
    val e = intercept[IllegalArgumentException] {
      GraphOps.nodeSimilarity(cycle, 0.0, maxCandidates = 50)
    }
    assert(e.getMessage.contains("maxCandidates"), e.getMessage)
    // the same graph with the probe disabled computes the exact definition
    assert(GraphOps.nodeSimilarity(cycle, 0.0, maxCandidates = 0).count() > 0)
  }

  test("sssp: a NULL weight is filtered like NULL endpoints, not an executor NPE") {
    import spark.implicits._
    val g = Seq(("a", "b", java.lang.Long.valueOf(10L)),
      ("a", "c", null.asInstanceOf[java.lang.Long]),
      ("c", "b", java.lang.Long.valueOf(1L)))
      .toDF("from", "to", "weight")
    // the null-weight edge a-c is dropped: c is only reachable through b
    val got = GraphOps.sssp(g, Seq("a")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 0L, "b" -> 10L, "c" -> 11L))
  }

  test("clusteringCoefficient: K4 scores 1, star hub 0, pendant NULL; multigraph collapses") {
    def r(es: Seq[(String, String)]): Map[String, (Long, Long, Option[Double])] =
      GraphOps.clusteringCoefficient(es.toDF("from", "to")).collect().map { row =>
        row.getString(0) -> ((row.getLong(1), row.getLong(2),
          if (row.isNullAt(3)) None else Some(row.getDouble(3))))
      }.toMap
    // K4: every node deg 3, 3 triangles each, lcc = 3/(3·2/2) = 1
    val k4 = r(Seq(("a","b"),("a","c"),("a","d"),("b","c"),("b","d"),("c","d")))
    assert(k4.values.forall(_ == ((3L, 3L, Some(1.0)))))
    // triangle abc + pendant d on a: a deg 3 closes 1 of 3 wedges → 1/3;
    // b,c stay fully closed; d deg 1 → NULL
    val g = r(Seq(("a","b"),("a","c"),("b","c"),("a","d")))
    assert(g("a") === ((3L, 1L, Some(0.333333))))
    assert(g("b") === ((2L, 1L, Some(1.0))))
    assert(g("d") === ((1L, 0L, None)))
    // star: hub has every wedge open → 0.0, leaves NULL
    val s = r(Seq(("hub","l1"),("hub","l2"),("hub","l3")))
    assert(s("hub") === ((3L, 0L, Some(0.0))))
    assert(s("l1") === ((1L, 0L, None)))
    // duplicate/reversed edges and self-loops collapse to the simple graph
    val m = r(Seq(("a","b"),("b","a"),("a","a"),("a","b"),("a","c"),("b","c")))
    assert(m("a") === ((2L, 1L, Some(1.0))))
  }

  test("labelPropagation: planted two-clique graph, deterministic ties, reference recurrence") {
    // two disjoint K4 cliques: LPA must converge each to its smallest
    // member's label within the default 5 sweeps, never mixing them
    def clique(ns: Seq[String]) =
      for (i <- ns.indices; j <- (i + 1) until ns.size) yield (ns(i), ns(j))
    val planted = (clique(Seq("a1", "a2", "a3", "a4")) ++
      clique(Seq("b1", "b2", "b3", "b4"))).toDF("from", "to")
    val got = GraphOps.labelPropagation(planted).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(Seq("a1", "a2", "a3", "a4").forall(n => got(n) === ("a1", 4L)))
    assert(Seq("b1", "b2", "b3", "b4").forall(n => got(n) === ("b1", 4L)))

    // reference: the same synchronous recurrence as DataFrame iterations
    // (the oracle's shape), on a messier graph with reversed/duplicate
    // edges and a bridge — the Pregel path must match it exactly
    val messy = Seq(
      ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c"),
      ("c", "d"), // bridge
      ("d", "e"), ("e", "f"), ("f", "d"), ("f", "e")).toDF("from", "to")
    def reference(e: DataFrame, iters: Int): Map[String, String] = {
      val canon = e.select(least(col("from"), col("to")).as("a"),
          greatest(col("from"), col("to")).as("b"))
        .where(col("a") =!= col("b")).distinct()
      val und = canon.union(canon.select(col("b"), col("a")))
        .toDF("node", "nb")
      var lbl = und.select(col("node")).distinct()
        .select(col("node"), col("node").as("label"))
      for (_ <- 1 to iters) {
        import org.apache.spark.sql.expressions.Window
        lbl = und.join(lbl.select(col("node").as("nb"), col("label")), "nb")
          .groupBy("node", "label").agg(count(lit(1)).as("c"))
          .withColumn("rn", row_number().over(
            Window.partitionBy("node").orderBy(col("c").desc, col("label"))))
          .where(col("rn") === 1).select("node", "label")
      }
      lbl.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    }
    val want = reference(messy, 5)
    val pregel = GraphOps.labelPropagation(messy).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(pregel === want)
    // determinism: an identical rerun returns the identical assignment
    val rerun = GraphOps.labelPropagation(messy).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rerun === pregel)
  }

  test("modularity: planted two-clique bridge, hand-computed, degenerate partitions") {
    // two triangles bridged by one edge: m = 7; the planted partition has
    // e_c = 3, d_c = 7 for each side -> contribution 3/7 - (7/14)^2 each
    val bridged = Seq(
      ("n1", "n2"), ("n1", "n3"), ("n2", "n3"),
      ("n4", "n5"), ("n4", "n6"), ("n5", "n6"),
      ("n3", "n4")).toDF("from", "to")
    val mem = Seq("n1" -> "A", "n2" -> "A", "n3" -> "A",
      "n4" -> "B", "n5" -> "B", "n6" -> "B").toDF("node", "community")
    val got = GraphOps.modularity(bridged, mem).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))).toMap
    val want = BigDecimal(3.0 / 7 - 0.25).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Map("A" -> ((3L, 7L, 3L, want)), "B" -> ((3L, 7L, 3L, want))))
    // Q of the planted partition is strongly positive
    assert(got.values.map(_._4).sum > 0.35)

    // one-community partition: Q = m/m - 1 = 0 exactly
    val one = mem.select(col("node"), lit("all").as("community"))
    val qOne = GraphOps.modularity(bridged, one).collect()
    assert(qOne.length === 1 && qOne(0).getDouble(4) === 0.0)

    // singleton partition: every e_c = 0, contribution = -(d_v/2m)^2 < 0
    val singletons = mem.select(col("node"), col("node").as("community"))
    val qSing = GraphOps.modularity(bridged, singletons).collect()
    assert(qSing.length === 6)
    assert(qSing.forall(r => r.getLong(3) === 0L && r.getDouble(4) < 0.0))

    // duplicate/reversed edges and self-loops collapse to the simple graph
    val messy = bridged.union(Seq(("n2", "n1"), ("n1", "n1"), ("n1", "n2"))
      .toDF("from", "to"))
    val gotMessy = GraphOps.modularity(messy, mem).collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(gotMessy === got.map { case (k, v) => k -> v._4 })
  }

  test("modularity: random graphs and partitions match a driver-side reference") {
    val rnd = new scala.util.Random(17)
    for (_ <- 1 to 5) {
      val nV = 8 + rnd.nextInt(8)
      val raw = Seq.fill(30)((s"n${rnd.nextInt(nV)}", s"n${rnd.nextInt(nV)}"))
      val canon = raw.filter(e => e._1 != e._2)
        .map(e => if (e._1 < e._2) e else e.swap).distinct
      val nodes = canon.flatMap(e => Seq(e._1, e._2)).distinct
      val mem = nodes.map(n => (n, s"c${rnd.nextInt(3)}"))
      val cm = mem.toMap
      val m = canon.size.toDouble
      val deg = canon.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val want = mem.groupBy(_._2).map { case (c, ns) =>
        val dC = ns.map(n => deg(n._1)).sum
        val eC = canon.count(e => cm(e._1) == c && cm(e._2) == c).toLong
        val contrib = BigDecimal(eC / m - (dC / (2 * m)) * (dC / (2 * m)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        c -> ((ns.size.toLong, dC, eC, contrib))
      }
      val got = GraphOps.modularity(raw.toDF("from", "to"),
          mem.toDF("node", "community")).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))).toMap
      assert(got === want)
    }
  }

  test("assortativity: hand-computed mixed graph, -1 on a star, NULL on a regular graph") {
    def r(es: Seq[(String, String)]): (Long, Option[Double]) = {
      val row = GraphOps.assortativity(es.toDF("from", "to")).head()
      (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getDouble(1)))
    }
    // triangle abc + pendant d on a: degrees a=3 b=2 c=2 d=1.
    // moments over both orientations: M=8, Σx=18, Σx²=44, Σxy=38
    // → r = (38/8 − (18/8)²) / (44/8 − (18/8)²) = −0.3125/0.4375 = −5/7
    assert(r(Seq(("a","b"), ("a","c"), ("b","c"), ("a","d")))
      === ((4L, Some(-0.714286))))
    // star: the canonical perfectly disassortative graph — exactly −1
    assert(r(Seq(("hub","l1"), ("hub","l2"), ("hub","l3")))
      === ((3L, Some(-1.0))))
    // regular graph (triangle): zero degree variance → undefined, NULL
    // not NaN/inf (the guard both engines share)
    assert(r(Seq(("a","b"), ("b","c"), ("c","a"))) === ((3L, None)))
    // duplicate/reversed edges and self-loops collapse before counting
    assert(r(Seq(("a","b"), ("b","a"), ("a","b"), ("a","a"), ("a","c"), ("b","c")))
      === ((3L, None)))
  }

  test("stronglyConnected: cycles collapse to min label, DAG stays singletons, direction matters") {
    // cycle {b,c,d}, tail a -> b (a reaches the cycle, cycle can't reach
    // back), island 2-cycle {x,y}, pure-DAG edge p -> q
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"),
      ("x", "y"), ("y", "x"), ("p", "q")).toDF("from", "to")
    val got = GraphOps.stronglyConnected(g).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(got === Map(
      "a" -> (("a", 1L)), "b" -> (("b", 3L)), "c" -> (("b", 3L)), "d" -> (("b", 3L)),
      "x" -> (("x", 2L)), "y" -> (("x", 2L)), "p" -> (("p", 1L)), "q" -> (("q", 1L))))
    // the same graph UNDIRECTED is two big weak components — the weak-CC
    // op cannot see any of this structure
    val weak = GraphOps.components(g).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(weak("a") === "a" && weak("d") === "a" && weak("q") === "p")
  }

  test("stronglyConnected: an unconverged iteration cap refuses by default, opt-out returns truncated labels") {
    // a condensation CHAIN of 2-cycles: a <-> a2 -> b <-> b2 -> c <-> c2;
    // GraphX peels one condensation level per outer round, so a too-small
    // cap leaves downstream cycles unfinalised
    val g = Seq(("a", "a2"), ("a2", "a"), ("a2", "b"), ("b", "b2"), ("b2", "b"),
      ("b2", "c"), ("c", "c2"), ("c2", "c")).toDF("from", "to")
    val ok = GraphOps.stronglyConnected(g).collect()
      .map(r => r.getString(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(ok === Map(
      "a" -> (("a", 2L)), "a2" -> (("a", 2L)), "b" -> (("b", 2L)),
      "b2" -> (("b", 2L)), "c" -> (("c", 2L)), "c2" -> (("c", 2L))))
    val e = intercept[IllegalStateException] {
      GraphOps.stronglyConnected(g, numIter = 1).collect()
    }
    assert(e.getMessage.contains("numIter=1"))
    // priced opt-out: the truncated labelling comes back without error
    assert(GraphOps.stronglyConnected(g, numIter = 1, requireConverged = false)
      .count() === 6)
  }

  test("condensation: cycles contract, multiplicity kept, the quotient is a DAG") {
    // 2-cycle {a,a2} feeding b twice (multiplicity), b -> c -> b cycle
    // {b,c}, plus a singleton tail c -> d
    val g = Seq(("a", "a2"), ("a2", "a"), ("a", "b"), ("a2", "b"),
      ("b", "c"), ("c", "b"), ("c", "d")).toDF("from", "to")
    val got = GraphOps.condensation(g).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // {a,a2} -> {b,c} with multiplicity 2; {b,c} -> d once; nothing else
    assert(got === Map(("a", "b") -> 2L, ("b", "d") -> 1L))
    // quotient is a DAG: no pair appears in both directions
    assert(got.keys.forall { case (s, d) => !got.contains((d, s)) })
    // truncated labelling refusal is inherited from stronglyConnected
    val chain = Seq(("a", "a2"), ("a2", "a"), ("a2", "b"), ("b", "b2"),
      ("b2", "b"), ("b2", "c"), ("c", "c2"), ("c2", "c")).toDF("from", "to")
    assertThrows[IllegalStateException] {
      GraphOps.condensation(chain, numIter = 1).collect()
    }
  }

  test("reciprocity: per-type same-type reverse ratio, dedup/self-loop rules, dyadic half boundary") {
    // type f: a<->b mutual, a->c one-way, a->a self-loop (dropped),
    // duplicate a->b (collapses) => n=3, recip=2 (both mutual directions)
    // type g: only a->b, but g's reverse exists in f — must NOT count
    val fg = Seq(
      ("f", "a", "b"), ("f", "b", "a"), ("f", "a", "c"),
      ("f", "a", "a"), ("f", "a", "b"),
      ("g", "b", "a"))
    // type h: an inexact-ratio sanity row (2/129)
    val h = (0 until 128).map(i => ("h", s"n$i", s"m$i")) :+ (("h", "m0", "n0"))
    val got = GraphOps.reciprocity((fg ++ h).toDF("etype", "src", "dst"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got("f") === ((3L, 2L, 0.666667)))
    assert(got("g") === ((1L, 0L, 0.0)))
    assert(got("h") === ((129L, 2L, math.floor(2.0 / 129 * 1e6 + 0.5) / 1e6)))
    // the DYADIC half boundary: 2/256 = 1/128, so ratio·1e6 = 7812.5
    // parks exactly ON the boundary — floor(v·1e6+0.5) must give
    // 0.007813 in any engine (a round-half-even engine would say
    // 0.007812 — the r16 tie-rounding class this quantizer exists for)
    val h2 = (0 until 255).map(i => ("h2", s"n$i", s"m$i")) :+ (("h2", "m0", "n0"))
    val b = GraphOps.reciprocity(h2.toDF("etype", "src", "dst"))
      .collect()(0)
    assert(b.getLong(1) === 256L && b.getLong(2) === 2L)
    assert(b.getDouble(3) === 0.007813, "half-boundary quantization")
  }

  test("topoLevels: longest-path layering on a diamond+chain, flags, cycle refusal") {
    // diamond a->{b,c}->d plus a long tail d->e->f: longest path wins
    // (b and c both level 1, d level 2 even though a->d would allow 1)
    val g = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"),
      ("d", "e"), ("e", "f")).toDF("src", "dst")
    val got = GraphOps.topoLevels(g).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(got === Map(
      "a" -> ((0L, true, false)), "b" -> ((1L, false, false)),
      "c" -> ((1L, false, false)), "d" -> ((2L, false, false)),
      "e" -> ((3L, false, false)), "f" -> ((4L, false, true))))
    // every edge goes strictly up a level — the topological-order witness
    val lev = got.map { case (n, (l, _, _)) => n -> l }
    Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"),
      ("d", "e"), ("e", "f")).foreach { case (s, d) =>
      assert(lev(s) < lev(d), s"$s->$d") }
    // cyclic input refuses loudly instead of returning a truncated layering
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    assertThrows[IllegalStateException] { GraphOps.topoLevels(cyc).collect() }
    // a too-small cap on a deep DAG also refuses (depth 4 needs 5 rounds)
    assertThrows[IllegalStateException] {
      GraphOps.topoLevels(g, maxIter = 2).collect()
    }
  }

  test("dagPathCounts: diamond multiplicity, two-source merge, cycle refusal") {
    // a->{b,c}->d->e plus a direct a->d: paths to d = via b + via c +
    // direct = 3; second source x->e adds an independent chain
    val g = Seq(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "d"),
      ("d", "e"), ("x", "e")).toDF("src", "dst")
    val got = GraphOps.dagPathCounts(g).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 3L,
      "e" -> 4L, "x" -> 1L))
    // a cycle REACHABLE from a source diverges -> cap refusal
    val reach = Seq(("s", "a"), ("a", "b"), ("b", "a")).toDF("src", "dst")
    assertThrows[IllegalStateException] { GraphOps.dagPathCounts(reach).collect() }
    // a SOURCE-LESS cycle converges at the all-zero fixpoint — the
    // zero-count proof check must refuse it, not return meaningless 0s
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    assertThrows[IllegalStateException] { GraphOps.dagPathCounts(cyc).collect() }
  }

  test("anf: exact closure counts on a path+island, sketch saturates with the diameter, layout-invariant") {
    // path a->b->c->d plus island x->y: balls grow for 3 rounds then stop
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("from", "to")
    val out = GraphOps.anf(g, maxK = 4, withExact = true).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // exact: N(0)=6 selves; N(1)=+4 edges; N(2)=+2 (a->c, b->d); N(3)=+1 (a->d)
    assert(out.map { case (k, (_, ex)) => k -> ex } ===
      Map(0 -> 6L, 1 -> 10L, 2 -> 12L, 3 -> 13L, 4 -> 13L))
    // the sketch tracks: positive, monotone, and FLAT once the true
    // closure saturates (k=4 == k=3 bit-exactly — the diameter signal)
    val ests = (0 to 4).map(k => out(k)._1)
    assert(ests.forall(_ > 0))
    assert(ests.sliding(2).forall { case Seq(p, n) => n >= p })
    assert(out(4)._1 === out(3)._1)
    // tiny balls in 64 registers: the small-range estimate is near-exact
    (0 to 4).foreach { k =>
      assert(math.abs(out(k)._1 - out(k)._2) / out(k)._2 < 0.25,
        s"k=$k est ${out(k)._1} vs exact ${out(k)._2}") }
    // register arithmetic is exact integers: layout cannot move anything
    val again = GraphOps.anf(g.repartition(5), maxK = 4, withExact = true).collect()
      .map(r => r.getInt(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(again === out)
  }

  test("anf: sketch-only default drops the exact closure — same sketch, no pairs relation in the plan") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")).toDF("from", "to")
    val full = GraphOps.anf(g, maxK = 4, withExact = true).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val lean = GraphOps.anf(g, maxK = 4)
    // schema: the exact_reach column is gone entirely
    assert(lean.columns.toSeq === Seq("k", "est_reach"))
    // est_reach is bit-identical with the flag off — the sketch path is
    // untouched by dropping the closure
    val leanRows = lean.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(leanRows === full)
    // plan assert: the flag-off plan has NO join and NO distinct — the
    // |V|²-class pairs relation is not merely unused, it is never built
    // (regs iterations are behind localCheckpoint, so any Join or
    // Deduplicate in the final plan could only come from the pairs twin)
    val plan = lean.queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join"), s"flag-off plan must not join:\n$plan")
    assert(!plan.contains("Deduplicate"), s"flag-off plan must not distinct:\n$plan")
  }

  test("personalizedPageRank: hand recurrence, unreachable scores 0, seed-set scaling, refusal") {
    // s1 -> m -> t, s2 -> m; island x -> y unreachable from the seeds
    val g = Seq(("s1", "m"), ("s2", "m"), ("m", "t"), ("x", "y")).toDF("from", "to")
    val seeds = Seq("s1", "s2").toDF("node")
    val got = GraphOps.personalizedPageRank(g, seeds, damping = 0.85, iterations = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

    // hand recurrence: s = 0.5 on each seed; seeds never gain (no
    // in-edges) so rank(seed) converges to 0.15*0.5 after one step
    var r = Map("s1" -> 0.5, "s2" -> 0.5, "m" -> 0.0, "t" -> 0.0,
      "x" -> 0.0, "y" -> 0.0)
    val outdeg = Map("s1" -> 1, "s2" -> 1, "m" -> 1, "x" -> 1)
    val edgeList = Seq(("s1", "m"), ("s2", "m"), ("m", "t"), ("x", "y"))
    val seedMass = Map("s1" -> 0.5, "s2" -> 0.5).withDefaultValue(0.0)
    for (_ <- 1 to 10) {
      val in = edgeList.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / outdeg(src) }.sum }
      r = r.keys.map(v => v -> (0.15 * seedMass(v) + 0.85 * in.getOrElse(v, 0.0))).toMap
    }
    r.foreach { case (v, expect) =>
      assert(math.abs(got(v) - expect) < 1e-9, s"node $v: got ${got(v)} want $expect") }
    // restart confines the walk: the island off the seeds scores exactly 0
    assert(got("x") === 0.0 && got("y") === 0.0)
    // seeds that match no graph node refuse loudly, never an all-zero walk
    val err = intercept[IllegalArgumentException] {
      GraphOps.personalizedPageRank(g, Seq("nope").toDF("node")).collect()
    }
    assert(err.getMessage.contains("no seed matches"))
  }

  test("motifPaths: typed hops, distractor types skipped, cycles cut, min sample path") {
    // ensembl-shaped fixture: gene -in_pathway-> pathway -affects-> trait
    val edges = Seq(
      ("g1", "pw1", "in_pathway"),
      ("g1", "pw2", "in_pathway"),
      ("g2", "pw1", "in_pathway"),
      ("pw1", "t1", "affects"),
      ("pw2", "t1", "affects"),
      // distractor TYPE from a start node: must not traverse hop 1
      ("g1", "pw3", "mentions"),
      ("pw3", "t9", "affects"),
      // back-edge to the start: the simple-path guard cuts g1->pw1->g1
      ("pw1", "g1", "affects")
    ).toDF("src", "dst", "etype")
    val starts = Seq("g1", "g2").toDF("node")
    val got = GraphOps.motifPaths(edges, starts, Seq("in_pathway", "affects"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(got === Set(
      // two distinct simple paths collapse to one row; sample = lexic. min
      ("g1", "t1", 2L, "g1->pw1->t1"),
      // g1 on g2's path is allowed (not a revisit within THAT path)
      ("g2", "g1", 1L, "g2->pw1->g1"),
      ("g2", "t1", 1L, "g2->pw1->t1")))
  }

  test("motifPathsRep: star hop matches every depth 0..k, cycle cut holds, distractor excluded") {
    // gene -(is_a*0..2)-> family -(part_of)-> pathway, with an is_a
    // back-edge (cycle) and a distractor type sharing the is_a endpoints
    val edges = Seq(
      ("g", "f1", "is_a"), ("f1", "f2", "is_a"),
      ("f1", "g", "is_a"),            // cycle back to the start
      ("f2", "p", "part_of"),
      ("g", "q", "part_of"),          // matched only by the 0-rep depth
      ("g", "fX", "rel"), ("fX", "p", "part_of") // distractor type
    ).toDF("src", "dst", "etype")
    val starts = Seq("g").toDF("node")
    def run(lo: Int): Set[(String, String, Long, String)] =
      GraphOps.motifPathsRep(edges, starts, Seq(("is_a", lo, 2), ("part_of", 1, 1)))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    // 0-rep: g itself takes part_of (g->q); 2-rep reaches p through f2;
    // the is_a cycle g->f1->g is cut; the rel distractor never expands
    // (n_paths to p would be 2 if typing leaked)
    assert(run(0) === Set(
      ("g", "q", 1L, "g->q"),
      ("g", "p", 1L, "g->f1->f2->p")))
    // raising minRep to 1 removes exactly the 0-rep match
    assert(run(1) === Set(("g", "p", 1L, "g->f1->f2->p")))
    // degenerate spec (0,0) on every hop: a hop can be skipped entirely
    val skip = GraphOps.motifPathsRep(edges, starts,
      Seq(("is_a", 0, 0), ("part_of", 1, 1))).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(skip === Set(("g", "q", 1L)))
  }

  test("randomWalks: edge-valid, sink-stopping, deterministic, and the pick rule is the documented hash") {
    // a has two out-neighbors (ranks: b=0, c=1); b chains to d; d is a sink
    val walkEdges = Seq(
      ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("a", "b") // dup edge: SET semantics
    ).toDF("from", "to")
    val out = GraphOps.randomWalks(walkEdges, walksPerNode = 2,
      walkLength = 3, seed = 17L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val edgeSet = Set(("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"))
    val byWalk = out.groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.sortBy(_._3).map(_._4).toSeq }
    // every node starts exactly walksPerNode walks, each beginning at itself
    assert(byWalk.keySet === Set("a", "b", "c", "d").flatMap(n => Set((n, 0), (n, 1))))
    byWalk.foreach { case ((s, _), path) => assert(path.head === s) }
    // consecutive hops are real edges; steps are contiguous from 0
    byWalk.foreach { case (k, path) =>
      path.sliding(2).filter(_.size == 2).foreach { p =>
        assert(edgeSet.contains((p(0), p(1))), s"$k walked a non-edge $p") }
    }
    // the sink stops immediately; full-length walks from a end at the sink
    assert(byWalk(("d", 0)) === Seq("d") && byWalk(("d", 1)) === Seq("d"))
    // a → {b|c} → d, then the sink truncates: 3 positions, not walkLength+1
    assert(byWalk(("a", 0)).length === 3 && byWalk(("a", 0)).last === "d")
    // the choice at (walk w, step s, node v) is EXACTLY the documented
    // hash — replay step 1 from "a" by hand for both walks
    import graft.functions.{SimHash64, SrpCodes}
    import org.apache.spark.unsafe.types.UTF8String
    val GOLD = 0x9E3779B97F4A7C15L
    def pick(v: String, w: Long, s: Int, outdeg: Long): Long = {
      val walkSalt = SrpCodes.mix64((17L + s.toLong * GOLD) ^ w)
      (SrpCodes.mix64(SimHash64.hash64(UTF8String.fromString(v)) ^ walkSalt)
        >>> 1) % outdeg
    }
    val ranked = Map(0L -> "b", 1L -> "c") // a's neighbors sorted by key
    assert(byWalk(("a", 0))(1) === ranked(pick("a", 0L, 1, 2L)))
    assert(byWalk(("a", 1))(1) === ranked(pick("a", 1L, 1, 2L)))
    // determinism: a second evaluation reproduces the corpus bit-for-bit
    val again = GraphOps.randomWalks(walkEdges, walksPerNode = 2,
      walkLength = 3, seed = 17L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(again.toSeq === out.toSeq)
    // a different seed moves at least one choice somewhere in the corpus
    val reseeded = GraphOps.randomWalks(walkEdges, walksPerNode = 2,
      walkLength = 3, seed = 18L).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(reseeded.toSeq !== out.toSeq)
  }

  test("resourceAllocation: exact hub-discounted weights; hubs priced out as connectors, kept as members") {
    val raEdges = Seq(
      ("z1", "a"), ("z1", "b"),                         // deg z1 = 2 -> w 5e11
      ("z2", "a"), ("z2", "b"), ("z2", "c"),            // deg z2 = 3 -> w ~3.33e11
      ("h", "a"), ("h", "b"), ("h", "c"), ("h", "d")    // deg h = 4 > cap: no connector role
    ).toDF("from", "to")
    val got = GraphOps.resourceAllocation(raEdges, maxHubDegree = 3, topK = 20)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val w2 = 500000000000L  // floor(1e12/2)
    val w3 = 333333333333L  // floor(1e12/3)
    assert(got === Map(
      // h never connects anyone (degree above cap), but IS ranked as a member
      ("h", "z2") -> ((3L, w3 + w3 + w2)), // via a, b (deg 3) and c (deg 2)
      ("a", "b")  -> ((2L, w2 + w3)),      // via z1 (deg 2) and z2 (deg 3)
      ("h", "z1") -> ((2L, w3 + w3)),      // via a, b
      ("z1", "z2") -> ((2L, w3 + w3)),
      ("a", "c") -> ((1L, w3)), ("b", "c") -> ((1L, w3))))
    // determinism: the exact-integer scores cannot move across layouts
    val again = GraphOps.resourceAllocation(raEdges.repartition(7),
      maxHubDegree = 3, topK = 20).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(3)))
    assert(again.sorted.toSeq === got.toSeq.map(kv => (kv._1._1, kv._1._2, kv._2._2)).sorted)
  }

  test("biasedWalks: the p/q classification weights the draw exactly; zero weights truncate") {
    import graft.functions.{SimHash64, SrpCodes}
    import org.apache.spark.unsafe.types.UTF8String
    val GOLD = 0x9E3779B97F4A7C15L
    def draw(v: String, w: Long, s: Int): Long = {
      val walkSalt = SrpCodes.mix64((17L + s.toLong * GOLD) ^ w)
      SrpCodes.mix64(SimHash64.hash64(UTF8String.fromString(v)) ^ walkSalt) >>> 1
    }
    // from b with prev=a: a is RETURN (w 1), c is COMMON (a->c exists,
    // w 4), d is FAR (w 16) — ranks a(0), c(1), d(2), cum [1, 5, 21]
    val edges = Seq(("a", "b"), ("a", "c"),
      ("b", "a"), ("b", "c"), ("b", "d")).toDF("from", "to")
    val out = GraphOps.biasedWalks(edges, walksPerNode = 2, walkLength = 2,
        seed = 17L, wReturn = 1, wCommon = 4, wFar = 16)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val byWalk = out.groupBy(t => (t._1, t._2))
      .map { case (k, rows) => k -> rows.sortBy(_._3).map(_._4).toSeq }
    (0 to 1).foreach { w =>
      // step 1 from a: uniform over {b, c} (ranks 0, 1)
      val s1 = Seq("b", "c")((draw("a", w, 1) % 2).toInt)
      assert(byWalk(("a", w))(1) === s1, s"walk $w step 1")
      if (s1 == "b") {
        // step 2 from b with prev=a: pick by cumulative range [1, 5, 21]
        val r = draw("b", w, 2) % 21
        val exp = if (r < 1) "a" else if (r < 5) "c" else "d"
        assert(byWalk(("a", w))(2) === exp, s"walk $w step 2 (r=$r)")
      }
    }
    // every hop is a real edge
    val edgeSet = Set(("a", "b"), ("a", "c"), ("b", "a"), ("b", "c"), ("b", "d"))
    byWalk.foreach { case (k, path) =>
      path.sliding(2).filter(_.size == 2).foreach(p =>
        assert(edgeSet.contains((p(0), p(1))), s"$k walked a non-edge $p"))
    }
    // wReturn = 0 on a pure 2-cycle: the only continuation is the return,
    // weight 0 filters it, the walk truncates instead of dividing by zero
    val cyc = Seq(("a", "b"), ("b", "a")).toDF("from", "to")
    val t = GraphOps.biasedWalks(cyc, walksPerNode = 1, walkLength = 3,
        seed = 17L, wReturn = 0, wCommon = 4, wFar = 16)
      .collect().map(r => (r.getString(0), r.getInt(2)))
    assert(t.count(_._1 == "a") === 2, "a-walk must truncate after one hop")
    assert(t.count(_._1 == "b") === 2, "b-walk must truncate after one hop")
  }

  test("kg_skipgram equals the window-2 pairing recomputed from the walk corpus") {
    val dir = "/root/testdata/sf0.001"
    val walks = graft.queries.GraphEtl.kgWalks(spark, dir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getString(3)))
    // recompute the skip-gram pairs by hand from the walk rows
    val expected = walks.groupBy(t => (t._1, t._2)).values.flatMap { rows =>
      val path = rows.sortBy(_._3).map(_._4).toSeq
      for {
        i <- path.indices; j <- (i + 1) until math.min(i + 3, path.length)
        if path(i) != path(j)
      } yield (Seq(path(i), path(j)).min, Seq(path(i), path(j)).max)
    }.groupBy(identity).map { case (p, occ) => (p._1, p._2, occ.size.toLong) }.toSet
    val got = graft.queries.GraphEtl.kgSkipgram(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === expected)
    assert(got.nonEmpty, "the sf0.001 walk corpus must produce co-occurrences")
  }

  test("metaPathCensus: hub degrees multiply, typing separates, walks counted, NULLs drop") {
    val edges = Seq(
      // hub M:1 — 2 in-edges of type e1, 3 out-edges of type e2:
      // the census must report 2·3 = 6 instances via ONE multiplication
      ("e1", "A:1", "M:1"), ("e1", "A:2", "M:1"),
      ("e2", "M:1", "B:1"), ("e2", "M:1", "B:2"), ("e2", "M:1", "B:3"),
      // a second typed composition through a different mid
      ("e1", "A:3", "M:2"), ("e3", "M:2", "C:1"),
      // a mutual pair — the backtracking WALK X→Y→X counts (documented)
      ("t", "X:1", "Y:1"), ("t", "Y:1", "X:1"),
      // NULL type / endpoint rows drop at the door
      (null, "A:4", "M:1"), ("e1", null, "M:1"))
    val got = GraphOps.metaPathCensus(edges.toDF("etype", "src", "dst"),
        c => substring_index(c, ":", 1)).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3), r.getString(4)) -> ((r.getLong(5), r.getLong(6))))
      .toMap
    assert(got(("A", "e1", "M", "e2", "B")) === ((6L, 1L)))
    assert(got(("A", "e1", "M", "e3", "C")) === ((1L, 1L)))
    // the mutual pair composes both ways: X→Y→X and Y→X→Y
    assert(got(("X", "t", "Y", "t", "X")) === ((1L, 1L)))
    assert(got(("Y", "t", "X", "t", "Y")) === ((1L, 1L)))
    // nothing else: the e1 edges into M:1 do NOT compose with e3 (wrong mid)
    assert(got.size === 4)
  }

  test("localBridges: triangle edges supported, pendant and isolated edges flagged") {
    // triangle a-b-c, pendant c-d, isolated component e-f
    val df = Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("e", "f"),
      ("b", "a"), ("c", "c")) // reverse dup + self-loop must canonicalise away
      .toDF("from", "to")
    val got = GraphOps.localBridges(df).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got(("a", "b")) === ((2L, 2L, 1L, false))) // common neighbour c
    assert(got(("a", "c")) === ((2L, 3L, 1L, false)))
    assert(got(("b", "c")) === ((2L, 3L, 1L, false)))
    assert(got(("c", "d")) === ((3L, 1L, 0L, true)))  // the weak tie
    assert(got(("e", "f")) === ((1L, 1L, 0L, true)))
    assert(got.size === 5)
  }

  test("richClub: thresholds share one edge pass, canonicalisation, NULL below 2 nodes") {
    // hub layer: h1–h2–h3 triangle + h4 wired only to leaves
    // degrees: h1 = 2+7 = 9, h2 = 2+3 = 5, h3 = 2+2 = 4, h4 = 5, leaves 1
    val hubs = Seq(("h1", "h2"), ("h1", "h3"), ("h2", "h3"))
    val leaves =
      (1 to 7).map(i => ("h1", s"a$i")) ++ (1 to 3).map(i => ("h2", s"b$i")) ++
      (1 to 2).map(i => ("h3", s"c$i")) ++ (1 to 5).map(i => ("h4", s"d$i"))
    // duplicate, reversed, and self-loop edges must all collapse/drop
    val noise = Seq(("h1", "h2"), ("h2", "h1"), ("h1", "h1"))
    val df = (hubs ++ leaves ++ noise).toDF("from", "to")
    val got = GraphOps.richClub(df, Seq(1, 4, 8)).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else java.lang.Double.valueOf(r.getDouble(3)))))
      .toMap
    // k=1: club {h1,h2,h3,h4}, intra edges = the triangle
    assert(got(1) === ((4L, 3L, java.lang.Double.valueOf(0.5))))
    // k=4: {h1,h2,h4} — h3 (deg 4) falls out; only h1–h2 survives
    assert(got(4) === ((3L, 1L, java.lang.Double.valueOf(
      math.floor(2.0 / 6 * 1e6 + 0.5) / 1e6))))
    // k=8: {h1} alone — phi undefined, NULL not a division error
    assert(got(8) === ((1L, 0L, null)))
  }

  test("Scc.run labels equal GraphX stronglyConnectedComponents, converged iff work graph drained") {
    // the r17 single-run convergence port: same colorize-and-peel
    // algorithm, plus a reported converged flag replacing the old
    // run-twice-at-numIter+1-and-diff proof. Pin label equality against
    // the library implementation on a structured mix (cycle + tail +
    // island 2-cycle + DAG edge, and the chain-of-2-cycles that peels one
    // condensation level per round), at both a converging and a
    // truncating cap.
    import org.apache.spark.graphx.{Edge, Graph => XGraph}
    def xg(edges: Seq[(Long, Long)]) = XGraph.fromEdges(
      spark.sparkContext.parallelize(edges.map { case (a, b) => Edge(a, b, ()) }), ())
    val mixed = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 4L -> 2L,
      7L -> 8L, 8L -> 7L, 5L -> 6L)
    val chain = Seq(1L -> 2L, 2L -> 1L, 2L -> 3L, 3L -> 4L, 4L -> 3L,
      4L -> 5L, 5L -> 6L, 6L -> 5L)
    for ((edges, numIter) <- Seq((mixed, 10), (chain, 10), (chain, 1))) {
      val (got, converged) = graft.ops.graph.Scc.run(xg(edges), numIter)
      val want = xg(edges).stronglyConnectedComponents(numIter)
        .vertices.collect().toMap
      assert(got.vertices.collect().toMap === want,
        s"labels diverge from GraphX at numIter=$numIter")
      // converged exactly when the cap sufficed: 10 rounds drain both
      // graphs, 1 round leaves the chain's cycles unfinalised
      assert(converged === (numIter == 10))
    }
  }
}
