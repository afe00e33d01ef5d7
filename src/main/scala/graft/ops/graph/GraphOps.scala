package graft.ops.graph

import org.apache.spark.graphx.{Edge, Graph => XGraph}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Graph

/** GraphX-backed graph processing over graft's triple/PG data and dedup
  * output (reference context: the KG built by the ETL ends up in a graph
  * database; bulk graph analytics on the way there run on GraphX's
  * Pregel-style distributed engine, not on the DB).
  */
object GraphOps {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Connected components of an undirected pair graph (e.g. near-duplicate
    * pairs from graft.ops.dedup): every member is assigned the minimum id
    * of its component — the canonical-representative step that turns
    * pairwise dedup output into dedup *clusters*.
    *
    * GraphX connectedComponents is an iterative Pregel computation —
    * label propagation over partitioned edge/vertex RDDs, linear per
    * iteration, no driver-side graph.
    */
  def connectedComponents(pairs: DataFrame, aCol: String = "a", bCol: String = "b"): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val edges = pairs.select(col(aCol).cast("long"), col(bCol).cast("long"))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
    val graph = XGraph.fromEdges(edges, defaultValue = ())
    graph.connectedComponents().vertices
      .toDF("id", "component")
      .orderBy("id")
  }

  /** Dense, collision-free GraphX vertex ids for string node keys: distinct
    * endpoints sorted and zipped with their index. Deterministic —
    * re-evaluating the plan reproduces the identical assignment, so the
    * edge-mapping branch and the result join-back always agree — and free
    * of the birthday hazard `xxhash64(node)` has at 10^9+ nodes (64-bit
    * hashed ids silently merge distinct nodes on collision). The sort is a
    * range-partitioned shuffle: fully parallel, no driver materialisation.
    */
  def nodeIndex(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    e.select(col("from").as("node")).union(e.select(col("to")))
      .distinct()
      .as[String].rdd.sortBy(identity).zipWithIndex()
      .toDF("node", "vid")
  }

  private def endpoints(pgEdges: DataFrame): DataFrame =
    pgEdges.select(col("from"), col("to"))
      .where(col("from").isNotNull && col("to").isNotNull)

  private def mapEdges(e: DataFrame, idx: DataFrame) = {
    val spark = e.sparkSession
    import spark.implicits._
    e.join(idx.select(col("node").as("from"), col("vid").as("fvid")), "from")
      .join(idx.select(col("node").as("to"), col("vid").as("tvid")), "to")
      .select(col("fvid"), col("tvid"))
      .as[(Long, Long)].rdd.map { case (a, b) => Edge(a, b, ()) }
  }

  /** Connected components of a PG edge set with STRING node keys: every
    * node labelled with the lexicographically smallest node key of its
    * component, plus the component size. The KG hygiene primitive —
    * disconnected islands reveal broken cross-references before the graph
    * ships to the database, and the component label is the natural
    * partition key for downstream per-subgraph processing.
    *
    * GraphX connectedComponents propagates the minimum VERTEX ID by
    * Pregel (label propagation, linear per superstep); because
    * [[nodeIndex]] assigns vids in sorted node order, the minimum vid IS
    * the lexicographically minimum node key — the relabel join is exact,
    * not a convention. Size attaches via one keyed count join (no window
    * over the full node set).
    */
  def components(pgEdges: DataFrame): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val cc = XGraph.fromEdges(mapEdges(e, idx), ())
      .connectedComponents().vertices.toDF("vid", "cvid")
    val labelled = cc.join(idx, "vid")
      .join(idx.select(col("vid").as("cvid"), col("node").as("component")), "cvid")
      .select(col("node"), col("component"))
    val sizes = labelled.groupBy("component").agg(count(lit(1)).as("component_size"))
    labelled.join(sizes, "component")
      .select(col("node"), col("component"), col("component_size"))
      .orderBy("node")
  }

  /** Static PageRank over a PG edge set via GraphX's Pregel implementation
    * (fixed iteration count, reset 0.15). Returns (node, rank) for every
    * node appearing in an edge. The GraphOpsSpec cross-validates this
    * against an independent DataFrame power iteration.
    */
  def pageRank(pgEdges: DataFrame, iterations: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val ranks = XGraph.fromEdges(mapEdges(e, idx), ())
      .staticPageRank(iterations).vertices.toDF("vid", "rank")
    idx.join(ranks, "vid")
      .select(col("node"), col("rank"))
      .orderBy("node")
  }

  /** STRONGLY connected components of a directed PG edge set — the
    * directed complement of [[components]]: nodes in the same SCC reach
    * each other along edge DIRECTION (mutual reachability), so a DAG is
    * all singletons and every cycle collapses to one label. The KG
    * hygiene read: an ontology edge set that is SUPPOSED to be a
    * hierarchy (is-a, part-of) must have only singleton SCCs — any
    * larger one is a definitional cycle to fix before load.
    *
    * GraphX stronglyConnectedComponents is the iterative
    * colorize/prune Pregel algorithm, labelling every member with the
    * minimum vertex id of its SCC; [[nodeIndex]] assigns vids in sorted
    * node order, so as in [[components]] the label IS the
    * lexicographically smallest node key — exact, not conventional.
    * Sizes attach via one keyed count. `numIter` bounds the
    * color/propagate rounds (≥ the longest cycle's diameter; 10 covers
    * the fixture's 2-cycles with slack — callers with deep cycles raise
    * it). A bound is not a proof: by default (`requireConverged = true`)
    * the op REFUSES — with the cap named — unless the peel loop
    * finalised every vertex within the cap (the [[Scc]] runner reports
    * convergence directly; an unconverged SCC label is not an
    * approximation of anything). Callers who have priced the cap
    * themselves can opt out.
    */
  def stronglyConnected(pgEdges: DataFrame, numIter: Int = 10,
                        requireConverged: Boolean = true): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val mapped = mapEdges(e, idx)
    val (labels, converged) = Scc.run(XGraph.fromEdges(mapped, ()), numIter)
    if (requireConverged && !converged) throw new IllegalStateException(
      s"stronglyConnected: labels still moving after numIter=$numIter rounds — " +
        "raise numIter (longest cycle diameter) or pass requireConverged=false " +
        "to accept a truncated labelling")
    val scc = labels.vertices.toDF("vid", "cvid").localCheckpoint()
    val labelled = scc.join(idx, "vid")
      .join(idx.select(col("vid").as("cvid"), col("node").as("scc")), "cvid")
      .select(col("node"), col("scc"))
    val sizes = labelled.groupBy("scc").agg(count(lit(1)).as("scc_size"))
    labelled.join(sizes, "scc")
      .select(col("node"), col("scc"), col("scc_size"))
      .orderBy("node")
  }

  /** SCC condensation DAG — contract every strongly connected component
    * of [[stronglyConnected]] to one vertex and keep the cross-component
    * edges with multiplicity: the PROVABLY ACYCLIC quotient graph
    * (Tarjan's classic reduction), i.e. the dependency topology a cyclic
    * KG actually has once its definitional cycles are collapsed — the
    * structure to schedule loads/propagations over, and the direct
    * answer to "what does the graph look like ABOVE its cycles".
    * Returns (src_scc, dst_scc, n_edges) for every inter-component edge
    * group; self-loops (within-SCC edges) are contracted away by
    * definition.
    *
    * Scale: the SCC labelling plus two node-keyed equi-joins of the edge
    * set against the |V|-row label table and one keyed count — nothing
    * beyond [[stronglyConnected]]'s own shape. Convergence stance
    * inherited (refuses a truncated labelling by default).
    */
  def condensation(pgEdges: DataFrame, numIter: Int = 10,
                   requireConverged: Boolean = true): DataFrame = {
    val lab = stronglyConnected(pgEdges, numIter, requireConverged)
      .select(col("node"), col("scc"))
    endpoints(pgEdges)
      .join(lab.select(col("node").as("from"), col("scc").as("src_scc")), "from")
      .join(lab.select(col("node").as("to"), col("scc").as("dst_scc")), "to")
      .where(col("src_scc") =!= col("dst_scc"))
      .groupBy("src_scc", "dst_scc").agg(count(lit(1)).as("n_edges"))
      .orderBy("src_scc", "dst_scc")
  }

  /** Per-type edge reciprocity (Newman) of a typed directed edge set:
    * for each relation type, how many distinct (src, dst) edges have
    * their reverse (dst, src) present IN THE SAME TYPE, and the ratio —
    * the "is this relation symmetric in practice" read that decides
    * whether a KG relation should be loaded as directed or undirected
    * (a declared-asymmetric type with high reciprocity, or a
    * declared-symmetric one with low, is a mapping bug surfaced before
    * load). Multi-edges collapse (reciprocity is about the relation,
    * not multiplicity); self-loops are excluded (trivially their own
    * reverse); each direction of a mutual pair counts once, the Newman
    * convention. The ratio is an exact integer ratio quantized by
    * floor(v·1e6+0.5) — deterministic cross-engine even when the ratio
    * is dyadic and parks ON the half boundary (1/128 → 0.007813).
    *
    * Scale: one distinct + one self left-semi join on the SAME
    * (type, src, dst) key shape — co-partitioned, no second shuffle —
    * and two keyed counts; output is |types| rows.
    */
  def reciprocity(edges: DataFrame, srcCol: String = "src",
                  dstCol: String = "dst", typeCol: String = "etype"): DataFrame = {
    val e = edges.select(col(typeCol).as("etype"),
        col(srcCol).as("__s"), col(dstCol).as("__d"))
      .where(col("__s").isNotNull && col("__d").isNotNull &&
        col("__s") =!= col("__d"))
      .distinct()
    val rev = e.select(col("etype"), col("__d").as("__s"), col("__s").as("__d"))
    val recip = e.join(rev, Seq("etype", "__s", "__d"), "left_semi")
    val n = e.groupBy("etype").agg(count(lit(1)).as("n_edges"))
    val m = recip.groupBy("etype").agg(count(lit(1)).as("n_recip"))
    n.join(m, Seq("etype"), "left")
      .select(col("etype"), col("n_edges"),
        coalesce(col("n_recip"), lit(0L)).as("n_recip"),
        (floor(coalesce(col("n_recip"), lit(0L)).cast("double") / col("n_edges")
          * lit(1000000) + lit(0.5)) / lit(1e6)).as("reciprocity"))
      .orderBy("etype")
  }

  /** Length-2 typed META-PATH census — for every (src_type)−[etype1]→
    * (mid_type)−[etype2]→(dst_type) schema pattern, the number of
    * 2-walk INSTANCES and of distinct middle nodes: the schema-level
    * profile (which typed hops actually compose, and how heavily) that
    * picks the motifs worth running [[motifPaths]] on and prices them
    * before any traversal — KnetMiner's semantic-motif design loop.
    * Counts are WALK counts (src = dst walks included; on typed
    * hierarchies walks and simple paths coincide because no type ladder
    * returns to its source).
    *
    * Scale: the defining trick is that a census never needs the
    * instances — #instances through mid = indeg_{t1,src_t}(mid) ×
    * outdeg_{t2,dst_t}(mid), so the op joins two per-(mid, type, type)
    * DEGREE tables (each at most edge-sized) on the mid key and sums
    * the products into a schema-sized result. A hub with 10⁶ in- and
    * 10⁶ out-edges contributes one multiplication, not 10¹² join rows —
    * the pair-enumeration formulation dies exactly there.
    */
  def metaPathCensus(edges: DataFrame, nodeType: org.apache.spark.sql.Column
      => org.apache.spark.sql.Column, srcCol: String = "src",
      dstCol: String = "dst", typeCol: String = "etype"): DataFrame = {
    // checkpointed: the in-star and out-star aggregates BOTH consume the
    // typed edge set — unstaged, each re-runs whatever union/distinct
    // chain the caller built it from (kg_meta_paths: 2 lineitem distincts
    // per side, and the identical subtrees do NOT exchange-reuse across
    // the two differently-keyed groupBys)
    val e = edges.select(col(typeCol).as("etype"),
        col(srcCol).as("__s"), col(dstCol).as("__d"))
      .where(col("etype").isNotNull && col("__s").isNotNull &&
        col("__d").isNotNull)
      .localCheckpoint()
    val din = e.groupBy(col("__d").as("mid"), col("etype").as("etype1"),
        nodeType(col("__s")).as("src_type"))
      .agg(count(lit(1)).as("n_in"))
    val dout = e.groupBy(col("__s").as("mid"), col("etype").as("etype2"),
        nodeType(col("__d")).as("dst_type"))
      .agg(count(lit(1)).as("n_out"))
    din.join(dout, "mid")
      .groupBy(col("src_type"), col("etype1"), nodeType(col("mid"))
        .as("mid_type"), col("etype2"), col("dst_type"))
      .agg(sum(col("n_in") * col("n_out")).as("n_paths"),
        count_distinct(col("mid")).as("n_mids"))
      .orderBy("src_type", "etype1", "mid_type", "etype2", "dst_type")
  }

  /** Longest-path (critical-path) topological levels of a DAG — the
    * scheduling read of [[condensation]]'s quotient graph: level(v) = 0
    * for sources, else 1 + max(level(u) : u→v), i.e. the earliest wave a
    * node can be processed in when every dependency must finish first
    * (parallel load/propagation scheduling: everything at one level runs
    * concurrently, levels run in order). Also emits is_source / is_sink
    * (no incoming / no outgoing edges).
    *
    * CYCLE SAFETY: on cyclic input the levels never stabilise, so the op
    * iterates to a fixed point under a `maxIter` cap and REFUSES if still
    * moving at the cap — feeding a non-condensed graph (or a too-deep DAG
    * with a too-small cap) fails loudly instead of returning a truncated
    * layering (the [[stronglyConnected]] convergence stance; an
    * unconverged level is not an approximation of anything).
    *
    * Scale: per round one keyed join of the edge set against the |V|-row
    * level table + one max-agg; rounds = longest path length (the
    * condensation of a real KG is shallow — its depth is the hierarchy
    * depth, not |V|); lineage localCheckpoint-flattened per round.
    */
  def topoLevels(dagEdges: DataFrame, maxIter: Int = 32): DataFrame = {
    val e = dagEdges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().localCheckpoint()
    var levels = nodes.withColumn("level", lit(0L)).localCheckpoint()
    var moving = true
    var it = 0
    while (moving && it < maxIter) {
      val incoming = e.join(levels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node")).agg(max(col("level") + 1).as("__lin"))
      // previous level rides the step row, so the fixed-point test is a
      // filter over the just-checkpointed frame rather than a second
      // full join of two |V|-row tables per round
      val step = levels.withColumnRenamed("level", "__prev")
        .join(incoming, Seq("node"), "left")
        .select(col("node"), coalesce(col("__lin"), lit(0L)).as("level"),
          col("__prev"))
        .localCheckpoint()
      moving = step.where(col("level") =!= col("__prev")).limit(1).count() > 0
      levels = step.select(col("node"), col("level"))
      it += 1
    }
    if (moving) throw new IllegalStateException(
      s"topoLevels: levels still moving after maxIter=$maxIter rounds — " +
        "the input has a cycle (condense it first) or the DAG is deeper " +
        "than the cap; raise maxIter only if acyclicity is known")
    val sinks = e.select(col("src").as("node")).distinct()
      .withColumn("__hasOut", lit(true))
    val sources = e.select(col("dst").as("node")).distinct()
      .withColumn("__hasIn", lit(true))
    levels.join(sources, Seq("node"), "left").join(sinks, Seq("node"), "left")
      .select(col("node"), col("level"),
        col("__hasIn").isNull.as("is_source"), col("__hasOut").isNull.as("is_sink"))
      .orderBy("node")
  }

  /** Source-to-node path counts of a DAG — the other classic DAG DP
    * beside [[topoLevels]]: n_paths(v) = 1 for sources, else
    * Σ over predecessors n_paths(u) — how many distinct dependency
    * chains lead to each node (levels say WHEN a node can run,
    * path counts say how much upstream multiplicity feeds it — a
    * provenance/criticality read: a node fed by one chain is fragile,
    * one fed by thousands is a hub). Iterates the recurrence to a fixed
    * point (reached at DAG depth) under the [[topoLevels]] cap-and-
    * refuse stance — cyclic input or a too-small cap fails loudly.
    * Counts grow combinatorially on wide DAGs; sums run under Spark's
    * ANSI overflow checking, so an overflowing count REFUSES rather
    * than wrapping (swap the accumulator to DECIMAL(38,0) for graphs
    * with > 2⁶³ chains — stated, not silent).
    *
    * Scale: identical shape to [[topoLevels]] — one keyed join + sum-agg
    * per round, rounds = DAG depth, lineage checkpoint-flattened.
    */
  def dagPathCounts(dagEdges: DataFrame, maxIter: Int = 32): DataFrame = {
    val e = dagEdges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().localCheckpoint()
    val isSrc = nodes.join(e.select(col("dst").as("node")).distinct(),
        Seq("node"), "left_anti")
      .withColumn("__src1", lit(1L))
    val seeded = nodes.join(isSrc, Seq("node"), "left")
      .select(col("node"), coalesce(col("__src1"), lit(0L)).as("__base"))
      .localCheckpoint()
    var cnt = seeded.select(col("node"), col("__base"),
      col("__base").as("n_paths"))
    var moving = true
    var it = 0
    while (moving && it < maxIter) {
      val in = e.join(cnt.select(col("node").as("src"), col("n_paths")), "src")
        .groupBy(col("dst").as("node")).agg(sum("n_paths").as("__in"))
      // seed base and previous count ride the step row (the topoLevels
      // stance): the fixed-point test is a filter over the checkpointed
      // frame, not a second |V|-row join per round
      val step = cnt.select(col("node"), col("__base"),
          col("n_paths").as("__prev"))
        .join(in, Seq("node"), "left")
        .select(col("node"), col("__base"),
          (col("__base") + coalesce(col("__in"), lit(0L))).as("n_paths"),
          col("__prev"))
        .localCheckpoint()
      moving = step.where(col("n_paths") =!= col("__prev")).limit(1).count() > 0
      cnt = step.select(col("node"), col("__base"), col("n_paths"))
      it += 1
    }
    if (moving) throw new IllegalStateException(
      s"dagPathCounts: counts still moving after maxIter=$maxIter rounds — " +
        "the input has a cycle (condense it first) or the DAG is deeper " +
        "than the cap; raise maxIter only if acyclicity is known")
    // on a true DAG every node descends from a source, so n_paths >= 1
    // everywhere; a zero count is PROOF of a source-less cycle (which
    // converges at the all-zero fixpoint instead of diverging) — refuse
    // rather than return a silently-meaningless 0
    if (cnt.where(col("n_paths") === 0).limit(1).count() > 0)
      throw new IllegalStateException(
        "dagPathCounts: nodes unreachable from any source — the input " +
          "contains a source-less cycle (condense it first)")
    cnt.select(col("node"), col("n_paths")).orderBy("node")
  }

  /** HyperANF neighbourhood function (Boldi, Rosa & Vigna, WWW 2011) over
    * a DIRECTED PG edge set: for k = 0..maxK, an HLL-sketched estimate of
    * N(k) = |{(v,u) : dist(v→u) ≤ k}| — the distance distribution of the
    * graph (how fast balls grow, where reachability saturates, the
    * effective-diameter curve) WITHOUT materialising any transitive
    * closure. Per node, a 64-register HLL sketch of its ≤k-ball; one
    * iteration is S_v ← S_v max-merge ⋃_{v→w} S_w — registers are the
    * [[graft.ops.stats.Stats.hllRegisters]] relational kernel (exact
    * integer max-merges, so the sketch is bit-identical in any engine),
    * per-node estimates the shared C53 formula rounded at 4 dp, and the
    * per-k total a DECIMAL-summed aggregate of those — order-free end to
    * end. `withExact = true` additionally computes the exact ≤k-ball
    * pair closure for fixture-scale validation (the C53/C92
    * exact-ride-along stance, materialised in the QUERY only); the
    * DEFAULT is sketch-only — the exact closure is |V|²-class on any
    * graph whose effective diameter ≤ maxK (precisely the graphs
    * HyperANF targets), so a 100 TB caller never pays it and the
    * flag-off output schema is (k, est_reach) with no pairs relation
    * in the plan at all.
    *
    * Scale: per iteration one keyed join (register rows keyed by edge
    * dst) + one (node, j) max-agg — register rows are Σ_v min(64,
    * |ball_v|), bounded by 64·|V| and in sparse graphs far below it;
    * lineage is localCheckpoint-flattened per round like kg_betweenness.
    * This is THE practical distance profile at 10⁹ nodes, where exact
    * closures are impossible (HyperANF's published runs: billions of
    * edges on one box).
    */
  def anf(pgEdges: DataFrame, maxK: Int = 4, withExact: Boolean = false): DataFrame = {
    val spark = pgEdges.sparkSession
    import graft.ops.stats.Stats
    val e = endpoints(pgEdges).select(col("from").as("src"), col("to").as("dst"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node")).union(e.select(col("dst")))
      .distinct().localCheckpoint()
    // S0: each node sketches {itself}
    var regs = Stats.hllRegisters(nodes, "node", col("node")).localCheckpoint()
    // exact ≤k-ball pairs, same iteration structure — fixture validation
    // ONLY; never built when withExact is off (|V|²-class at scale)
    var pairs: Option[DataFrame] =
      if (withExact) Some(nodes.select(col("node").as("v"), col("node").as("u"))
        .localCheckpoint())
      else None
    def level(k: Int): DataFrame = {
      val est = Stats.hllEstimate(regs, "node")
        .agg(round(sum(col("est_distinct").cast("decimal(27,10)")).cast("double"), 4)
          .as("est_reach"))
      pairs match {
        case Some(p) =>
          val exact = p.agg(count(lit(1)).as("exact_reach"))
          est.crossJoin(exact)
            .select(lit(k).as("k"), col("est_reach"), col("exact_reach"))
        case None =>
          est.select(lit(k).as("k"), col("est_reach"))
      }
    }
    var out = level(0)
    for (k <- 1 to maxK) {
      regs = regs.join(e, regs("node") === e("dst"))
        .select(col("src").as("node"), col("j"), col("mj"))
        .union(regs)
        .groupBy("node", "j").agg(max("mj").as("mj"))
        .localCheckpoint()
      pairs = pairs.map(p => p.join(e, p("u") === e("src"))
        .select(col("v"), col("dst").as("u"))
        .union(p)
        .distinct()
        .localCheckpoint())
      out = out.union(level(k))
    }
    out.orderBy("k")
  }

  /** Personalized PageRank over a DIRECTED PG edge set: random walk with
    * restart to a SEED set — x₀(v) = s(v), x_{k+1}(v) = (1−d)·s(v) +
    * d·Σ_{u→v} x_k(u)/outdeg(u), with s(v) = 1/|S| on seeds and 0
    * elsewhere, a FIXED iteration count. This is relevance FROM a query
    * set rather than global importance: the KnetMiner-domain staple
    * ("rank everything by closeness to these genes") that global
    * PageRank cannot express — restart confines the walk to the seeds'
    * neighbourhood, so unreachable subgraphs score exactly 0 and scores
    * decay with distance from S.
    *
    * Semantics deliberately mirror [[pageRank]]'s truncated-walk stance:
    * mass leaking at out-degree-0 sinks is NOT redistributed (observable,
    * and reproduced identically by the oracle's unrolled recurrence);
    * fixed iterations make the result a finite sum of path products, so
    * the DuckDB twin unrolls k CTE levels (the kg_pagerank pattern).
    * Each iteration's rank is rounded at 12 dp on BOTH sides before the
    * next step and the result once more at 6 dp: restart masses are
    * short decimals (1/|S| scaled by 0.15/0.85 products), so exact
    * ranks routinely land ON a 6-dp half boundary where ~1e−16
    * summation-order noise alone would flip the final digit — the
    * 12-dp intermediate round absorbs that noise while sitting far
    * (~5e−13) from any boundary the values actually approach
    * (observed at sf0.001: region mass exactly 0.0108375).
    *
    * Distribution: seeds resolve to vids via one broadcast-sized join
    * (|S| is query-sized by definition — a caller restarting from a
    * corpus-sized set wants [[pageRank]]); one aggregateMessages (keyed
    * sum along out-edges, contribution pre-divided by the sender's
    * static out-degree) per iteration — linear in |E| per step, no
    * driver-side graph. The one eager job is the |S| count, needed to
    * scale the restart vector before the plan exists.
    */
  def personalizedPageRank(pgEdges: DataFrame, seeds: DataFrame,
                           damping: Double = 0.85, iterations: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val seedCol = seeds.columns.head
    val seedVids = idx.join(
        seeds.select(col(seedCol).cast("string").as("node"))
          .where(col("node").isNotNull).distinct(),
        "node")
      .select(col("vid")).as[Long].rdd
    val nSeeds = seedVids.count()
    require(nSeeds > 0,
      "personalizedPageRank: no seed matches a graph node — a restart " +
        "vector of zeros has no stationary walk; check the seed key space")
    val restart = 1.0 / nSeeds
    // attr = (rank, seedMass, outdeg); outdeg static across iterations
    val g0 = XGraph.fromEdges(mapEdges(e, idx), ())
    var g = g0.outerJoinVertices(g0.outDegrees)((_, _, d) => d.getOrElse(0))
      .outerJoinVertices(seedVids.map(v => (v, ())))((_, deg, s) =>
        (if (s.isDefined) restart else 0.0, if (s.isDefined) restart else 0.0, deg))
    def r12(x: Double) =
      BigDecimal(x).setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to iterations) {
      val msgs = g.aggregateMessages[Double](ctx =>
        if (ctx.srcAttr._3 > 0) ctx.sendToDst(ctx.srcAttr._1 / ctx.srcAttr._3),
        _ + _)
      g = g.outerJoinVertices(msgs)((_, attr, m) =>
        (r12((1.0 - damping) * attr._2 + damping * m.getOrElse(0.0)), attr._2, attr._3))
    }
    idx.join(g.vertices.map { case (vid, (r, _, _)) => (vid, r) }.toDF("vid", "pprank"), "vid")
      .select(col("node"), round(col("pprank"), 6).as("pprank"))
      .orderBy("node")
  }

  /** Katz centrality over a DIRECTED PG edge set: x₀ = 1,
    * x_{k+1}(v) = 1 + α·Σ_{u→v} x_k(u), a FIXED iteration count — every
    * node scores the attenuated count of walks ending at it (α^length
    * weighting), the influence measure that, unlike PageRank, does not
    * dilute a source's contribution by its out-degree (a hub endorsing
    * many nodes endorses each fully). Fixed iterations + the β = 1 base
    * make the recurrence unroll to k oracle CTE levels (the kg_pagerank
    * pattern); α must stay below 1/λ_max for the truncation to be a
    * contraction (default 0.2 suits the shallow supplier→nation→region
    * KG, spectral radius < 5).
    *
    * Distribution: one aggregateMessages (keyed sum along in-edges) per
    * iteration over partitioned edge RDDs — linear in |E| per step, no
    * driver-side graph. Message merge order is engine-chosen, so like
    * pageRank the result is rounded to 6 dp, far above double
    * accumulation-order noise at KG degrees.
    */
  def katz(pgEdges: DataFrame, alpha: Double = 0.2, iterations: Int = 8): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    var g = XGraph.fromEdges(mapEdges(e, idx), ()).mapVertices((_, _) => 1.0)
    for (_ <- 1 to iterations) {
      val msgs = g.aggregateMessages[Double](ctx => ctx.sendToDst(ctx.srcAttr), _ + _)
      g = g.outerJoinVertices(msgs)((_, _, m) => 1.0 + alpha * m.getOrElse(0.0))
    }
    idx.join(g.vertices.toDF("vid", "katz"), "vid")
      .select(col("node"), round(col("katz"), 6).as("katz"))
      .orderBy("node")
  }

  /** HITS hubs-and-authorities over a DIRECTED PG edge set: h₀ = 1,
    * a_k(v) = Σ_{u→v} h_{k−1}(u), h_k(u) = Σ_{u→v} a_k(v), a FIXED
    * iteration count with ONE final L1 normalisation — the bipartite
    * influence split Katz/PageRank collapse (an authority is endorsed BY
    * good hubs; a hub endorses good authorities; the two scores are
    * different rankings on any non-symmetric graph).
    *
    * Normalisation is deliberately DEFERRED to the end: the textbook
    * per-iteration norm only rescales (the recurrence is linear), and one
    * final division keeps every intermediate an order-insensitive sum of
    * products — so the DuckDB oracle unrolls the recurrence exactly (the
    * kg_pagerank pattern) with no per-iteration rounding to drift.
    * Magnitudes grow like λ_max^k: 8 iterations on a KG with degree
    * ~10⁴ stays ~1e32, far inside double range; the final scores are
    * ratios, rounded once to 6 dp. Two aggregateMessages per iteration,
    * linear in |E| per step.
    */
  def hits(pgEdges: DataFrame, iterations: Int = 8): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    var g = XGraph.fromEdges(mapEdges(e, idx), ()).mapVertices((_, _) => (1.0, 0.0))
    for (_ <- 1 to iterations) {
      val auth = g.aggregateMessages[Double](ctx => ctx.sendToDst(ctx.srcAttr._1), _ + _)
      g = g.outerJoinVertices(auth)((_, hv, a) => (hv._1, a.getOrElse(0.0)))
      val hub = g.aggregateMessages[Double](ctx => ctx.sendToSrc(ctx.dstAttr._2), _ + _)
      g = g.outerJoinVertices(hub)((_, hv, h) => (h.getOrElse(0.0), hv._2))
    }
    val scores = g.vertices.map { case (vid, (h, a)) => (vid, h, a) }
      .toDF("vid", "h", "a")
    val tot = scores.agg(sum("h").as("sh"), sum("a").as("sa"))
    idx.join(scores, "vid").crossJoin(tot)
      .select(col("node"),
        round(when(col("sh") > 0, col("h") / col("sh")).otherwise(0.0), 6).as("hub"),
        round(when(col("sa") > 0, col("a") / col("sa")).otherwise(0.0), 6).as("authority"))
      .orderBy("node")
  }

  /** Per-node triangle counts of a PG edge set via GraphX's TriangleCount
    * (edge-partitioned set intersection — the distributed formulation;
    * `TriangleCount.run` canonicalises direction and drops self/duplicate
    * edges, so the input is treated as a simple undirected graph). Nodes
    * in no triangle report 0. Triangle counting is the classic structural
    * signal for community density / spam-graph detection on KG-scale data.
    */
  def triangles(pgEdges: DataFrame): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val tc = org.apache.spark.graphx.lib.TriangleCount
      .run(XGraph.fromEdges(mapEdges(e, idx), ()))
      .vertices.toDF("vid", "triangles")
    idx.join(tc, "vid")
      .select(col("node"), col("triangles"))
      .orderBy("node")
  }

  /** Undirected BFS hop distances from a set of seed nodes, via GraphX
    * Pregel (the streaming-BFS formulation: frontier expansion by message
    * passing, one superstep per hop — linear work per level, no driver
    * loop over vertices). Returns (node, dist) for every node reachable
    * within `maxHops`; seeds report 0. Edges are symmetrised, so `@from`/
    * `@to` orientation does not matter.
    */
  /** Typed k-hop motif paths — the KnetMiner domain's query staple
    * (gene → pathway → trait semantic motifs; the reference builds the
    * graph FOR such traversals — mappings/knetminer.py): from each start
    * node, follow DIRECTED edges whose type matches the hop's predicate,
    * one `hopTypes` entry per hop, and report per (start, end) the
    * number of distinct simple typed paths plus a deterministic sample
    * (the lexicographic min of the `->`-joined path strings — min, so
    * any engine reproduces it). Cycles are cut per path (`dst` must not
    * already be on the path — simple-path semantics), which also bounds
    * the blowup on cyclic inputs.
    *
    * Shape at scale: k fixed-depth keyed equi-joins on the node id — no
    * transitive closure, no GraphX build; each hop's type filter pushes
    * into the edge scan, the only per-row state is the ≤ k+1-element
    * path array, and the final count+min is one keyed aggregate.
    * Frontier size is the true path volume (the data's fan-out), so a
    * hub-heavy hop costs what the answer costs — callers constrain hops
    * by type exactly to keep that volume meaningful.
    */
  def motifPaths(edges: DataFrame, starts: DataFrame, hopTypes: Seq[String],
                 srcCol: String = "src", dstCol: String = "dst",
                 typeCol: String = "etype", startCol: String = "node"): DataFrame = {
    require(hopTypes.nonEmpty, "motifPaths: at least one hop type is required")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(typeCol).as("__t"))
    var frontier = starts
      .select(col(startCol).as("__n"), array(col(startCol)).as("__path"))
    hopTypes.foreach { t =>
      frontier = frontier
        .join(e.where(col("__t") === t), col("__n") === col("__src"))
        .where(!array_contains(col("__path"), col("__dst"))) // simple paths
        .select(col("__dst").as("__n"),
          array_append(col("__path"), col("__dst")).as("__path"))
    }
    frontier
      .groupBy(element_at(col("__path"), 1).as("start_node"),
        col("__n").as("end_node"))
      .agg(count(lit(1)).as("n_paths"),
        min(array_join(col("__path"), "->")).as("sample_path"))
      .orderBy("start_node", "end_node")
  }

  /** [[motifPaths]] with BOUNDED PER-HOP REPETITION — the full KnetMiner
    * semantic-motif shape (gene −is_a*≤k→ family −part_of→ pathway;
    * the reference's graph exists to serve such motifs —
    * mappings/knetminer.py): each hop is `(type, minRep, maxRep)`,
    * matching between `minRep` and `maxRep` consecutive edges of that
    * type (0 allowed: the hop may be skipped entirely). Output matches
    * [[motifPaths]]: per (start, end) the distinct simple typed-path
    * count across ALL admissible depths plus the lexicographic-min
    * sample path.
    *
    * Unrolled, NOT transitive: a hop `(t, lo, hi)` expands its frontier
    * `hi` times with the [[motifPaths]] single-step join and unions the
    * depth-`lo..hi` frontiers — dynamic-programming over shared
    * prefixes, so the whole motif costs Σ maxRep fixed keyed equi-joins
    * regardless of how many depth combinations it admits (a product
    * enumeration would pay the prefix joins once per combination; a
    * transitive closure would be unbounded). Same simple-path cycle cut
    * per step, same scale shape as [[motifPaths]].
    */
  def motifPathsRep(edges: DataFrame, starts: DataFrame,
                    hops: Seq[(String, Int, Int)],
                    srcCol: String = "src", dstCol: String = "dst",
                    typeCol: String = "etype", startCol: String = "node"): DataFrame = {
    require(hops.nonEmpty, "motifPathsRep: at least one hop spec is required")
    hops.foreach { case (t, lo, hi) =>
      require(lo >= 0 && hi >= lo, s"motifPathsRep: hop $t needs 0 <= minRep <= maxRep ($lo, $hi)") }
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"),
      col(typeCol).as("__t"))
    var frontier = starts
      .select(col(startCol).as("__n"), array(col(startCol)).as("__path"))
    hops.foreach { case (t, lo, hi) =>
      var cur = frontier
      var acc: Option[DataFrame] = if (lo == 0) Some(cur) else None
      for (i <- 1 to hi) {
        cur = cur
          .join(e.where(col("__t") === t), col("__n") === col("__src"))
          .where(!array_contains(col("__path"), col("__dst"))) // simple paths
          .select(col("__dst").as("__n"),
            array_append(col("__path"), col("__dst")).as("__path"))
        if (i >= lo) acc = Some(acc.map(_.unionAll(cur)).getOrElse(cur))
      }
      frontier = acc.getOrElse(cur)
    }
    frontier
      .groupBy(element_at(col("__path"), 1).as("start_node"),
        col("__n").as("end_node"))
      .agg(count(lit(1)).as("n_paths"),
        min(array_join(col("__path"), "->")).as("sample_path"))
      .orderBy("start_node", "end_node")
  }

  /** Deterministic seeded truncated random walks over the directed PG
    * edge set — the DeepWalk/node2vec-style CORPUS GENERATOR (Perozzi et
    * al. 2014): `walksPerNode` walks of up to `walkLength` steps from
    * every node, following out-edges, stopping early at sinks. The walk
    * corpus is what a graph-embedding trainer consumes, so this is the
    * KG-to-training-data bridge op.
    *
    * Determinism is the contract, not a convenience: the "random" choice
    * at step s of walk w standing on node v is
    * `mix64(fnv1a64(v) XOR mix64((seed + s·φ) XOR w)) >>> 1 mod outdeg(v)`
    * — a pure function of (seed, walk, step, node), so re-running the
    * plan, recovering a failed stage, or replaying on another cluster
    * reproduces the identical corpus (RDD lineage recovery would corrupt
    * a nondeterministic sample), and the DuckDB oracle replays it
    * bit-for-bit (fnv1a64 = single-token [[graft.functions.SimHash64]];
    * mix64 = the SRP-verified splitmix64 finalizer; the step salt
    * `seed + s·φ` wraps in Scala at plan construction — no Column-level
    * overflow for ANSI mode to reject). Neighbors rank 0..outdeg−1 by
    * sorted `to` key over the DISTINCT edge set (neighbor SET semantics:
    * parallel edges don't bias the draw).
    *
    * Scale: neighbor ranks are one row_number window partitioned by
    * `from` (keyed sorted runs over the edge set, no global sort); each
    * step is two keyed equi-joins (frontier→outdeg, then (node, pick)→
    * ranked edge) over |nodes|·walksPerNode rows — walkLength·2 joins
    * total, nothing quadratic, no driver loop over data. Output is one
    * row per (start_node, walk, step) — the walk corpus in long form.
    */
  def randomWalks(pgEdges: DataFrame, walksPerNode: Int = 2,
                  walkLength: Int = 3, seed: Long = 17L): DataFrame = {
    require(walksPerNode >= 1 && walkLength >= 1,
      s"randomWalks: walksPerNode and walkLength must be >= 1 ($walksPerNode, $walkLength)")
    val spark = pgEdges.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val GOLD = 0x9E3779B97F4A7C15L
    val e = endpoints(pgEdges).where(col("from") =!= col("to")).distinct()
      .localCheckpoint() // ranks, degrees, and the node set all read it
    val ranked = e.select(col("from").as("__cur"),
      (row_number().over(Window.partitionBy("from").orderBy("to")).cast("long")
        - 1).as("__pick"),
      col("to").as("__next"))
      .localCheckpoint()
    val deg = e.groupBy(col("from").as("__cur"))
      .agg(count(lit(1)).as("__deg"))
    val nodes = e.select(col("from").as("node")).union(e.select(col("to")))
      .distinct()
    // flatten lineage per step (the kg_ppr stance): without it every
    // union branch re-derives ALL prior steps — O(L²) joins in one plan
    var frontier = nodes
      .crossJoin(spark.range(0, walksPerNode)
        .select(col("id").cast("int").as("walk")))
      .select(col("node").as("start_node"), col("walk"), col("node").as("__cur"))
      .localCheckpoint()
    var acc = frontier.select(col("start_node"), col("walk"),
      lit(0).as("step"), col("__cur").as("node"))
    for (s <- 1 to walkLength) {
      val stepSalt = seed + s.toLong * GOLD // wraps: the mod-2^64 semantic
      val walkSalt = call_function("graft_mix64",
        lit(stepSalt).bitwiseXOR(col("walk").cast("long")))
      val pick = shiftrightunsigned(call_function("graft_mix64",
        call_function("graft_simhash64", array(col("__cur")))
          .bitwiseXOR(walkSalt)), 1) % col("__deg")
      val stepped = frontier.join(deg, Seq("__cur")) // sinks stop here
        .withColumn("__pick", pick)
        .join(ranked, Seq("__cur", "__pick"))
        .select(col("start_node"), col("walk"), col("__next").as("__cur"))
        .localCheckpoint()
      acc = acc.unionAll(stepped.select(col("start_node"), col("walk"),
        lit(s).as("step"), col("__cur").as("node")))
      frontier = stepped
    }
    acc.orderBy("start_node", "walk", "step")
  }

  /** node2vec-style BIASED random walks (Grover & Leskovec 2016) — the
    * second-order upgrade of [[randomWalks]]: the draw at each step
    * weights the current node's out-neighbors by where they sit
    * relative to the PREVIOUS node — `wReturn` for going back to prev,
    * `wCommon` for a neighbor prev also points to (BFS-ish, stays
    * local), `wFar` otherwise (DFS-ish, explores) — so one weight
    * triple tunes the corpus between structural-equivalence and
    * community flavors, which is the entire point of node2vec over
    * DeepWalk. Weights are INTEGERS (the exactness stance: the
    * selection is cumulative-range arithmetic on exact sums, never a
    * float partition) and the randomness is the [[randomWalks]] stream
    * (mix64/fnv of (seed, walk, step, node)) reduced mod the row's
    * total weight — deterministic, replay-stable, oracle-replayable.
    * Step 1 has no prev and draws uniformly (weight 1 per neighbor).
    *
    * Scale: unlike the first-order walk (O(1) join rows per walker per
    * step), the biased draw must SEE every out-neighbor's class, so a
    * step costs Σ deg(cur) join rows — one aggregateMessages-round
    * equivalent per step, the honest price of second-order bias (the
    * alias-table trick trades the same product for precomputed state).
    * All joins are keyed (frontier→neighbors on cur; class lookup on
    * (prev, x) against the edge set; cumulative weights are one window
    * per walker-step partition). Lineage checkpoint-flattened per step.
    */
  def biasedWalks(pgEdges: DataFrame, walksPerNode: Int = 2,
                  walkLength: Int = 3, seed: Long = 17L,
                  wReturn: Int = 1, wCommon: Int = 4, wFar: Int = 16): DataFrame = {
    require(walksPerNode >= 1 && walkLength >= 1,
      s"biasedWalks: walksPerNode and walkLength must be >= 1 ($walksPerNode, $walkLength)")
    require(wReturn >= 0 && wCommon >= 0 && wFar >= 0
        && (wReturn + wCommon + wFar) > 0,
      s"biasedWalks: weights must be non-negative, not all zero ($wReturn, $wCommon, $wFar)")
    val spark = pgEdges.sparkSession
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.expressions.Window
    val GOLD = 0x9E3779B97F4A7C15L
    val e = endpoints(pgEdges).where(col("from") =!= col("to")).distinct()
      .localCheckpoint()
    val ranked = e.select(col("from").as("__cur"),
      (row_number().over(Window.partitionBy("from").orderBy("to")).cast("long")
        - 1).as("__rank"),
      col("to").as("__x"))
      .localCheckpoint()
    val edgeSet = e.select(col("from").as("__prev"), col("to").as("__x"),
      lit(1).as("__has"))
    val nodes = e.select(col("from").as("node")).union(e.select(col("to")))
      .distinct()
    var frontier = nodes
      .crossJoin(spark.range(0, walksPerNode)
        .select(col("id").cast("int").as("walk")))
      .select(col("node").as("start_node"), col("walk"),
        col("node").as("__prev"), col("node").as("__cur"))
      .localCheckpoint()
    var acc = frontier.select(col("start_node"), col("walk"),
      lit(0).as("step"), col("__cur").as("node"))
    for (s <- 1 to walkLength) {
      val stepSalt = seed + s.toLong * GOLD // wraps: the mod-2^64 semantic
      val walkSalt = call_function("graft_mix64",
        lit(stepSalt).bitwiseXOR(col("walk").cast("long")))
      val draw = shiftrightunsigned(call_function("graft_mix64",
        call_function("graft_simhash64", array(col("__cur")))
          .bitwiseXOR(walkSalt)), 1)
      // expand to every out-neighbor, classify against prev, weight
      val expanded = frontier.join(ranked, Seq("__cur"))
        .join(edgeSet, Seq("__prev", "__x"), "left")
        .withColumn("__w",
          when(lit(s) === 1, lit(1L)) // no prev yet: uniform
            .when(col("__x") === col("__prev"), lit(wReturn.toLong))
            .when(col("__has").isNotNull, lit(wCommon.toLong))
            .otherwise(lit(wFar.toLong)))
        .where(col("__w") > 0)
      val ww = Window.partitionBy("start_node", "walk")
        .orderBy("__rank")
      val cum = expanded
        .withColumn("__cum", sum("__w").over(
          ww.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("__total", sum("__w").over(
          ww.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      val stepped = cum
        .withColumn("__r", draw % col("__total"))
        .where(col("__r") >= col("__cum") - col("__w")
          && col("__r") < col("__cum"))
        .select(col("start_node"), col("walk"),
          col("__cur").as("__prev"), col("__x").as("__cur"))
        .localCheckpoint()
      acc = acc.unionAll(stepped.select(col("start_node"), col("walk"),
        lit(s).as("step"), col("__cur").as("node")))
      frontier = stepped
    }
    acc.orderBy("start_node", "walk", "step")
  }

  def bfsDistances(pgEdges: DataFrame, seeds: Seq[String], maxHops: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val seedVids = idx.filter(col("node").isin(seeds: _*))
      .select("vid").as[Long].collect().toSet
    val bcSeeds = spark.sparkContext.broadcast(seedVids)
    val g = XGraph.fromEdges(mapEdges(e, idx), ())
      .mapVertices((vid, _) =>
        if (bcSeeds.value.contains(vid)) 0 else Int.MaxValue)
    val dists = g.pregel(Int.MaxValue, maxIterations = maxHops)(
      (_, d, msg) => math.min(d, msg),
      triplet => {
        val out =
          if (triplet.srcAttr != Int.MaxValue && triplet.srcAttr + 1 < triplet.dstAttr)
            Iterator((triplet.dstId, triplet.srcAttr + 1)) else Iterator.empty
        val back =
          if (triplet.dstAttr != Int.MaxValue && triplet.dstAttr + 1 < triplet.srcAttr)
            Iterator((triplet.srcId, triplet.dstAttr + 1)) else Iterator.empty
        out ++ back
      },
      math.min)
      .vertices.filter(_._2 != Int.MaxValue).toDF("vid", "dist")
    idx.join(dists, "vid")
      .select(col("node"), col("dist"))
      .orderBy("node")
  }

  /** Weighted single-source(-set) shortest paths over an undirected PG
    * edge set — the min-plus generalisation of [[bfsDistances]] (reference
    * context: path queries over the loaded KG; the bulk form runs here,
    * not in the graph DB). `wEdges` carries (from, to, `weightCol`); any
    * non-negative integral edge property serves as the weight. Seeds start
    * at 0, every other node at +inf; each Pregel superstep relaxes
    * `dist(src) + w` across both orientations and vertices keep the MIN —
    * after convergence (or the `maxHops` cap: distances using at most
    * maxHops edges — the standard bounded-relaxation semantics) a node's
    * value is its exact shortest weighted distance. Unreachable nodes
    * produce NO row (their +inf sentinel is filtered, mirroring
    * bfsDistances). Ties need no tie-break: min over equal path weights
    * is the weight itself, so the result is deterministic for any
    * partitioning/arrival order.
    *
    * Negative weights are REJECTED (one cheap agg before the graph
    * build): min-plus relaxation's optimal substructure needs ≥ 0, and a
    * silent wrong answer on a negative edge is worse than the guard's
    * cost. Long weights keep sums exact — no float drift between engines.
    *
    * Scale: one superstep shuffles at most |E| messages (only improved
    * vertices re-send — Pregel's active-set semantics); the vid space is
    * [[nodeIndex]]'s dense sorted ids, no driver-side graph. The oracle
    * unrolls the relaxation as chained min-distance CTE levels with the
    * weight in the join (the kg_bfs recipe).
    */
  def sssp(wEdges: DataFrame, seeds: Seq[String], maxHops: Int = 10,
           weightCol: String = "weight"): DataFrame = {
    val spark = wEdges.sparkSession
    import spark.implicits._
    // a NULL weight would survive the endpoint filter AND the negative-
    // weight require (min() skips nulls) only to NPE in the tuple decode
    // below with an opaque executor error — filter it like the endpoints
    // (an unweighted edge cannot participate in min-plus relaxation)
    val e = wEdges.select(col("from"), col("to"),
        col(weightCol).cast("long").as("w"))
      .where(col("from").isNotNull && col("to").isNotNull &&
        col(weightCol).isNotNull)
    val minW = e.agg(min(col("w"))).head().get(0)
    require(minW == null || minW.asInstanceOf[Long] >= 0L,
      s"sssp: negative edge weight $minW — min-plus relaxation requires " +
        "non-negative weights (Bellman-Ford with negative cycles has no " +
        "shortest paths; route negative-weight graphs elsewhere)")
    val idx = nodeIndex(e)
    val seedVids = idx.filter(col("node").isin(seeds: _*))
      .select("vid").as[Long].collect().toSet
    val bcSeeds = spark.sparkContext.broadcast(seedVids)
    val mapped = e
      .join(idx.select(col("node").as("from"), col("vid").as("fvid")), "from")
      .join(idx.select(col("node").as("to"), col("vid").as("tvid")), "to")
      .select(col("fvid"), col("tvid"), col("w"))
      .as[(Long, Long, Long)].rdd.map { case (a, b, w) => Edge(a, b, w) }
    val g = XGraph.fromEdges(mapped, ()).mapVertices((vid, _) =>
      if (bcSeeds.value.contains(vid)) 0L else Long.MaxValue)
    val dists = g.pregel(Long.MaxValue, maxIterations = maxHops)(
      (_, d, msg) => math.min(d, msg),
      t => {
        val out =
          if (t.srcAttr != Long.MaxValue && t.srcAttr + t.attr < t.dstAttr)
            Iterator((t.dstId, t.srcAttr + t.attr)) else Iterator.empty
        val back =
          if (t.dstAttr != Long.MaxValue && t.dstAttr + t.attr < t.srcAttr)
            Iterator((t.srcId, t.dstAttr + t.attr)) else Iterator.empty
        out ++ back
      },
      math.min)
      .vertices.filter(_._2 != Long.MaxValue).toDF("vid", "dist")
    idx.join(dists, "vid")
      .select(col("node"), col("dist"))
      .orderBy("node")
  }

  /** k-core of an undirected PG edge set — the standard degeneracy
    * pruning (Seidman 1983): repeatedly peel nodes of degree < k until
    * the fixpoint; what survives is the maximal subgraph where every
    * node keeps ≥ k neighbours. The KG hygiene/density primitive:
    * cores isolate the densely cross-referenced backbone from pendant
    * chains, and "node leaves the 2-core" is a cheaper structural-decay
    * alarm than any centrality. Returns surviving (node, core_degree)
    * — each node's degree INSIDE the core.
    *
    * Iterative DataFrame peel, not a driver-side graph: each round is
    * one degree aggregate over the surviving edge set + two semi-joins
    * restricting edges to surviving endpoints, checkpointed so the
    * lineage stays flat; the loop stops at the fixpoint (edge count
    * unchanged) or `maxIter`. Edges shrink monotonically, so every
    * round costs at most the previous round's |E| — the peel cascade
    * depth (not |V|) bounds the round count, and on hierarchical KGs
    * that depth is the hierarchy depth. Canonicalised (a < b, distinct)
    * first so multi-edges and orientation can never inflate a degree.
    * The oracle unrolls the same peel as fixed CTE rounds — post-
    * fixpoint rounds are no-ops, so an unroll ≥ the cascade depth is
    * exact.
    */
  def kcore(pgEdges: DataFrame, k: Int = 2, maxIter: Int = 20): DataFrame = {
    require(k >= 1, "kcore: k must be >= 1")
    val e0 = endpoints(pgEdges)
    var edges = e0.select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .where(col("a") =!= col("b")).distinct()
      .localCheckpoint()
    var n = edges.count()
    var changed = n > 0
    var iter = 0
    while (changed && iter < maxIter) {
      val deg = edges.select(col("a").as("n"))
        .unionAll(edges.select(col("b").as("n")))
        .groupBy("n").agg(count(lit(1)).as("d"))
      val keep = deg.where(col("d") >= k).select("n")
      val pruned = edges
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
      val m = pruned.count()
      changed = m < n
      edges = pruned
      n = m
      iter += 1
    }
    edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_degree"))
      .orderBy("node")
  }

  /** Landmark harmonic closeness over an undirected PG edge set — the
    * scale answer to closeness centrality: exact closeness needs
    * all-pairs distances (O(n·|E|), dead at KG size), so the standard
    * practice scores against k LANDMARKS instead. Landmarks are the
    * first `k` nodes in md5(node-key) order — a deterministic,
    * content-derived sample both engines reproduce exactly (the
    * sampling-family stance: pure function of the data, stable across
    * layout/partitioning). One Pregel run carries a per-vertex
    * landmark→distance map (state and messages bounded by k entries —
    * NOT one run per landmark, so the edge set is traversed
    * min(diameter, maxHops) times total); per node the score is the sum
    * of reciprocal distances to the landmarks it reaches (harmonic form:
    * defined on disconnected graphs, where classic closeness breaks),
    * summed in lidx order as a left fold so the double is
    * bit-reproducible, rounded once at 6 dp. Nodes reaching no landmark
    * emit no row; a landmark's self-distance 0 counts as reached but
    * adds nothing to the harmonic sum.
    */
  def landmarkCloseness(pgEdges: DataFrame, k: Int = 8,
                        maxHops: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val (idx, verts) = landmarkDistanceMaps(pgEdges, k, maxHops)
    val scored = verts
      .map { case (vid, m) =>
        val harmonic = m.toSeq.sortBy(_._1)
          .foldLeft(0.0) { case (acc, (_, d)) =>
            if (d > 0) acc + 1.0 / d else acc }
        (vid, m.size, harmonic)
      }
      .toDF("vid", "n_reached", "h0")
    idx.join(scored, "vid")
      .select(col("node"), col("n_reached").cast("long").as("n_reached"),
        round(col("h0"), 6).as("harmonic"))
      .orderBy("node")
  }

  /** The landmark multi-BFS shared by [[landmarkCloseness]],
    * [[landmarkEccentricity]] (and any future landmark score): ONE Pregel
    * run carrying a per-vertex landmark→distance map (state and messages
    * bounded by k entries), landmarks the first `k` nodes in md5 order.
    * Returns the node index and the non-empty per-vertex maps — the
    * scoring fold is the only thing the public ops differ in, so the
    * traversal cannot drift between them.
    */
  private def landmarkDistanceMaps(pgEdges: DataFrame, k: Int, maxHops: Int)
      : (DataFrame, org.apache.spark.rdd.RDD[(Long, Map[Int, Int])]) = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    // k rows to the driver — bounded by the parameter, like BFS seeds
    val lms = idx.select(col("vid"), col("node"))
      .withColumn("h", md5(col("node")))
      .orderBy("h", "node").limit(k)
      .select("vid").as[Long].collect().zipWithIndex
      .map { case (vid, i) => vid -> i }.toMap
    val bcLms = spark.sparkContext.broadcast(lms)

    def mergeMin(a: Map[Int, Int], b: Map[Int, Int]): Map[Int, Int] =
      (a.keySet ++ b.keySet).iterator
        .map(l => l -> math.min(a.getOrElse(l, Int.MaxValue),
          b.getOrElse(l, Int.MaxValue))).toMap

    val g = XGraph.fromEdges(mapEdges(e, idx), ())
      .mapVertices((vid, _) =>
        bcLms.value.get(vid).map(l => Map(l -> 0)).getOrElse(Map.empty[Int, Int]))
    val res = g.pregel(Map.empty[Int, Int], maxIterations = maxHops)(
      (_, m, msg) => mergeMin(m, msg),
      t => {
        def improving(src: Map[Int, Int], dst: Map[Int, Int]): Map[Int, Int] =
          src.iterator.map { case (l, d) => l -> (d + 1) }
            .filter { case (l, d) => d < dst.getOrElse(l, Int.MaxValue) }.toMap
        val fwd = improving(t.srcAttr, t.dstAttr)
        val bwd = improving(t.dstAttr, t.srcAttr)
        (if (fwd.nonEmpty) Iterator((t.dstId, fwd)) else Iterator.empty) ++
          (if (bwd.nonEmpty) Iterator((t.srcId, bwd)) else Iterator.empty)
      },
      mergeMin)
    (idx, res.vertices.filter(_._2.nonEmpty).map { case (vid, m) => (vid: Long, m) })
  }

  /** Landmark eccentricity LOWER BOUNDS over an undirected PG edge set —
    * the third landmark score beside closeness and betweenness, and the
    * standard scale answer to eccentricity/diameter (exact eccentricity
    * is all-pairs): for any landmark l, ecc(v) ≥ d(v, l), so the max over
    * the k md5-ordered landmarks is a certified lower bound that is EXACT
    * whenever a true peripheral node is sampled (the classic
    * double-sweep/landmark bound; with k ≥ n it IS eccentricity, the
    * spec's oracle case). max over the bound column is the graph's
    * diameter lower bound — the KG "how far apart can two records be"
    * telemetry. Same ONE-Pregel traversal as [[landmarkCloseness]]
    * ([[landmarkDistanceMaps]] — k-bounded state, never k runs); nodes
    * reaching no landmark emit no row.
    */
  def landmarkEccentricity(pgEdges: DataFrame, k: Int = 8,
                           maxHops: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val (idx, verts) = landmarkDistanceMaps(pgEdges, k, maxHops)
    val scored = verts
      .map { case (vid, m) => (vid, m.size, m.values.max) }
      .toDF("vid", "n_reached", "ecc")
    idx.join(scored, "vid")
      .select(col("node"), col("n_reached").cast("long").as("n_reached"),
        col("ecc").cast("long").as("ecc_lb"))
      .orderBy("node")
  }

  /** Landmark (sampled) Brandes betweenness over an undirected PG edge
    * set — the scale answer to betweenness centrality (exact Brandes is
    * one BFS + dependency sweep per SOURCE: all-pairs work, dead at KG
    * size), completing the centrality family beside degree/PageRank/Katz/
    * HITS/closeness/k-core. Landmarks are the first `k` nodes in
    * md5(node-key) order (the [[landmarkCloseness]] sample: deterministic,
    * content-derived, engine-independent); the score is the UNNORMALISED
    * sum of per-landmark dependencies δ_s(v) = Σ_{w: succ(v)}
    * σ_sv/σ_sw·(1+δ_s(w)) over v ≠ s (Brandes 2001, "A faster algorithm
    * for betweenness centrality", J. Math. Sociol. — the sampled variant
    * is Brandes/Pich 2007). Nodes on no landmark-rooted shortest path
    * emit no row.
    *
    * Both sweeps are synchronous (node, lidx)-keyed DataFrame recurrences
    * — the A43 stance, no driver-side graph:
    *  - FORWARD: level-synchronous BFS with path counting. Level i is one
    *    keyed join of the dist-(i−1) frontier against the canonicalised
    *    neighbour relation + one map-combined σ sum + one anti-join
    *    against the reached set (σ is complete the round a node is first
    *    reached, because every shortest path arrives on that exact
    *    level); the loop stops when the frontier empties (≤ diameter
    *    rounds, ≤ `maxHops`).
    *  - BACKWARD: δ recomputed from scratch each round over the static
    *    successor relation (v, w, lidx, σ_v/σ_w) — the recurrence has
    *    dependency depth = max dist, so maxDist rounds reach the exact
    *    fixpoint, and post-fixpoint rounds are no-ops (what lets the
    *    oracle unroll a FIXED count of CTE levels ≥ the depth).
    * Edges are canonicalised (least/greatest, distinct) first: parallel
    * or reversed duplicates would inflate σ, unlike plain BFS where they
    * are harmless. δ is rounded to 6 dp each round and the final
    * per-node sum over ≤ k rounded addends is rounded once more — the
    * textSurprisal stance: every addend is bit-identical across engines,
    * only the sum order is not, and 6 dp absorbs it.
    *
    * Scale: each round shuffles at most |E|·k narrow (node, lidx) rows
    * with map-side combine; driver state is k landmark keys + one max-
    * dist scalar + a per-round count (all bounded); lineage is flattened
    * with localCheckpoint like [[kcore]].
    */
  def landmarkBetweenness(pgEdges: DataFrame, k: Int = 8,
                          maxHops: Int = 10): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val canon = e.select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .where(col("a") =!= col("b")).distinct()
    // both orientations: the traversal relation (staged — every round of
    // both sweeps reads it)
    val nb = canon.unionAll(canon.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    // k landmark keys to the driver — bounded by the parameter (A43)
    val lms = nb.select(col("a").as("node")).distinct()
      .withColumn("h", md5(col("node")))
      .orderBy("h", "node").limit(k)
      .select("node").as[String].collect().zipWithIndex
    val lmDf = lms.map { case (n, i) => (n, i) }.toSeq.toDF("node", "lidx")

    // forward: reached(node, lidx, dist, sigma)
    var reached = lmDf.select(col("node"), col("lidx"),
      lit(0).as("dist"), lit(1L).as("sigma")).localCheckpoint()
    var frontier = reached
    var level = 1
    while (level <= maxHops && !frontier.isEmpty) {
      val cand = nb.join(frontier.withColumnRenamed("node", "a"), "a")
        .groupBy(col("b").as("node"), col("lidx"))
        .agg(sum(col("sigma")).as("sigma"))
      frontier = cand
        .join(reached.select("node", "lidx"), Seq("node", "lidx"), "left_anti")
        .select(col("node"), col("lidx"), lit(level).as("dist"), col("sigma"))
        .localCheckpoint()
      reached = reached.unionByName(frontier).localCheckpoint()
      level += 1
    }

    // static successor relation: v at dist d, neighbour w at dist d+1,
    // carrying the σ ratio (one deterministic double division)
    val succ = nb
      .join(reached.select(col("node").as("a"), col("lidx"),
        col("dist").as("dv"), col("sigma").as("sv")), Seq("a"))
      .join(reached.select(col("node").as("b"), col("lidx"),
        col("dist").as("dw"), col("sigma").as("sw")), Seq("b", "lidx"))
      .where(col("dw") === col("dv") + 1)
      .select(col("a").as("v"), col("lidx"), col("dv"),
        (col("sv").cast("double") / col("sw")).as("r"), col("b").as("w"))
      .localCheckpoint()
    val maxDRow = reached.agg(max(col("dist"))).head()
    val maxD = if (maxDRow.isNullAt(0)) 0 else maxDRow.getInt(0)

    // backward: δ recomputed synchronously; fixpoint at maxD rounds
    var delta = succ.select(col("v").as("node"), col("lidx"), col("dv"),
      lit(0.0).as("delta")).where(lit(false))
    for (_ <- 1 to maxD) {
      delta = succ
        .join(delta.select(col("node").as("w"), col("lidx"),
          col("delta").as("dw8")), Seq("w", "lidx"), "left")
        .groupBy(col("v").as("node"), col("lidx"), col("dv"))
        .agg(round(sum(col("r") * (lit(1.0) + coalesce(col("dw8"), lit(0.0)))), 6)
          .as("delta"))
        .localCheckpoint()
    }
    delta.where(col("dv") > 0)
      .groupBy("node")
      .agg(round(sum(col("delta")), 6).as("betweenness"))
      .orderBy("node")
  }

  /** Synchronous label propagation (community detection) over an
    * undirected PG edge set, via GraphX Pregel with a DETERMINISTIC
    * tie-break — GraphX's own `LabelPropagation.run` picks `maxBy` over a
    * hash map, so equal-count ties depend on map iteration order and the
    * result is not reproducible across runs/partitionings; this variant
    * picks (count desc, label asc), and because [[nodeIndex]] assigns
    * vids in sorted node-key order the winning vid IS the
    * lexicographically smallest winning node key — exactly reproducible
    * in ANSI SQL (`ORDER BY c DESC, label`).
    *
    * Semantics (the oracle unrolls this recurrence as `iterations` CTE
    * levels): l0(v) = v; l_i(v) = the most frequent label among v's
    * neighbours under l_{i-1}, ties to the smallest label. All updates
    * in a superstep read the PREVIOUS superstep's labels (synchronous),
    * so a fixed iteration count gives a deterministic, engine-independent
    * result — the kg_pagerank/kg_bfs oracle pattern. Edges are
    * canonicalised (undirected, deduplicated) first so orientation or
    * duplicate rows never double a neighbour's vote.
    *
    * Scale: one Pregel superstep shuffles messages along edges — linear
    * in |E| per iteration, no driver-side graph. Message maps merge by
    * per-label count sum, so a vertex's merged map is bounded by the
    * number of DISTINCT labels among its neighbours — it starts at
    * deg(v) for hubs (the standard LPA hub cost) and shrinks as
    * communities consolidate; the fixed low iteration count (default 5)
    * is also the published guidance, since LPA label quality peaks in
    * the first handful of sweeps.
    */
  def labelPropagation(pgEdges: DataFrame, iterations: Int = 5): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val canon = e.select(least(col("from"), col("to")).as("from"),
        greatest(col("from"), col("to")).as("to"))
      .where(col("from") =!= col("to")).distinct()
    val g = XGraph.fromEdges(mapEdges(canon, idx), ())
      .mapVertices((vid, _) => vid)
    val res = g.pregel(
        Map.empty[Long, Long], iterations,
        org.apache.spark.graphx.EdgeDirection.Either)(
      (_, lbl, msg) =>
        if (msg.isEmpty) lbl
        else msg.minBy { case (l, c) => (-c, l) }._1,
      t => Iterator((t.srcId, Map(t.dstAttr -> 1L)),
        (t.dstId, Map(t.srcAttr -> 1L))),
      (a, b) => (a.keySet ++ b.keySet).iterator
        .map(k => k -> (a.getOrElse(k, 0L) + b.getOrElse(k, 0L))).toMap)
    val labelled = res.vertices.toDF("vid", "cvid")
      .join(idx, "vid")
      .join(idx.select(col("vid").as("cvid"), col("node").as("community")), "cvid")
      .select(col("node"), col("community"))
    val sizes = labelled.groupBy("community")
      .agg(count(lit(1)).as("community_size"))
    labelled.join(sizes, "community")
      .select(col("node"), col("community"), col("community_size"))
      .orderBy("node")
  }

  /** Structural node similarity over an undirected PG edge set: Jaccard of
    * neighbour sets for every node pair sharing at least one neighbour —
    * the KG entity-resolution primitive (two records pointing at the same
    * authorities/places/terms are merge candidates even when their own
    * attributes differ). Returns (node_a, node_b, common, jaccard) with
    * node_a < node_b and jaccard ≥ `minJaccard`.
    *
    * Pure DataFrame joins, no GraphX: candidate pairs enumerate through
    * the shared-neighbour inverted index (the dedup posting-list shape),
    * never all-pairs — work is Σ_v deg(v)² over MUTUAL neighbours only.
    * That sum is exactly where a hub node blows up (one v with a million
    * neighbours yields 10¹² candidates), so `maxHubDegree` removes
    * super-node NEIGHBOURS from the graph before scoring — the standard
    * practice (co-pointing at an everyone-points-at-it hub carries no
    * similarity signal), and each dropped hub removes deg² candidate
    * pairs. The pruning is self-consistent: hubs leave the numerator AND
    * the denominator, so the result is exactly [[nodeSimilarity]] of the
    * hub-pruned graph (spec-proven), never a mixed score. `maxHubDegree =
    * 0` leaves the cap to the AUTO guard below.
    *
    * AUTO hub guard (the [[graft.ops.dedup.Dedup.ngramJaccardAdaptive]]
    * stance — the op prices its own quadratic instead of trusting every
    * caller to): with no explicit `maxHubDegree`, the degree HISTOGRAM of
    * the neighbour relation (one agg over the staged relation; distinct
    * degree values are O(√|E|), so the driver-side histogram is provably
    * bounded) estimates candidate volume Σ_m d_m(d_m−1)/2 and, when it
    * exceeds `maxCandidates`, engages the LARGEST degree cap whose kept
    * estimate stays inside the budget — logged loudly, and conservative
    * in the safe direction (pruning hubs only shrinks survivors'
    * degrees, so the post-prune volume is ≤ the estimate). Below the
    * budget nothing engages and the result is the full exact definition —
    * which is why the oracle-checked driver query stays bit-identical at
    * every shipped fixture while a 100× hub graph gets a bounded plan
    * instead of a 10¹²-candidate join. `maxCandidates = 0` disables the
    * probe (the documented exact-baseline configuration at any size);
    * an explicit `maxHubDegree` also skips it (the caller owns the cap).
    * The probe is EAGER — it runs a (bounded, histogram-sized) Spark job
    * during DataFrame construction, like the row-count router in
    * [[graft.ops.ann.Ann.cosinePairsAdaptive]]: routing decisions must be
    * made before the plan is built, and the price is one O(√|E|)-row agg.
    * If even the smallest degree bucket alone exceeds the budget (every
    * cap would prune essentially everything), the guard REFUSES with a
    * descriptive error rather than returning a near-empty result.
    */
  def nodeSimilarity(pgEdges: DataFrame, minJaccard: Double,
                     maxHubDegree: Int = 0,
                     maxCandidates: Long = 50000000L): DataFrame = {
    val e = endpoints(pgEdges)
    // undirected distinct neighbour relation (both orientations)
    val nbAll = e.select(col("from").as("n"), col("to").as("m"))
      .union(e.select(col("to").as("n"), col("from").as("m")))
      .where(col("n") =!= col("m"))
      .distinct()
      .localCheckpoint() // staged: degrees AND the pair join both read it
    val hubCap =
      if (maxHubDegree > 0 || maxCandidates <= 0) maxHubDegree
      else {
        val hist = nbAll.groupBy("n").agg(count(lit(1)).as("d"))
          .groupBy("d").agg(count(lit(1)).as("cnt"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
        var kept = 0L
        var cap = 0L
        var engaged = false
        hist.foreach { case (d, c) =>
          val add = c * d * (d - 1) / 2
          if (!engaged && kept + add <= maxCandidates) { kept += add; cap = d }
          else engaged = true
        }
        // if even the SMALLEST degree bucket blows the budget, any cap the
        // guard could pick prunes essentially every edge — a near-empty
        // result behind a log line is a silent wrong answer, so refuse
        // loudly instead (the ngramJaccardAdaptive allowApproximate=false
        // stance): the caller must either own the cap or own the cost
        require(!engaged || cap >= 1L,
          s"nodeSimilarity: even degree-${hist.headOption.map(_._1).getOrElse(0L)} " +
            s"nodes alone exceed maxCandidates=$maxCandidates — no degree cap " +
            "yields a non-trivial result inside the budget; pass an explicit " +
            "maxHubDegree to own the prune, or maxCandidates=0 to pay the " +
            "exact quadratic deliberately")
        if (engaged)
          log.warn(s"nodeSimilarity: estimated candidate volume exceeds " +
            s"maxCandidates=$maxCandidates — auto hub guard engaged at " +
            s"degree $cap (kept estimate $kept); neighbours above the cap " +
            "are pruned from scoring (scores = nodeSimilarity of the " +
            "pruned graph)")
        if (engaged) cap.toInt else 0
      }
    val nb =
      if (hubCap <= 0) nbAll
      else {
        // delete the hub VERTEX (both sides of the symmetric relation) —
        // leaving hubs as sources would still score (node, hub) pairs
        val hubs = nbAll.groupBy("n").agg(count(lit(1)).as("d"))
          .where(col("d") > hubCap).select("n")
        nbAll
          .join(broadcast(hubs.withColumnRenamed("n", "m")), Seq("m"), "left_anti")
          .join(broadcast(hubs), Seq("n"), "left_anti")
      }
    val deg = nb.groupBy("n").agg(count(lit(1)).as("d"))
    val common = nb.select(col("m"), col("n").as("a"))
      .join(nb.select(col("m"), col("n").as("b")), "m")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    common
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(col("a").as("node_a"), col("b").as("node_b"), col("common"),
        (col("common").cast("double") /
          (col("da") + col("db") - col("common"))).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
      .orderBy("node_a", "node_b")
  }

  /** Resource-Allocation link prediction (Zhou/Lü/Zhang 2009) — the
    * hub-discounting complement of [[nodeSimilarity]]'s Jaccard: a
    * candidate pair (a, b) scores Σ over shared neighbours z of
    * 1/deg(z), so an endorsement through a degree-2 connector counts 50
    * times a degree-100 hub's (Jaccard weighs them equally — on KGs with
    * containment hubs RA is the stronger missing-edge ranker). Scores
    * are EXACT integers: each z contributes floor(10¹²/deg(z)) — one
    * integral division, summed as longs — so ranking is deterministic
    * under any partitioning/order (a double Σ1/deg would be
    * order-sensitive in the last ulp) and the oracle reproduces it
    * verbatim; `ra` is the single closing division by 10¹².
    *
    * Hub handling is RA-NATIVE: an intermediate z above `maxHubDegree`
    * is dropped from the inverted index (its per-path contribution is
    * ≤ 10¹²/cap — negligible by the op's own weighting, while costing
    * deg² candidate pairs), but unlike [[nodeSimilarity]]'s vertex
    * delete the pruned hub can still APPEAR in scored pairs — only its
    * connector role is priced out. Existing edges drop via one keyed
    * anti join; top-k via orderBy().limit() (TakeOrderedAndProject
    * per-partition heaps on the unique (score desc, a, b) total order —
    * no global sort).
    */
  def resourceAllocation(pgEdges: DataFrame, maxHubDegree: Int = 10,
                         topK: Int = 20): DataFrame = {
    require(maxHubDegree >= 2, s"resourceAllocation: maxHubDegree >= 2 (got $maxHubDegree)")
    val e = endpoints(pgEdges)
    val nb = e.select(col("from").as("n"), col("to").as("m"))
      .union(e.select(col("to").as("n"), col("from").as("m")))
      .where(col("n") =!= col("m"))
      .distinct()
      .localCheckpoint() // staged: degrees and the pair join both read it
    val deg = nb.groupBy("n").agg(count(lit(1)).as("d"))
    val z = nb.join(deg.where(col("d") <= maxHubDegree), "n")
      .select(col("n").as("z"), col("m").as("nbr"),
        expr("1000000000000 div d").as("w12"))
    val scored = z.select(col("z"), col("nbr").as("a"), col("w12"))
      .join(z.select(col("z"), col("nbr").as("b")), "z")
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(count(lit(1)).as("n_shared"), sum("w12").as("ra_u12"))
    val existing = nb.where(col("n") < col("m"))
      .select(col("n").as("a"), col("m").as("b"))
    scored.join(existing, Seq("a", "b"), "left_anti")
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("n_shared"), col("ra_u12"),
        (col("ra_u12") / lit(1e12)).as("ra"))
      .orderBy(col("ra_u12").desc, col("node_a"), col("node_b"))
      .limit(topK)
  }

  /** Local bridges of the canonical simple undirected graph — edges
    * whose endpoints share NO common neighbour (they sit in no
    * triangle), i.e. Granovetter's weak ties: the only local conduits
    * between otherwise-separate neighbourhoods. In a KG these are the
    * edges whose removal (a mapping change, a retracted cross-reference)
    * locally DISCONNECTS regions of the graph — the fragility list to
    * review before deleting relations — where a high-support edge is
    * redundantly witnessed by its triangles. Emits every canonical edge
    * with endpoint degrees, the common-neighbour count, and the
    * is_local_bridge flag.
    *
    * Scale: common neighbours are counted by expanding each edge from
    * its LOWER-degree endpoint only (the classic triangle-counting
    * delegation — Σ min-degree work, not Σ deg², so a hub edge costs
    * its leaf side) and semi-joining the wedges back against the
    * adjacency on the (hi, x) key; everything is node-keyed joins and
    * one map-combined count. No neighbourhood is ever materialised as
    * a set.
    */
  def localBridges(pgEdges: DataFrame): DataFrame = {
    val canon = endpoints(pgEdges)
      .where(col("from") =!= col("to"))
      .select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .distinct()
    val nb = canon.select(col("a").as("n"), col("b").as("m"))
      .union(canon.select(col("b"), col("a")))
    val deg = nb.groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = canon
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    val oriented = withDeg.select(col("a"), col("b"),
      when(col("da") <= col("db"), col("a")).otherwise(col("b")).as("lo"),
      when(col("da") <= col("db"), col("b")).otherwise(col("a")).as("hi"))
    val wedges = oriented
      .join(nb.select(col("n").as("lo"), col("m").as("x")), "lo")
      .join(nb.select(col("n").as("hi"), col("m").as("x")),
        Seq("hi", "x"), "left_semi")
    val common = wedges.groupBy("a", "b").agg(count(lit(1)).as("common"))
    withDeg.join(common, Seq("a", "b"), "left")
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("da").as("deg_a"), col("db").as("deg_b"),
        coalesce(col("common"), lit(0L)).as("n_common"),
        (coalesce(col("common"), lit(0L)) === 0).as("is_local_bridge"))
      .orderBy("node_a", "node_b")
  }

  /** Rich-club coefficient curve over the canonical simple undirected
    * graph (a<b, distinct, self-loops dropped — the [[modularity]]
    * canonicalisation): for each degree threshold k, the number of
    * nodes with degree > k, the number of edges with BOTH endpoints in
    * that club, and φ(k) = 2·E_k / (n_k·(n_k−1)) — how much more
    * densely the hubs wire to EACH OTHER than chance. The KG topology
    * read that distinguishes a hub-and-spoke ontology (hubs joined only
    * through leaves, φ flat) from an interconnected core (φ rising with
    * k) — which decides whether hub-pruning heuristics
    * ([[nodeSimilarity]]'s guard, [[resourceAllocation]]'s cap) cut
    * real structure or just fan-out. n_k < 2 yields NULL, not a
    * division error. φ is floor(v·1e6+0.5)-quantized from exact integer
    * counts.
    *
    * Scale: ALL thresholds ride one edge pass — each endpoint's degree
    * is attached by a node-keyed join (the same shuffle any |V|-dim
    * join costs), then every k is a conditional sum over min(d_a, d_b)
    * in a single map-side-combined aggregate; the node side likewise.
    * No per-threshold subgraph is ever materialised.
    */
  def richClub(pgEdges: DataFrame,
               thresholds: Seq[Int] = Seq(1, 2, 4, 8, 16)): DataFrame = {
    require(thresholds.nonEmpty && thresholds == thresholds.sorted,
      s"richClub: thresholds must be non-empty ascending (got $thresholds)")
    val canon = endpoints(pgEdges)
      .where(col("from") =!= col("to"))
      .select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .distinct()
    val deg = canon.select(col("a").as("node"))
      .union(canon.select(col("b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val ed = canon
      .join(deg.select(col("node").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("degree").as("db")), "b")
      .select(least(col("da"), col("db")).as("dmin"))
    val eAggs = thresholds.map(k =>
      sum(when(col("dmin") > k, 1L).otherwise(0L)).as(s"e$k"))
    val nAggs = thresholds.map(k =>
      sum(when(col("degree") > k, 1L).otherwise(0L)).as(s"n$k"))
    val edAgg = ed.agg(eAggs.head, eAggs.tail: _*)
    val ndAgg = deg.agg(nAggs.head, nAggs.tail: _*)
    val stackExpr = s"stack(${thresholds.size}, " +
      thresholds.map(k => s"$k, n$k, e$k").mkString(", ") +
      ") as (k, n_nodes, n_edges)"
    ndAgg.crossJoin(edAgg)
      .selectExpr(stackExpr)
      .select(col("k"), col("n_nodes"), col("n_edges"),
        when(col("n_nodes") < 2, lit(null).cast("double"))
          .otherwise(floor((lit(2) * col("n_edges")).cast("double")
            / (col("n_nodes") * (col("n_nodes") - 1))
            * lit(1000000) + lit(0.5)) / lit(1e6)).as("phi"))
      .orderBy("k")
  }

  /** Node degrees of a PG edge set (triples with `@from`/`@to`), via
    * GraphX degree aggregation. Isolated nodes (no edges) are absent, as
    * in GraphX semantics.
    */
  def degrees(pgEdges: DataFrame): DataFrame = {
    val spark = pgEdges.sparkSession
    import spark.implicits._
    val e = endpoints(pgEdges)
    val idx = nodeIndex(e)
    val degs = XGraph.fromEdges(mapEdges(e, idx), ()).degrees.toDF("vid", "degree")
    idx.join(degs, "vid")
      .select(col("node"), col("degree"))
      .orderBy("node")
  }

  /** Newman modularity of a node partition over the canonical simple
    * undirected graph (a<b, distinct, self-loops dropped):
    * Q = Σ_c (e_c/m − (d_c/(2m))²) where e_c = intra-community edges,
    * d_c = degree sum of community c, m = total edges. The quality
    * scalar that makes [[labelPropagation]] output MEASURABLE the way
    * [[clusteringCoefficient]]/[[assortativity]] measure raw structure —
    * "did LPA find real communities (Q ≫ 0) or noise (Q ≈ 0)".
    *
    * Returns one row per community: `(community, n_nodes, degree_sum,
    * intra_edges, contribution)` — the first four are EXACT integers
    * (hash-comparable cross-engine), the contribution is the one double,
    * rounded once at 6 dp with the division order written identically in
    * the SQL twin (no pow(): explicit self-multiplication on both
    * sides). Global Q = sum(contribution) before rounding.
    *
    * Scale shape: one edge pass for degrees (explode + keyed count), one
    * two-sided membership join for intra-edges (shuffle on node id, the
    * join Spark would pick for any |V|-sized dimension), one |C|-keyed
    * agg, and a 1-row total-edge-count crossed in (broadcast). Nothing
    * is quadratic and no per-community state exceeds a counter.
    */
  def modularity(pgEdges: DataFrame, membership: DataFrame,
                 nodeCol: String = "node", commCol: String = "community"): DataFrame = {
    val canon = endpoints(pgEdges)
      .where(col("from") =!= col("to"))
      .select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .distinct()
    val mem = membership.select(col(nodeCol).as("node"), col(commCol).as("community"))
    val deg = canon.select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val ds = deg.join(mem, "node").groupBy("community")
      .agg(sum("deg").as("degree_sum"), count(lit(1)).as("n_nodes"))
    val intra = canon
      .join(mem.select(col("node").as("a"), col("community").as("ca")), "a")
      .join(mem.select(col("node").as("b"), col("community").as("cb")), "b")
      .where(col("ca") === col("cb"))
      .groupBy(col("ca").as("community")).agg(count(lit(1)).as("intra_edges"))
    val m = canon.agg(count(lit(1)).cast("double").as("m"))
    val dOver2m = col("degree_sum").cast("double") / (lit(2.0) * col("m"))
    ds.join(intra, Seq("community"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(m)
      .select(col("community"), col("n_nodes"), col("degree_sum"),
        col("intra_edges"),
        round(col("intra_edges").cast("double") / col("m") -
          dOver2m * dOver2m, 6).as("contribution"))
      .orderBy("community")
  }

  /** Per-node local clustering coefficient: triangles(v) /
    * (deg(v)·(deg(v)−1)/2) over the canonical simple undirected graph —
    * the density-of-neighbourhood signal (a KG entity whose neighbours
    * all know each other is a tight community; a pure hub scores 0), and
    * together with [[assortativity]] the standard pair of structural
    * health scalars. Nodes of degree < 2 have no possible wedge and
    * report NULL (not 0 — "no signal" and "open neighbourhood" are
    * different facts, and both engines agree on the NULL).
    *
    * Triangle counts come from GraphX TriangleCount (distributed
    * edge-partitioned set intersection); degrees are counted on the SAME
    * canonicalised edge set (a<b, distinct, self-loops dropped) so the
    * ratio can never mix a multigraph degree with a simple-graph triangle
    * count. One keyed count + one broadcast-sized join back to the
    * triangle vertices; |V| output rows.
    */
  def clusteringCoefficient(pgEdges: DataFrame): DataFrame = {
    val u = endpoints(pgEdges)
      .where(col("from") =!= col("to"))
      .select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .distinct()
    val deg = u.select(col("a").as("node")).union(u.select(col("b")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    val tri = triangles(pgEdges)
    tri.join(deg, "node")
      .select(col("node"), col("degree"), col("triangles").cast("long").as("triangles"),
        when(col("degree") < 2, lit(null)).otherwise(
          round(col("triangles").cast("double") * 2 /
            (col("degree") * (col("degree") - 1)), 6)).as("lcc"))
      .orderBy("node")
  }

  /** Degree assortativity of the undirected simple graph (Newman 2002):
    * Pearson correlation between the degrees at the two ends of every
    * edge. Positive = hubs attach to hubs (social nets), negative = hubs
    * attach to leaves (hub-and-spoke hierarchies, most KGs) — the one
    * scalar that says which regime a graph is in, and an early-warning
    * drift signal for an ETL suddenly producing star-shaped artifacts.
    *
    * Each edge contributes BOTH orientations, making Σx = Σy (the
    * standard undirected symmetrisation), so one moment set suffices.
    * All moments are exact integer sums (degrees are ints) — associative
    * and partition-order-proof — and r is one closed-form double from
    * them, term-identical in any engine. Shape: edge dedup + one keyed
    * degree count + two degree-attach joins (co-keyed on the endpoint)
    * + a single map-combined global aggregate; nothing holds more than
    * the edge set, and the output is ONE row.
    */
  def assortativity(pgEdges: DataFrame): DataFrame = {
    val u = endpoints(pgEdges)
      .where(col("from") =!= col("to"))
      .select(least(col("from"), col("to")).as("a"),
        greatest(col("from"), col("to")).as("b"))
      .distinct()
    val degs = u.select(col("a").as("node")).union(u.select(col("b")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = u.union(u.select(col("b"), col("a")))
    val m = col("m").cast("double")
    val mean = col("sx").cast("double") / m
    val den = col("sxx").cast("double") / m - mean * mean
    oriented
      .join(degs.select(col("node").as("a"), col("deg").as("dx")), "a")
      .join(degs.select(col("node").as("b"), col("deg").as("dy")), "b")
      .agg(count(lit(1)).as("m"), sum("dx").as("sx"),
        sum(col("dx") * col("dx")).as("sxx"),
        sum(col("dx") * col("dy")).as("sxy"))
      .select((col("m") / 2).cast("long").as("n_edges"),
        when(den === 0, lit(null)).otherwise(
          round((col("sxy").cast("double") / m - mean * mean) / den, 6))
          .as("assortativity"))
  }
}
