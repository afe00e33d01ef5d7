package graft.ops.graph

import scala.reflect.ClassTag

import org.apache.spark.graphx._

/** The GraphX colorize-and-peel SCC algorithm
  * (org.apache.spark.graphx.lib.StronglyConnectedComponents — trim
  * degree-0 vertices to a fixed point, forward-propagate the minimum
  * vertex id as a colour, finalise each colour's root SCC by a backward
  * pass, peel and repeat), reproduced here with ONE addition: the runner
  * REPORTS whether the peel loop converged (work graph empty at exit)
  * instead of making the caller prove convergence by re-deriving the
  * whole labelling at numIter + 1 and diffing — that proof was a full
  * second SCC run, i.e. 2x the dominant cost of every query in the
  * kg_scc / kg_condensation / kg_topo_levels / kg_path_count family.
  *
  * On convergence the labelling is the unique SCC decomposition with
  * min-vid labels (each colour root is the minimum vid of its SCC), so
  * the output is identical to the library call this replaces. The
  * convergence test itself is strictly SOUND and marginally stricter
  * than the old diff: a run that exhausts numIter with unfinalised
  * vertices is refused even in the measure-zero case where the
  * outstanding labels would have come out equal anyway (all remaining
  * SCCs labelled by their own min placeholder) — "not proven converged"
  * refuses, which is the stance the op documents.
  */
private[graft] object Scc {

  /** @return (labels graph, converged): converged iff every vertex was
    *         finalised within `numIter` peel rounds.
    */
  def run[VD: ClassTag, ED: ClassTag](graph: Graph[VD, ED], numIter: Int)
      : (Graph[VertexId, ED], Boolean) = {
    require(numIter > 0,
      s"Number of iterations must be greater than 0, but got $numIter")

    // the graph we update with final SCC ids, and return at the end
    var sccGraph = graph.mapVertices { case (vid, _) => vid }
    // the graph we peel vertices from: (current colour, finalised?)
    var sccWorkGraph = graph.mapVertices { case (vid, _) => (vid, false) }.cache()

    var prevSccGraph = sccGraph
    var numVertices = sccWorkGraph.numVertices
    var iter = 0
    while (sccWorkGraph.numVertices > 0 && iter < numIter) {
      iter += 1
      do {
        numVertices = sccWorkGraph.numVertices
        // vertices with no out-edges (then: no in-edges) in the remaining
        // graph are singleton SCCs — finalise them with their own id
        sccWorkGraph = sccWorkGraph.outerJoinVertices(sccWorkGraph.outDegrees) {
          (vid, data, degreeOpt) => if (degreeOpt.isDefined) data else (vid, true)
        }.outerJoinVertices(sccWorkGraph.inDegrees) {
          (vid, data, degreeOpt) => if (degreeOpt.isDefined) data else (data._1, true)
        }.cache()

        val finalVertices = sccWorkGraph.vertices
          .filter { case (_, (_, isFinal)) => isFinal }
          .mapValues((_, data) => data._1)

        sccGraph = sccGraph.outerJoinVertices(finalVertices) {
          (_, scc, opt) => opt.getOrElse(scc)
        }.cache()
        // materialise before unpersisting the lineage it was built from
        sccGraph.vertices.count()
        sccGraph.edges.count()
        prevSccGraph.unpersist()
        prevSccGraph = sccGraph

        // keep only vertices not yet finalised
        sccWorkGraph = sccWorkGraph.subgraph(vpred = (_, data) => !data._2).cache()
      } while (sccWorkGraph.numVertices < numVertices)

      // on the capped round the phase result could never be written back
      // (the loop exits first), so skip the pointless Pregel pair
      if (iter < numIter) {
        sccWorkGraph = sccWorkGraph.mapVertices { case (vid, (_, isFinal)) => (vid, isFinal) }

        // forward: propagate the minimum vertex id as the colour
        sccWorkGraph = Pregel[(VertexId, Boolean), ED, VertexId](
          sccWorkGraph, Long.MaxValue, activeDirection = EdgeDirection.Out)(
          (_, myScc, neighborScc) => (math.min(myScc._1, neighborScc), myScc._2),
          e =>
            if (e.srcAttr._1 < e.dstAttr._1) Iterator((e.dstId, e.srcAttr._1))
            else Iterator(),
          (vid1, vid2) => math.min(vid1, vid2))

        // backward: a vertex is final if it is its colour's root, or it
        // has a same-colour final out-neighbor (the root reaches it
        // against edge direction within the colour class)
        sccWorkGraph = Pregel[(VertexId, Boolean), ED, Boolean](
          sccWorkGraph, false, activeDirection = EdgeDirection.In)(
          (vid, myScc, existsSameColorFinalNeighbor) => {
            val isColorRoot = vid == myScc._1
            (myScc._1, myScc._2 || isColorRoot || existsSameColorFinalNeighbor)
          },
          e => {
            val sameColor = e.dstAttr._1 == e.srcAttr._1
            val onlyDstIsFinal = e.dstAttr._2 && !e.srcAttr._2
            if (sameColor && onlyDstIsFinal) Iterator((e.srcId, e.dstAttr._2))
            else Iterator()
          },
          (final1, final2) => final1 || final2)
      }
    }
    (sccGraph, sccWorkGraph.numVertices == 0)
  }
}
