package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN recall telemetry: measures recall@k of the approximate search
  * routes (SRP-LSH, IVF, PQ/ADC) against the exact brute-force top-k on
  * the embeddings table of SPARK_GRAFT_SF_DIR — the per-corpus number
  * that says whether the plane/band/probe settings are adequate BEFORE a
  * pipeline trusts the approximate indexes. Args: [nQueries] [k]
  * (default 50 / 10).
  */
object AnnRecall {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nQ = args.headOption.map(_.toInt).getOrElse(50)
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.ops.ann.Ann
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qids = e.select("vec_id").orderBy("vec_id").limit(nQ)
      .collect().map(_.getLong(0)).toSet
    val queries = e.where(col("vec_id").isInCollection(qids))
    val corpus = e.where(!col("vec_id").isInCollection(qids))
    val n = corpus.count()
    println(s"[ann-recall] corpus=$n queries=$nQ k=$k dir=$sfDir")

    def topkSet(df: DataFrame): Map[Long, Set[Long]] =
      df.select(col("qid"), col("cid")).collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap

    val t0 = System.nanoTime()
    val truth = topkSet(Ann.bruteForceTopK(queries, corpus, k))
    val tTruth = (System.nanoTime() - t0) / 1e9
    def recall(name: String, settings: String, df: => DataFrame): Unit = {
      val s0 = System.nanoTime()
      val got = topkSet(df)
      val secs = (System.nanoTime() - s0) / 1e9
      val r = truth.map { case (q, t) =>
        got.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }.sum / truth.size
      println(f"[ann-recall] $name recall@$k=$r%.3f ($settings) in $secs%.1f s")
    }
    println(f"[ann-recall] brute-force ground truth in $tTruth%.1f s")
    recall("ann_lsh", "planes=4 bands=8",
      Ann.lshTopK(queries, corpus, k, planes = 4, bands = 8))
    recall("ann_ivf", "nCells=16 nProbe=4 iters=2",
      Ann.ivfTopK(queries, corpus, k, nCells = 16, nProbe = 4, iters = 2))
    // the oracle config (m=2, nCells=8 = 6 bits/vector) is deliberately
    // tiny so DuckDB can unroll the codebooks — at a 20k corpus its 64
    // distinct ADC scores cannot separate a top-10 (recall ~0 by design);
    // the production-shaped codebook shows the same seam scaled up
    recall("ann_pq (oracle cfg)", "m=2 nCells=8 iters=1",
      Ann.pqSearch(queries, corpus, k, m = 2, nCells = 8, iters = 1))
    recall("ann_pq (prod cfg)", "m=8 nCells=32 iters=2",
      Ann.pqSearch(queries, corpus, k, m = 8, nCells = 32, iters = 2))
    recall("ivfadc", "nCells=16 nProbe=4 + m=8 pqCells=32",
      Ann.ivfPqSearch(queries, corpus, k, nCells = 16, nProbe = 4,
        ivfIters = 2, m = 8, pqCells = 32, pqIters = 2))
    spark.stop()
  }
}
