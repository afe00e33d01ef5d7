package graft.tools

import org.apache.spark.sql.SparkSession

/** Batched-BPE scale demonstration: trains a k-merge vocabulary with
  * [[graft.ops.text.Bpe.bpeTrainBatched]] on the documents table of
  * SPARK_GRAFT_SF_DIR and reports merges learned, rounds implied, and
  * wall time — the evidence that vocabulary induction no longer costs one
  * driver round-trip per merge. Args: [k] [batch] (default 256 / 32).
  */
object BpeScale {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val k = args.headOption.map(_.toInt).getOrElse(256)
    val batch = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val raw = spark.read.parquet(s"$sfDir/documents.parquet")
    // the synthetic fixture has a 31-word vocabulary, which exhausts BPE
    // after ~90 merges; "rich" mode re-words the corpus with salted md5
    // prefixes (16-char alphabet, 8-char words, thousands of distinct
    // word shapes) so a k-merge budget in the hundreds is exercisable
    // while token count and word-frequency skew stay corpus-shaped
    val docs =
      if (args.contains("rich"))
        raw.select(col("doc_id"),
          concat_ws(" ", transform(split(col("text"), "\\s+"),
            w => substring(md5(concat(w, col("doc_id") % 97)), 1, 8))).as("text"))
      else raw
    val t0 = System.nanoTime()
    val (merges, vocab) =
      if (args.contains("seq")) graft.ops.text.Bpe.bpeTrainFull(docs, k)
      else graft.ops.text.Bpe.bpeTrainBatched(docs, k, batch,
        exact = !args.contains("approx"))
    val n = merges.count()
    val nv = vocab.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val mode =
      if (args.contains("seq")) "seq"
      else s"batch=$batch exact=${!args.contains("approx")}"
    println(f"[bpe-scale] k=$k $mode learned=$n vocabWords=$nv in $secs%.1f s")
    merges.orderBy("rank").show(10, truncate = false)
    spark.stop()
  }
}
