package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sharded training-corpus writer/reader — the storage counterpart of
  * [[graft.ops.sample.Sampling.shardShuffle]]: the deterministic shard +
  * within-shard order materialised as one directory per shard, so a
  * training job's data-loader reads its shard sequentially with zero
  * coordination and any shard can be re-read (or re-written) in isolation.
  *
  * Plan shape: `shardShuffle`'s window already exchanges keyed by `shard`,
  * which means every shard's rows land WHOLLY in one task, sorted by the
  * shuffle order — the `partitionBy("shard")` write then emits exactly one
  * sorted file per shard directory with NO second exchange. The explicit
  * `pos` column makes consumption order independent of parquet reader
  * row-order guarantees.
  */
object Shards {

  /** Writes `df` as `path/shard=N/` directories, one sorted parquet file
    * per shard; rows carry `shard` and 1-based `pos`. Deterministic in
    * (id, salt): re-running produces byte-identical shard membership and
    * order, and `salt` derives an independent epoch order.
    */
  def write(df: DataFrame, idCol: String, nShards: Int, path: String,
            salt: String = ""): Unit =
    graft.ops.sample.Sampling.shardShuffle(df, idCol, nShards, salt)
      .write.mode("overwrite").partitionBy("shard")
      .parquet(Checkpoint.basePath(path))

  /** Reads the full sharded corpus (all shards). */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(Checkpoint.basePath(path))

  /** Reads ONE shard in training order — partition pruning keeps the scan
    * to that shard's directory; the sort is within one shard's rows only.
    */
  def readShard(spark: SparkSession, path: String, shard: Int): DataFrame =
    read(spark, path).where(col("shard") === shard).orderBy("pos")
}
