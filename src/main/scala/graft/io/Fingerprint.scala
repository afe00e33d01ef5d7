package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Content fingerprint of source data, for naming derived caches (IVF
  * indexes, bucketed tables) that persist across queries.
  *
  * Keyed on the DATA — every file's path, length, and modification time
  * under the source — not on the path string: a regenerated dataset under
  * the same directory changes the fingerprint and so rebuilds the derived
  * cache, where a path-keyed name would silently serve stale results. The
  * digest is md5-based (48 bits kept), so accidental collisions are
  * negligible where a 32-bit `hashCode` was not.
  *
  * Listing file status is a metadata-only operation (no data read) and runs
  * once per query build — at 100 TB that is a namenode/object-store listing,
  * the same one the scan planner already performs.
  */
object Fingerprint {

  /** Fingerprint of one file or directory tree (recursive). */
  def ofPath(spark: SparkSession, path: String): String = ofPaths(spark, Seq(path))

  /** Combined fingerprint of several files/directories. */
  def ofPaths(spark: SparkSession, paths: Seq[String]): String = {
    val entries = paths.flatMap { p0 =>
      val p = new Path(p0)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(p)) Seq(s"absent:$p0")
      else {
        val it = fs.listFiles(p, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val s = it.next()
          buf += s"${s.getPath.toUri.getPath}:${s.getLen}:${s.getModificationTime}"
        }
        buf.sorted.toSeq
      }
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(entries.mkString("\n").getBytes("UTF-8"))
    md.digest().take(6).map(b => f"$b%02x").mkString
  }
}
