package graft.io

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Data-keyed cache fingerprints: derived caches (IVF index, bucketed
  * tables) must be invalidated when the SOURCE DATA changes under the same
  * path — a path-keyed name (the old `dir.hashCode`) silently serves stale
  * results after a dataset regeneration.
  */
class FingerprintSpec extends SparkSpec {

  test("fingerprint is stable across calls and changes when the data changes") {
    val dir = Files.createTempDirectory("graft-fp").toString
    Files.writeString(Paths.get(dir, "part-0.parquet"), "aaaa")
    Files.writeString(Paths.get(dir, "part-1.parquet"), "bbbb")

    val fp1 = Fingerprint.ofPath(spark, dir)
    assert(fp1 === Fingerprint.ofPath(spark, dir), "deterministic")
    assert(fp1.matches("[0-9a-f]{12}"), fp1)

    // regenerated file, same path, different size -> different fingerprint
    Files.writeString(Paths.get(dir, "part-0.parquet"), "aaaaaaaa")
    val fp2 = Fingerprint.ofPath(spark, dir)
    assert(fp2 !== fp1, "size change must change the fingerprint")

    // same sizes but different mtime -> different fingerprint (regeneration
    // with identical byte counts is still a regeneration)
    val f = Paths.get(dir, "part-1.parquet").toFile
    assert(f.setLastModified(f.lastModified() + 60000))
    assert(Fingerprint.ofPath(spark, dir) !== fp2, "mtime change must change the fingerprint")
  }

  test("missing paths fingerprint distinctly rather than erroring") {
    val a = Fingerprint.ofPath(spark, "/nonexistent/graft-a")
    val b = Fingerprint.ofPath(spark, "/nonexistent/graft-b")
    assert(a !== b)
  }

  test("multi-path fingerprint covers every input") {
    val dir = Files.createTempDirectory("graft-fp2").toString
    Files.writeString(Paths.get(dir, "x"), "1")
    Files.writeString(Paths.get(dir, "y"), "2")
    val both = Fingerprint.ofPaths(spark, Seq(s"$dir/x", s"$dir/y"))
    Files.writeString(Paths.get(dir, "y"), "22")
    assert(Fingerprint.ofPaths(spark, Seq(s"$dir/x", s"$dir/y")) !== both)
  }
}
