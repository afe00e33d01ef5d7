package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.{call_function, lit}

/** Typed Column API over graft's native expressions — the ergonomic entry
  * point for library users (`import graft.functions.api._`). Each function
  * requires [[graft.functions.GraftFunctions.register]] (or the
  * GraftExtensions session extension) to have run for the session.
  */
package object functions {

  object api {

    /** Registers graft's functions on the active session and returns it. */
    def enable(spark: SparkSession): SparkSession = {
      GraftFunctions.register(spark)
      spark
    }

    /** Dot product of two array<double> columns (codegen, left-to-right). */
    def graft_dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

    /** 64-bit SimHash of a token array. */
    def graft_simhash64(tokens: Column): Column =
      call_function("graft_simhash64", tokens)

    /** Per-band sign-random-projection LSH codes of a vector. */
    def graft_srp_codes(v: Column, planes: Int, bands: Int, seed: Int = 17): Column =
      call_function("graft_srp_codes", v, lit(planes), lit(bands), lit(seed))

    /** Intersection size of two sorted array<long> columns (merge scan). */
    def graft_intersect_count(a: Column, b: Column): Column =
      call_function("graft_intersect_count", a, b)

    /** One-pass MinHash signature of a token array. */
    def graft_minhash_codes(tokens: Column, numHashes: Int): Column =
      call_function("graft_minhash_codes", tokens, lit(numHashes))

    /** MinHash sketch AGGREGATE over a string column (group signature). */
    def graft_minhash_sketch(value: Column, numHashes: Int): Column =
      call_function("graft_minhash_sketch", value, lit(numHashes))
  }
}
