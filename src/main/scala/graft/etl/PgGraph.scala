package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Graph

/** Triples → PG-format DataFrame (reference: src/ketl/io/core.py:16-127
  * triples_2_pg_df).
  *
  * The reference runs four separate groupBys (labels, from, to, properties)
  * and re-joins them on id — four shuffles plus three joins. Here the whole
  * element is assembled in ONE `groupBy("id")` (single exchange): the
  * key/value pairs of an element are collected once, and labels / endpoints /
  * property map are carved out of that array with higher-order functions —
  * per-element work, no further shuffle. Property counts per element are
  * bounded by the mapper configuration, so the collected array is small and
  * map-side partial aggregation keeps the shuffle compact. At 100 TB this is
  * one hash-exchange on `id` instead of four.
  *
  * Output columns: type ('node'|'edge'), id, labels (sorted string array),
  * from, to (null for nodes), properties (map key → sorted distinct values,
  * values still JSON-serialised; defaults to empty map).
  */
object PgGraph {

  def toPg(triples: DataFrame): DataFrame = {
    val kvs = col("kvs")
    def ofKey(key: String): Column = filter(kvs, kv => kv.getField("key") === key)
    def firstOf(key: String): Column = {
      val f = ofKey(key)
      when(size(f) > 0, element_at(f, 1).getField("value"))
    }
    val propKvs = filter(kvs, kv => !kv.getField("key").isin(Graph.SpecialKeys.toSeq: _*))
    val propKeys = array_distinct(transform(propKvs, kv => kv.getField("key")))

    triples
      .groupBy("id")
      .agg(collect_list(struct(col("key"), col("value"))).as("kvs"))
      .select(
        col("id"),
        array_sort(array_distinct(transform(ofKey(Graph.TypeKey), kv => kv.getField("value")))).as("labels"),
        firstOf(Graph.FromKey).as("from"),
        firstOf(Graph.ToKey).as("to"),
        map_from_arrays(
          propKeys,
          transform(propKeys, k =>
            array_sort(array_distinct(transform(
              filter(propKvs, kv => kv.getField("key") === k),
              kv => kv.getField("value"))))))
          .as("properties"))
      .withColumn("type",
        when(col("from").isNotNull, lit(Graph.EdgeType)).otherwise(lit(Graph.NodeType)))
      .select("type", "id", "labels", "from", "to", "properties")
  }

  /** Upserts a triple batch into an existing PG snapshot — the reference's
    * reload story (drop and re-run the whole mapping; reference:
    * src/ketl/io/neoloader.py orchestrates a full reload) done
    * incrementally, so a 100 TB snapshot absorbs a day's delta without a
    * rebuild. Absence still means retention, and removal is EXPLICIT via
    * tombstone triples under the reserved [[Graph.DeleteKey]]:
    *
    *   - `(id, "@delete", "*")` deletes the whole element — within one
    *     batch the id-level tombstone WINS over any data triples for the
    *     same id (deterministic: a delete+reinsert needs two batches);
    *   - `(id, "@delete", k)` unsets property key `k` on the element —
    *     after the merge, so it also wins over batch-supplied values for
    *     `k` in the same batch; all sibling keys are untouched. An unset
    *     of an absent key (or on an absent id) is a no-op.
    *
    * Both forms are idempotent (re-merging the same tombstone batch is a
    * no-op) — the at-scale delete story the reference only gets by full
    * rebuild. Merge semantics for data triples:
    *
    *   - ids absent from the batch pass through byte-identical;
    *   - labels merge as a sorted-distinct set union (re-running a mapper
    *     that adds a label composes with prior mappers, matching toPg over
    *     the unioned triples);
    *   - endpoints take the batch's value when the batch supplies one
    *     (latest-state re-pointing), else keep the snapshot's;
    *   - property keys in `latestKeys` are REPLACED by the batch's value
    *     set (latest-state scalar semantics, the B44 stance); every other
    *     key unions sorted-distinct, matching toPg's multi-valued
    *     collection. Keys the batch doesn't mention are kept;
    *   - `type` is recomputed from the merged endpoints.
    *
    * Scale shape: the snapshot is never shuffled. Untouched rows exit via
    * a broadcast anti-join and the (few) touched rows are extracted via a
    * broadcast semi-join, so the cost is two map-side scans of the
    * snapshot plus batch-sized shuffle work; only `toPg(batchTriples)`
    * exchanges, and only on the batch. Tombstone relations are
    * batch-sized too, consumed as further broadcast joins. Idempotent:
    * re-merging the same batch is a no-op (every rule above is
    * idempotent; spec-pinned).
    */
  def mergeInc(snapshot: DataFrame, batchTriples: DataFrame,
               latestKeys: Set[String] = Set.empty): DataFrame = {
    val tombs = batchTriples.where(col("key") === Graph.DeleteKey)
    val delIds = broadcast(
      tombs.where(col("value") === Graph.DeleteAll).select("id").distinct())
    val unsets = broadcast(tombs.where(col("value") =!= Graph.DeleteAll)
      .groupBy("id").agg(collect_set(col("value")).as("drop_keys")))
    val batchPg = toPg(batchTriples.where(col("key") =!= Graph.DeleteKey))
      .join(delIds, Seq("id"), "left_anti") // id-level delete wins in-batch
    // touched = upserted OR key-unset; fully-deleted ids exit nowhere
    val bIds = broadcast(
      batchPg.select("id").union(unsets.select("id")).distinct())
    val untouched = snapshot
      .join(bIds, Seq("id"), "left_anti")
      .join(delIds, Seq("id"), "left_anti")
      .select("type", "id", "labels", "from", "to", "properties")
    val touchedSnap = snapshot.join(bIds, Seq("id"), "left_semi")
      .join(delIds, Seq("id"), "left_anti").select(
        col("id"), col("labels").as("s_labels"), col("from").as("s_from"),
        col("to").as("s_to"), col("properties").as("s_props"))
    // full outer: an unset-only id has a snapshot row but no batch row
    val joined = batchPg.select(
        col("id"), col("labels").as("b_labels"), col("from").as("b_from"),
        col("to").as("b_to"), col("properties").as("b_props"))
      .join(touchedSnap, Seq("id"), "full_outer")
    val noVals = typedlit(Seq.empty[String])
    val noProps = typedlit(Map.empty[String, Seq[String]])
    val sProps = coalesce(col("s_props"), noProps)
    val bProps = coalesce(col("b_props"), noProps)
    val keys = array_distinct(concat(map_keys(sProps), map_keys(bProps)))
    def mergedVals(k: Column): Column = {
      val union = array_sort(array_distinct(concat(
        coalesce(element_at(sProps, k), noVals),
        coalesce(element_at(bProps, k), noVals))))
      if (latestKeys.isEmpty) union
      else when(k.isin(latestKeys.toSeq: _*),
          coalesce(element_at(bProps, k), element_at(sProps, k)))
        .otherwise(union)
    }
    val mergedFrom = coalesce(col("b_from"), col("s_from"))
    val merged = joined.select(
      when(mergedFrom.isNotNull, lit(Graph.EdgeType))
        .otherwise(lit(Graph.NodeType)).as("type"),
      col("id"),
      array_sort(array_distinct(concat(
        coalesce(col("s_labels"), noVals),
        coalesce(col("b_labels"), noVals)))).as("labels"),
      mergedFrom.as("from"),
      coalesce(col("b_to"), col("s_to")).as("to"),
      map_from_arrays(keys, transform(keys, mergedVals _)).as("properties"))
    // per-key unsets apply AFTER the merge (they win over batch values)
    val unset = merged.join(unsets, Seq("id"), "left")
      .withColumn("properties",
        when(col("drop_keys").isNull, col("properties"))
          .otherwise(map_filter(col("properties"),
            (k, _) => !array_contains(col("drop_keys"), k))))
      .drop("drop_keys")
    untouched.unionByName(unset)
  }

  /** Parsed-PG schema as read back from JSONL.pg: property values are the
    * ACTUAL values (as strings via primitivesAsString), matching what the
    * reference's loader feeds Neo4j — not the serialised triple form.
    */
  val JsonlSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("type", StringType), StructField("id", StringType),
      StructField("labels", ArrayType(StringType)),
      StructField("from", StringType), StructField("to", StringType),
      StructField("properties", MapType(StringType, ArrayType(StringType)))))
  }

  /** Reads JSONL.pg lines (files or a line DataFrame) back into PG rows —
    * the missing half of the JSONL sink, so graft pipelines can also
    * consume graphs produced elsewhere. Distributed text scan + from_json;
    * nodes get null endpoints, absent properties become empty maps.
    *
    * Note the same representational collapse the reference's loader has
    * (reference: src/ketl/io/neoloader.py:291-296 — parsed values go to the
    * database as-is): a JSON string "0.75" and the number 0.75 both land as
    * the string "0.75" here.
    */
  def fromJsonl(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    parseJsonl(spark.read.text(path).withColumnRenamed("value", "line"))

  def parseJsonl(lines: DataFrame): DataFrame =
    lines.select(from_json(col("line"), JsonlSchema,
        Map("primitivesAsString" -> "true")).as("pg"))
      .select(col("pg.type"), col("pg.id"), col("pg.labels"),
        col("pg.from"), col("pg.to"),
        coalesce(col("pg.properties"), map()).as("properties"))

  /** Validates PG rows against the graph invariants the reference lists as
    * its pending validations (reference: src/ketl/io/core.py:115-118 TODO):
    * every element labelled; edges with exactly one label and both
    * endpoints; nodes without endpoints. Returns one row per violation
    * `(id, problem)` — empty means loadable.
    */
  def validate(pg: DataFrame): DataFrame = {
    def violation(cond: Column, problem: String): DataFrame =
      pg.where(cond).select(col("id"), lit(problem).as("problem"))
    violation(size(col("labels")) === 0, "unlabelled element")
      .union(violation(col("type") === Graph.EdgeType && size(col("labels")) =!= 1,
        "edge must have exactly one label"))
      .union(violation(col("type") === Graph.EdgeType &&
        (col("from").isNull || col("to").isNull), "edge missing endpoint"))
      .union(violation(col("type") === Graph.NodeType &&
        (col("from").isNotNull || col("to").isNotNull), "node with endpoint"))
  }

  /** PG DataFrame → JSONL.pg lines (reference: src/ketl/io/core.py:130-191
    * pg_df_2_pg_jsonl). The reference serialises on the driver via
    * `toLocalIterator` — a non-starter at scale; here each line is built
    * distributively.
    *
    * Property values are already JSON representations, so by default each is
    * inlined verbatim (a `to_json` over the struct would double-encode
    * them). Properties written by a custom serialiser get their JSON
    * fragment from `converters` (keyed by property name) — the counterpart
    * of the reference's per-key value_converters unserialisation
    * (reference: src/ketl/io/core.py:150-174). Key order matches the
    * reference's dict layout: type, id, labels, properties[, from, to].
    */
  def toJsonl(pg: DataFrame,
              converters: Map[String, Column => Column] = Map.empty): DataFrame = {
    val q = (c: Column) => Triples.jsonSerialize(c) // JSON-quote a raw string
    val labelsJson = concat(lit("["),
      array_join(transform(col("labels"), q), ","), lit("]"))
    def valueJson(key: Column, v: Column): Column =
      converters.foldLeft(v) { case (acc, (k, conv)) =>
        when(key === k, conv(v)).otherwise(acc)
      }
    // entries key-sorted: the map's internal order follows collect_list
    // arrival order (nondeterministic under shuffle); sorting makes the
    // serialised text stable run-to-run
    val propsJson = concat(lit("{"),
      array_join(
        transform(array_sort(map_entries(col("properties"))), e =>
          concat(q(e.getField("key")), lit(":["),
            array_join(transform(e.getField("value"),
              v => valueJson(e.getField("key"), v)), ","),
            lit("]"))),
        ","),
      lit("}"))
    val base = concat(
      lit("""{"type":"""), q(col("type")),
      lit(""","id":"""), q(col("id")),
      lit(""","labels":"""), labelsJson,
      lit(""","properties":"""), propsJson)
    val line = when(col("type") === Graph.EdgeType,
        concat(base, lit(""","from":"""), q(col("from")),
          lit(""","to":"""), q(col("to")), lit("}")))
      .otherwise(concat(base, lit("}")))
    pg.select(line.as("line"))
  }

  /** Writes the JSONL.pg text, optionally compressed — the reference's own
    * TODO (src/ketl/io/core.py: JSONL compression options). `codec` is any
    * Spark text-sink codec name (`gzip`, `bzip2`, `deflate`, `lz4`);
    * [[fromJsonl]] needs no counterpart option because the text source
    * auto-detects compression from the file extension.
    */
  def writeJsonl(pg: DataFrame, path: String, codec: Option[String] = None,
                 converters: Map[String, Column => Column] = Map.empty): Unit = {
    val writer = toJsonl(pg, converters).write.mode("overwrite")
    codec.fold(writer)(c => writer.option("compression", c)).text(path)
  }
}
