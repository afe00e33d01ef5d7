package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.DataType

import graft.io.{Checkpoint, DataFrames}

/** Config-driven tabular-file → triples mapping unit (reference:
  * src/ketl/tabmap/core.py:445-618 GenericTabFileMapper / TabFileMapper).
  *
  * One object binds everything the reference's workflow step carries: the
  * read options (merged over the TSV defaults), optional explicit column
  * types (applied only when `inferSchema` is off, like the reference's
  * SparkDataFrameTypes), the mapper set, and an optional checkpoint output
  * for incremental workflow engines. `map()` is the whole step:
  * read → cast → map → checkpoint.
  *
  * The mapper is any `DataFrame => DataFrame` producing triple rows — a
  * single [[Triples.nodes]]/[[Triples.edges]] call (the reference's
  * TabFileMapper case) or a [[Triples.chain]] of several (its
  * GenericTabFileMapper over df_mappers_chain). Everything stays
  * declarative: the read is one scan, the mapping one narrow codegen stage.
  */
final case class TabFileMapper(
    mapper: DataFrame => DataFrame,
    options: Map[String, String] = Map.empty,
    columnTypes: Map[String, DataType] = Map.empty) {

  /** Runs the step. With `outPath`, the result is checkpointed (parquet +
    * `_SUCCESS`, reference: src/ketl/tabmap/core.py:545-552) and the saved
    * frame returned.
    */
  def map(spark: SparkSession, filePath: String,
          outPath: Option[String] = None): DataFrame = {
    val raw = DataFrames.readTable(spark, filePath, options)
    val inferSchema = options.getOrElse("inferSchema", "true") == "true"
    // as in the reference: explicit types apply only when inference is off
    // (src/ketl/tabmap/core.py:531-537)
    val typed =
      if (!inferSchema && columnTypes.nonEmpty) DataFrames.castColumns(raw, columnTypes)
      else raw
    val triples = mapper(typed)
    outPath match {
      case Some(p) => Checkpoint.save(triples, p)
      case None => triples
    }
  }
}

object TabFileMapper {

  /** Single node-type file mapper — the reference's common TabFileMapper
    * case (src/ketl/tabmap/core.py:556-575).
    */
  def nodes(id: Column, props: Seq[Prop],
            options: Map[String, String] = Map.empty,
            columnTypes: Map[String, DataType] = Map.empty): TabFileMapper =
    TabFileMapper(df => Triples.nodes(df, id, props), options, columnTypes)

  /** Single edge-type file mapper with the auto edge id. */
  def edges(edgeType: String, from: Column, to: Column,
            props: Seq[Prop] = Seq.empty,
            options: Map[String, String] = Map.empty,
            columnTypes: Map[String, DataType] = Map.empty): TabFileMapper =
    TabFileMapper(df => Triples.edges(df, edgeType, from, to, props),
      options, columnTypes)

  /** Several mappers over the same file, chained — the
    * GenericTabFileMapper + df_mappers_chain composition
    * (reference: src/ketl/tabmap/helpers.py:179).
    */
  def chained(mappers: Seq[DataFrame => DataFrame],
              options: Map[String, String] = Map.empty,
              columnTypes: Map[String, DataType] = Map.empty): TabFileMapper = {
    require(mappers.nonEmpty, "chained: need at least one mapper")
    TabFileMapper(
      df => Triples.chain(mappers.head(df), mappers.tail.map(_(df)): _*),
      options, columnTypes)
  }
}
