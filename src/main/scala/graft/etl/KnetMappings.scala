package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mapping helpers for common KnetMiner node/edge shapes
  * (reference: src/ketl/mappings/knetminer.py).
  */
object KnetMappings {

  /** The `accessions` property `"SOURCE:ACC"` (reference:
    * src/ketl/mappings/knetminer.py:11 create_accession_tabmapper).
    * Either part can be a constant (reference's `"!CONST"` convention) via
    * `lit(...)` or a column value; empty/null parts drop the property.
    */
  def accessionProp(accSource: Column, acc: Column): Prop =
    Prop("accessions",
      when(accSource.isNull || accSource.cast("string") === "" ||
           acc.isNull || acc.cast("string") === "", lit(null))
        .otherwise(concat(accSource.cast("string"), lit(":"), acc.cast("string"))))

  /** The `dataSources` provenance property (reference:
    * src/ketl/mappings/knetminer.py:58 data_source_triple_mapper).
    */
  def dataSourcesProp(dataSource: String): Prop =
    Prop.constant("dataSources", dataSource)

  /** Accession node + linking edge for one accession column, mirroring the
    * reference real case (reference: tests/resources/ensembl/wf_mapping.py:27
    * make_accession_mappers_for_source): the accession node id is
    * `accession:SOURCE:ACC`, carries the raw value, type `Accession` and the
    * source; `hasAccession` edges link the owning node to it.
    * Returns (node triples, edge triples) for [[Triples.chain]]-ing.
    */
  def accessionMappers(df: org.apache.spark.sql.DataFrame, sourceId: String,
                       accCol: Column, ownerId: Column,
                       extraProps: Seq[Prop] = Seq.empty)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val accNodeId = Triples.wrap(accCol, s"accession:$sourceId:")
    val nodes = Triples.nodes(df, accNodeId,
      Seq(Prop("value", accCol), Prop.tpe("Accession"),
        Prop.constant("source", sourceId)) ++ extraProps)
    val edges = Triples.edges(df, "hasAccession", ownerId, accNodeId,
      props = extraProps)
    (nodes, edges)
  }
}
