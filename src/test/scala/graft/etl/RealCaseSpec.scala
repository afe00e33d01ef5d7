package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Graph

/** End-to-end reproduction of the reference's real-case workflow
  * (reference: tests/ketl/snake/test_real_case.py +
  * tests/resources/ensembl/wf_mapping.py): an ENSEMBL→UniProt TSV mapped to
  * gene/protein nodes, accession nodes, hasAccession links and
  * encodesProtein edges, then aggregated to PG rows.
  */
class RealCaseSpec extends SparkSpec {

  private val ketlSource = "graft/RealCaseSpec"

  private lazy val input = {
    val path = java.nio.file.Files.createTempDirectory("graft-real").resolve("e2u.tsv")
    java.nio.file.Files.writeString(path,
      "ENSEMBL ID\tUniProt ID\nAT4G24270\tAT4G24270.1\nAT1G19130\tAT1G19130.1\n")
    graft.io.DataFrames.readTable(spark, path.toString)
  }

  /** The full chained mapping (reference: wf_mapping.py E2U_* mappers). */
  private lazy val triples = {
    val srcProp = Prop.constant("ketl:source", ketlSource)
    val geneId = Triples.wrap(col("ENSEMBL ID"), "gene:")
    val protId = Triples.wrap(col("UniProt ID"), "protein:")

    val geneNodes = Triples.nodes(input, geneId,
      Seq(Prop.tpe("Gene"), KnetMappings.dataSourcesProp("ENSEMBL-Plants"), srcProp))
    val protNodes = Triples.nodes(input, protId,
      Seq(Prop.tpe("Protein"), KnetMappings.dataSourcesProp("ENSEMBL-Plants"),
        KnetMappings.dataSourcesProp("TAIR"), srcProp))
    val (accNodes, accEdges) = KnetMappings.accessionMappers(
      input, "ENSEMBL-Plants", col("ENSEMBL ID"), geneId, Seq(srcProp))
    val (upNodes, upEdges) = KnetMappings.accessionMappers(
      input, "UniProt", col("UniProt ID"), protId, Seq(srcProp))
    val encodes = Triples.edges(input, "encodesProtein", geneId, protId,
      props = Seq(KnetMappings.dataSourcesProp("ENSEMBL Plants"), srcProp))

    Triples.chain(geneNodes, protNodes, accNodes, accEdges, upNodes, upEdges, encodes)
  }

  test("real-case triples match reference semantics for one input row") {
    val ts = triples.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val gene = "gene:AT4G24270"
    val prot = "protein:AT4G24270.1"
    val acc = "accession:ENSEMBL-Plants:AT4G24270"
    assert(ts.contains((gene, Graph.TypeKey, "Gene")))
    assert(ts.contains((gene, "dataSources", "\"ENSEMBL-Plants\"")))
    assert(ts.contains((gene, "ketl:source", "\"" + ketlSource + "\"")))
    assert(ts.contains((prot, Graph.TypeKey, "Protein")))
    assert(ts.contains((prot, "dataSources", "\"TAIR\"")))
    assert(ts.contains((acc, Graph.TypeKey, "Accession")))
    assert(ts.contains((acc, "value", "\"AT4G24270\"")))
    val accEdge = s"hasAccession:$gene-$acc"
    assert(ts.contains((accEdge, Graph.FromKey, gene)))
    assert(ts.contains((accEdge, Graph.ToKey, acc)))
    val encodes = s"encodesProtein:$gene-$prot"
    assert(ts.contains((encodes, Graph.TypeKey, "encodesProtein")))
    assert(ts.contains((encodes, "dataSources", "\"ENSEMBL Plants\"")))
  }

  test("real-case PG aggregation: multi-valued dataSources, edge endpoints") {
    val pg = PgGraph.toPg(triples)
    val prot = pg.where(col("id") === "protein:AT4G24270.1").collect()(0)
    assert(prot.getAs[String]("type") === Graph.NodeType)
    val props = prot.getAs[Map[String, scala.collection.Seq[String]]]("properties")
    assert(props("dataSources").toSet === Set("\"ENSEMBL-Plants\"", "\"TAIR\""))
    val edge = pg.where(col("id") === "encodesProtein:gene:AT4G24270-protein:AT4G24270.1")
      .collect()(0)
    assert(edge.getAs[String]("type") === Graph.EdgeType)
    assert(edge.getAs[String]("from") === "gene:AT4G24270")
    assert(edge.getAs[String]("to") === "protein:AT4G24270.1")
    // 2 input rows → 2 genes + 2 proteins + 4 accessions + 4 hasAccession + 2 encodes
    assert(pg.count() === 14)
  }

  test("accession prop helper handles constant sources and empty values") {
    import spark.implicits._
    val df = Seq(("ACC1", ""), ("", "X")).toDF("acc", "other")
    val t = Triples.nodes(df, col("acc"),
      Seq(KnetMappings.accessionProp(lit("ENSEMBL"), col("acc"))))
    val ts = t.collect().map(r => (r.getString(0), r.getString(2))).toSet
    assert(ts === Set(("ACC1", "\"ENSEMBL:ACC1\"")))
  }
}
