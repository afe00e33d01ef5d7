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

  private lazy val inputPath = {
    val path = java.nio.file.Files.createTempDirectory("graft-real").resolve("e2u.tsv")
    java.nio.file.Files.writeString(path,
      "ENSEMBL ID\tUniProt ID\nAT4G24270\tAT4G24270.1\nAT1G19130\tAT1G19130.1\n")
    path.toString
  }

  /** The full chained mapping as ONE config-driven workflow unit
    * (reference: wf_mapping.py E2U_* mappers bound into TabFileMapper
    * objects, src/ketl/tabmap/core.py:445-618).
    */
  private lazy val fileMapper: TabFileMapper = {
    val srcProp = Prop.constant("ketl:source", ketlSource)
    val geneId = Triples.wrap(col("ENSEMBL ID"), "gene:")
    val protId = Triples.wrap(col("UniProt ID"), "protein:")

    TabFileMapper.chained(Seq(
      df => Triples.nodes(df, geneId,
        Seq(Prop.tpe("Gene"), KnetMappings.dataSourcesProp("ENSEMBL-Plants"), srcProp)),
      df => Triples.nodes(df, protId,
        Seq(Prop.tpe("Protein"), KnetMappings.dataSourcesProp("ENSEMBL-Plants"),
          KnetMappings.dataSourcesProp("TAIR"), srcProp)),
      df => {
        val (n, e) = KnetMappings.accessionMappers(
          df, "ENSEMBL-Plants", col("ENSEMBL ID"), geneId, Seq(srcProp))
        n.union(e)
      },
      df => {
        val (n, e) = KnetMappings.accessionMappers(
          df, "UniProt", col("UniProt ID"), protId, Seq(srcProp))
        n.union(e)
      },
      df => Triples.edges(df, "encodesProtein", geneId, protId,
        props = Seq(KnetMappings.dataSourcesProp("ENSEMBL Plants"), srcProp))))
  }

  private lazy val triples = fileMapper.map(spark, inputPath)

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

  test("file mapper checkpoints its output and applies explicit column types") {
    val out = java.nio.file.Files.createTempDirectory("graft-real-out")
      .resolve("triples").toString
    fileMapper.map(spark, inputPath, outPath = Some(out))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(graft.io.Checkpoint.checkPath(out))))
    val reloaded = graft.io.Checkpoint.load(spark, out)
    assert(reloaded.count() === triples.count())
    // explicit types: inferSchema off + columnTypes casts the input column
    val typed = TabFileMapper.nodes(
      Triples.wrap(col("ENSEMBL ID"), "gene:"), Seq(Prop.tpe("Gene")),
      options = Map("inferSchema" -> "false"),
      columnTypes = Map("ENSEMBL ID" -> org.apache.spark.sql.types.StringType))
    assert(typed.map(spark, inputPath).count() === 2)
  }

  test("rowTriples escape hatch emits arbitrary per-row triples") {
    // a value function not Column-expressible (imperative string surgery):
    // reference RowTripleMapper equivalence (src/ketl/tabmap/core.py:83-115)
    val df = graft.io.DataFrames.readTable(spark, inputPath)
    val t = Triples.rowTriples(df) { row =>
      val ens = row.getAs[String]("ENSEMBL ID")
      val chromosomeGuess = ens.drop(2).takeWhile(_.isDigit)
      Seq(("gene:" + ens, "chromosome", "\"" + chromosomeGuess + "\""))
    }
    val got = t.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      ("gene:AT4G24270", "chromosome", "\"4\""),
      ("gene:AT1G19130", "chromosome", "\"1\"")))
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
