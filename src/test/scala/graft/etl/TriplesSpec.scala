package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.Graph

/** Mirrors the reference's tabmap tests
  * (reference: tests/ketl/tabmap/test_tabmap_core.py).
  */
class TriplesSpec extends SparkSpec {
  import spark.implicits._

  private def collectTriples(df: org.apache.spark.sql.DataFrame): Set[(String, String, String)] =
    df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet

  test("node mapping serialises values as JSON and drops nulls (ref test_map)") {
    val df = Seq(
      ("001", Some("Alice"), 30, "Wonderland"),
      ("002", Some("Bob"), 25, "Builderland"),
      ("003", None, 22, "Nullville")
    ).toDF("id", "name", "age", "city")

    val triples = Triples.nodes(df, col("id"),
      Seq(Prop.column("name", "hasName"), Prop.column("age")))

    assert(collectTriples(triples) === Set(
      ("001", "hasName", "\"Alice\""),
      ("001", "age", "30"),
      ("002", "hasName", "\"Bob\""),
      ("002", "age", "25"),
      ("003", "age", "22")))
  }

  test("constant and type props (ref test_map_constants)") {
    val df = Seq(("001", "Alice", 30), ("002", "Bob", 25)).toDF("id", "name", "age")
    val triples = Triples.nodes(df, col("id"),
      Seq(Prop.column("name", "hasName"), Prop.column("age"),
        Prop.tpe("Person"), Prop.constant("source", "TestDataset")))

    val ts = collectTriples(triples)
    assert(ts.count(_._2 == Graph.TypeKey) === 2)
    assert(ts.filter(_._2 == Graph.TypeKey).map(_._3) === Set("Person"))
    assert(ts.filter(_._2 == "source").map(_._3) === Set("\"TestDataset\""))
    assert(ts.size === 2 * 4)
  }

  test("edge mapping with auto id and prefix (ref test_auto_edge_id)") {
    val df = Seq(("GENE001", "PROT001"), ("GENE002", "PROT002")).toDF("gene", "protein")
    val triples = Triples.edges(df, "encodesProtein", col("gene"), col("protein"),
      idPrefix = "test:")

    assert(collectTriples(triples) === Set(
      ("test:encodesProtein:GENE001-PROT001", Graph.TypeKey, "encodesProtein"),
      ("test:encodesProtein:GENE001-PROT001", Graph.FromKey, "GENE001"),
      ("test:encodesProtein:GENE001-PROT001", Graph.ToKey, "PROT001"),
      ("test:encodesProtein:GENE002-PROT002", Graph.TypeKey, "encodesProtein"),
      ("test:encodesProtein:GENE002-PROT002", Graph.FromKey, "GENE002"),
      ("test:encodesProtein:GENE002-PROT002", Graph.ToKey, "PROT002")))
  }

  test("optional edge property dropped when null (ref test_from_extractor_row_mapper)") {
    val df = Seq(
      ("GENE001", "PROT001", Some("122030434")),
      ("GENE002", "PROT002", None)
    ).toDF("gene", "protein", "reference")

    val triples = Triples.edges(df, "encodesProtein",
      Triples.wrap(col("gene"), "ENSEMBL:"), Triples.wrap(col("protein"), "UNIPROT:"),
      Seq(Prop("hasPMID", Triples.wrap(col("reference"), "PMID:"))))

    val ts = collectTriples(triples)
    assert(ts.contains(("encodesProtein:ENSEMBL:GENE001-UNIPROT:PROT001", "hasPMID", "\"PMID:122030434\"")))
    assert(!ts.exists(t => t._1.contains("GENE002") && t._2 == "hasPMID"))
    assert(ts.size === 7)
  }

  test("jsonSerialize matches json.dumps semantics") {
    val df = Seq((Some("quote\"back\\slash"), Option.empty[String], Some(""))).toDF("a", "b", "c")
    val r = df.select(
      Triples.jsonSerialize(col("a")),
      Triples.jsonSerialize(col("b")),
      Triples.jsonSerialize(col("c")),
      Triples.jsonSerialize(lit(0.75)),
      Triples.jsonSerialize(lit(true))).collect()(0)
    assert(r.getString(0) === "\"quote\\\"back\\\\slash\"")
    assert(r.isNullAt(1))
    assert(r.isNullAt(2))
    assert(r.getString(3) === "0.75")
    assert(r.getString(4) === "true")
  }

  test("TSV file mapping end-to-end (ref test_mapping_tsv semantics)") {
    val path = java.nio.file.Files.createTempDirectory("graft").resolve("genes.tsv")
    java.nio.file.Files.writeString(path,
      "accession\tname\tchromosome\tbegin\tend\n" +
      "# a comment line\n" +
      "ENSMBL0003\tEGFR\t7C\t55019017\t55211628\n")
    val df = graft.io.DataFrames.readTable(spark, path.toString)
    val triples = Triples.nodes(df, col("accession"),
      Seq(Prop.column("name", "hasGeneName"), Prop.column("accession", "hasAccession"),
        Prop.column("begin", "hasChromosomeBegin"),
        Prop.tpe("Gene"), Prop.constant("source", "TestTSV")))
    val ts = collectTriples(triples)
    assert(ts === Set(
      ("ENSMBL0003", "hasGeneName", "\"EGFR\""),
      ("ENSMBL0003", "hasAccession", "\"ENSMBL0003\""),
      ("ENSMBL0003", "hasChromosomeBegin", "55019017"),
      ("ENSMBL0003", Graph.TypeKey, "Gene"),
      ("ENSMBL0003", "source", "\"TestTSV\"")))
  }
}
