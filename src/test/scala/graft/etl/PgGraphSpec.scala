package graft.etl

import graft.SparkSpec
import graft.model.Graph

/** Mirrors the reference's io tests (reference: tests/ketl/io/test_io.py). */
class PgGraphSpec extends SparkSpec {
  import spark.implicits._

  private lazy val nodeTriples = Seq(
    ("N001", "name", "\"Node 1\""),
    ("N001", Graph.TypeKey, "TestNode"),
    ("N002", "name", "\"Node 2\""),
    ("N002", Graph.TypeKey, "TestNode"),
    ("N003", "name", "\"Node 3\""),
    ("N003", Graph.TypeKey, "TestNode"),
    ("N003", "nickname", "\"Noddy\""),
    ("N003", "nickname", "\"Noddy2\""),
    ("N003", Graph.TypeKey, "NoddyNode"),
    ("N004", Graph.TypeKey, "EmptyNode")
  ).toDF("id", "key", "value")

  private lazy val edgeTriples = Seq(
    ("E001", Graph.FromKey, "N001"), ("E001", Graph.ToKey, "N002"),
    ("E001", Graph.TypeKey, "links"), ("E001", "weight", "0.75"),
    ("E002", Graph.FromKey, "N002"), ("E002", Graph.ToKey, "N003"),
    ("E002", Graph.TypeKey, "links"),
    ("E002", "weight", "0.85"), ("E002", "weight", "0.95"),
    ("E003", Graph.FromKey, "N003"), ("E003", Graph.ToKey, "N001"),
    ("E003", Graph.TypeKey, "inferredLink"),
    ("E003", "description", "\"Inferred relationship\""),
    ("E004", Graph.FromKey, "N004"), ("E004", Graph.ToKey, "N001"),
    ("E004", Graph.TypeKey, "links")
  ).toDF("id", "key", "value")

  private def pgMap(df: org.apache.spark.sql.DataFrame) =
    pgMapOf(PgGraph.toPg(df))

  private def pgMapOf(pg: org.apache.spark.sql.DataFrame) =
    pg.collect().map { r =>
      r.getAs[String]("id") -> ((r.getAs[String]("type"),
        r.getAs[scala.collection.Seq[String]]("labels").toSet,
        Option(r.getAs[String]("from")), Option(r.getAs[String]("to")),
        r.getAs[Map[String, scala.collection.Seq[String]]]("properties")
          .map { case (k, v) => k -> v.toSet }))
    }.toMap

  test("node PG aggregation (ref TestTriples2PgDf node tests)") {
    val pg = pgMap(nodeTriples)
    assert(pg.size === 4)
    assert(pg.values.forall(_._1 == Graph.NodeType))
    assert(pg("N001")._2 === Set("TestNode"))
    assert(pg("N003")._2 === Set("TestNode", "NoddyNode"))
    assert(pg("N004")._2 === Set("EmptyNode"))
    assert(pg("N001")._5 === Map("name" -> Set("\"Node 1\"")))
    assert(pg("N003")._5("nickname") === Set("\"Noddy\"", "\"Noddy2\""))
    assert(pg("N004")._5 === Map.empty)
  }

  test("edge PG aggregation (ref TestTriples2PgDf edge tests)") {
    val pg = pgMap(edgeTriples)
    assert(pg.size === 4)
    assert(pg.values.forall(_._1 == Graph.EdgeType))
    assert(pg("E001")._3 === Some("N001") && pg("E001")._4 === Some("N002"))
    assert(pg("E001")._5("weight") === Set("0.75"))
    assert(pg("E002")._5("weight") === Set("0.85", "0.95"))
    assert(pg("E003")._2 === Set("inferredLink"))
    assert(pg("E004")._5 === Map.empty)
  }

  test("JSONL serialisation round-trips (ref TestPgDf2PgJSONL)") {
    val lines = PgGraph.toJsonl(PgGraph.toPg(nodeTriples.union(edgeTriples)))
      .as[String].collect()
    assert(lines.length === 8)
    // Each line must be valid JSON with unserialised property values.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val parsed = lines.map(mapper.readTree)
    val byId = parsed.map(n => n.get("id").asText() -> n).toMap
    assert(byId("N001").get("type").asText() === "node")
    assert(byId("N001").get("properties").get("name").get(0).asText() === "Node 1")
    assert(byId("E001").get("from").asText() === "N001")
    assert(byId("E001").get("to").asText() === "N002")
    assert(byId("E001").get("properties").get("weight").get(0).asDouble() === 0.75)
    assert(byId("E003").get("labels").get(0).asText() === "inferredLink")
    val nick = byId("N003").get("properties").get("nickname")
    assert(Set(nick.get(0).asText(), nick.get(1).asText()) === Set("Noddy", "Noddy2"))
    assert(byId("N004").get("properties").size() === 0)
  }

  test("PG validation flags the invariants the reference lists (io/core.py TODO)") {
    val broken = Seq(
      ("E9", Graph.FromKey, "N1"),              // edge missing @to
      ("E9", Graph.TypeKey, "links"),
      ("E8", Graph.FromKey, "N1"), ("E8", Graph.ToKey, "N2"),
      ("E8", Graph.TypeKey, "a"), ("E8", Graph.TypeKey, "b"), // two labels
      ("N9", "name", "\"x\"")                   // unlabelled node
    ).toDF("id", "key", "value")
    val problems = PgGraph.validate(PgGraph.toPg(broken))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(problems === Set(
      ("E9", "edge missing endpoint"),
      ("E8", "edge must have exactly one label"),
      ("N9", "unlabelled element")))
    // and a clean graph validates empty
    assert(PgGraph.validate(PgGraph.toPg(nodeTriples.union(edgeTriples))).count() === 0)
  }

  test("custom value converters round-trip (ref ValueConverter extension point)") {
    import org.apache.spark.sql.functions._
    // a non-JSON serialiser: raw value with a prefix, no quoting
    val rawSerializer = (c: org.apache.spark.sql.Column) =>
      concat(lit("raw|"), c.cast("string"))
    val df = Seq(("N1", "hello")).toDF("id", "name")
    val triples = Triples.nodes(df, col("id"),
      Seq(Prop("name", col("name"), serializer = rawSerializer), Prop.tpe("T")))
    val stored = triples.where(col("key") === "name").collect()(0).getString(2)
    assert(stored === "raw|hello")
    // JSONL export needs the matching converter to re-encode valid JSON
    val jsonl = PgGraph.toJsonl(PgGraph.toPg(triples),
      converters = Map("name" -> ((v: org.apache.spark.sql.Column) =>
        Triples.jsonSerialize(regexp_replace(v, "^raw\\|", "")))))
      .as[String].collect()(0)
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(jsonl)
    assert(node.get("properties").get("name").get(0).asText() === "hello")
  }

  test("Cypher multi-value modes (ref neoloader _parse_pg_elem_property)") {
    val pg = PgGraph.toPg(edgeTriples)
    // default Auto: singleton unwrapped, multi kept as array
    val auto = NeoCypher.statements(pg, Graph.EdgeType, batchSize = 100).collect().mkString
    assert(auto.contains("\"weight\":0.75"))       // E001 singleton unwrapped
    assert(auto.contains("\"weight\":[0.85,0.95]")) // E002 stays an array
    // Multiple: everything stays an array
    val multi = NeoCypher.statements(pg, Graph.EdgeType, batchSize = 100,
      config = NeoCypher.PropertyConfig(default = NeoCypher.Multiple)).collect().mkString
    assert(multi.contains("\"weight\":[0.75]"))
    // Single on a multi-valued property raises
    val err = intercept[Exception] {
      NeoCypher.statements(pg, Graph.EdgeType, batchSize = 100,
        config = NeoCypher.PropertyConfig(modes = Map("weight" -> NeoCypher.Single)))
        .collect()
    }
    assert(err.getMessage.contains("weight") ||
      err.getCause != null && err.getCause.getMessage.contains("weight"))
  }

  test("mergeInc upserts a batch into a PG snapshot (A48 semantics)") {
    val snapTriples = Seq(
      ("N1", Graph.TypeKey, "Gene"), ("N1", "name", "\"g1\""),
      ("N1", "score", "\"a\""),
      ("N2", Graph.TypeKey, "Gene"), ("N2", "name", "\"g2\""),
      ("E1", Graph.TypeKey, "rel"), ("E1", Graph.FromKey, "N1"),
      ("E1", Graph.ToKey, "N2"), ("E1", "weight", "1")
    ).toDF("id", "key", "value")
    val batch = Seq(
      ("N1", Graph.TypeKey, "Audited"), ("N1", "name", "\"G1\""),
      ("N1", "score", "\"b\""),
      ("E1", Graph.TypeKey, "rel"), ("E1", Graph.FromKey, "N1"),
      ("E1", Graph.ToKey, "N3"),
      ("N3", Graph.TypeKey, "Gene"), ("N3", "name", "\"g3\"")
    ).toDF("id", "key", "value")
    val snapshot = PgGraph.toPg(snapTriples)
    val merged = PgGraph.mergeInc(snapshot, batch, latestKeys = Set("name"))
    val m = pgMapOf(merged)
    assert(m.size === 4)
    // touched node: labels union, latest-state key replaced, other key unioned
    assert(m("N1")._2 === Set("Gene", "Audited"))
    assert(m("N1")._5("name") === Set("\"G1\""))
    assert(m("N1")._5("score") === Set("\"a\"", "\"b\""))
    // untouched node passes through byte-identical (no-delete stance: absence
    // from the batch means retention, never removal)
    assert(m("N2") === pgMap(snapTriples)("N2"))
    // edge re-pointed (endpoint latest-state); weight absent from the batch
    // is KEPT — a removal needs an explicit tombstone upstream of the merge
    assert(m("E1")._1 === Graph.EdgeType)
    assert(m("E1")._3 === Some("N1") && m("E1")._4 === Some("N3"))
    assert(m("E1")._5("weight") === Set("1"))
    // brand-new id appends
    assert(m("N3")._2 === Set("Gene") && m("N3")._5("name") === Set("\"g3\""))
    // idempotent: re-merging the same batch is a no-op
    val again = pgMapOf(PgGraph.mergeInc(merged, batch, latestKeys = Set("name")))
    assert(again === m)
    // scale shape: the snapshot side exits through BROADCAST anti/semi hash
    // joins — never a snapshot-side exchange
    val plan = merged.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti")
      && plan.contains("LeftSemi"))
  }

  test("mergeInc tombstones: id delete, per-key unset leaves siblings, delete-then-remerge idempotent") {
    val snapTriples = Seq(
      ("N1", Graph.TypeKey, "Gene"), ("N1", "name", "\"g1\""),
      ("N1", "score", "\"a\""),
      ("N2", Graph.TypeKey, "Gene"), ("N2", "name", "\"g2\""),
      ("N4", Graph.TypeKey, "Gene"), ("N4", "name", "\"g4\""),
      ("E1", Graph.TypeKey, "rel"), ("E1", Graph.FromKey, "N1"),
      ("E1", Graph.ToKey, "N2"), ("E1", "weight", "1")
    ).toDF("id", "key", "value")
    val batch = Seq(
      // id-level delete — WINS over the data triple for the same id
      ("N2", Graph.DeleteKey, Graph.DeleteAll),
      ("N2", "name", "\"zombie\""),
      // per-key unset with an upsert on a sibling key of the same id
      ("N1", Graph.DeleteKey, "score"),
      ("N1", Graph.TypeKey, "Audited"),
      // unset-only id: no data triples at all
      ("N4", Graph.DeleteKey, "name"),
      // unset of an absent key and on an absent id: both no-ops
      ("N4", Graph.DeleteKey, "no_such_key"),
      ("N9", Graph.DeleteKey, "name")
    ).toDF("id", "key", "value")
    val snapshot = PgGraph.toPg(snapTriples)
    val merged = PgGraph.mergeInc(snapshot, batch)
    val m = pgMapOf(merged)
    // tombstoned id absent; no phantom N9; E1 and survivors intact
    assert(m.keySet === Set("N1", "N4", "E1"))
    // unset removed exactly the named key; siblings untouched
    assert(m("N1")._5.keySet === Set("name"))
    assert(m("N1")._5("name") === Set("\"g1\""))
    assert(m("N1")._2 === Set("Audited", "Gene"))
    // unset-only id: same element minus the key, no other movement
    assert(m("N4")._2 === Set("Gene") && m("N4")._5 === Map.empty)
    // the edge pointing at the deleted node passes through (referential
    // cleanup is a validate/pg_validate concern, not silent edge dropping)
    assert(m("E1")._5("weight") === Set("1"))
    // delete-then-remerge: same tombstone batch again is a no-op
    val again = pgMapOf(PgGraph.mergeInc(merged, batch))
    assert(again === m)
    // a reserved-key triple never leaks into properties via toPg
    assert(!PgGraph.toPg(batch).select("properties").collect()
      .exists(_.getMap[String, Seq[String]](0).contains(Graph.DeleteKey)))
  }

  test("Cypher statement batches (ref neoloader batching)") {
    val pg = PgGraph.toPg(nodeTriples.union(edgeTriples))
    val nodeStmts = NeoCypher.statements(pg, Graph.NodeType, batchSize = 3).collect()
    assert(nodeStmts.forall(_.startsWith("UNWIND [")))
    assert(nodeStmts.forall(_.contains("SET n :$(nlabels)")))
    // every node carries the common label
    assert(nodeStmts.forall(_.contains("\"Node\"")))
    val edgeStmts = NeoCypher.statements(pg, Graph.EdgeType, batchSize = 3).collect()
    assert(edgeStmts.forall(_.contains("CREATE (from)-[e:$(etype)]->(to)")))
    // batches respect size: 4 edges with batchSize 3 in one partition → ≤2 stmts/partition
    val totalEdges = edgeStmts.map(s => "\"from\":".r.findAllIn(s).length).sum
    assert(totalEdges === 4)
  }
}
