package graft.etl

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.io.{Checkpoint, DataFrames}

/** Config-driven multi-step workflow runner — graft's counterpart of the
  * reference's Snakemake orchestration (reference:
  * tests/resources/ensembl/workflow.snakefile,
  * tests/resources/tabmap-test.snakefile,
  * tests/ketl/snake/test_real_case.py run_snakefile).
  *
  * Like Snakemake, every step declares input/output FILES and the runner
  * derives the DAG from them: a step is ready when each of its inputs
  * exists on disk (raw source file, or an upstream step's checkpoint), and
  * a step whose outputs are already checkpointed is SKIPPED — rerunning a
  * half-finished workflow resumes where it stopped, the property the
  * reference gets from Snakemake + df_check_path `_SUCCESS` markers.
  * Ready steps run in deterministic name order, so a run's step sequence
  * is reproducible.
  *
  * Mapper CODE is bound by NAME through a registry (`mappers`), exactly as
  * the reference's snakefile references mapper objects defined in
  * wf_mapping.py: the config carries the orchestration (files, order,
  * loader settings), the registry carries the mapping logic.
  *
  * Step kinds (config keys under `workflow.steps.<name>.`):
  *  - `kind: map` — `input` table file → `output` triples checkpoint via
  *    the registered [[TabFileMapper]] named by `mapper`
  *    (reference rule: map_gene_tsv / map_ensembl_plants_genes).
  *  - `kind: pg` — `inputs` (comma-separated triples checkpoints) →
  *    unionByName → [[PgGraph.toPg]] → `output` checkpoint
  *    (reference rule: node_triples_2_pg_df / triples_2_json_pg).
  *  - `kind: jsonl` — `input` PG checkpoint → [[PgGraph.toJsonl]] →
  *    `output` text directory (reference rule: node_triples_2_json_pg).
  *  - `kind: load` — `input` JSONL.pg → [[NeoLoader.load]] through the
  *    runner's transport, phase done-flags under `done`, optional
  *    `batch_size` (reference rule: neo_loader).
  *
  * Paths in the config may be written as base paths or `_SUCCESS` check
  * paths (the reference's df_path/df_check_path round-trip); `${VAR}` env
  * interpolation comes from [[graft.io.Config.parse]] upstream.
  */
object Workflow {

  final case class Step(name: String, conf: Map[String, String]) {
    def kind: String = conf.getOrElse("kind",
      throw new IllegalArgumentException(s"workflow step $name: missing kind"))

    private def get(key: String): String = conf.getOrElse(key,
      throw new IllegalArgumentException(s"workflow step $name ($kind): missing $key"))

    def inputs: Seq[String] = kind match {
      case "pg" => get("inputs").split(",").map(_.trim).filter(_.nonEmpty).toSeq
      case _ => Seq(get("input"))
    }

    def output: String = kind match {
      case "load" => get("done")
      case _ => get("output")
    }
  }

  /** One executed (or skipped) step, in execution order. */
  final case class StepRun(name: String, kind: String, skipped: Boolean)

  /** Extracts the step table from a parsed config's dotted keys
    * (`workflow.steps.<name>.<key> -> value`).
    */
  def steps(conf: Map[String, String],
            prefix: String = "workflow.steps."): Seq[Step] =
    conf.collect { case (k, v) if k.startsWith(prefix) =>
        k.drop(prefix.length).split("\\.", 2) match {
          case Array(name, key) => (name, key, v)
        }
      }
      .groupBy(_._1)
      .map { case (name, kvs) =>
        Step(name, kvs.map { case (_, k, v) => k -> v }.toMap)
      }
      .toSeq.sortBy(_.name)

  /** Runs (or resumes) the workflow. Returns the step runs in execution
    * order; `skipped = true` marks steps whose outputs were already
    * checkpointed.
    */
  def run(spark: SparkSession, conf: Map[String, String],
          mappers: Map[String, TabFileMapper] = Map.empty,
          transport: NeoLoader.CypherTransport = new NeoLoader.NoopTransport)
      : Seq[StepRun] = {
    var pending = steps(conf)
    require(pending.nonEmpty, "workflow: no steps configured")
    val runs = Seq.newBuilder[StepRun]
    while (pending.nonEmpty) {
      val (ready, blocked) = pending.partition(_.inputs.forall(available))
      if (ready.isEmpty)
        throw new IllegalArgumentException(
          "workflow stuck — no step's inputs are satisfiable: " +
            blocked.map(s => s"${s.name} waits on " +
              s.inputs.filterNot(available).mkString(", ")).mkString("; "))
      ready.foreach(s => runs += exec(spark, s, mappers, transport))
      pending = blocked
    }
    runs.result()
  }

  /** A path is available when it exists as given, as a parquet/text
    * checkpoint with a `_SUCCESS` marker, or (for load done-flags) when
    * both phase flags exist.
    */
  private def available(path: String): Boolean = {
    val base = Checkpoint.basePath(path)
    Files.exists(Paths.get(path)) || Files.exists(Paths.get(Checkpoint.checkPath(base)))
  }

  private def checkpointDone(path: String): Boolean =
    Files.exists(Paths.get(Checkpoint.checkPath(Checkpoint.basePath(path))))

  private def loadDone(doneBase: String): Boolean = {
    val trimmed = doneBase.stripSuffix(".nodes").stripSuffix(".edges")
    Files.exists(Paths.get(trimmed + ".nodes")) && Files.exists(Paths.get(trimmed + ".edges"))
  }

  private def exec(spark: SparkSession, step: Step,
                   mappers: Map[String, TabFileMapper],
                   transport: NeoLoader.CypherTransport): StepRun = step.kind match {
    case "map" =>
      val out = Checkpoint.basePath(step.output)
      if (checkpointDone(out)) StepRun(step.name, "map", skipped = true)
      else {
        val mapperName = step.conf.getOrElse("mapper",
          throw new IllegalArgumentException(s"workflow step ${step.name}: missing mapper"))
        val m = mappers.getOrElse(mapperName,
          throw new IllegalArgumentException(
            s"workflow step ${step.name}: mapper '$mapperName' not registered " +
              s"(have: ${mappers.keys.toSeq.sorted.mkString(", ")})"))
        m.map(spark, step.inputs.head, outPath = Some(out))
        StepRun(step.name, "map", skipped = false)
      }

    case "pg" =>
      val out = Checkpoint.basePath(step.output)
      if (checkpointDone(out)) StepRun(step.name, "pg", skipped = true)
      else {
        val triples = DataFrames.unionAllByName(
          step.inputs.map(p => Checkpoint.load(spark, p)))
        Checkpoint.save(PgGraph.toPg(triples), out)
        StepRun(step.name, "pg", skipped = false)
      }

    case "jsonl" =>
      val out = Checkpoint.basePath(step.output)
      if (checkpointDone(out)) StepRun(step.name, "jsonl", skipped = true)
      else {
        PgGraph.writeJsonl(Checkpoint.load(spark, step.inputs.head), out,
          codec = step.conf.get("codec"))
        StepRun(step.name, "jsonl", skipped = false)
      }

    case "load" =>
      val doneBase = step.output
      if (loadDone(doneBase)) StepRun(step.name, "load", skipped = true)
      else {
        val cfg = NeoLoader.Config(
          batchSize = step.conf.get("batch_size").map(_.toInt).getOrElse(2500),
          doneBasePath = Some(doneBase))
        val report = NeoLoader.load(
          PgGraph.fromJsonl(spark, step.inputs.head), transport, cfg)
        StepRun(step.name, "load",
          skipped = report.nodesSkipped && report.edgesSkipped)
      }

    case other =>
      throw new IllegalArgumentException(
        s"workflow step ${step.name}: unknown kind '$other' " +
          "(expected map | pg | jsonl | load)")
  }
}
