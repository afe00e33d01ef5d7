package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def batchEvents = graft.queries.Tables.events(spark, dir)

  test("eventStream cold start: empty source dir falls back to the declared schema and waits") {
    // production start-before-first-file: the eager schema read finds no
    // events.parquet; the stream must still START (declared EventsSchema)
    // instead of throwing AnalysisException
    val empty = java.nio.file.Files.createTempDirectory("graft-cold").toString
    val stream = Streaming.eventStream(spark, empty)
    assert(stream.isStreaming)
    assert(stream.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val query = Streaming.windowAgg(stream).writeStream
      .format("memory").queryName("cold_start").outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()
    assert(spark.table("cold_start").count() === 0)
  }

  test("D1: stream window agg equals the batch twin (end-to-end memory sink)") {
    val stream = Streaming.windowAgg(Streaming.eventStream(spark, dir))
    val query = stream.writeStream
      .format("memory").queryName("win_agg").outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()
    val streamed = spark.table("win_agg")
      .select("bucket", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = Streaming.windowAgg(batchEvents)
      .select("bucket", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("D1b: hopping-window stream agg equals the batch twin, 3 windows per event") {
    val stream = Streaming.hopWindowAgg(Streaming.eventStream(spark, dir))
    val query = stream.writeStream
      .format("memory").queryName("hop_agg").outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()
    val streamed = spark.table("hop_agg")
      .select("bucket", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    val batch = Streaming.hopWindowAgg(batchEvents)
      .select("bucket", "event_type", "n_events", "sum_value")
      .collect().map(_.toSeq).toSet

    assert(streamed === batch)
    // overlap invariant: summed per-window counts = 3x the event count
    val total = spark.table("hop_agg").agg(sum("n_events")).head().getLong(0)
    assert(total === 3 * batchEvents.count())
  }

  test("D2: streaming dedup drops re-delivered events") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val ev = spark.read.parquet(s"$dir/events.parquet")
    ev.limit(100).write.parquet(s"$tmp/batch1")
    // re-deliver the same 100 events plus 50 new ones
    ev.limit(150).write.parquet(s"$tmp/batch2")
    val raw = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val src = raw.withColumn("ts", graft.queries.Tables.eventTs(raw))
    val query = Streaming.dedup(src).writeStream
      .format("memory").queryName("dedup_sink").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    val ids = spark.table("dedup_sink").select("event_id").as[Long].collect()
    assert(ids.length === ids.distinct.length)
    assert(ids.length === 150)
  }

  test("D13: streaming anomaly scores equal the batch events_anomaly query") {
    // stage 1: the stream's window agg lands hourly buckets in the sink
    val stream = Streaming.windowAgg(Streaming.eventStream(spark, dir))
    val query = stream.writeStream
      .format("memory").queryName("anomaly_buckets").outputMode("complete").start()
    try query.processAllAvailable() finally query.stop()
    // stage 2: the shared trailing-z stage scores the accumulated buckets
    // (bucket as epoch micros, matching the batch query's output rule)
    val streamed = Streaming.anomalyScores(spark.table("anomaly_buckets")
        .withColumn("bucket", unix_micros(col("bucket"))))
      .collect().map(_.toSeq).toSet
    val batch = graft.queries.Relational.eventsAnomaly(spark, dir)
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
    // the monitor actually scores: at least one bucket has a defined z
    assert(streamed.exists(_(3) != null))
  }

  test("D13: append-mode closed buckets score exactly as the batch query's closed prefix") {
    // two time-ordered files so the watermark advances between triggers and
    // the engine actually CLOSES windows (the documented production wiring)
    val tmp = java.nio.file.Files.createTempDirectory("graft-anom").toString
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .orderBy("ts")
    val n = ev.count()
    ev.limit((n / 2).toInt).write.parquet(s"$tmp/batch1")
    ev.orderBy(col("ts").desc).limit((n - n / 2).toInt).write.parquet(s"$tmp/batch2")
    val raw = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val src = raw.withColumn("ts", graft.queries.Tables.eventTs(raw))
    val query = Streaming.windowAgg(src).writeStream
      .format("memory").queryName("anomaly_closed").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()

    val closed = spark.table("anomaly_closed")
      .withColumn("bucket", unix_micros(col("bucket")))
    // the watermark leaves the trailing bucket(s) open: a strict subset
    val closedKeys = closed.select("bucket", "event_type")
      .collect().map(_.toSeq).toSet
    val batchAll = graft.queries.Relational.eventsAnomaly(spark, dir)
    val batchKeys = batchAll.select("bucket", "event_type")
      .collect().map(_.toSeq).toSet
    assert(closedKeys.nonEmpty && closedKeys.subsetOf(batchKeys))
    assert(closedKeys.size < batchKeys.size,
      "the final watermark must leave at least one bucket unclosed")

    // closed buckets score FINAL values: identical rows to the batch query
    // restricted to the closed keys (every closed bucket's trailing
    // neighbours are closed too, so no z can be revised later)
    val streamed = Streaming.anomalyScores(closed).collect().map(_.toSeq).toSet
    val batchClosed = batchAll.collect().map(_.toSeq)
      .filter(r => closedKeys.contains(Seq(r(0), r(1)))).toSet
    assert(streamed === batchClosed)
    assert(streamed.exists(_(3) != null))

    // a replay-after-restart appends closed buckets twice; the monitor's
    // dedup keeps the scores identical
    val replayed = Streaming.anomalyScores(closed.union(closed))
      .collect().map(_.toSeq).toSet
    assert(replayed === streamed)
  }

  test("D14: in-stream snapshot diff flags equal the batch diff's added+changed half") {
    import org.apache.spark.sql.types._
    val docsSchema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val old = base.where(pmod(col("doc_id"), lit(10)) =!= 0)
    val neu = base.where(pmod(col("doc_id"), lit(10)) =!= 1)
      .withColumn("text", when(pmod(col("doc_id"), lit(10)) === 2,
        concat(col("text"), lit(" edited"))).otherwise(col("text")))
    // stream the NEW snapshot from files against the static old one
    val tmp = java.nio.file.Files.createTempDirectory("graft-diff").toString
    neu.write.parquet(s"$tmp/new")
    val src = spark.readStream.schema(docsSchema).parquet(s"$tmp/new")
    val query = Streaming.diffFlags(src, old).writeStream
      .format("memory").queryName("diff_flags").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    val streamed = spark.table("diff_flags").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.ops.dedup.Dedup.snapshotDiff(old, neu).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed === batch.filter(_._2 != "removed"))
    assert(streamed.exists(_._2 == "added") && streamed.exists(_._2 == "changed"))
    // removed rows are exactly what the stream CANNOT see — the documented
    // asymmetry: they exist in the batch diff only
    assert(batch.exists(_._2 == "removed"))
  }

  test("D4: foreachBatch lands stream batches as workflow checkpoints") {
    val out = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val query = Streaming.eventStream(spark, dir).writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(s"$out/events.parquet")
      }
      .option("checkpointLocation", s"$out/_chk")
      .start()
    try query.processAllAvailable() finally query.stop()
    val landed = graft.io.Checkpoint.load(spark,
      graft.io.Checkpoint.checkPath(s"$out/events.parquet"))
    assert(landed.count() === batchEvents.count())
  }

  test("D5: stream-stream band join (library op) matches the batch twin") {
    def purchases(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    def clicks(df: org.apache.spark.sql.DataFrame) =
      df.where(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts").as("c_ts"), col("event_id").as("c_id"))

    val joined = Streaming.bandJoin(
      purchases(Streaming.eventStream(spark, dir)),
      clicks(Streaming.eventStream(spark, dir)),
      leftKey = "user_id", rightKey = "c_user",
      leftTs = "p_ts", rightTs = "c_ts",
      watermark = "1 hour", bandBefore = "10 minutes")
    val query = joined.writeStream.format("memory")
      .queryName("ss_join").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    val streamed = spark.table("ss_join").count()

    // identical call on batch frames = the oracle
    val batch = Streaming.bandJoin(
      purchases(batchEvents), clicks(batchEvents),
      leftKey = "user_id", rightKey = "c_user",
      leftTs = "p_ts", rightTs = "c_ts",
      watermark = "1 hour", bandBefore = "10 minutes").count()

    assert(streamed === batch)
    assert(streamed > 0)
  }

  test("D6: streaming curation (quality gate + exact dedup) matches the batch twin") {
    val stream = Streaming.curate(Streaming.documentStream(spark, dir))
    val query = stream.writeStream.format("memory")
      .queryName("curated").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    // survivors per dup group are arbitrary on both engines: compare the
    // deduped key sets, which are determined
    val streamed = spark.table("curated")
      .select("key_hash").collect().map(_.getString(0)).toSet
    val batch = Streaming.curate(spark.read.parquet(s"$dir/documents.parquet"))
      .select("key_hash").collect().map(_.getString(0)).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("D7: streaming minhash near-dup matches the batch op and the stream's batch twin") {
    val streamed = {
      val q = Streaming.nearDupPairs(Streaming.documentStream(spark, dir), 0.5)
        .writeStream.format("memory").queryName("near_dups").outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("near_dups").select("a", "b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val twin = Streaming.nearDupPairs(docs, 0.5)
      .collect().map(p => (p.a, p.b)).toSet
    val batchOp = graft.ops.dedup.Dedup.minhashLsh(docs, 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed.nonEmpty)
    assert(streamed === twin)
    assert(streamed === batchOp)
  }

  test("D7b: retained near-dup dedups within the window and expires old members") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-retain").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("doc_id", "text", "epoch_s")
        .select(col("doc_id"), col("text"),
          col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val dupText = (1 to 40).map(i => s"tok$i").mkString(" ")
    val h = 3600L
    // non-zero base: event time at epoch 0 EQUALS the query's initial
    // watermark and the late-row filter drops it before the stateful op
    val t0 = 1000000000L
    // batch 1: two near-identical docs at t0
    write("b1", Seq((1L, dupText, t0), (2L, dupText, t0)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.nearDupPairsRetained(src, 0.5, tsCol = "ts", retention = "1 hour")
      .writeStream.format("memory").queryName("retained").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: an unrelated doc ten days later — advances the watermark
      write("b2", Seq((50L, (1 to 40).map(i => s"other$i").mkString(" "), t0 + 10 * 24 * h)))
      q.processAllAvailable()
      // batch 3: a duplicate of doc 1, but its buddies expired long ago
      write("b3", Seq((3L, dupText, t0 + 10 * 24 * h + 60)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("retained").select("a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // in-window pair found; (1,3)/(2,3) expired
  }

  test("D8: streaming MG candidates cover every true heavy hitter per group") {
    val capacity = 24
    val stream = Streaming.heavyHitterCandidates(
      Streaming.documentStream(spark, dir), capacity)
    val query = stream.writeStream
      .format("memory").queryName("hh_cands").outputMode("update").start()
    try query.processAllAvailable() finally query.stop()
    // last emission per group = the end-of-stream sketch state
    val finalRows = spark.table("hh_cands").collect()
      .groupBy(_.getString(0)).map { case (g, rows) => rows.maxBy(_.getLong(2)) }
    val cands = finalRows.map(r => r.getString(0) -> r.getSeq[String](1).toSet).toMap

    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    // ground truth at threshold n/(capacity+1): MG guarantee bound
    val truth = graft.ops.text.CorpusStats
      .heavyHitters(batchDocs, capacity + 1, groupCol = "source")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(truth.nonEmpty, "weak test: no heavy hitters at this capacity")
    truth.foreach { case (g, tok) =>
      assert(cands(g).contains(tok), s"group $g lost true heavy hitter '$tok'")
    }
    // bounded state: no candidate set ever exceeds capacity
    assert(spark.table("hh_cands").collect().forall(_.getSeq[String](1).size <= capacity))
  }

  test("D9: streaming passage counts converge to the batch chunking") {
    val stream = Streaming.passageCounts(Streaming.documentStream(spark, dir))
    val query = stream.writeStream
      .format("memory").queryName("passage_counts").outputMode("update").start()
    try query.processAllAvailable() finally query.stop()
    // update mode emits running counts; the max per fingerprint is the
    // final (monotone) count
    val streamed = spark.table("passage_counts").collect()
      .groupBy(_.getString(0)).map { case (fp, rows) =>
        fp -> rows.map(_.getLong(1)).max
      }
    val batch = graft.ops.dedup.Dedup
      .chunkFingerprints(spark.read.parquet(s"$dir/documents.parquet"))
      .groupBy("chunk_fp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed.toMap === batch)
    assert(streamed.nonEmpty)
  }

  test("stateless text gates (gopher + pii) run unchanged on a document stream") {
    import graft.ops.text.TextOps
    def gates(df: org.apache.spark.sql.DataFrame) = {
      val cols = (TextOps.gopherColumns(col("text")) ++ TextOps.piiColumns(col("text")))
        .collect { case (n, c) if n == "pass" || n == "scrubbed" => c.as(n) }
      df.select(col("doc_id") +: cols: _*)
    }
    val query = gates(Streaming.documentStream(spark, dir)).writeStream
      .format("memory").queryName("text_gates").outputMode("append").start()
    try query.processAllAvailable() finally query.stop()
    val streamed = spark.table("text_gates").collect().map(_.toSeq).toSet
    val batch = gates(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(_.toSeq).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("D3b: session state and source offsets survive a query restart from checkpoint") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val src = s"$tmp/src"
    val ckpt = s"$tmp/ckpt"
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val schema = org.apache.spark.sql.Encoders.product[Streaming.Event].schema

    val outDir = s"$tmp/out"
    // the memory sink is not fault-tolerant (no checkpoint recovery);
    // foreachBatch + parquet is, and is the production sink shape anyway
    def run(): Unit = {
      val events = spark.readStream.schema(schema).parquet(src)
        .as[Streaming.Event]
      val q = Streaming.sessionize(events, gapMinutes = 30, emitOpen = false)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streaming.UserSession], _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    def emitted(): Seq[Streaming.UserSession] =
      if (!new java.io.File(outDir).exists()) Nil
      else spark.read.schema(org.apache.spark.sql.Encoders.product[Streaming.UserSession].schema)
        .parquet(outDir).as[Streaming.UserSession].collect().toSeq

    // run 1: two events 10 min apart — they buffer in the OPEN trailing
    // session (emitOpen = false), so nothing is emitted
    Seq(Streaming.Event(1, ts(0), 7L, "click", 1.0),
        Streaming.Event(2, ts(10), 7L, "click", 2.0))
      .toDS().write.parquet(src)
    run()
    assert(emitted().isEmpty, "the open session must stay buffered, not emitted")

    // run 2 — a FRESH query on the SAME checkpoint: a later event closes
    // the buffered session. Emitting it proves both recoveries at once:
    // the state store carried the session across the restart, and the file
    // source resumed past batch 1 (re-reading it would double n_events).
    Seq(Streaming.Event(3, ts(100), 7L, "view", 4.0))
      .toDS().write.mode("append").parquet(src)
    run()
    assert(emitted() === Seq(Streaming.UserSession(7L, ts(0), ts(10), 2, 3.0)))
  }

  test("D3c: the sessionize monitor restarts from checkpoint on the RocksDB state backend") {
    // same two-run recovery scenario as D3b, but with the state store on
    // RocksDB (the 100M-key production backend — heap-bounded, disk-backed,
    // changelog-checkpointed) instead of the default in-memory provider.
    // Passing proves the stateful kernels are backend-agnostic AND that the
    // buffered session survives a cold restart through RocksDB snapshots.
    val tmp = java.nio.file.Files.createTempDirectory("graft-rocksdb").toString
    val src = s"$tmp/src"
    val ckpt = s"$tmp/ckpt"
    val outDir = s"$tmp/out"
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val schema = org.apache.spark.sql.Encoders.product[Streaming.Event].schema
    def run(): Unit = {
      val events = spark.readStream.schema(schema).parquet(src)
        .as[Streaming.Event]
      val q = Streaming.sessionize(events, gapMinutes = 30, emitOpen = false)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[Streaming.UserSession], _: Long) =>
          batch.write.mode("append").parquet(outDir): Unit
        }
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    Streaming.useRocksDbStateStore(spark)
    try {
      Seq(Streaming.Event(1, ts(0), 7L, "click", 1.0),
          Streaming.Event(2, ts(10), 7L, "click", 2.0))
        .toDS().write.parquet(src)
      run()
      assert(!new java.io.File(outDir).exists() ||
        spark.read.parquet(outDir).isEmpty,
        "the open session must stay buffered in RocksDB, not emitted")
      // fresh query, same checkpoint: the session closes only if RocksDB
      // recovered the buffered state and the source resumed past batch 1
      Seq(Streaming.Event(3, ts(100), 7L, "view", 4.0))
        .toDS().write.mode("append").parquet(src)
      run()
      val got = spark.read
        .schema(org.apache.spark.sql.Encoders.product[Streaming.UserSession].schema)
        .parquet(outDir).as[Streaming.UserSession].collect().toSeq
      assert(got === Seq(Streaming.UserSession(7L, ts(0), ts(10), 2, 3.0)))
    } finally Streaming.useDefaultStateStore(spark)
  }

  test("D3: sessionize splits on gaps > 30min and aggregates per session") {
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    val events = Seq(
      Streaming.Event(1, ts(0), 7L, "click", 1.0),
      Streaming.Event(2, ts(10), 7L, "click", 2.0),
      Streaming.Event(3, ts(100), 7L, "view", 4.0),  // gap 90min → new session
      Streaming.Event(4, ts(120), 7L, "click", 8.0),
      Streaming.Event(5, ts(0), 9L, "view", 16.0)
    ).toDS()
    val sessions = Streaming.sessionize(events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length === 3)
    val s1 = sessions(0)
    assert(s1.user_id === 7L && s1.n_events === 2 && s1.sum_value === 3.0)
    assert(s1.session_start === ts(0) && s1.session_end === ts(10))
    val s2 = sessions(1)
    assert(s2.n_events === 2 && s2.sum_value === 12.0)
    val s3 = sessions(2)
    assert(s3.user_id === 9L && s3.n_events === 1 && s3.sum_value === 16.0)
  }

  test("D10: streaming contamination flags == batch twin, with no false negatives") {
    import graft.ops.dedup.Dedup
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val bloom = Dedup.evalGramBloom(batchDocs, col("source") === "src0", bits = 1 << 16)
    val stream = Streaming.contaminationFlags(
      Streaming.documentStream(spark, dir), bloom)
    val q = stream.writeStream.format("memory").queryName("contam_flags")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("contam_flags").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    val twin = Streaming.contaminationFlags(batchDocs, bloom)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(streamed.nonEmpty && streamed === twin)
    // Bloom admits no false negatives: every train doc the EXACT batch
    // contamination check reports must be flagged by the stream
    val contaminated = Dedup.contamination(batchDocs, col("source") === "src0")
      .select("train_id").collect().map(_.getLong(0)).toSet
    assert(contaminated.forall(streamed(_)),
      s"missed: ${contaminated.filterNot(streamed(_))}")
    // and the definitive negative side actually fires on this corpus
    assert(streamed.values.exists(_ == false))
  }

  test("D11: streaming histogram sketch converges to the batch bucket counts") {
    val stream = Streaming.histSketch(Streaming.documentStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("hist_sketch")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hist_sketch").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batch = Streaming.histSketch(spark.read.parquet(s"$dir/documents.parquet"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("D12: a batch-trained NB model scores a stream identically to the batch distill") {
    import graft.ops.text.TextOps
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val pass = TextOps.gopherColumns(col("text")).toMap.apply("pass") === 1
    val model = TextOps.nbTrain(batchDocs, pass)
    val stream = TextOps.nbScore(Streaming.documentStream(spark, dir), model)
    val q = stream.writeStream.format("memory").queryName("nb_scores")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last emission per doc = the completed score
    val streamed = spark.table("nb_scores").collect()
      .groupBy(_.getLong(0)).map { case (id, rows) => id -> rows.last.getDouble(1) }
    val batch = TextOps.nbDistill(batchDocs, pass).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(streamed.nonEmpty && streamed.toMap === batch)
  }

  test("D16: streaming vocabulary top-k equals the batch corpus_zipf ranked prefix") {
    val stream = Streaming.zipfTopK(Streaming.documentStream(spark, dir), k = 50)
    val q = stream.writeStream.format("memory").queryName("zipf_topk")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("zipf_topk").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    val batch = graft.queries.Pipeline.corpusZipf(spark, dir)
      .select("t", "freq").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(streamed.nonEmpty && streamed === batch)
    // the monitor's slope (identical OLS closed form over the sink rows)
    // equals the batch query's zipf_slope column
    val rows = spark.table("zipf_topk").collect()
      .sortBy(r => (-r.getLong(1), r.getString(0))).zipWithIndex
      .map { case (r, i) => (math.log(i + 1.0), math.log(r.getLong(1).toDouble)) }
    val k = rows.length.toDouble
    val (sx, sy) = (rows.map(_._1).sum, rows.map(_._2).sum)
    val (sxy, sxx) = (rows.map(p => p._1 * p._2).sum, rows.map(p => p._1 * p._1).sum)
    val slope = BigDecimal((k * sxy - sx * sy) / (k * sxx - sx * sx))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val batchSlope = graft.queries.Pipeline.corpusZipf(spark, dir)
      .select("zipf_slope").head().getDouble(0)
    assert(math.abs(slope - batchSlope) <= 1e-6, s"$slope vs $batchSlope")
  }

  test("D17: streaming user-stats monitor equals the batch events_user_stats query") {
    val stream = Streaming.userStatsMonitor(
      Streaming.eventStream(spark, dir).where(col("user_id") % 50 === 0))
    val q = stream.writeStream.format("memory").queryName("user_stats")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last emission per user = the completed aggregate
    val streamed = spark.table("user_stats").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.last.toSeq.drop(1) }
    val batch = graft.queries.Relational.qEventsUserStats(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(streamed.nonEmpty && streamed.toMap === batch)
  }

  test("D18: streaming latest-per-key compaction equals the batch events_latest_per_key query") {
    val stream = Streaming.latestPerKeyMonitor(Streaming.eventStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("latest_state")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last emission per user = the current state after the full prefix
    val streamed = spark.table("latest_state").collect()
      .groupBy(_.getLong(0)).map { case (u, rows) => u -> rows.last.toSeq.drop(1) }
    val batch = graft.queries.Relational.qLatestPerKey(spark, dir).collect()
      .map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(streamed.nonEmpty && streamed.toMap === batch)
  }

  test("D21: funnel monitor is exact under cross-batch out-of-order arrival and retires dead state") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-funnel").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "event_type", "epoch_s")
        .select(col("user_id"), col("event_type"),
          col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val t0 = 1000000000L
    // batch 1: user 1's click+purchase arrive BEFORE their view (the case
    // O(1)-state funnels get wrong); user 3 has a never-qualifying click
    write("b1", Seq((1L, "click", t0 + 100), (1L, "purchase", t0 + 200),
      (3L, "view", t0 + 100), (3L, "click", t0 + 50)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.funnelMonitor(src).writeStream
      .format("memory").queryName("funnel").outputMode("update").start()
    try {
      q.processAllAvailable()
      // batch 2: the late view completes user 1's funnel retroactively;
      // user 2 exercises the strict-order edge (click@t0+5 precedes its view)
      write("b2", Seq((1L, "view", t0 + 50),
        (2L, "view", t0 + 10), (2L, "click", t0 + 5), (2L, "click", t0 + 20)))
      q.processAllAvailable()
      // batch 3: far-future event advances the watermark way past t0
      write("b3", Seq((9L, "view", t0 + 10 * 24 * 3600)))
      q.processAllAvailable()
      val before = spark.table("funnel").count()
      // batch 4: no-op events re-touch each user so pruning is observable
      val far = t0 + 10 * 24 * 3600 + 60
      write("b4", Seq((1L, "other", far), (2L, "other", far), (3L, "other", far)))
      q.processAllAvailable()
      val last = spark.table("funnel").collect().drop(before.toInt)
        .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getInt(5)))).toMap
      def us(s: Long) = s * 1000000L
      // user 1: full funnel, chained-min times == the batch B32 semantics;
      // pending = the t2 witness click + the t3 witness purchase
      assert(last(1L) === ((3, us(t0 + 50), us(t0 + 100), us(t0 + 200), 2)))
      // user 2: click@t0+5 never qualifies (before the first view) and is
      // dead once the watermark passes it — only the t2 witness remains
      assert(last(2L) === ((2, us(t0 + 10), us(t0 + 20), -1L, 1)))
      // user 3: the non-qualifying click is fully retired
      assert(last(3L) === ((1, us(t0 + 100), -1L, -1L, 0)))
    } finally q.stop()
  }

  test("D22: streaming rolling-DAU HLL registers equal the batch sketch, estimate rides along") {
    val stream = Streaming.dauHllMonitor(Streaming.eventStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("dau_regs")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // register maxima are monotone — the max emission per (wend, j) is final
    val streamed = spark.table("dau_regs").collect()
      .groupBy(r => (r.getInt(0), r.getInt(1)))
      .map { case (k, rows) => k -> rows.map(_.getInt(2)).max }
    val batch = Streaming.dauHllMonitor(
      graft.queries.Tables.events(spark, dir)).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getInt(2)).toMap
    assert(streamed.nonEmpty && streamed.toMap === batch)
    // probing the stream's registers gives the batch estimate exactly
    import spark.implicits._
    val regsDf = streamed.toSeq.map { case ((w, j), m) => (w, j, m) }
      .toDF("wend", "j", "mj")
    val est = graft.ops.stats.Stats.hllEstimate(regsDf, "wend").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    val batchEst = graft.ops.stats.Stats.hllEstimate(
      graft.queries.Tables.events(spark, dir)
        .transform(Streaming.dauHllMonitor(_)), "wend").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(est === batchEst)
  }

  test("D24: streaming value histogram equals the batch histogram") {
    val stream = Streaming.valueHistogram(Streaming.eventStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("val_hist")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    // last emission per bucket = the full-prefix aggregate
    val streamed = spark.table("val_hist").collect()
      .groupBy(_.getLong(0)).map { case (b, rows) => b -> rows.last.toSeq.drop(1) }
    val batch = Streaming.valueHistogram(graft.queries.Tables.events(spark, dir))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(streamed.nonEmpty && streamed.toMap === batch)
  }

  test("D25: dormancy detector alerts exactly the users the watermark proves idle") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-dormant").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, Long)]): Unit = {
      import spark.implicits._
      rows.toDF("user_id", "epoch_s")
        .select(col("user_id"), col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val t0 = 1000000000L
    val h12 = 12L * 3600
    // batch 1: users 1 and 2 active at t0; user 3 stays active later
    write("b1", Seq((1L, t0), (2L, t0 + 60), (3L, t0)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.dormancyMonitor(src).writeStream
      .format("memory").queryName("dormant").outputMode("append").start()
    try {
      q.processAllAvailable()
      // batch 2: user 3 re-activates inside the idle window, and a far
      // event pushes the watermark past t0 + 12h for everyone
      write("b2", Seq((3L, t0 + 11 * 3600), (9L, t0 + 2 * 24 * 3600)))
      q.processAllAvailable()
      // batch 3: any event forces the trigger that fires pending timeouts
      write("b3", Seq((9L, t0 + 2 * 24 * 3600 + 60)))
      q.processAllAvailable()
      val got = spark.table("dormant").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // users 1 and 2 idle > 12h behind the watermark → alerted with their
      // last activity; user 3's re-activity reset the clock (its t0+11h
      // timeout is also past the watermark, so it alerts too — but with
      // the REFRESHED last_us); user 9 is the frontier and stays silent
      assert(got(1L) === t0 * 1000000L)
      assert(got(2L) === (t0 + 60) * 1000000L)
      assert(got(3L) === (t0 + 11 * 3600) * 1000000L)
      assert(!got.contains(9L))
    } finally q.stop()
  }

  test("D23: stream-scored embedding outliers equal the batch query") {
    val batchEmb = spark.read.parquet(s"$dir/embeddings.parquet")
    val stats = graft.ops.ann.Ann.dimStats(batchEmb)
    val src = spark.readStream.schema(batchEmb.schema)
      .option("pathGlobFilter", "embeddings.parquet").parquet(dir)
    val q = Streaming.outlierMonitor(src, stats).writeStream
      .format("memory").queryName("emb_outliers").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("emb_outliers").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    val batch = graft.queries.Pipeline.embedOutliers(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("D15: streaming quality-agreement monitor equals the batch diagnostic") {
    val stream = Streaming.qualityAgreementMonitor(Streaming.documentStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("qa_monitor")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6))
    val streamed = spark.table("qa_monitor").collect().map(key).toMap
    val batch = Streaming.qualityAgreementMonitor(
      spark.read.parquet(s"$dir/documents.parquet")).collect().map(key).toMap
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("events ingestion is schema-adaptive: nanos-long and timestamp sources agree") {
    // spec-owned fixtures in BOTH schemas the driver has shipped, so a
    // future testdata regeneration can never redden the streaming suite:
    // ts as int64 epoch-nanos (rounds <= 8) and as parquet TIMESTAMP
    // micros (current). Same logical events, micro-exact values.
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val tmp = java.nio.file.Files.createTempDirectory("graft-dual").toString
    val rows = Seq( // (event_id, ts in epoch MICROS, user_id, type, value, props)
      (1L, 1000000000000000L, 7L, "view", 1.0, """{"k":1}"""),
      (2L, 1000000000500000L, 7L, "click", 2.0, """{"k":2}"""),
      (3L, 1000003600000007L, 9L, "view", 4.0, """{"k":3}"""))
    // single-FILE layout like the driver's ($dir/events.parquet is a file,
    // not a directory): stage the write, move the lone part file in place
    def asSingleFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      val stage = s"$tmp/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$tmp/$name"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$tmp/$name/events.parquet"))
    }
    asSingleFile(rows.map { case (id, us, u, t, v, p) => (id, us * 1000L, u, t, v, p) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props"), "nanos")
    asSingleFile(rows.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")).cast(TimestampNTZType))
      .select("event_id", "ts", "user_id", "event_type", "value", "props"), "micros")

    for (d <- Seq(s"$tmp/nanos", s"$tmp/micros")) {
      // both normalise to ONE downstream type
      assert(graft.queries.Tables.events(spark, d).schema("ts").dataType
        === TimestampType, d)
    }
    // batch query: identical output from either schema
    def win(d: String) = graft.queries.Relational.eventsWindow(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(win(s"$tmp/nanos") === win(s"$tmp/micros"))
    assert(win(s"$tmp/nanos").nonEmpty)
    // streaming source: identical window agg from either schema
    def streamed(d: String, q: String) = {
      val query = Streaming.windowAgg(Streaming.eventStream(spark, d))
        .writeStream.format("memory").queryName(q).outputMode("complete").start()
      try query.processAllAvailable() finally query.stop()
      spark.table(q).collect().map(_.toSeq).toSet
    }
    val a = streamed(s"$tmp/nanos", "dual_nanos")
    val b = streamed(s"$tmp/micros", "dual_micros")
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("evalGramBloom of an empty eval set flags nothing") {
    import graft.ops.dedup.Dedup
    val batchDocs = spark.read.parquet(s"$dir/documents.parquet")
    val bloom = Dedup.evalGramBloom(batchDocs, lit(false), bits = 1 << 10)
    val out = Streaming.contaminationFlags(batchDocs, bloom)
    assert(out.where(col("flagged")).count() === 0)
  }

  test("D19: streaming Count-Min registers equal the batch sketch, state bounded at d·w") {
    val stream = Streaming.cmsMonitor(Streaming.documentStream(spark, dir))
    val q = stream.writeStream.format("memory").queryName("cms_regs")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val streamed = rows(spark.table("cms_regs"))
    val batch = rows(graft.ops.stats.Stats.cmsRegisters(
      spark.read.parquet(s"$dir/documents.parquet")
        .select(explode(split(col("text"), " ")).as("token")), col("token")))
    assert(streamed.nonEmpty && streamed === batch)
    // the CMS point: state never exceeds d·w counters however the stream grows
    assert(streamed.size <= 4 * 64)
    // probing the streamed state answers point queries one-sidedly
    val probes = Seq(("the", 0)).toDF("token", "x").drop("x")
    val est = graft.ops.stats.Stats.cmsEstimate(
      spark.table("cms_regs"), probes, col("token")).head().getLong(1)
    val exact = spark.read.parquet(s"$dir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("t"))
      .where(col("t") === "the").count()
    assert(est >= exact)
  }

  test("D20: streaming winnowing fingerprints equal the batch selection, stateless append") {
    val stream = Streaming.winnowMonitor(Streaming.documentStream(spark, dir))
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("winnow_fps")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val streamed = rows(spark.table("winnow_fps"))
    val batch = rows(graft.ops.text.TextOps.winnow(
      spark.read.parquet(s"$dir/documents.parquet")))
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("D26: streaming CEP motif monitor equals the batch operator, absorbing out-of-order arrivals") {
    import org.apache.spark.sql.types._
    // split by event_id parity: every user's history interleaves the two
    // batches, so most arrivals land out of (ts, tie) order mid-stream —
    // the re-sort-on-emit contract is what keeps the final counts exact
    val ev = batchEvents.select("event_id", "ts", "user_id", "event_type")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cep").toString
    ev.where(col("event_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b1")
    ev.where(col("event_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b2")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*/")
    val q = Streaming.patternMonitor(src, "vc*p").writeStream
      .format("memory").queryName("cep_counts").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // one emission per user per batch; n_events grows monotonically, so the
    // max-n_events row per user is the final state
    val streamed = spark.table("cep_counts").collect()
      .groupBy(_.getLong(0))
      .map { case (u, rs) => val r = rs.maxBy(_.getLong(1))
        (u, r.getLong(1), r.getLong(2)) }.toSet
    val batch = graft.ops.events.Events
      .matchPattern(batchEvents, "vc*p", keepZero = true).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed === batch)
    assert(streamed.exists(_._3 > 0)) // the motif actually fires somewhere
    // batch-mode run of the SAME op (each group complete in one call)
    val twin = Streaming.patternMonitor(batchEvents, "vc*p").collect()
      .map(p => (p.user_id, p.n_events, p.n_matches)).toSet
    assert(twin === batch)
  }

  test("D26b: retained CEP monitor truncates a user's history at the horizon") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cepret").toString
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    def write(name: String, rows: Seq[(Long, Long, Long, String)]): Unit = {
      rows.toDF("event_id", "epoch_s", "user_id", "event_type")
        .select(col("event_id"), col("epoch_s").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val h = 3600L
    val t0 = 1000000000L
    // batch 1: user 1 completes the v c* p motif inside the window
    write("b1", Seq((1L, t0, 1L, "view"), (2L, t0 + 1, 1L, "click"),
      (3L, t0 + 2, 1L, "purchase")))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.patternMonitorRetained(src, "vc*p", retention = "1 hour")
      .writeStream.format("memory").queryName("cep_retained")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // another user ten days later advances the watermark past user 1's
      // entire history
      write("b2", Seq((4L, t0 + 10 * 24 * h, 99L, "view")))
      q.processAllAvailable()
      // user 1 purchases again — their expired prefix must NOT complete
      // the motif: the retained sequence is just "p"
      write("b3", Seq((5L, t0 + 10 * 24 * h + 60, 1L, "purchase")))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("cep_retained")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val user1 = rows.filter(_._1 == 1L)
    assert(user1.contains((1L, 3L, 1L)),
      s"the in-window motif must fire on batch 1: ${user1.toSeq}")
    assert(user1.contains((1L, 1L, 0L)),
      s"after expiry the retained history is 1 event / 0 matches: ${user1.toSeq}")
    assert(!user1.contains((1L, 4L, 2L)) && !user1.contains((1L, 4L, 1L)),
      s"the expired prefix must not survive into batch 3: ${user1.toSeq}")
  }

  test("D27: winnow pair witnesses aggregate to the batch index self-join across batch splits") {
    import org.apache.spark.sql.types._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-wpm").toString
    docs.where(col("doc_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b1")
    docs.where(col("doc_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b2")
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*/")
    val q = Streaming.winnowPairMonitor(src).writeStream
      .format("memory").queryName("wpm_pairs").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("wpm_pairs").groupBy("a", "b")
      .agg(count(lit(1)).as("shared")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val idx = graft.ops.dedup.Dedup.winnowIndex(docs)
    val batch = idx.as("x").join(idx.as("y"),
        col("x.fp") === col("y.fp") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
      .agg(count(lit(1)).as("shared")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed.nonEmpty && streamed === batch)
  }

  test("D27: a saturated fingerprint bucket stops emitting (the streaming df guard)") {
    import spark.implicits._
    val boiler = "identical boilerplate fingerprint text for every doc"
    val docs = (1L to 4L).map(i => (i, boiler)).toDF("doc_id", "text")
    // cap 2: the 3rd and 4th members of every bucket arrive into a full
    // bucket and certify nothing
    val got = Streaming.winnowPairMonitor(docs, maxBucket = 2)
      .collect().map(p => (p.a, p.b)).toSet
    // uncapped, all 6 pairs certify
    val all = Streaming.winnowPairMonitor(docs)
      .collect().map(p => (p.a, p.b)).toSet
    assert(all === (for (i <- 1L to 4L; j <- (i + 1) to 4L) yield (i, j)).toSet)
    // capped at 2 members, exactly one pair certifies per bucket (WHICH
    // pair depends on within-group arrival order — asserted by size)
    assert(got.size === 1 && all.contains(got.head))
  }

  test("D30: streaming cosine near-dup matches the batch op and the stream's batch twin") {
    import org.apache.spark.sql.types._
    val embs = spark.read.parquet(s"$dir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft-cpm").toString
    embs.where(col("vec_id") % 2 === 0).coalesce(1).write.parquet(s"$tmp/b1")
    embs.where(col("vec_id") % 2 === 1).coalesce(1).write.parquet(s"$tmp/b2")
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*/")
    val q = Streaming.cosinePairMonitor(src, 0.45).writeStream
      .format("memory").queryName("cos_pairs").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // per-band duplicate emissions dedupe at the consumer
    val streamed = spark.table("cos_pairs").dropDuplicates("a", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the batch operator with the SAME pinned geometry (single probe)
    val batchOp = graft.ops.ann.Ann
      .cosinePairsLsh(embs, 0.45, planes = 8, bands = 16).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed.nonEmpty && streamed === batchOp)
    // batch-mode run of the same op (each bucket complete in one call)
    val twin = Streaming.cosinePairMonitor(embs, 0.45)
      .dropDuplicates("a", "b").collect()
      .map(p => (p.a, p.b, p.cosine)).toSet
    assert(twin === batchOp)
  }

  test("D28: attribution witnesses match the batch join and re-aggregate to events_attribution") {
    val q = Streaming.attributionMonitor(Streaming.eventStream(spark, dir))
      .writeStream.format("memory").queryName("attr_w").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_w").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // identical call on batch frames = the witness oracle
    val batch = Streaming.attributionMonitor(batchEvents).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(streamed.nonEmpty && streamed === batch)
    // consumer-side election + rollup over the witnesses == the batch B65
    // aggregate (same rn_first/rn_last election, same per-type rollup)
    val byP = org.apache.spark.sql.expressions.Window.partitionBy("pid")
    val ranked = spark.table("attr_w")
      .withColumn("rn_first", row_number().over(
        byP.orderBy(col("tts_us"), col("tid"))))
      .withColumn("rn_last", row_number().over(
        byP.orderBy(col("tts_us").desc, col("tid").desc)))
    val agg = ranked.groupBy("touch_type")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct("pid").as("purchases_touched"),
        sum(when(col("rn_first") === 1, 1L).otherwise(0L)).as("first_touch"),
        sum(when(col("rn_last") === 1, 1L).otherwise(0L)).as("last_touch"))
      .orderBy("touch_type").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    val b65 = graft.queries.Relational.eventsAttribution(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSet
    assert(agg === b65)
  }

  test("D28: a late OLDER touch inside the watermark still attributes and re-elects first-touch") {
    import org.apache.spark.sql.types._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // b1: the purchase and a 09:45 view; b2 (late): an OLDER 09:30 view —
    // arriving after the purchase's batch, within the 1 h watermark
    val rows1 = Seq((100L, t("2026-01-01 10:00:00"), 1L, "purchase"),
      (2L, t("2026-01-01 09:45:00"), 1L, "view"))
    val rows2 = Seq((1L, t("2026-01-01 09:30:00"), 1L, "view"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-attr").toString
    import spark.implicits._
    rows1.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$tmp/b1")
    rows2.toDF("event_id", "ts", "user_id", "event_type")
      .coalesce(1).write.parquet(s"$tmp/b2")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*/")
    val q = Streaming.attributionMonitor(src).writeStream
      .format("memory").queryName("attr_late").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("attr_late").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSet
    // both touches certified for the purchase...
    assert(got === Set((100L, 1L), (100L, 2L)))
    // ...and the consumer's min-time election now names the LATE arrival
    val first = spark.table("attr_late").orderBy(col("tts_us"), col("tid"))
      .collect().head.getLong(3)
    assert(first === 1L)
  }

  test("D29: markov transition witnesses re-count to events_markov across time-ordered batches") {
    import org.apache.spark.sql.types._
    // two batches split at the global (ts, event_id) median: every user's
    // arrival order across batches respects their own timeline (the
    // monitor's cross-batch contract), while intra-batch file order is
    // whatever parquet wrote — intra-batch disorder is re-sorted
    val ev = batchEvents.select("event_id", "ts", "user_id", "event_type")
    val half = ev.count() / 2
    val ranked = ev.withColumn("rn", row_number().over(
      org.apache.spark.sql.expressions.Window.orderBy(col("ts"), col("event_id"))))
    val tmp = java.nio.file.Files.createTempDirectory("graft-mkv").toString
    ranked.where(col("rn") <= half).drop("rn")
      .coalesce(1).write.parquet(s"$tmp/b1")
    ranked.where(col("rn") > half).drop("rn")
      .coalesce(1).write.parquet(s"$tmp/b2")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType)))
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$tmp/*/")
    val q = Streaming.markovMonitor(src).writeStream
      .format("memory").queryName("mkv_w").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    // consumer rollup: counts + row-conditional p over the witnesses
    val totals = org.apache.spark.sql.expressions.Window.partitionBy("prev_type")
    val agg = spark.table("mkv_w")
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double") / sum("n").over(totals), 6))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    val b66 = graft.queries.Relational.eventsMarkov(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(agg.nonEmpty && agg === b66)
    // batch-mode run of the SAME op (each group complete in one call,
    // fully shuffled input): the re-sort absorbs intra-batch disorder
    val twin = Streaming.markovMonitor(
        ev.orderBy(col("event_id"))) // any order ≠ (ts, tie)
      .groupBy("prev_type", "next_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(twin === b66.map(x => (x._1, x._2, x._3)))
  }

  test("D32: streaming simhash pairs == batch simhash on any prefix (lossless banding); " +
      "saturation stop caps a hot bucket") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val (b1, b2) = docs.splitAt(docs.size / 2)
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.simhashPairMonitor(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sh_pairs")
      .outputMode("append").start()
    try {
      // a NULL-text poison row must be dropped at the door, not NPE the
      // typed state
      mem.addData(b1 :+ (888888L, null.asInstanceOf[String]): _*)
      q.processAllAvailable()
      mem.addData(b2: _*)
      q.processAllAvailable()
    } finally q.stop()
    // consumer dedup on (a, b): per-shared-chunk emissions collapse, and
    // the deduped set must equal the batch operator EXACTLY — pigeonhole
    // banding is lossless, so this is set equality, not recall
    val streamed = spark.table("sh_pairs")
      .select("a", "b", "hamming").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = graft.ops.dedup.Dedup.simhash(
        spark.read.parquet(s"$dir/documents.parquet"), maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batch.nonEmpty, "fixture must contain simhash near-dups")
    assert(streamed === batch)
    // saturation: 10 identical docs under maxBucket=4 emit at most
    // C(4,2)=6 pairs per bucket and the membership list stops growing
    val mem2 = MemoryStream[(Long, String)]
    val q2 = Streaming.simhashPairMonitor(
        mem2.toDF.toDF("doc_id", "text"), maxBucket = 4)
      .writeStream.format("memory").queryName("sh_sat")
      .outputMode("append").start()
    try {
      mem2.addData((1L to 10L).map(i => (i, "identical boilerplate row " * 4)): _*)
      q2.processAllAvailable()
    } finally q2.stop()
    val sat = spark.table("sh_sat").select("a", "b").distinct().count()
    assert(sat === 6L, s"saturated bucket must cap at C(4,2)=6 pairs, got $sat")
  }

  test("D32: a non-numeric string doc_id is dropped at the door, not a stream-killing NULL cast") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String)]
    val q = Streaming.simhashPairMonitor(mem.toDF.toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("sh_strid")
      .outputMode("append").start()
    try {
      // "doc-7" casts to NULL long — before the r16 fix the isNotNull
      // check ran on the RAW column, so the row passed the filter and
      // killed the stream in the non-nullable ShDoc encoder
      mem.addData(("1", "identical boilerplate row " * 4),
        ("doc-7", "identical boilerplate row " * 4),
        ("2", "identical boilerplate row " * 4))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sh_strid").select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)), s"parseable ids must still pair: $got")
  }

  test("D32b: retained simhash pairs dedup within the window and expire old members") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-shret").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      rows.toDF("doc_id", "text", "epoch_s")
        .select(col("doc_id"), col("text"),
          col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val dupText = "identical boilerplate row " * 4
    val h = 3600L
    val t0 = 1000000000L
    write("b1", Seq((1L, dupText, t0), (2L, dupText, t0)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.simhashPairMonitorRetained(src, tsCol = "ts",
        retention = "1 hour")
      .writeStream.format("memory").queryName("sh_retained")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // unrelated doc ten days later — advances the watermark
      write("b2", Seq((50L, (1 to 30).map(i => s"other$i").mkString(" "),
        t0 + 10 * 24 * h)))
      q.processAllAvailable()
      // a duplicate of doc 1, but its buddies expired long ago
      write("b3", Seq((3L, dupText, t0 + 10 * 24 * h + 60)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sh_retained").select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // in-window pair found; (1,3)/(2,3) expired
  }

  test("D27b: retained winnow witnesses pair within the window and expire old members") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-wnret").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))
    def write(name: String, rows: Seq[(Long, String, Long)]): Unit = {
      rows.toDF("doc_id", "text", "epoch_s")
        .select(col("doc_id"), col("text"),
          col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val h = 3600L
    val t0 = 1000000000L
    write("b1", Seq((1L, shared, t0), (2L, shared, t0)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.winnowPairMonitorRetained(src, tsCol = "ts",
        retention = "1 hour")
      .writeStream.format("memory").queryName("wn_retained")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // unrelated doc ten days later — advances the watermark far past b1
      write("b2", Seq((50L, (1 to 30).map(i => s"zq$i").mkString(" "),
        t0 + 10 * 24 * h)))
      q.processAllAvailable()
      // a copy of doc 1's text, but its buddies expired long ago: the
      // shared fingerprints exist in both, yet no witness may fire
      write("b3", Seq((3L, shared, t0 + 10 * 24 * h + 60)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("wn_retained").select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // in-window witness found; (1,3)/(2,3) expired
    // within the window the witness contract is D27's: the deduped
    // witness count for (1,2) equals the batch winnow index self-join
    val batch = graft.ops.dedup.Dedup.winnowIndex(
      Seq((1L, shared), (2L, shared)).toDF("doc_id", "text"))
    val sharedFps = spark.table("wn_retained")
      .where(col("a") === 1L && col("b") === 2L)
      .select("fp").distinct().count()
    val batchShared = batch.where(col("doc_id") === 1L).select("fp").distinct().count()
    assert(sharedFps === batchShared)
  }

  test("D36: streaming CUSUM equals the batch recursion however batched; late buckets skip; untrained silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.stats.Stats
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // training window: alternating 99/101 baseline; live window carries a
    // planted +2 sustained shift (the B71 fixture shape)
    val train = (0 until 40).map(i => ("t", i.toLong, if (i % 2 == 0) 99L else 101L))
    val live = (40 until 60).map(i => ("t", i.toLong, 102L)) ++
      (60 until 64).map(i => ("u", i.toLong, 50L)) // untrained group
    val baseline = Stats.cusumParams(train.toDF("event_type", "bucket", "n_events"),
        "event_type", "n_events").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streaming.cusumMonitor(
        mem.toDF.toDF("event_type", "bucket", "n_events"), baseline)
      .writeStream.format("memory").queryName("cusum_mon")
      .outputMode("append").start()
    try {
      // feed the live window in three uneven batches, in bucket order
      val batches = Seq(live.take(7), live.slice(7, 8), live.drop(8))
      batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      // a LATE closed bucket (before the fold head) must be skipped
      mem.addData(("t", 41L, 500L)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cusum_mon")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    // batch twin: the SAME recursion seeded by the SAME training params —
    // Stats.cusum over train++liveT scores the live suffix identically
    // only when params match, so recompute by hand with the frozen params
    val (mu6, k6, h6) = baseline("t")
    var s = 0L
    (40 until 60).foreach { i =>
      s = math.max(0L, s + 102L * 1000000L - mu6 - k6)
      assert(got(("t", i.toLong)) === ((s, s > h6)), s"bucket $i")
    }
    // the late re-delivery of bucket 41 did not emit again or corrupt S
    assert(got.size === 20)
    assert(got.keys.forall(_._1 == "t"), "untrained group must emit nothing")
  }

  test("D38: streaming Holt equals the batch recursion however batched; late buckets skip; untrained silent") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.stats.Stats
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // the B72 fixture shape: linear growth with one planted break
    val series = (0 until 60).map(i =>
      ("t", i.toLong, 100L + 5L * i + (if (i == 40) 2000L else 0L)))
    val h6 = Stats.cusumParams(series.take(40)
        .toDF("event_type", "bucket", "n_events"),
        "event_type", "n_events", slackSds = 0.0, alarmSds = 3.0)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    val live = series ++ Seq(("u", 99L, 50L)) // untrained group
    val mem = MemoryStream[(String, Long, Long)]
    val q = Streaming.holtMonitor(
        mem.toDF.toDF("event_type", "bucket", "n_events"), h6)
      .writeStream.format("memory").queryName("holt_mon")
      .outputMode("append").start()
    try {
      Seq(live.take(13), live.slice(13, 14), live.drop(14)).foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
      }
      // a LATE closed bucket (already folded) must be skipped
      mem.addData(("t", 41L, 999L)); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("holt_mon").collect().map(r =>
      (r.getString(0), r.getLong(1)) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]),
          Option(r.get(3)).map(_.asInstanceOf[Long]),
          r.getLong(4), r.getLong(5), r.getBoolean(6)))).toMap
    // hand recursion with the frozen threshold — bit-exact per bucket
    val hh = h6("t")
    var l = series.head._3 * 1000000L
    var t = 0L
    assert(got(("t", 0L)) === ((None, None, l, 0L, false)))
    series.tail.foreach { case (_, b, x) =>
      val f = l + t
      val e = x * 1000000L - f
      val lN = Math.floorDiv(x * 1000000L + l + t, 2L)
      val tN = Math.floorDiv(lN - l + t, 2L)
      l = lN; t = tN
      assert(got(("t", b)) === ((Some(f), Some(e), lN, tN, math.abs(e) > hh)),
        s"bucket $b")
    }
    // late re-delivery emitted nothing, untrained group silent
    assert(got.size === 60)
    assert(got.keys.forall(_._1 == "t"))
    // the value columns equal the batch op's on the same series (alarm
    // thresholds differ by construction: batch σ covers the break)
    val batch = Stats.holt(series.toDF("g", "b", "x"), "g", "b", "x")
      .collect().map(r => r.getLong(1) ->
        ((Option(r.get(2)).map(_.asInstanceOf[Long]), r.getLong(4), r.getLong(5)))).toMap
    series.foreach { case (_, b, _) =>
      val (f, lv, tr) = batch(b)
      assert(got(("t", b))._1 === f, s"forecast at $b")
      assert(got(("t", b))._3 === lv && got(("t", b))._4 === tr, s"state at $b")
    }
  }

  test("D37: streaming join-size estimate equals the batch CMS estimator at every batch, one-sided, monotone") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.stats.Stats
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // static side: the frozen dimension sketch (trained-model shape)
    val static = Seq(1L, 1L, 2L, 5L)
    val regsBDf = Stats.cmsRegisters(static.toDF("k"), col("k"))
    val regsB = regsBDf.collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val batches = Seq(Seq(1L, 2L, 2L), Seq(3L, 1L), Seq(2L, 5L, 5L, 9L))
    val mem = MemoryStream[Long]
    val q = Streaming.joinCardMonitor(mem.toDF.toDF("k"), "k", regsB)
      .writeStream.format("memory").queryName("jcard")
      .outputMode("append").start()
    try {
      var fed = Seq.empty[Long]
      batches.foreach { b =>
        mem.addData(b: _*); q.processAllAvailable()
        fed = fed ++ b
        // latest per j = max ip (emissions are monotone per sketch row)
        val streamEst = spark.table("jcard").groupBy("j")
          .agg(max("ip").as("ip")).collect().map(_.getLong(1)).min
        // the stream's state IS the batch register table of everything
        // fed so far: the monitor's min equals batch cmsJoinSize exactly
        val batchEst = Stats.cmsJoinSize(
            Stats.cmsRegisters(fed.toDF("k"), col("k")), regsBDf)
          .collect()(0).getLong(0)
        assert(streamEst === batchEst, s"after ${fed.size} values")
        // one-sided at every point: never below the exact join size
        val exact = fed.map(k => static.count(_ == k).toLong).sum
        assert(streamEst >= exact, s"one-sided after ${fed.size} values")
      }
    } finally q.stop()
    // per sketch row the inner product never decreases across batches —
    // a threshold alarm downstream can never flap
    val perJ = spark.table("jcard").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values
    assert(perJ.forall { rows =>
      val ips = rows.sortBy(_._3).map(_._2)
      ips.zip(ips.tail).forall { case (p, n) => n >= p }
    })
    // every batch emitted one refreshed row per sketch row (d = 4)
    assert(spark.table("jcard").count() === 12)
  }

  test("D33: streaming triples->PG upsert converges on batch toPg however batched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Graph
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq(
      ("N1", "name", "\"n1\""), ("N1", Graph.TypeKey, "Gene"),
      ("E1", Graph.TypeKey, "rel"), ("E1", Graph.FromKey, "N1"),
      ("E1", Graph.ToKey, "N2"))
    // batch 2 revisits N1 (new label, second name value) and adds N2;
    // a NULL-value poison triple drops at the door
    val b2 = Seq(
      ("N1", Graph.TypeKey, "Audited"), ("N1", "name", "\"n1b\""),
      ("N2", Graph.TypeKey, "Gene"),
      ("N2", "junk", null.asInstanceOf[String]))
    val mem = MemoryStream[(String, String, String)]
    val q = Streaming.pgMergeMonitor(mem.toDF.toDF("id", "key", "value"))
      .writeStream.format("memory").queryName("pg_upserts")
      .outputMode("append").start()
    def latest() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("id")
        .orderBy(col("batch_ord").desc)
      spark.table("pg_upserts")
        .withColumn("batch_ord", monotonically_increasing_id())
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .collect().map { r =>
          r.getAs[String]("id") -> ((r.getAs[String]("tpe"),
            r.getAs[scala.collection.Seq[String]]("labels").toList,
            Option(r.getAs[String]("from")), Option(r.getAs[String]("to")),
            r.getAs[Map[String, scala.collection.Seq[String]]]("props")
              .map { case (k, v) => k -> v.toList }))
        }.toMap
    }
    def batchPg(ts: Seq[(String, String, String)]) =
      graft.etl.PgGraph.toPg(ts.toDF("id", "key", "value")
          .where(col("value").isNotNull))
        .collect().map { r =>
          r.getAs[String]("id") -> ((r.getAs[String]("type"),
            r.getAs[scala.collection.Seq[String]]("labels").toList,
            Option(r.getAs[String]("from")), Option(r.getAs[String]("to")),
            r.getAs[Map[String, scala.collection.Seq[String]]]("properties")
              .map { case (k, v) => k -> v.toList.sorted }))
        }.toMap
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batchPg(b1))
      mem.addData(b2: _*)
      q.processAllAvailable()
      // the latest upsert per id == a full batch rebuild over both batches:
      // live ingest and batch reload converge on the same graph
      assert(latest() === batchPg(b1 ++ b2))
      assert(latest()("N1")._2 === List("Audited", "Gene"))
      assert(latest()("N1")._5("name") === List("\"n1\"", "\"n1b\""))
      assert(latest()("E1")._1 === Graph.EdgeType)
    } finally q.stop()
  }

  test("D33 tombstones: id delete wins in-batch and clears state; key unset leaves siblings") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.Graph
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(String, String, String)]
    val q = Streaming.pgMergeMonitor(mem.toDF.toDF("id", "key", "value"))
      .writeStream.format("memory").queryName("pg_tomb")
      .outputMode("append").start()
    def latest() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("id").orderBy(col("ord").desc)
      spark.table("pg_tomb").withColumn("ord", monotonically_increasing_id())
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .collect().map { r =>
          r.getAs[String]("id") -> ((r.getAs[String]("tpe"),
            r.getAs[Map[String, scala.collection.Seq[String]]]("props")
              .map { case (k, v) => k -> v.toList },
            r.getAs[scala.collection.Seq[String]]("labels").toList))
        }.toMap
    }
    try {
      mem.addData(
        ("N1", Graph.TypeKey, "Gene"), ("N1", "name", "\"n1\""),
        ("N1", "score", "\"a\""),
        ("N2", Graph.TypeKey, "Gene"), ("N2", "name", "\"n2\""))
      q.processAllAvailable()
      // batch 2: delete N2 (data triple in the SAME batch must lose);
      // unset N1.score while upserting a label beside it
      mem.addData(
        ("N2", Graph.DeleteKey, Graph.DeleteAll), ("N2", "name", "\"zombie\""),
        ("N1", Graph.DeleteKey, "score"), ("N1", Graph.TypeKey, "Audited"),
        ("N1", Graph.DeleteKey, "no_such_key"))
      q.processAllAvailable()
      val m1 = latest()
      assert(m1("N2")._1 === Streaming.TombstoneType)
      assert(m1("N1")._1 === Graph.NodeType)
      assert(m1("N1")._2 === Map("name" -> List("\"n1\"")))
      assert(m1("N1")._3 === List("Audited", "Gene"))
      // batch 3: N2 rebuilds FROM EMPTY (state was cleared, two-batch
      // delete-then-reinsert — the A54 mergeInc stance)
      mem.addData(("N2", Graph.TypeKey, "Fresh"), ("N2", "name", "\"reborn\""))
      q.processAllAvailable()
      val m2 = latest()
      assert(m2("N2")._1 === Graph.NodeType)
      assert(m2("N2")._3 === List("Fresh")) // no Gene residue
      assert(m2("N2")._2 === Map("name" -> List("\"reborn\"")))
    } finally q.stop()
  }

  test("D35: streaming interval overlaps match the batch join, claim once across buckets, expire") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val horizon = 3600L // seconds retention
    val t0 = 1000000000L
    // (key, id, s, e, arrival-epoch-s): 1-2 overlap straddling the
    // bucket-100 boundary (shared buckets 0 AND 1 — must emit once);
    // 3 overlaps 2 but not 1; 4 touches 3 end-exclusively (no pair);
    // id 9 arrives one batch later, overlapping 3 (cross-batch pair)
    val b1 = Seq(("k1", 1L, 0L, 50L, t0), ("k1", 2L, 40L, 140L, t0),
      ("k1", 3L, 100L, 200L, t0), ("k1", 4L, 200L, 300L, t0),
      ("k2", 6L, 0L, 1000L, t0))
    val b2 = Seq(("k1", 9L, 150L, 260L, t0 + 10))
    // watermark pusher (other key), THEN the expiry probe: watermarks
    // advance at batch boundaries, so expiry needs its own batch first
    val b3a = Seq(("k3", 99L, 0L, 10L, t0 + 8000))
    val b3 = Seq(("k1", 10L, 60L, 90L, t0 + 8005))
    val mem = MemoryStream[(String, Long, Long, Long, Long)]
    val q = Streaming.intervalOverlapMonitor(
        mem.toDF.toDF("key", "id", "s", "e", "epoch_s")
          .withColumn("ts", col("epoch_s").cast("timestamp")).drop("epoch_s"),
        bucketUs = 100L, tsCol = "ts", retention = s"$horizon seconds")
      .writeStream.format("memory").queryName("overlaps")
      .outputMode("append").start()
    def pairs() = spark.table("overlaps").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      // within-batch pairs, each exactly once (1-2 despite 2 shared buckets)
      assert(pairs().sorted === Seq(("k1", 1L, 2L, 10L), ("k1", 2L, 3L, 40L)))
      mem.addData(b2: _*)
      q.processAllAvailable()
      // cross-batch: 9 pairs with retained 2 (overlap [150,140)? no — with
      // 3: [150,200) 50us; with 4: [200,260) 60us; with 2: none (140<=150)
      assert(pairs().sorted === Seq(("k1", 1L, 2L, 10L), ("k1", 2L, 3L, 40L),
        ("k1", 3L, 9L, 50L), ("k1", 4L, 9L, 60L)))
      // matches the batch operator over everything in-window
      val batch = graft.ops.events.Events.intervalOverlapPairs(
          (b1 ++ b2).toDF("key", "id", "s", "e", "epoch_s"),
          "key", "id", "s", "e", bucketUs = 100L)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(pairs().map(p => (p._1, p._2, p._3)).toSet === batch)
      mem.addData(b3a: _*)
      q.processAllAvailable()
      mem.addData(b3: _*)
      q.processAllAvailable()
      // the late interval overlaps 2 by VALUE but the members are past
      // the horizon — no new pair may appear
      assert(pairs().size === 4)
    } finally q.stop()
  }

  test("D34: live shard manifest converges on the batch manifest however batches split") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val b1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"))
    val b2 = Seq((4L, null.asInstanceOf[String]), (5L, "delta"), (6L, "epsilon"))
    val mem = MemoryStream[(Long, String)]
    val q = Streaming.manifestMonitor(
        mem.toDF.toDF("doc_id", "text"), nShards = 4)
      .writeStream.format("memory").queryName("manifest")
      .outputMode("update").start()
    def latest() = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("shard").orderBy(col("batch_ord").desc)
      spark.table("manifest")
        .withColumn("batch_ord", monotonically_increasing_id())
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .drop("batch_ord", "rn")
        .collect().map(r => r.getAs[Int]("shard") -> r.toSeq.drop(1)).toMap
    }
    def batch(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      graft.ops.sample.Sampling.shardManifest(
          rows.toDF("doc_id", "text"), "doc_id", "text", nShards = 4)
        .collect().map(r => r.getAs[Int]("shard") -> r.toSeq.drop(1)).toMap
    }
    try {
      mem.addData(b1: _*)
      q.processAllAvailable()
      assert(latest() === batch(b1))
      mem.addData(b2: _*)
      q.processAllAvailable()
      // latest per shard == the batch manifest over everything streamed:
      // count/sum/min/max/xor all commute, so the batch split is invisible
      assert(latest() === batch(b1 ++ b2))
      // and the NULL-text doc contributed 0 bytes but still counts
      assert(latest().values.map(_(0).asInstanceOf[Long]).sum === 6L)
    } finally q.stop()
  }

  test("D30b: retained cosine pairs dedup within the window and expire old members") {
    import org.apache.spark.sql.types._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cosret").toString
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("ts", TimestampType)))
    // two near-identical vectors, one orthogonal distractor
    val vA = Array.fill(8)(1.0f)
    val vB = vA.clone(); vB(0) = 0.9f
    val vOrth = Array.tabulate(8)(i => if (i % 2 == 0) 1.0f else -1.0f)
    def write(name: String, rows: Seq[(Long, Array[Float], Long)]): Unit = {
      rows.toDF("vec_id", "embedding", "epoch_s")
        .select(col("vec_id"), col("embedding"),
          col("epoch_s").cast("timestamp").as("ts"))
        .coalesce(1).write.parquet(s"$tmp/$name")
    }
    val h = 3600L
    val t0 = 1000000000L
    write("b1", Seq((1L, vA, t0), (2L, vB, t0)))
    val src = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
      .parquet(s"$tmp/*/")
    val q = Streaming.cosinePairMonitorRetained(src, tsCol = "ts",
        retention = "1 hour", minCosine = 0.9)
      .writeStream.format("memory").queryName("cos_retained")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // unrelated vector ten days later — advances the watermark
      write("b2", Seq((50L, vOrth, t0 + 10 * 24 * h)))
      q.processAllAvailable()
      // a duplicate of vector 1, but its buddies expired long ago
      write("b3", Seq((3L, vA.clone(), t0 + 10 * 24 * h + 60)))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("cos_retained").select("a", "b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L))) // in-window pair found; (1,3)/(2,3) expired
  }

  test("D31: drift monitor == batch KS/JS kernel after EVERY batch; planted drift fires; " +
      "state is one support-sized register") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.ops.stats.Stats
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def register(df: org.apache.spark.sql.DataFrame) = df
      .where(col("text").isNotNull)
      .select(size(graft.ops.text.TextOps.tokens(col("text"))).cast("long").as("len"))
      .groupBy("len").agg(count(lit(1)).as("cnt"))
    val baseDf = register(docs.where(col("source") === "src0"))
    val baseline = baseDf.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val mem = MemoryStream[(Long, String)]
    val q = Streaming.driftMonitor(mem.toDF.toDF("doc_id", "text"), baseline)
      .writeStream.format("memory").queryName("drift_sink")
      .outputMode("complete").start()
    def sinkRow() = spark.table("drift_sink").collect() match {
      case Array(r) => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))
    }
    // the batch twin: the SAME shared kernels over the prefix's register
    def twin(prefix: Seq[(Long, String)]) = {
      val live = register(prefix.toDF("doc_id", "text"))
      val joint = Stats.jointCounts(baseDf, live, "len")
      val ks = Stats.ksFromJoint(joint, "len").head()
      val js = Stats.jsFromJoint(joint).head()
      (ks.getLong(0), ks.getLong(1), ks.getDouble(2),
        js.getDouble(2), js.getDouble(3))
    }
    try {
      // batch 1: in-distribution documents (src1, plus one NULL-text
      // poison row the monitor must exclude like batch C60 does)
      val b1 = docs.where(col("source") === "src1").select("doc_id", "text")
        .as[(Long, String)].collect().toSeq :+ (999999L, null.asInstanceOf[String])
      mem.addData(b1: _*)
      q.processAllAvailable()
      val s1 = sinkRow()
      assert(s1 === twin(b1.filter(_._2 != null)))
      val ksInDist = s1._3
      // batch 2: PLANTED drift — much longer documents shift the length
      // distribution; the cumulative state now covers both batches
      val b2 = (1 to 40).map(i => (100000L + i, ("drift " * 200) + i))
      mem.addData(b2: _*)
      q.processAllAvailable()
      val s2 = sinkRow()
      assert(s2 === twin(b1.filter(_._2 != null) ++ b2))
      assert(s2._3 > ksInDist + 0.1,
        s"planted drift must move KS: ${ksInDist} -> ${s2._3}")
      assert(s2._4 > s1._4, "planted drift must move JS too")
      // state: ONE aggregation row (the buffer map is support-sized by
      // construction — keys are distinct token lengths, never rows)
      val st = q.lastProgress.stateOperators
      if (st.nonEmpty) assert(st.map(_.numRowsTotal).sum <= 1)
    } finally q.stop()
  }

  test("D39: streaming seasonality chi2 equals the batch kernel and converges under ANY batching") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")
    // "human": all 10 events in hour 9 -> chi2 = 23T = 230, diurnal;
    // "bot": one event per hour -> chi2 = 0, flat; poison rows drop
    val human = (0 until 10).map(_ => ("human", ts(9)))
    val bot = (0 until 24).map(h => ("bot", ts(h)))
    val poison = Seq((null.asInstanceOf[String], ts(1)),
      ("human", null.asInstanceOf[java.sql.Timestamp]))
    def run(name: String, batches: Seq[Seq[(String, java.sql.Timestamp)]])
        : Map[String, (Long, Double, Boolean)] = {
      val mem = MemoryStream[(String, java.sql.Timestamp)]
      val q = Streaming.seasonalityMonitor(
          mem.toDF.toDF("event_type", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      // keep the LAST emission per type (B44 latest-state read)
      spark.table(name).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getBoolean(3))))
        .foldLeft(Map.empty[String, (Long, Double, Boolean)])((m, kv) => m + kv)
    }
    val all = human ++ bot ++ poison
    val a = run("season_a", Seq(all.take(5), all.slice(5, 6), all.drop(6)))
    // a radically different batching — including late re-ordered hours —
    // converges to the identical final state (commutative counts)
    val b = run("season_b", Seq(all.reverse.take(20), all.reverse.drop(20)))
    assert(a === b, "batching must not move the final statistic")
    assert(a("human") === ((10L, 230.0, true)), "one-hour concentration = 23T")
    assert(a("bot") === ((24L, 0.0, false)), "uniform profile is flat")
    assert(a.keySet === Set("human", "bot"), "poison rows must drop at the door")
  }

  test("D40: streaming packer equals the batch next-fit bins on an in-order feed, however batched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // ids 0,8,16,24 land in part 0 (mod 8); counts 100,100,100,200 are the
    // C111 fixture: budget 256 -> bins [100+100], [100], [200]
    val docs = Seq((0L, 100L), (8L, 100L), (16L, 100L), (24L, 200L),
      (3L, 300L)) // part 3: an over-budget doc opens and overflows its own bin
    val mem = MemoryStream[(Long, Long)]
    val q = Streaming.packMonitor(
        mem.toDF.toDF("id", "n_tokens"), tokenBudget = 256, partitions = 8)
      .writeStream.format("memory").queryName("pack_mon")
      .outputMode("append").start()
    try Seq(docs.take(2), docs.slice(2, 3), docs.drop(3)).foreach { b =>
      mem.addData(b: _*); q.processAllAvailable()
    } finally q.stop()
    val live = spark.table("pack_mon").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getInt(3), r.getLong(4)))
    // group live assignments into bins and compare against the batch kernel
    val liveBins = live.groupBy(t => (t._1, t._4)).map { case ((part, seq), rows) =>
      (part, seq, rows.sortBy(_._2).map(_._2).toSeq, rows.map(_._3).sum)
    }.toSet
    val batch = graft.ops.text.TextOps.packCounts(
        docs.toDF("id", "n_tokens"), tokenBudget = 256, partitions = Some(8))
      .collect().map(r => (r.getInt(0), r.getInt(1),
        r.getSeq[Long](2).toSeq, r.getLong(3))).toSet
    assert(liveBins === batch, "live bins must equal the batch next-fit packing")
    // the over-budget doc sat alone in its bin and overflowed it
    assert(live.find(_._2 == 3L).get._5 === 300L)
    // per-doc fill-after is monotone within a bin (next-fit never reorders)
    live.groupBy(t => (t._1, t._4)).values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._5).toSeq === sorted.map(_._5).sorted.toSeq)
    }
  }

  test("D41: live concurrency converges to the batch B79 rows however batched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L
    def mn(m: Long) = base + m * 60L * 1000000L
    // the B79 fixture sessions plus a bucket-SPANNING one [30min, 125min]
    // (base contribution to hour 1, end point in hour 2)
    val sessions = Seq(
      (mn(0), mn(10)), (mn(5), mn(5)), (mn(10), mn(10)), (mn(60), mn(60)),
      (mn(30), mn(125)))
      .map { case (s, e) => (s, e, new Timestamp(e / 1000L)) }
    def run(name: String, batches: Seq[Seq[(Long, Long, Timestamp)]]) = {
      val mem = MemoryStream[(Long, Long, Timestamp)]
      // retention far above the span so the reversed feed drops nothing
      val q = Streaming.concurrencyMonitor(
          mem.toDF.toDF("s_us", "e_us", "ts"), bucketUs = 3600L * 1000000L,
          retention = "10 hours")
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      // keep the LAST emission per bucket (the live gauge read)
      spark.table(name).collect()
        .map(r => (r.getLong(0),
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .foldLeft(Map.empty[Long, (Long, Long, Long, Long)])(_ + _)
    }
    val a = run("conc_a", Seq(sessions.take(2), sessions.slice(2, 4), sessions.drop(4)))
    val b = run("conc_b", Seq(sessions.reverse.take(1), sessions.reverse.drop(1)))
    assert(a === b, "batching/order must not move the final gauge")
    // batch twin: the SAME sessions arise from 30-min-gap sessionization of
    // this events fixture, so eventsConcurrency's rows are the oracle
    val dir = java.nio.file.Files.createTempDirectory("graft-conc-mon").toString
    Seq((1L, 10L, 0L), (2L, 10L, 10L), (3L, 20L, 5L), (4L, 30L, 10L),
      (5L, 40L, 60L),
      (6L, 50L, 30L), (7L, 50L, 55L), (8L, 50L, 80L), (9L, 50L, 105L),
      (10L, 50L, 125L))
      .map { case (id, u, m) => (id, u, new Timestamp(mn(m) / 1000L)) }
      .toDF("event_id", "user_id", "ts")
      .write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.Relational.eventsConcurrency(spark, dir)
      .collect()
      .map(r => (r.getLong(0) / (3600L * 1000000L),
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // monitor buckets are absolute (µs div bucketUs) indices; the batch
    // emits the hour-start µs — divide to align
    assert(a === batch,
      "latest live emissions must equal the batch events_concurrency rows")
    // hand values: hour 0 peak 2 (the touch at 00:10), S holds level 1 open
    assert(a(base / (3600L * 1000000L)) === ((4L, 3L, 2L, 1L)))
  }

  test("D42: live ACF equals the batch events_autocorr however batched, zero-fill included") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def hourTs(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:30:00")
    // type a: the B80 alternator [1,2,1,2,1]; type b: a REAL zero hour
    val events = (Seq(1, 2, 1, 2, 1).zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(_ => ("a", hourTs(h))) } ++
      Seq(("b", hourTs(0)), ("b", hourTs(0)), ("b", hourTs(2)), ("b", hourTs(2))))
    def run(name: String, batches: Seq[Seq[(String, Timestamp)]]) = {
      val mem = MemoryStream[(String, Timestamp)]
      val q = Streaming.autocorrMonitor(mem.toDF.toDF("event_type", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2),
          if (r.isNullAt(3)) null
          else java.lang.Double.valueOf(r.getDouble(3)))))
        .foldLeft(Map.empty[(String, Int), (Long, Any)])(_ + _)
    }
    val a = run("acf_a", Seq(events.take(4), events.slice(4, 9), events.drop(9)))
    val b = run("acf_b", Seq(events.reverse))
    assert(a === b, "batching/order must not move the final ACF")
    // batch twin on the same data
    val dir = java.nio.file.Files.createTempDirectory("graft-acf-mon").toString
    events.zipWithIndex.map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("event_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.Relational.eventsAutocorr(spark, dir).collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getLong(2),
        if (r.isNullAt(3)) null
        else java.lang.Double.valueOf(r.getDouble(3))))).toMap
    assert(a === batch, "latest live ACF must equal the batch query")
    // the zero hour was filled, not spliced: b lag1 = -16/24 exactly
    assert(a(("b", 1)) === ((3L,
      java.lang.Double.valueOf(math.floor(-16.0 / 24 * 1e6 + 0.5) / 1e6))))
  }

  test("D43: live change point equals the batch events_changepoint however batched") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    import java.sql.Timestamp
    def hourTs(h: Int) = Timestamp.valueOf(f"2024-01-01 $h%02d:15:00")
    // the B81 fixtures: a level shift and a symmetric tie
    val events = Seq(1, 1, 1, 5, 5).zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map(_ => ("a", hourTs(h))) } ++
      Seq(("b", hourTs(0)), ("b", hourTs(0)), ("b", hourTs(3)), ("b", hourTs(3)))
    def run(name: String, batches: Seq[Seq[(String, Timestamp)]]) = {
      val mem = MemoryStream[(String, Timestamp)]
      val q = Streaming.changepointMonitor(mem.toDF.toDF("event_type", "ts"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try batches.foreach { b => mem.addData(b: _*); q.processAllAvailable() }
      finally q.stop()
      spark.table(name).collect()
        .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))))
        .foldLeft(Map.empty[String, (Long, Long, Long, Long, Double, Double,
          Double)])(_ + _)
    }
    val a = run("cpt_a", Seq(events.take(5), events.drop(5)))
    val b = run("cpt_b", Seq(events.reverse))
    assert(a === b, "batching/order must not move the final split")
    val dir = java.nio.file.Files.createTempDirectory("graft-cpt-mon").toString
    events.zipWithIndex.map { case ((t, ts), i) => (i.toLong, t, ts) }
      .toDF("event_id", "event_type", "ts")
      .write.parquet(s"$dir/events.parquet")
    val batch = graft.queries.Relational.eventsChangepoint(spark, dir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    assert(a === batch, "latest live split must equal the batch query")
  }
}
