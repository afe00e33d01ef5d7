package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured-Streaming operators (SURVEY.md §2 D-block).
  *
  * The transforms are written once against a DataFrame and run identically
  * under `read` and `readStream` — the streaming-vs-batch split lives only
  * in the source/sink wiring, which is the Spark-native way to keep the two
  * paths provably consistent (the batch twin IS the oracle for the stream).
  */
object Streaming {

  /** events.parquet schema under `nanosAsLong` (ts arrives as epoch nanos).
    * Kept for fixtures that WRITE long-ts events; reading is schema-adaptive
    * (see [[eventStream]]).
    */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Streaming source over the events table. The file-stream source
    * monitors directories, so the sf dir is the source path with a glob
    * filter selecting the events file(s) — works for single-file test
    * layouts and partitioned production layouts alike.
    *
    * `readStream` needs a declared schema; it is taken from the files
    * present at start (one footer read), and `ts` is then normalised by
    * [[graft.queries.Tables.eventTs]] — so epoch-nano-long and parquet
    * timestamp events sources both stream with a TimestampType `ts`.
    * When NO file exists yet (a stream started before its first input —
    * the normal production cold start) the eager read cannot infer, and
    * the declared [[EventsSchema]] takes over so the stream starts and
    * waits instead of throwing.
    */
  def eventStream(spark: SparkSession, dir: String): DataFrame = {
    val schema =
      try spark.read.option("pathGlobFilter", "events.parquet")
        .parquet(dir).schema
      catch { case _: org.apache.spark.sql.AnalysisException => EventsSchema }
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    raw.withColumn("ts", graft.queries.Tables.eventTs(raw))
  }

  /** Switches the session's streaming state store to RocksDB — the
    * production backend for every stateful operator in this file (the
    * sessionize/funnel/dormancy/retained-dedup monitors, all
    * flatMapGroupsWithState). The default HDFSBackedStateStoreProvider
    * keeps every key's state in executor heap; at the 100M-key scale a
    * per-user monitor reaches on a real event stream that is an executor
    * OOM, while RocksDB spills state to local disk with a bounded block
    * cache and adds changelog checkpointing. The conf is read at QUERY
    * start, so call this before `writeStream.start()`; checkpoints are
    * backend-specific (HDFS-backed and RocksDB layouts differ), so
    * restarts must keep the backend they started with — new checkpoint
    * for a backend migration.
    *
    * The same setting rides the config file path unchanged:
    * `config.spark.sql.streaming.stateStore.providerClass: ...RocksDBStateStoreProvider`
    * in a [[graft.io.Config]] YAML reaches the session builder verbatim.
    */
  def useRocksDbStateStore(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

  /** Reverts [[useRocksDbStateStore]] to the default in-memory provider. */
  def useDefaultStateStore(spark: SparkSession): Unit =
    spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

  /** D1: tumbling 1-hour window aggregation with a 10-minute watermark.
    * Works on both batch and streaming frames; late data beyond the
    * watermark is dropped by the engine in streaming mode.
    */
  def windowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1000000) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6)).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** D1b: HOPPING window aggregation (15-minute windows sliding every 5 —
    * each event lands in 3 overlapping windows) with a 10-minute
    * watermark; the streaming run of the `events_hop` batch query. State
    * per key is windows × types; the watermark closes duration/slide
    * windows per advance, so state stays bounded on an unbounded stream.
    */
  def hopWindowAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "15 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sum(floor(col("value") * lit(1000000) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6)).as("sum_value"))
      .select(col("window.start").as("bucket"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** D2: streaming dedup on event_id within the watermark horizon —
    * exactly-once semantics over an at-least-once source.
    */
  def dedup(events: DataFrame): DataFrame =
    events.withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** D13: streaming volume-anomaly monitor — the z stage of the batch
    * `events_anomaly` query applied to the hourly buckets a stream has
    * CLOSED so far. `closedBuckets` is the accumulated append-mode output
    * of [[windowAgg]] (watermark-closed (bucket, type, n) rows — the
    * production wiring lands them in a foreachBatch-appended counts table,
    * tiny by construction at |types|·|hours| rows); each scoring pass runs
    * [[graft.ops.stats.Stats.trailingZ]] over it.
    *
    * The guarantee, precisely: the scores equal the batch `events_anomaly`
    * query RESTRICTED TO THE CLOSED BUCKETS. Hour windows close in bucket
    * order, so every closed bucket's 6 trailing neighbours are closed too
    * and its z is final the moment it is emitted — the batch row never
    * revises it. Buckets the watermark has not yet closed are absent here
    * but present in a batch run over the same events; they appear (with
    * the identical z, same arithmetic) once the watermark passes. Both
    * halves are spec-asserted: append-mode closed-prefix agreement, and
    * full equality on a drained stream.
    *
    * A replay-after-restart can append the same CLOSED bucket twice (a
    * closed window re-emits identically, so duplicates are exact); the
    * dedup below restores [[graft.ops.stats.Stats.trailingZ]]'s
    * unique-key precondition deterministically.
    */
  def anomalyScores(closedBuckets: DataFrame): DataFrame =
    graft.ops.stats.Stats.trailingZ(
      closedBuckets.select("bucket", "event_type", "n_events")
        .dropDuplicates("bucket", "event_type"),
      "event_type", "bucket", "n_events")

  /** D8: streaming per-group frequent-token candidates — the Misra–Gries
    * sketch as `flatMapGroupsWithState` state, sharing its update/compress
    * core with the batch aggregate (graft.functions.MisraGries), so the
    * streaming candidates inherit the same guarantee: after any prefix of
    * the stream, every token with count > n/(capacity+1) so far is in the
    * group's candidate set. State is O(capacity) per group forever — the
    * bounded-memory shape that lets corpus token telemetry run on an
    * unbounded ingest stream. Each trigger emits the group's current
    * (candidates, n_tokens); downstream recounts candidates exactly when
    * the heavy-hitter set must be exact (CorpusStats.heavyHitters).
    */
  def heavyHitterCandidates(docs: DataFrame, capacity: Int,
                            groupCol: String = "source", textCol: String = "text")
      : DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).as("grp"),
        explode(split(col(textCol), " ")).as("token"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (grp: String, rows: Iterator[(String, String)],
         state: GroupState[(Map[String, Long], Long)]) =>
          val (m0, n0) = state.getOption.getOrElse((Map.empty[String, Long], 0L))
          val m = scala.collection.mutable.HashMap[String, Long](m0.toSeq: _*)
          var n = n0
          rows.foreach { case (_, tok) =>
            graft.functions.MisraGries.add(m, tok, capacity); n += 1
          }
          state.update((m.toMap, n))
          Iterator.single((grp, m.keysIterator.toSeq.sorted, n))
      }
      .toDF("grp", "candidates", "n_tokens")
  }

  /** D11: streaming length-distribution sketch — running power-of-two
    * histogram bucket counts of the token length per group, update mode.
    * The bucket rule is SHARED with the batch quantile sketch
    * ([[graft.ops.stats.Stats.pow2Bucket]]) so the stream's final state
    * IS the batch sketch: feed it to the same rank-interpolation step for
    * live p50/p99 length telemetry. State is O(groups · log₂ maxLen)
    * counters — bounded however long the stream runs.
    */
  def histSketch(docs: DataFrame, groupCol: String = "source",
                 textCol: String = "text"): DataFrame =
    docs.select(col(groupCol).as("grp"),
        graft.ops.stats.Stats.pow2Bucket(
          size(graft.ops.text.TextOps.tokens(col(textCol)))).as("b"))
      .groupBy("grp", "b").count()

  /** D19: streaming Count-Min frequency sketch — the running (j, b, c)
    * register table of token counts over an ingest stream, update mode.
    * The hash coordinates are SHARED with the batch sketch
    * ([[graft.ops.stats.Stats.cmsBuckets]]) so the stream's state after
    * any prefix IS the batch register table on that prefix: probe it with
    * [[graft.ops.stats.Stats.cmsEstimate]] for live "how often has THIS
    * value occurred" answers. State is d·w counters — 256 rows — bounded
    * however long the stream runs and whatever the vocabulary grows to
    * (the whole point of CMS over an exact streaming word count).
    */
  def cmsMonitor(docs: DataFrame, textCol: String = "text",
                 d: Int = 4, w: Int = 64): DataFrame =
    graft.ops.stats.Stats.cmsRegisters(
      docs.select(explode(split(col(textCol), " ")).as("token")),
      col("token"), d, w)

  /** One emitted drift row: counts of both sides plus the two statistics
    * (None on an empty side — drift from nothing is undefined, the C60/C71
    * stance).
    */
  final case class DriftStat(na: Long, nb: Long, ks: Option[Double],
                             js_nats: Option[Double], js_norm: Option[Double])

  /** The D31 drift state+finisher as ONE typed aggregate: the buffer is
    * the support-sized length-count map (the register), and `finish`
    * computes KS and JS against the frozen `baseline` with EXACTLY the
    * arithmetic of the shared DataFrame kernels
    * ([[graft.ops.stats.Stats.ksFromJoint]]/[[Stats.jsFromJoint]]): KS in
    * exact integer cross-products |ca·nb − cb·na|, JS per-key double
    * terms (StrictMath.log — Spark's SQL `log`) summed through
    * scale-10 HALF_UP decimals (the Catalyst double→DECIMAL(27,10) cast),
    * both rounded once at 6 dp via the Catalyst Round path. Keys iterate
    * in sorted order, so the fold is deterministic.
    */
  private final class DriftAggregator(baseline: Map[Long, Long])
      extends org.apache.spark.sql.expressions.Aggregator[Long, Map[Long, Long], DriftStat] {
    private def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def zero: Map[Long, Long] = Map.empty
    def reduce(m: Map[Long, Long], len: Long): Map[Long, Long] =
      m.updated(len, m.getOrElse(len, 0L) + 1L)
    def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] =
      y.foldLeft(x) { case (acc, (k, v)) => acc.updated(k, acc.getOrElse(k, 0L) + v) }
    def finish(live: Map[Long, Long]): DriftStat = {
      val na = baseline.values.sum
      val nb = live.values.sum
      // the exact-integer KS numerator |ca·nb − cb·na| (and the na·nb
      // emptiness test) is valid while na·nb < 2⁶³ — the ksFromJoint
      // bound, both sides under ~3e9 rows. Past it na·nb wraps negative:
      // the empty-side branch flips and the statistic silently corrupts,
      // so refuse loudly instead (the r15 advisor finding).
      require(na <= 3000000000L && nb <= 3000000000L,
        s"driftMonitor: side counts na=$na nb=$nb exceed ~3e9 — the exact " +
          "integer KS cross-product would overflow Long (the ksFromJoint " +
          "bound). Window the stream or downsample the register feed.")
      if (na * nb <= 0) DriftStat(na, nb, None, None, None)
      else {
        val keys = (baseline.keySet ++ live.keySet).toSeq.sorted
        var ca = 0L; var cb = 0L; var num = 0L
        var sp = BigDecimal(0); var sq = BigDecimal(0)
        keys.foreach { k =>
          val a = baseline.getOrElse(k, 0L)
          val b = live.getOrElse(k, 0L)
          ca += a; cb += b
          num = math.max(num, math.abs(ca * nb - cb * na))
          val p = a.toDouble / na
          val q = b.toDouble / nb
          val m = (p + q) / 2
          if (a > 0) sp += BigDecimal(p * StrictMath.log(p / m))
            .setScale(10, BigDecimal.RoundingMode.HALF_UP)
          if (b > 0) sq += BigDecimal(q * StrictMath.log(q / m))
            .setScale(10, BigDecimal.RoundingMode.HALF_UP)
        }
        val jsNats = r6((sp + sq).toDouble * 0.5)
        DriftStat(na, nb, Some(r6(num.toDouble / (na * nb))),
          Some(jsNats), Some(r6(jsNats / 0.6931471805599453)))
      }
    }
    def bufferEncoder: org.apache.spark.sql.Encoder[Map[Long, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[DriftStat] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[DriftStat]()
  }

  /** D31: streaming distribution-drift monitor — the live twin the drift
    * family (C60 KS, C71 JS) was missing: one row per trigger with KS and
    * JS of the arrived documents' token-length distribution against a
    * FROZEN baseline register (collect a batch register once and pass the
    * map — the trained-model shape, support-sized, broadcast inside the
    * aggregate's closure). Update/complete mode; the only state is the
    * aggregation buffer — the support-sized length-count map (the D19/D22
    * register stance: bounded by DISTINCT lengths however long the stream
    * runs, never by rows). After any stream prefix the emitted row EQUALS
    * the batch kernel [[graft.ops.stats.Stats.ksFromJoint]]/
    * [[Stats.jsFromJoint]] over `jointCounts(baseline, prefix register)`
    * — spec-proven per batch; the shared-finisher arithmetic is what
    * makes that an identity, not a tolerance. NULL-text rows are excluded
    * exactly as the batch C60 does (r15 NULL stance). Per-row cost is one
    * persistent-map update; the finisher walks the support once per
    * trigger.
    */
  def driftMonitor(docs: DataFrame, baseline: Map[Long, Long],
                   textCol: String = "text"): DataFrame = {
    val agg = udaf(new DriftAggregator(baseline))
    docs.where(col(textCol).isNotNull)
      .select(size(graft.ops.text.TextOps.tokens(col(textCol))).cast("long").as("len"))
      .agg(agg(col("len")).as("drift"))
      .select(col("drift.na").as("na"), col("drift.nb").as("nb"),
        col("drift.ks").as("ks"), col("drift.js_nats").as("js_nats"),
        col("drift.js_norm").as("js_norm"))
  }

  /** D20: streaming winnowing fingerprints — each arriving document's MOSS
    * selection ([[graft.ops.text.TextOps.winnow]]) computed in-stream:
    * STATELESS narrow per-document work (no state store, no watermark,
    * append mode), so ingest fingerprinting runs at stream-scan speed and
    * the emitted (doc_id, pos, fp) rows feed the C67 pair join or a live
    * contamination probe downstream. Identical selection to batch by
    * construction — the same mapPartitions kernel runs in both.
    */
  def winnowMonitor(docs: DataFrame, k: Int = 5, w: Int = 4): DataFrame =
    graft.ops.text.TextOps.winnow(docs, k, w)

  /** D16: streaming vocabulary top-k — the running top-`k` tokens by
    * frequency over an ingest stream (complete mode: one keyed count, the
    * engine's sort+limit on the |vocab|-row state). After any stream
    * prefix the table equals the batch `corpus_zipf` query's ranked
    * prefix on the same documents, so the drift monitor (Zipf slope,
    * template takeover, vocabulary churn) reads straight off the sink —
    * the spec computes the slope from this table with the identical OLS
    * closed form. State is the token count map — |vocab| rows, the same
    * state any streaming word count carries.
    */
  def zipfTopK(docs: DataFrame, k: Int = 50, textCol: String = "text"): DataFrame =
    docs.select(explode(graft.ops.text.TextOps.tokens(col(textCol))).as("t"))
      .where(length(col("t")) > 0)
      .groupBy("t").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("t"))
      .limit(k)

  /** D17: streaming per-user event telemetry — the batch B39
    * `events_user_stats` aggregate run in update mode: total + per-type
    * conditional counts, first/last activity (epoch micros), exact value
    * total. Every branch is an algebraic aggregate (count/min/max/
    * decimal-sum), so state per user is O(1) and each trigger's emission
    * for a user equals the batch query on the stream prefix — the live
    * per-account activity view. State grows with |users|; bound it
    * upstream with a watermarked window when user churn is unbounded.
    */
  def userStatsMonitor(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        count(when(col("event_type") === "view", 1)).as("n_view"),
        count(when(col("event_type") === "click", 1)).as("n_click"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchase"),
        unix_micros(min(col("ts"))).as("first_us"),
        unix_micros(max(col("ts"))).as("last_us"),
        (sum(floor(col("value") * lit(1000000) + lit(0.5)).cast("long"))
          .cast("double") / lit(1e6)).as("sum_value"))

  /** Funnel-monitor state: the established stage times plus the pending
    * out-of-order candidates the watermark has not yet retired. All times
    * are epoch micros.
    */
  case class FunnelState(t1: Option[Long], clicks: List[Long],
                         purchases: List[Long])

  /** D21: streaming ordered-funnel monitor — the batch B32 `events_funnel`
    * chained-min semantics (first view, first click AFTER it, first
    * purchase AFTER that) maintained live per user, EXACT under
    * out-of-order arrival. The subtlety an algebraic formulation misses:
    * a click that doesn't qualify today (no earlier view yet) can start
    * qualifying when an older view arrives, so the monitor must remember
    * it — naive O(1) state is simply wrong on late data. State is instead
    * the minimal sufficient set, pruned by the WATERMARK:
    *
    *   - a pending click `c` is dead once `c ≤ min(t1, watermark)` — any
    *     future view `v` satisfies `v ≥ watermark`, so the first-view time
    *     can never drop below `c` again (same argument retires purchases
    *     against `t2`);
    *   - a pending click strictly above the current `t2` is dead because
    *     the qualifying set only grows, so `t2` only decreases.
    *
    * What remains is the out-of-order horizon: O(events inside the
    * watermark lag) per user, the same bound every watermarked stateful
    * op in this file carries. Each trigger emits the user's current
    * funnel stage and stage times (== the batch funnel on the stream
    * prefix, spec-proven including cross-batch out-of-order arrival) plus
    * `n_pending` so the state-retirement behaviour is observable.
    */
  def funnelMonitor(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      // ts itself rides along unused: the watermark lives in the column's
      // metadata, so projecting it away would detach the watermark from
      // the stateful operator
      .select(col("user_id").cast("long"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("ts"))
      .withWatermark("ts", "30 minutes")
      .as[(Long, String, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, String, Long, java.sql.Timestamp)],
         state: GroupState[FunnelState]) =>
          val s0 = state.getOption.getOrElse(FunnelState(None, Nil, Nil))
          var t1 = s0.t1
          var clicks = s0.clicks
          var purchases = s0.purchases
          rows.foreach { case (_, tpe, us, _) => tpe match {
            case "view"     => if (t1.forall(us < _)) t1 = Some(us)
            case "click"    => clicks ::= us
            case "purchase" => purchases ::= us
            case _          => ()
          }}
          // micros; on the very first batch no watermark exists yet → -inf
          val wm =
            if (state.getCurrentWatermarkMs() > 0) state.getCurrentWatermarkMs() * 1000L
            else Long.MinValue
          val t2 = t1.flatMap(v => clicks.filter(_ > v).minOption)
          val t3 = t2.flatMap(c => purchases.filter(_ > c).minOption)
          // retire: c ≤ min(watermark, stage-min) can never qualify again
          // (every future candidate for the preceding stage arrives ≥ wm),
          // and c above the (only-decreasing) next stage min is never the min
          def cutoff(stage: Option[Long]) =
            math.min(wm, stage.getOrElse(Long.MaxValue))
          clicks = clicks.filter(c => c > cutoff(t1) && t2.forall(c <= _)).distinct
          purchases = purchases.filter(p => p > cutoff(t2) && t3.forall(p <= _)).distinct
          state.update(FunnelState(t1, clicks, purchases))
          val stage = Seq(t1, t2, t3).takeWhile(_.isDefined).size
          Iterator.single((user, stage, t1.getOrElse(-1L), t2.getOrElse(-1L),
            t3.getOrElse(-1L), clicks.size + purchases.size))
      }
      .toDF("user_id", "stage", "t1_us", "t2_us", "t3_us", "n_pending")
  }

  final case class PatEvent(user_id: Long, ts_us: Long, tie: Long, ch: String)
  final case class PatternCount(user_id: Long, n_events: Long, n_matches: Long)

  /** D26: streaming CEP motif monitor — the batch B63/B64
    * [[graft.ops.events.Events.matchPattern]] as a per-user stateful
    * stream: each user's `flatMapGroupsWithState` group holds the FULL
    * (ts, tie, ch) event list and every batch re-sorts and re-counts, so
    * each emission is EXACTLY the batch answer over everything seen so
    * far — out-of-order arrivals are absorbed by construction (a late
    * event changes the next emission, never corrupts state), the same
    * stance as the D21 funnel. Pattern and event-char mapping are the
    * SAME arguments as the batch op, so one motif definition serves
    * batch, oracle, and stream.
    *
    * Emits one (user, n_events, n_matches) row per user per batch
    * (append; latest per user wins at the consumer — the D8/D24 update
    * convention). State per user is that user's event count — the
    * sessionize-class contract; a production stream bounds it with an
    * ingest watermark + EventTimeTimeout exactly like [[dormancyMonitor]],
    * which changes none of the logic. Runs identically on a batch frame
    * (each group arrives complete in one call) — the batch run AND the
    * batch operator are both oracles (StreamingSpec checks all three
    * agree).
    */
  def patternMonitor(events: DataFrame, pattern: String,
                     charMap: Map[String, String] = Map.empty): Dataset[PatternCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.ops.events.Events.validateCharMap(charMap)
    // compile once on the driver: a malformed pattern fails at plan time,
    // not per-task; java.util.regex.Pattern is serializable
    val compiled = java.util.regex.Pattern.compile(pattern)
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("tie"),
        graft.ops.events.Events.encodeCol("event_type", charMap).as("ch"))
      .as[PatEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[PatEvent], state: GroupState[List[PatEvent]]) =>
          val all = it.foldLeft(state.getOption.getOrElse(Nil))((acc, e) => e :: acc)
          state.update(all)
          val seq = all.sortBy(e => (e.ts_us, e.tie)).iterator
            .map(_.ch).mkString
          val m = compiled.matcher(seq)
          var n = 0L
          while (m.find()) n += 1
          Iterator.single(PatternCount(uid, seq.length.toLong, n))
      }
  }

  final case class TsPatEvent(user_id: Long, ts: java.sql.Timestamp,
                              ts_us: Long, tie: Long, ch: String)

  /** D26 with BOUNDED state: [[patternMonitor]] against a retention
    * window — the [[nearDupPairsRetained]] (D7b) pattern applied to the
    * per-user CEP state. The input is watermarked by `retention`; on
    * every visit the user's event history is truncated at the horizon
    * (`event.ts ≥ watermark`), the pattern recount runs over the
    * RETAINED suffix only, and users quiet past the horizon are erased
    * entirely by an event-time timeout — state is proportional to each
    * user's in-window event count, never their lifetime history. The
    * emitted row is the in-window match count (n_events = retained
    * events): a pattern whose prefix expired no longer matches, by
    * design — the horizon IS the semantic (a funnel older than the
    * retention window is not an active funnel). This is the shape an
    * unbounded production stream runs; the NoTimeout variant above is
    * the whole-corpus batch-equivalent tool.
    */
  def patternMonitorRetained(events: DataFrame, pattern: String,
                             retention: String = "1 hour",
                             tsCol: String = "ts",
                             charMap: Map[String, String] = Map.empty): Dataset[PatternCount] = {
    val spark = events.sparkSession
    import spark.implicits._
    graft.ops.events.Events.validateCharMap(charMap)
    val compiled = java.util.regex.Pattern.compile(pattern)
    val typed = events
      .withWatermark(tsCol, retention)
      .select(col("user_id").cast("long").as("user_id"),
        col(tsCol).as("ts"),
        unix_micros(col(tsCol)).as("ts_us"),
        col("event_id").cast("long").as("tie"),
        graft.ops.events.Events.encodeCol("event_type", charMap).as("ch"))
      .as[TsPatEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[TsPatEvent], state: GroupState[List[TsPatEvent]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            val retained = it.foldLeft(state.getOption.getOrElse(Nil))(
              (acc, e) => e :: acc).filter(_.ts.getTime >= watermark)
            if (retained.isEmpty) {
              // every event expired and nothing in-window arrived
              state.remove()
              Iterator.empty
            } else {
              state.update(retained)
              var maxTs = watermark
              retained.foreach(e => if (e.ts.getTime > maxTs) maxTs = e.ts.getTime)
              // erase the user once the watermark passes their newest event
              state.setTimeoutTimestamp(maxTs + 1)
              val seq = retained.sortBy(e => (e.ts_us, e.tie)).iterator
                .map(_.ch).mkString
              val m = compiled.matcher(seq)
              var n = 0L
              while (m.find()) n += 1
              Iterator.single(PatternCount(uid, seq.length.toLong, n))
            }
          }
      }
  }

  final case class MkEvent(user_id: Long, ts_us: Long, tie: Long,
                           event_type: String)
  final case class MkTransition(user_id: Long, prev_type: String,
                                next_type: String, ts_us: Long)

  /** D29: streaming behavioural-transition witnesses — the batch B66
    * `events_markov` lag kernel at ingest: per user, each arriving event
    * emits one (prev_type → next_type) transition row against the user's
    * LAST event, and the state advances — O(1) state per user (the
    * single last-event row, the D17/D18 algebraic-class bound), append
    * mode. The |types|² count matrix and the row-conditional
    * probabilities are the consumer's aggregate (the D27 witness
    * stance): counts of the emitted witnesses grouped by (prev, next)
    * equal the batch operator's `n` on any stream prefix.
    *
    * Ordering: within a batch, a user's rows are re-sorted by
    * (ts_us, tie) before stepping — intra-batch disorder is absorbed.
    * ACROSS batches the lag recurrence is inherently order-coupled: a
    * late event older than the stored last would retroactively SPLIT an
    * already-emitted transition, which no O(1)-state stream can retract.
    * The exactness contract is therefore per-user in-order arrival
    * across batches (any time-ordered batching — the natural shape of a
    * replayed log or a watermark-sorted feed); a deployment with
    * unbounded disorder uses the D26 full-history stance and pays
    * O(events) state for it. This is the same priced trade the
    * incremental dedup family documents: per-batch cost O(batch), not
    * O(history).
    */
  def markovMonitor(events: DataFrame): Dataset[MkTransition] = {
    val spark = events.sparkSession
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long").as("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        col("event_id").cast("long").as("tie"),
        col("event_type"))
      .as[MkEvent]
    typed.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[MkEvent], state: GroupState[MkEvent]) =>
          val sorted = it.toIndexedSeq.sortBy(e => (e.ts_us, e.tie))
          var last = state.getOption.orNull
          val out = List.newBuilder[MkTransition]
          sorted.foreach { e =>
            if (last != null)
              out += MkTransition(uid, last.event_type, e.event_type, e.ts_us)
            last = e
          }
          if (last != null) state.update(last)
          out.result().iterator
      }
  }

  /** D24: streaming value histogram — the B57 equi-width distribution
    * profile maintained live per bucket in update mode: bucketing is the
    * same narrow floor-divide, and every per-bucket statistic (count,
    * decimal-exact sum, min, max) is algebraic, so state is O(|buckets|)
    * forever and each emission equals the batch histogram on the stream
    * prefix — the live "has the value distribution shifted" readout next
    * to the volume monitor (D13). Runs identically on batch and stream
    * frames (the batch run IS the spec's oracle).
    */
  def valueHistogram(events: DataFrame, width: Double = 10.0): DataFrame =
    events
      .select(floor(col("value") / width).cast("long").as("bucket"),
        col("value"), col("value").cast(DecimalType(18, 6)).as("dv"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum("dv").cast("double").as("total"),
        min("value").as("min_v"), max("value").as("max_v"))

  /** D25: streaming dormancy detector — the batch B59 churn list as a
    * LIVE alert, and the one member of the family that is impossible as
    * a pure streaming aggregation: dormancy is the ABSENCE of events,
    * and only a state timeout can observe absence. Per-user state is the
    * last-seen event time (O(1)); each update arms an
    * `EventTimeTimeout` at last + idle, and when the WATERMARK passes it
    * — meaning no earlier event can still arrive, the exact moment the
    * claim "idle for `idleMs`" becomes safe — the user emits once and
    * the state clears (a later reactivation starts a fresh episode, so
    * emissions are one-per-dormancy-episode by construction). The
    * timeout is clamped above the current watermark so a user first
    * seen already-stale alerts on the next trigger instead of throwing.
    */
  def dormancyMonitor(events: DataFrame, idleMs: Long = 12L * 3600 * 1000)
      : DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), unix_micros(col("ts")).as("us"),
        col("ts"))
      .withWatermark("ts", "10 minutes")
      .as[(Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[(Long, Long, java.sql.Timestamp)],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single((user, last, idleMs))
          } else {
            val maxUs = (rows.map(_._2) ++ state.getOption.iterator).max
            state.update(maxUs)
            state.setTimeoutTimestamp(
              math.max(maxUs / 1000 + idleMs, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
      .toDF("user_id", "last_us", "idle_ms")
  }

  /** D23: in-stream embedding-outlier flags — the batch-train /
    * stream-score split (the D12 NB pattern) for embedding health: the
    * per-dimension moment table ([[graft.ops.ann.Ann.dimStats]]) is
    * trained batch-side at ingest and FROZEN as plan literals, so each
    * arriving vector scores max-|z| in a stateless narrow map — no state
    * store, no watermark, append mode, scan-speed. Per-dim rounding
    * before the order-free max makes the stream's flags bit-equal to the
    * batch C75 query on the same rows (spec-proven). The live tripwire
    * for an encoder regression mid-ingest.
    */
  def outlierMonitor(emb: DataFrame, stats: DataFrame): DataFrame =
    graft.ops.ann.Ann.outlierScores(emb, stats)

  /** D22: streaming rolling-DAU sketch — the B54 sliding distinct-user
    * window maintained live as HyperLogLog registers per window end
    * ([[graft.ops.stats.Stats.hllRegisters]], m = 64): each arriving
    * event expands to the `windowDays` window-ends it touches and bumps
    * max-rho registers. Two structural wins make this THE streaming
    * form: HLL is duplicate-insensitive, so the batch twin's
    * dropDuplicates stage vanishes (re-activity cannot move a max), and
    * max is algebraic, so update-mode state is exactly 64 counters per
    * window day — bounded forever, mergeable across streams by the same
    * max. After any prefix the emitted register table IS the batch
    * sketch on that prefix (spec-proven); probe with
    * [[graft.ops.stats.Stats.hllEstimate]] for the live DAU readout.
    */
  def dauHllMonitor(events: DataFrame, windowDays: Int = 3): DataFrame =
    graft.ops.stats.Stats.hllRegisters(
      events.select(col("user_id"),
          datediff(to_date(col("ts")), lit("1970-01-01")).as("day"))
        .select(col("user_id"),
          explode(sequence(col("day"), col("day") + (windowDays - 1))).as("wend")),
      "wend", col("user_id"))

  /** D18: streaming latest-state compaction — the batch B44
    * `events_latest_per_key` view maintained live in update mode: one row
    * per user carrying the most recent event's time/type/value. The
    * survivor is the MAX of the (ts, event_id, type, value) struct;
    * struct comparison is field-lexicographic, so the (ts, event_id)
    * prefix is the same total order the batch rank-1 window sorts by and
    * the winner matches exactly under timestamp ties. max is algebraic —
    * O(1) state per user, each trigger emits only users whose state
    * changed: the continuously-materialised current-state table a CDC
    * consumer reads instead of replaying the stream.
    */
  def latestPerKeyMonitor(events: DataFrame): DataFrame =
    events.groupBy("user_id")
      .agg(max(struct(col("ts"), col("event_id"),
        col("event_type"), col("value"))).as("last"))
      .select(col("user_id"), unix_micros(col("last.ts")).as("last_us"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))

  /** D15: streaming filter-agreement monitor — the running pairwise
    * contingency between the gopher quality flags over an ingest stream,
    * complete mode. Both the per-doc flag frame
    * ([[graft.ops.text.TextOps.gopherFlagFrame]]) and the conditional-sum
    * cells ([[graft.ops.stats.Stats.flagAgreement]]) are the BATCH
    * kernels verbatim, so after any stream prefix the monitor's table ==
    * the batch `quality_agreement` diagnostic on the same prefix. State
    * is the 4·|pairs| partial sums — O(1) however long the stream runs.
    * The live view of whether a quality gate has gone redundant (or
    * started disagreeing) as the ingest mix drifts.
    */
  def qualityAgreementMonitor(docs: DataFrame, textCol: String = "text"): DataFrame =
    graft.ops.stats.Stats.flagAgreement(
      graft.ops.text.TextOps.gopherFlagFrame(docs, textCol),
      graft.ops.text.TextOps.GopherFlagNames)

  /** D9: streaming passage-frequency monitor — the CDC chunk projection
    * ([[graft.ops.dedup.Dedup.chunkFingerprints]], shared with the batch
    * [[graft.ops.dedup.Dedup.sharedPassages]] so chunking cannot drift)
    * aggregated to running per-fingerprint occurrence counts in update
    * mode. The in-stream detector for boilerplate/copied passages: a
    * fingerprint whose count climbs across many documents is template
    * text to strip before training. State is one counter per distinct
    * chunk — the md5 keys are fixed-width, and counts (not chunk text)
    * are all the state holds.
    */
  def passageCounts(docs: DataFrame, divisor: Int = 7, minTokens: Int = 5): DataFrame =
    graft.ops.dedup.Dedup.chunkFingerprints(docs, divisor, minTokens)
      .groupBy("chunk_fp")
      .agg(count(lit(1)).as("n_occ"))

  /** D5: stream-stream equi-join with an event-time band — `right` rows
    * within `[left.ts - bandBefore, left.ts + bandAfter]` of the matching
    * `left` row. The watermark plus the time bound is what lets the engine
    * BOUND the join state: buffered rows age out as the watermark passes
    * their band, so state stays proportional to the band width, not the
    * stream length — the only stream-stream join shape that survives an
    * unbounded run. Works identically on batch frames (the batch twin is
    * the oracle).
    *
    * `leftTs`/`rightTs` name each side's event-time column (they must
    * differ, as join output carries both).
    */
  def bandJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTs: String, rightTs: String,
               watermark: String = "1 hour",
               bandBefore: String = "10 minutes",
               bandAfter: String = "0 seconds"): DataFrame = {
    require(leftTs != rightTs, "bandJoin: time columns must have distinct names")
    require(leftKey != rightKey,
      "bandJoin: key columns must have distinct names (col(k) === col(k) would " +
        "resolve both sides to one input — rename one side before joining)")
    val l = left.withWatermark(leftTs, watermark)
    val r = right.withWatermark(rightTs, watermark)
    l.join(r,
      col(leftKey) === col(rightKey) &&
        col(rightTs) >= col(leftTs) - expr(s"INTERVAL $bandBefore") &&
        col(rightTs) <= col(leftTs) + expr(s"INTERVAL $bandAfter"))
  }

  /** D28: streaming multi-touch attribution witnesses — the batch B65
    * `events_attribution` join half run live on the [[bandJoin]]
    * machinery: purchases × their preceding touches (view/click) within
    * the `lookback` event-time band, per user. Each emitted row
    * (pid, touch_type, tts_us, tid) certifies one attributable touch for
    * one purchase, exactly once, as soon as both sides have arrived —
    * out-of-order pairs inside the watermark are found by the join
    * buffer, which is what makes the emitted WITNESS SET equal to the
    * batch join on any batching (StreamingSpec asserts it, including a
    * late touch arriving after its purchase's batch).
    *
    * The first/last-touch ELECTION and the per-type rollup are
    * deliberately the consumer's aggregate (the D8/D27 witness stance):
    * "first touch" is a fact about the FINAL attributable set of a
    * purchase, which a stream only knows once the watermark closes the
    * purchase's band — a late-arriving OLDER touch re-elects the winner.
    * Emitting witnesses makes that re-election the consumer's trivially
    * correct max/min instead of a retraction protocol. State is the D5
    * bound: both sides buffered for watermark + band, proportional to
    * the band width, never the stream length. The strict `tts < pts`
    * batch predicate rides as a post-join filter on the band join's
    * closed interval.
    */
  def attributionMonitor(events: DataFrame,
                         watermark: String = "1 hour",
                         lookback: String = "24 hours"): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"),
      col("event_type"), col("ts"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("pid"),
        col("ts").as("pts"))
    val touches = ev.where(col("event_type").isin("view", "click"))
      .select(col("user_id").as("t_user"), col("event_id").as("tid"),
        col("event_type").as("touch_type"), col("ts").as("tts"))
    bandJoin(purchases, touches, "p_user", "t_user", "pts", "tts",
      watermark = watermark, bandBefore = lookback, bandAfter = "0 seconds")
      .where(col("tts") < col("pts"))
      .select(col("pid"), col("touch_type"),
        unix_micros(col("tts")).as("tts_us"), col("tid"))
  }

  /** documents.parquet schema, for the file-stream source. */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming source over the documents table (same glob-filter pattern
    * as [[eventStream]]).
    */
  def documentStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(DocumentsSchema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(dir)

  /** D14: in-stream snapshot diff — each arriving document flagged
    * `added` (id unknown to the reference snapshot) or `changed` (id
    * known, content fingerprint differs) against a STATIC previous
    * snapshot; unchanged arrivals are dropped. The stream-side half of
    * [[graft.ops.dedup.Dedup.snapshotDiff]], sharing its xxhash64
    * fingerprint comparison so stream == batch is provable: after the
    * stream drains, the flags equal the batch diff restricted to
    * added+changed (`removed` needs the absence of an arrival, which only
    * a batch pass over the closed snapshot can observe — the documented
    * asymmetry of an unbounded stream).
    *
    * Plan: a stream-static LEFT join on the id. The reference side is a
    * plain DataFrame — at scale, bucket it by id at ingest (or let AQE
    * broadcast its (id, hash) projection, two narrow columns) and each
    * micro-batch joins O(batch), never O(snapshot).
    */
  def diffFlags(docs: DataFrame, oldSnap: DataFrame,
                idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ref = oldSnap.select(col(idCol).as("__ref_id"),
      xxhash64(col(textCol)).as("__ref_h"))
    docs
      .withColumn("__h", xxhash64(col(textCol)))
      .join(ref, col(idCol) === col("__ref_id"), "left")
      .withColumn("status",
        when(col("__ref_id").isNull, lit("added"))
          .when(col("__h") =!= col("__ref_h"), lit("changed")))
      .where(col("status").isNotNull)
      .select(col(idCol).as("id"), col("status"))
  }

  /** D6: the training-data curation pipeline as ONE batch/stream-shared
    * transform — token-count quality gate, then exact dedup on the
    * normalisation key (first ten tokens, as in the batch C1 operator).
    * Under `readStream` the dedup state is unbounded — a production stream
    * would attach an ingest-time watermark and
    * `dropDuplicatesWithinWatermark`; the point here is that the C-block
    * column work runs under both engines verbatim, so the batch run IS the
    * oracle for the stream.
    */
  def curate(docs: DataFrame, minTokens: Int = 20, maxTokens: Int = 80): DataFrame =
    docs
      .withColumn("n_tokens", size(split(col("text"), " ")).cast("long"))
      .where(col("n_tokens").between(minTokens, maxTokens))
      .withColumn("key_hash",
        md5(concat_ws(" ", slice(split(col("text"), " "), 1, 10))))
      .dropDuplicates("key_hash")
      .select("doc_id", "key_hash", "n_tokens")

  /** D10: in-stream benchmark-contamination flagging — each arriving
    * document is probed against a FIXED-size Bloom filter of the eval
    * set's word n-gram hashes (built once in batch by
    * [[graft.ops.dedup.Dedup.evalGramBloom]] and carried as a literal in
    * the plan). Stateless and narrow: the same transform runs verbatim
    * under batch (the spec's oracle) and `readStream` — no watermark, no
    * state store, scan speed at any corpus size. Bloom false negatives
    * are impossible, so `flagged = false` is definitive; a flagged doc is
    * contaminated with probability ≈ 1 − FPR^n_hit_grams, and a batch
    * [[graft.ops.dedup.Dedup.contamination]] over the flagged slice
    * confirms exactly.
    */
  def contaminationFlags(docs: DataFrame, evalBloom: graft.ops.dedup.Dedup.BloomLit,
                         nGram: Int = 8,
                         idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    docs.select(col(idCol).as("doc_id"),
        size(filter(graft.ops.dedup.Dedup.ngramHashes(col(textCol), nGram),
          h => call_function("graft_bloom_contains",
            h, typedLit(evalBloom.words.toSeq),
            lit(evalBloom.bits), lit(evalBloom.numHashes)))).as("n_hit_grams"))
      .withColumn("flagged", col("n_hit_grams") > 0)
  }

  final case class BandedDoc(bh: Long, id: Long, sh: Array[Long])
  final case class TsBandedDoc(bh: Long, id: Long, sh: Array[Long], ts: java.sql.Timestamp)
  final case class NearDup(a: Long, b: Long, jaccard: Double)

  /** D7: streaming near-duplicate detection — the MinHash+LSH dedup
    * pipeline as a stateful stream. Arriving documents are banded exactly
    * like the batch operator (graft.ops.dedup.Dedup.minhashLsh: native
    * one-pass signatures, hashed band buckets); each band bucket is a
    * `flatMapGroupsWithState` group holding the bucket's members, and a new
    * arrival is verified with the EXACT sorted-array Jaccard against them —
    * so every emitted pair is exact, immediately, as data streams in.
    *
    * A pair matching in several bands is emitted once per matching band
    * (bands are independent groups); consumers dedupe on (a, b) — in batch
    * mode a `dropDuplicates`, in a stream whatever keying the sink already
    * does. State per bucket grows with corpus size under `NoTimeout`; a
    * production stream bounds it with an ingest-time watermark +
    * `GroupStateTimeout.EventTimeTimeout` (dedup against a retention
    * window), which changes none of the logic here.
    *
    * Runs identically on a batch DataFrame (each group arrives complete in
    * one call) — the batch run and [[graft.ops.dedup.Dedup.minhashLsh]]
    * are both oracles for the stream (StreamingSpec checks all three
    * agree).
    */
  def nearDupPairs(docs: DataFrame, minJaccard: Double,
                   numHashes: Int = 0, bands: Int = 0,
                   idCol: String = "doc_id", textCol: String = "text"): Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // threshold-aware auto-banding shared with the batch operator (see
    // Dedup.autoBands: the r12 sf1 sweep showed the old fixed 16/4 put the
    // S-curve midpoint ABOVE a 0.5 threshold); explicit params override.
    // Floored at 1 band: numHashes < 4 would otherwise yield b = 0 and a
    // negative-start slice (see Dedup.minhashLsh).
    val b = if (bands > 0) bands
            else math.max(1, math.min(graft.ops.dedup.Dedup.autoBands(minJaccard),
              if (numHashes > 0) numHashes / 4 else Int.MaxValue))
    val nh = if (numHashes > 0) numHashes else 4 * b
    val rows = if (bands > 0) nh / b else 4
    val banded = docs
      .where(col(idCol).try_cast("long").isNotNull)
      .select(col(idCol).try_cast("long").as("id"),
        graft.ops.text.TextOps.bigrams(col(textCol)).as("shs"))
      .select(col("id"),
        array_sort(transform(col("shs"), s => xxhash64(s))).as("sh"),
        graft.ops.dedup.Dedup.minhashSignature(col("shs"), nh).as("sig"))
      .where(size(col("sh")) > 0)
      .select(col("id"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(b - 1)),
          i => slice(col("sig"), i * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
      .select(xxhash64(col("band"), col("bandsig")).as("bh"), col("id"), col("sh"))
      .as[BandedDoc]

    def inter(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }

    banded.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[BandedDoc], state: GroupState[List[BandedDoc]]) =>
          var seen = state.getOption.getOrElse(Nil)
          val out = List.newBuilder[NearDup]
          it.foreach { d =>
            seen.foreach { o =>
              if (o.id != d.id) {
                val c = inter(o.sh, d.sh)
                val j = c.toDouble / (o.sh.length + d.sh.length - c)
                if (j >= minJaccard) {
                  val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                  out += NearDup(a, b, j)
                }
              }
            }
            seen ::= d
          }
          state.update(seen)
          out.result().iterator
      }
  }

  /** D7 with BOUNDED state: [[nearDupPairs]] against a retention window.
    * `tsCol` is the document's event time; the input is watermarked by
    * `retention` and each arrival is deduplicated only against bucket
    * members the watermark still allows (`member.ts ≥ watermark`, watermark
    * trailing max event time by `retention`). Expired members are pruned on
    * every bucket visit, and quiet buckets are erased entirely by an
    * event-time timeout — so state is proportional to the retention
    * window's data volume, never the stream's history. This is the shape
    * an unbounded production stream runs; the unbounded variant above is
    * the whole-corpus batch-equivalent tool.
    */
  def nearDupPairsRetained(docs: DataFrame, minJaccard: Double,
                           tsCol: String, retention: String = "1 hour",
                           numHashes: Int = 0, bands: Int = 0,
                           idCol: String = "doc_id", textCol: String = "text"): Dataset[NearDup] = {
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    // same threshold-aware auto-banding as nearDupPairs / Dedup.minhashLsh
    // (incl. the ≥ 1 band floor for numHashes < 4)
    val b = if (bands > 0) bands
            else math.max(1, math.min(graft.ops.dedup.Dedup.autoBands(minJaccard),
              if (numHashes > 0) numHashes / 4 else Int.MaxValue))
    val nh = if (numHashes > 0) numHashes else 4 * b
    val rows = if (bands > 0) nh / b else 4
    val banded = docs
      .withWatermark(tsCol, retention)
      .where(col(idCol).try_cast("long").isNotNull)
      .select(col(idCol).try_cast("long").as("id"), col(tsCol).as("ts"),
        graft.ops.text.TextOps.bigrams(col(textCol)).as("shs"))
      .select(col("id"), col("ts"),
        array_sort(transform(col("shs"), s => xxhash64(s))).as("sh"),
        graft.ops.dedup.Dedup.minhashSignature(col("shs"), nh).as("sig"))
      .where(size(col("sh")) > 0)
      .select(col("id"), col("ts"), col("sh"),
        posexplode(transform(sequence(lit(0), lit(b - 1)),
          i => slice(col("sig"), i * rows + 1, lit(rows)))).as(Seq("band", "bandsig")))
      .select(xxhash64(col("band"), col("bandsig")).as("bh"), col("id"), col("sh"), col("ts"))
      .as[TsBandedDoc]

    def inter(a: Array[Long], b: Array[Long]): Int = {
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }

    banded.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[TsBandedDoc], state: GroupState[List[TsBandedDoc]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            var seen = state.getOption.getOrElse(Nil)
              .filter(_.ts.getTime >= watermark) // retention prune
            val out = List.newBuilder[NearDup]
            var maxTs = watermark
            it.foreach { d =>
              seen.foreach { o =>
                if (o.id != d.id) {
                  val c = inter(o.sh, d.sh)
                  val j = c.toDouble / (o.sh.length + d.sh.length - c)
                  if (j >= minJaccard) {
                    val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                    out += NearDup(a, b, j)
                  }
                }
              }
              seen ::= d
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            state.update(seen)
            // erase the bucket once the watermark passes its newest member
            // (its members would all be pruned anyway)
            state.setTimeoutTimestamp(maxTs + 1)
            out.result().iterator
          }
      }
  }

  final case class SrpDoc(bh: Long, id: Long, v: Array[Double], nrm: Double)
  final case class CosPair(a: Long, b: Long, cosine: Double)

  /** D30: streaming embedding near-dup detection — the SRP-LSH cosine
    * pipeline as a stateful stream, completing the ingest-time family
    * (D7 minhash, D27 winnowing; batch twin C5b `cosineIncrement`).
    * Arriving vectors are SRP-banded exactly like the batch operator
    * ([[graft.ops.ann.Ann.cosinePairsLsh]]: native one-pass codes,
    * hashed (band, code) buckets); each bucket is a
    * `flatMapGroupsWithState` group holding its members' (id, v, nrm),
    * and a new arrival is verified with the EXACT 6-dp cosine against
    * them — every emitted pair is exact, immediately, as data streams
    * in. Single-probe banding: recall is the batch op's single-probe
    * S-curve (the priced trade; the batch increment runs multi-probe
    * because an INDEX can afford probe fan-out a per-event stream
    * cannot), and false positives are impossible.
    *
    * `planes` is a fixed capacity knob (default 8 ≈ the auto-sizing at
    * 8k vectors): a stream cannot auto-size planes on an unknown final
    * corpus, so the caller pins the bucket geometry — exactly like
    * numHashes in D7. A pair matching in several bands emits once per
    * band (independent groups); consumers dedupe on (a, b). State per
    * bucket holds member VECTORS (the verify payload — heavier than
    * D7's shingle arrays by dims×8 bytes/member) and grows with the
    * corpus under NoTimeout; [[cosinePairMonitorRetained]] (D30b) is
    * the retention-bounded production shape.
    */
  def cosinePairMonitor(emb: DataFrame, minCosine: Double,
                        planes: Int = 8, bands: Int = 16,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding"): Dataset[CosPair] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val banded = emb
      .where(col(idCol).try_cast("long").isNotNull)
      .select(col(idCol).try_cast("long").as("id"),
        graft.ops.ann.Ann.vec(col(vecCol)).as("v"))
      .withColumn("nrm", graft.ops.ann.Ann.norm(col("v")))
      .select(col("id"), col("v"), col("nrm"),
        posexplode(graft.ops.ann.Ann.srpCodes(col("v"), planes, bands))
          .as(Seq("bidx", "code")))
      .select(xxhash64(col("bidx"), col("code")).as("bh"),
        col("id"), col("v"), col("nrm"))
      .as[SrpDoc]

    def cos(x: SrpDoc, y: SrpDoc): Double = {
      if (x.nrm * y.nrm <= 0) return 0.0
      var s = 0.0
      var i = 0
      val n = math.min(x.v.length, y.v.length)
      while (i < n) { s += x.v(i) * y.v(i); i += 1 }
      // the exact rounding path of Spark's round(col, 6) on doubles
      // (BigDecimal HALF_UP), so emitted values match the batch operator
      // bit-for-bit
      BigDecimal(s / (x.nrm * y.nrm))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    banded.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[SrpDoc], state: GroupState[List[SrpDoc]]) =>
          var members = state.getOption.getOrElse(Nil)
          val seen = scala.collection.mutable.HashSet.empty[Long]
          members.foreach(m => seen += m.id)
          val out = List.newBuilder[CosPair]
          it.foreach { d =>
            if (!seen(d.id)) {
              members.foreach { o =>
                val c = cos(o, d)
                if (c >= minCosine) {
                  val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                  out += CosPair(a, b, c)
                }
              }
              members ::= d
              seen += d.id
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  final case class TsSrpDoc(bh: Long, id: Long, v: Array[Double], nrm: Double,
                            ts: java.sql.Timestamp)

  /** D30 with BOUNDED state: [[cosinePairMonitor]] against a retention
    * window — the [[nearDupPairsRetained]] (D7b) pattern applied to the
    * cosine pair monitor, completing the retained family (D7b/D26b/D32b;
    * D30 was the last pair monitor holding unbounded state, and the
    * HEAVIEST per member — dims×8-byte vectors, so the bound matters most
    * here). `tsCol` is the vector's event time; the input is watermarked
    * by `retention`, each arrival verifies only against bucket members
    * the watermark still allows, expired members are pruned on every
    * bucket visit, and quiet buckets are erased by an event-time
    * timeout — state is proportional to the retention window's data
    * volume, never the stream's history. Within the window the emission
    * contract is D30's unchanged (single-probe SRP banding, exact 6-dp
    * cosine verify, dedupe on (a, b) downstream); an expired member can
    * never pair again by construction. This is the shape an unbounded
    * production stream runs; the NoTimeout variant above is the
    * whole-corpus batch-equivalent tool.
    */
  def cosinePairMonitorRetained(emb: DataFrame, tsCol: String,
                                retention: String = "1 hour",
                                minCosine: Double = 0.45,
                                planes: Int = 8, bands: Int = 16,
                                idCol: String = "vec_id",
                                vecCol: String = "embedding"): Dataset[CosPair] = {
    val spark = emb.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val banded = emb
      .withWatermark(tsCol, retention)
      .where(col(idCol).try_cast("long").isNotNull)
      .select(col(idCol).try_cast("long").as("id"), col(tsCol).as("ts"),
        graft.ops.ann.Ann.vec(col(vecCol)).as("v"))
      .withColumn("nrm", graft.ops.ann.Ann.norm(col("v")))
      .select(col("id"), col("v"), col("nrm"), col("ts"),
        posexplode(graft.ops.ann.Ann.srpCodes(col("v"), planes, bands))
          .as(Seq("bidx", "code")))
      .select(xxhash64(col("bidx"), col("code")).as("bh"),
        col("id"), col("v"), col("nrm"), col("ts"))
      .as[TsSrpDoc]

    def cos(x: TsSrpDoc, y: TsSrpDoc): Double = {
      if (x.nrm * y.nrm <= 0) return 0.0
      var s = 0.0
      var i = 0
      val n = math.min(x.v.length, y.v.length)
      while (i < n) { s += x.v(i) * y.v(i); i += 1 }
      BigDecimal(s / (x.nrm * y.nrm))
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    }

    banded.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[TsSrpDoc], state: GroupState[List[TsSrpDoc]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            var members = state.getOption.getOrElse(Nil)
              .filter(_.ts.getTime >= watermark) // retention prune
            val seen = scala.collection.mutable.HashSet.empty[Long]
            members.foreach(m => seen += m.id)
            val out = List.newBuilder[CosPair]
            var maxTs = watermark
            members.foreach(m => if (m.ts.getTime > maxTs) maxTs = m.ts.getTime)
            it.foreach { d =>
              if (!seen(d.id)) {
                members.foreach { o =>
                  val c = cos(o, d)
                  if (c >= minCosine) {
                    val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                    out += CosPair(a, b, c)
                  }
                }
                members ::= d
                seen += d.id
              }
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            state.update(members)
            // erase the bucket once the watermark passes its newest member
            state.setTimeoutTimestamp(maxTs + 1)
            out.result().iterator
          }
      }
  }

  final case class ShDoc(bh: Long, id: Long, code64: Long)
  final case class ShPair(a: Long, b: Long, hamming: Long)

  /** D32: streaming SimHash near-dup pairs — the C4/C4b family at ingest,
    * completing the streaming pair-monitor family (D7 minhash, D27
    * winnow, D30 cosine; SimHash was the one batch dedup family without
    * a live twin). Each arriving document hashes through the SAME native
    * kernel as batch (`graft_simhash64` over [[graft.ops.text.TextOps.tokens]]),
    * its pigeonhole chunks key `flatMapGroupsWithState` groups holding
    * members' (id, code64), and a new arrival verifies hamming ≤
    * `maxHamming` against them with one exact xor/bit_count — every
    * emitted pair is exact, immediately. Pigeonhole banding is LOSSLESS
    * (a qualifying pair shares ≥ 1 intact chunk, so it is emitted in at
    * least one bucket): unlike D30's S-curve recall, the stream finds
    * EVERY pair the batch op finds; a pair sharing several chunks emits
    * once per shared bucket (independent groups) — consumers dedupe on
    * (a, b), and the deduped set EQUALS batch [[graft.ops.dedup.Dedup.simhash]]
    * on any prefix however the stream is batched (spec-proven).
    *
    * State per bucket is (id, code64) pairs — 16 bytes/member, far
    * lighter than D30's vectors; `maxBucket` hard-stops a boilerplate
    * code's bucket (the streaming face of C87's df guard, the r14
    * saturation-stop pattern: a saturated bucket stops absorbing members
    * too, capping the state list itself); production bounds overall
    * state with the D7b retention-watermark pattern unchanged. NULL
    * id/text rows are dropped at the door (the r15 NULL stance — a
    * non-nullable typed state cannot carry them, and a NULL text has no
    * signature).
    */
  def simhashPairMonitor(docs: DataFrame, maxHamming: Int = 3,
                         maxBucket: Int = Int.MaxValue,
                         idCol: String = "doc_id",
                         textCol: String = "text"): Dataset[ShPair] = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val mask = (1L << chunkLen) - 1
    // the null filter runs on the CASTED id: a non-numeric string id
    // casts to NULL and would kill the stream in the non-nullable ShDoc
    // encoder if only the raw column were checked (the r15 advisor
    // finding — unparseable ids are poison rows, dropped at the door)
    val chunks = docs
      .where(col(idCol).try_cast("long").isNotNull && col(textCol).isNotNull)
      .select(col(idCol).try_cast("long").as("id"),
        call_function("graft_simhash64",
          graft.ops.text.TextOps.tokens(col(textCol))).as("code64"))
      .select(col("id"), col("code64"),
        posexplode(array((0 until nChunks).map(c =>
          shiftrightunsigned(col("code64"), c * chunkLen).bitwiseAND(mask)): _*))
          .as(Seq("cidx", "code")))
      .select(xxhash64(col("cidx"), col("code")).as("bh"),
        col("id"), col("code64"))
      .as[ShDoc]
    chunks.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, it: Iterator[ShDoc], state: GroupState[List[ShDoc]]) =>
          var members = state.getOption.getOrElse(Nil)
          val seen = scala.collection.mutable.HashSet.empty[Long]
          members.foreach(m => seen += m.id)
          var size = seen.size
          val out = List.newBuilder[ShPair]
          it.foreach { d =>
            if (size < maxBucket && !seen(d.id)) {
              members.foreach { o =>
                val h = java.lang.Long.bitCount(o.code64 ^ d.code64).toLong
                if (h <= maxHamming) {
                  val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                  out += ShPair(a, b, h)
                }
              }
              members ::= d
              seen += d.id
              size += 1
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  final case class TsShDoc(bh: Long, id: Long, code64: Long,
                           ts: java.sql.Timestamp)

  /** D32 with BOUNDED state: [[simhashPairMonitor]] against a retention
    * window — the [[nearDupPairsRetained]] (D7b) pattern applied to the
    * SimHash pair monitor. `tsCol` is the document's event time; the
    * input is watermarked by `retention`, each arrival verifies only
    * against bucket members the watermark still allows (`member.ts ≥
    * watermark`), expired members are pruned on every bucket visit, and
    * quiet buckets are erased entirely by an event-time timeout — state
    * is proportional to the retention window's data volume, never the
    * stream's history. Within the window the emission contract is
    * D32's unchanged (pigeonhole-lossless hamming ≤ maxHamming pairs,
    * dedupe on (a, b) downstream); an expired member can never pair
    * again by construction. This is the shape an unbounded production
    * stream runs; the NoTimeout variant above is the whole-corpus
    * batch-equivalent tool.
    */
  def simhashPairMonitorRetained(docs: DataFrame, tsCol: String,
                                 retention: String = "1 hour",
                                 maxHamming: Int = 3,
                                 maxBucket: Int = Int.MaxValue,
                                 idCol: String = "doc_id",
                                 textCol: String = "text"): Dataset[ShPair] = {
    require(maxHamming <= 31, "banding needs chunks > maxHamming; 64 bits cap this at 31")
    val spark = docs.sparkSession
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val nChunks = Seq(4, 8, 16, 32).find(_ > maxHamming).get
    val chunkLen = 64 / nChunks
    val mask = (1L << chunkLen) - 1
    // null filter on the CASTED id, same stance as simhashPairMonitor
    val chunks = docs
      .withWatermark(tsCol, retention)
      .where(col(idCol).try_cast("long").isNotNull && col(textCol).isNotNull)
      .select(col(idCol).try_cast("long").as("id"), col(tsCol).as("ts"),
        call_function("graft_simhash64",
          graft.ops.text.TextOps.tokens(col(textCol))).as("code64"))
      .select(col("id"), col("ts"), col("code64"),
        posexplode(array((0 until nChunks).map(c =>
          shiftrightunsigned(col("code64"), c * chunkLen).bitwiseAND(mask)): _*))
          .as(Seq("cidx", "code")))
      .select(xxhash64(col("cidx"), col("code")).as("bh"),
        col("id"), col("code64"), col("ts"))
      .as[TsShDoc]
    chunks.groupByKey(_.bh)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (_: Long, it: Iterator[TsShDoc], state: GroupState[List[TsShDoc]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            var members = state.getOption.getOrElse(Nil)
              .filter(_.ts.getTime >= watermark) // retention prune
            val seen = scala.collection.mutable.HashSet.empty[Long]
            members.foreach(m => seen += m.id)
            var size = seen.size
            val out = List.newBuilder[ShPair]
            var maxTs = watermark
            members.foreach(m => if (m.ts.getTime > maxTs) maxTs = m.ts.getTime)
            it.foreach { d =>
              if (size < maxBucket && !seen(d.id)) {
                members.foreach { o =>
                  val h = java.lang.Long.bitCount(o.code64 ^ d.code64).toLong
                  if (h <= maxHamming) {
                    val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                    out += ShPair(a, b, h)
                  }
                }
                members ::= d
                seen += d.id
                size += 1
              }
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            state.update(members)
            // erase the bucket once the watermark passes its newest member
            state.setTimeoutTimestamp(maxTs + 1)
            out.result().iterator
          }
      }
  }

  final case class FpDoc(fp: Long, id: Long)
  final case class FpPair(a: Long, b: Long, fp: Long)

  /** D27: streaming winnowing pair witnesses — the C85
    * [[graft.ops.dedup.Dedup.winnowIncrement]] family at ingest, the
    * exact-substring counterpart of D7: each arriving document is winnowed
    * (same MOSS kernel as the batch index), every selected fingerprint's
    * bucket is a `flatMapGroupsWithState` group holding its member ids,
    * and a new member emits one (a, b, fp) WITNESS row against each
    * existing member — every row certifies a shared k-gram between the two
    * documents, immediately, as data streams in. A document re-presenting
    * the same fingerprint (another position, another batch) is absorbed by
    * the membership set, so each (pair, fp) witness is emitted EXACTLY
    * once and the per-pair witness count aggregated downstream equals the
    * batch [[graft.ops.dedup.Dedup.winnowIndex]] self-join's `shared`
    * count regardless of how the stream is batched (StreamingSpec asserts
    * the set equality).
    *
    * Deliberately emits certificates, not thresholded containment: the
    * containment denominator (per-doc guarded fingerprint count) and the
    * df guard are FINAL-corpus facts a stream cannot know mid-flight —
    * they belong to the consumer (aggregate + join sizes, or the batch
    * increment op on a checkpoint), exactly as D8 emits Misra–Gries
    * CANDIDATES for the batch verifier. `maxBucket` hard-stops a
    * boilerplate fingerprint's bucket (the streaming face of the batch
    * df ≤ 50 guard): a saturated bucket emits nothing further, bounding
    * any bucket's pair volume at maxBucket²/2; state is otherwise
    * NoTimeout and a production stream bounds it with the D7b
    * retention-watermark pattern unchanged.
    */
  def winnowPairMonitor(docs: DataFrame, k: Int = 5, w: Int = 4,
                        maxBucket: Int = Int.MaxValue): Dataset[FpPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val fps = graft.ops.text.TextOps.winnow(docs, k, w)
      .where(col("doc_id").try_cast("long").isNotNull)
      .select(col("fp"), col("doc_id").try_cast("long").as("id"))
      .as[FpDoc]
    fps.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (fp: Long, it: Iterator[FpDoc], state: GroupState[List[Long]]) =>
          var members = state.getOption.getOrElse(Nil)
          // Set shadow of the List state for O(1) membership (the state
          // encoder wants the List; contains on it is O(n) per arrival)
          val seen = scala.collection.mutable.HashSet.empty[Long]
          seen ++= members
          var size = seen.size
          val out = List.newBuilder[FpPair]
          it.foreach { d =>
            // a saturated bucket can never emit again, so tracking further
            // membership serves nothing — skip the append too, capping the
            // state list itself at maxBucket (not just the pair volume)
            if (size < maxBucket && !seen(d.id)) {
              members.foreach { o =>
                val (a, b) = if (o < d.id) (o, d.id) else (d.id, o)
                out += FpPair(a, b, fp)
              }
              members ::= d.id
              seen += d.id
              size += 1
            }
          }
          state.update(members)
          out.result().iterator
      }
  }

  final case class TsFpDoc(fp: Long, id: Long, ts: java.sql.Timestamp)

  /** D27b — D27 with BOUNDED state: [[winnowPairMonitor]] against a
    * retention window, the [[nearDupPairsRetained]] (D7b) pattern applied
    * to the winnow witness monitor — the LAST pair monitor without a
    * time-retention twin (D7b/D26b/D30b/D32b all bounded). `tsCol` is the
    * document's event time; the fingerprint stream is watermarked by
    * `retention`, each arrival witnesses only against bucket members the
    * watermark still allows (`member.ts ≥ watermark`), expired members
    * are pruned on every bucket visit, and quiet buckets are erased
    * entirely by an event-time timeout — state is proportional to the
    * retention window's data volume, never the stream's history. Within
    * the window the emission contract is D27's unchanged (one (a, b, fp)
    * witness per shared fingerprint, exactly once per pair-fp — consumers
    * aggregate witness counts downstream; `maxBucket` still hard-stops
    * boilerplate fingerprints, saturation capping the state list itself);
    * an expired member can never witness again by construction. This is
    * the shape an unbounded production stream runs; the NoTimeout variant
    * above is the whole-corpus batch-equivalent tool.
    */
  def winnowPairMonitorRetained(docs: DataFrame, tsCol: String,
                                retention: String = "1 hour",
                                k: Int = 5, w: Int = 4,
                                maxBucket: Int = Int.MaxValue): Dataset[FpPair] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // the watermark attaches AFTER the winnow flatMap: the event-time
    // column rides winnow's opaque extraCols path, and metadata planted
    // before a mapPartitions would not survive the new output attributes
    val fps = graft.ops.text.TextOps.winnow(docs, k, w, extraCols = Seq(tsCol))
      .withWatermark(tsCol, retention)
      .where(col("doc_id").try_cast("long").isNotNull)
      .select(col("fp"), col("doc_id").try_cast("long").as("id"),
        col(tsCol).as("ts"))
      .as[TsFpDoc]
    fps.groupByKey(_.fp)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (fp: Long, it: Iterator[TsFpDoc], state: GroupState[List[TsFpDoc]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            var members = state.getOption.getOrElse(Nil)
              .filter(_.ts.getTime >= watermark) // retention prune
            val seen = scala.collection.mutable.HashSet.empty[Long]
            members.foreach(m => seen += m.id)
            var size = seen.size
            val out = List.newBuilder[FpPair]
            var maxTs = watermark
            members.foreach(m => if (m.ts.getTime > maxTs) maxTs = m.ts.getTime)
            it.foreach { d =>
              if (size < maxBucket && !seen(d.id)) {
                members.foreach { o =>
                  val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                  out += FpPair(a, b, fp)
                }
                members ::= d
                seen += d.id
                size += 1
              }
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            state.update(members)
            // erase the bucket once the watermark passes its newest member
            state.setTimeoutTimestamp(maxTs + 1)
            out.result().iterator
          }
      }
  }

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                               session_end: java.sql.Timestamp, n_events: Int,
                               sum_value: Double)

  /** D3: gap-based sessionisation via flatMapGroupsWithState — the custom
    * stateful path for semantics `window()` can't express. A user's events
    * are split into sessions wherever the time gap exceeds `gapMinutes`;
    * gap comparison is between CONSECUTIVE events.
    *
    * The state carries events of the still-open trailing session between
    * invocations. In batch mode each group arrives complete in one call, so
    * every session (including the trailing one, flushed by `emitOpen`)
    * closes; a production stream would flip `emitOpen` off and pair the
    * buffered state with an event-time timeout to flush quiet users.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
                 emitOpen: Boolean = true): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def toSession(userId: Long, es: List[Event]): UserSession = {
      // per-event 6dp quantisation via floor(v·1e6 + 0.5) — multiply, add,
      // floor are each single correctly-rounded IEEE ops, so every engine
      // derives the IDENTICAL integer unit from the same double, and the
      // long sum is exact and order-independent. (The previous
      // new BigDecimal(double) HALF_UP quantised the EXACT binary
      // expansion, which disagrees with DuckDB's double→decimal cast on
      // doubles whose shortest representation parks ON the half boundary
      // — found by the r17 seeded robustness sweep, value 0.0005315:
      // exact expansion …49999 rounds down, the cast rounds up.)
      val units = es.foldLeft(0L) { (acc, e) =>
        acc + math.floor(e.value * 1e6 + 0.5).toLong
      }
      UserSession(userId, es.head.ts, es.last.ts, es.size, units / 1e6)
    }

    def fn(userId: Long, it: Iterator[Event],
           state: GroupState[List[Event]]): Iterator[UserSession] = {
      val sorted = (state.getOption.getOrElse(Nil) ++ it).sortBy(_.ts.getTime)
      if (sorted.isEmpty) return Iterator.empty
      // consecutive-gap split, sessions in order, each session in order
      val sessions = sorted.tail.foldLeft(List(List(sorted.head))) { (acc, e) =>
        if (e.ts.getTime - acc.head.head.ts.getTime > gapMs) List(e) :: acc
        else (e :: acc.head) :: acc.tail
      }.map(_.reverse).reverse
      if (emitOpen) {
        state.remove()
        sessions.iterator.map(toSession(userId, _))
      } else {
        state.update(sessions.last)
        sessions.init.iterator.map(toSession(userId, _))
      }
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  final case class BucketCount(g: String, b: Long, x: Long)
  final case class CusumRow(g: String, bucket: Long, cusum_u6: Long, alarm: Boolean)

  /** D36: streaming CUSUM drift monitor — the live twin of B71
    * (`events_cusum`), the D12 train-batch/score-live pattern: the
    * reference parameters (μ6, k6, h6 — [[graft.ops.stats.Stats
    * .cusumParams]], the SAME integer-scaled arithmetic as the batch op)
    * are frozen from a training window batch-side, and each arriving
    * CLOSED bucket count folds into the per-group drift statistic S ←
    * max(0, S + x·10⁶ − μ6 − k6), emitting (bucket, S, alarm). Because
    * every term is an exact integer, the stream's emissions over an
    * in-order feed EQUAL the batch recursion row-for-row however the
    * stream is batched (spec-pinned).
    *
    * Input is a closed-bucket count stream (the D13 append-mode windowed
    * agg shape — each bucket exactly once, watermark-ordered across
    * batches). Within a batch arrivals are sorted by bucket before
    * folding; a bucket at or before the last folded one is a LATE
    * closed bucket (an upstream contract violation — CUSUM is
    * order-defined) and is skipped rather than corrupting the
    * statistic. Groups without trained parameters emit nothing (an
    * unbaselined series has no drift definition). State per group is
    * two longs — nothing grows.
    */
  def cusumMonitor(counts: DataFrame, baseline: Map[String, (Long, Long, Long)],
                   groupCol: String = "event_type", bucketCol: String = "bucket",
                   valueCol: String = "n_events"): Dataset[CusumRow] = {
    val spark = counts.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(baseline)
    counts
      .where(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(bucketCol).cast("long").as("b"), col(valueCol).cast("long").as("x"))
      .as[BucketCount]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[BucketCount], state: GroupState[(Long, Long)]) =>
          bc.value.get(g) match {
            case None => Iterator.empty
            case Some((mu6, k6, h6)) =>
              var (s, last) = state.getOption.getOrElse((0L, Long.MinValue))
              val out = List.newBuilder[CusumRow]
              it.toList.sortBy(_.b).foreach { d =>
                if (d.b > last) {
                  s = math.max(0L, s + d.x * 1000000L - mu6 - k6)
                  last = d.b
                  out += CusumRow(g, d.b, s, s > h6)
                }
              }
              state.update((s, last))
              out.result().iterator
          }
      }
  }

  final case class HoltRow(g: String, bucket: Long, forecast_u6: Option[Long],
                           err_u6: Option[Long], level_u6: Long,
                           trend_u6: Long, alarm: Boolean)

  /** D38: streaming Holt forecast monitor — the live twin of B72
    * (`events_holt`), completing the anomaly-family pattern symmetry
    * (B71↔D36 CUSUM, B70↔D37 join size, B72↔D38 trend forecast): the
    * alarm threshold h6 is frozen from a training window
    * ([[graft.ops.stats.Stats.cusumParams]]'s σ ladder at 3σ — the SAME
    * arithmetic the batch op thresholds with), and each arriving CLOSED
    * bucket folds the exact integer Holt recursion (l ← ⌊(x6+l+t)/2⌋,
    * t ← ⌊(l′−l+t)/2⌋), emitting (bucket, forecast, error, level,
    * trend, alarm). Exact integers ⇒ over an in-order feed the emissions
    * EQUAL the batch recursion row-for-row however batched (spec-pinned,
    * the D36 contract). The first bucket a group ever sees initialises
    * (l = x·10⁶, t = 0) and emits a NULL forecast — exactly the batch
    * op's first row. Late closed buckets skip (order-defined recursion);
    * untrained groups emit nothing; state per group = three longs.
    */
  def holtMonitor(counts: DataFrame, h6ByGroup: Map[String, Long],
                  groupCol: String = "event_type", bucketCol: String = "bucket",
                  valueCol: String = "n_events"): Dataset[HoltRow] = {
    val spark = counts.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(h6ByGroup)
    counts
      .where(col(groupCol).isNotNull)
      .select(col(groupCol).cast("string").as("g"),
        col(bucketCol).cast("long").as("b"), col(valueCol).cast("long").as("x"))
      .as[BucketCount]
      .groupByKey(_.g)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[BucketCount],
         state: GroupState[(Long, Long, Long, Boolean)]) =>
          bc.value.get(g) match {
            case None => Iterator.empty
            case Some(h6) =>
              var (l, t, last, started) =
                state.getOption.getOrElse((0L, 0L, Long.MinValue, false))
              val out = List.newBuilder[HoltRow]
              it.toList.sortBy(_.b).foreach { d =>
                if (d.b > last) {
                  if (!started) {
                    l = d.x * 1000000L; t = 0L; started = true
                    out += HoltRow(g, d.b, None, None, l, t, alarm = false)
                  } else {
                    val f = l + t
                    val e = d.x * 1000000L - f
                    val lNew = Math.floorDiv(d.x * 1000000L + l + t, 2L)
                    val tNew = Math.floorDiv(lNew - l + t, 2L)
                    l = lNew; t = tNew
                    out += HoltRow(g, d.b, Some(f), Some(e), l, t,
                      math.abs(e) > h6)
                  }
                  last = d.b
                }
              }
              state.update((l, t, last, started))
              out.result().iterator
          }
      }
  }

  final case class JoinCardRow(j: Int, ip: Long, n_seen: Long)

  /** D37: streaming join-cardinality monitor — the live twin of B70
    * (`q_join_card_est`), the D12 train-batch/score-live pattern applied
    * to JOIN PLANNING: the static side's CMS register table (d·w rows,
    * [[graft.ops.stats.Stats.cmsRegisters]] — trained-model shape) is
    * frozen and broadcast, and the STREAMING side's sketch is maintained
    * in state as values arrive, emitting each sketch row's refreshed
    * inner product ip_j = Σ_b c_stream[j][b]·c_static[j][b] per batch.
    * The planning read (min over j of the latest row per j — the B44
    * latest-state stance) is a LIVE one-sided upper bound on
    * |stream-so-far ⋈ static|: "how big would the join be if I ran it
    * NOW", continuously, with neither input ever scanned again — the
    * ingestion-time capacity gauge for a landing table that will join a
    * 100 TB fact.
    *
    * The (j, b) coordinates come from the SHARED [[graft.ops.stats.Stats
    * .cmsBuckets]] kernel, so the stream's state is bit-for-bit the batch
    * register table of everything streamed so far — the monitor's min
    * EQUALS batch [[graft.ops.stats.Stats.cmsJoinSize]] at every point
    * (spec-pinned), and one-sidedness (est ≥ exact, collisions only add)
    * is inherited, not re-proven. Per j the inner product only grows
    * (counts are monotone, static regs non-negative) — emissions are
    * monotone per row, so a threshold alarm can never flap. State per
    * group: w longs + one counter, d groups total — nothing grows with
    * the stream.
    */
  def joinCardMonitor(values: DataFrame, valueCol: String,
                      staticRegs: Map[(Int, Int), Long],
                      d: Int = 4, w: Int = 64): Dataset[JoinCardRow] = {
    val spark = values.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(staticRegs)
    values.where(col(valueCol).isNotNull)
      .select(explode(graft.ops.stats.Stats.cmsBuckets(col(valueCol), d, w)).as("jb"))
      .select(col("jb.j").as("_1"), col("jb.b").as("_2")).as[(Int, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (j: Int, it: Iterator[(Int, Int)], state: GroupState[(Array[Long], Long)]) =>
          val (counts, seen) = state.getOption.getOrElse((Array.fill(w)(0L), 0L))
          var n = seen
          it.foreach { case (_, b) => counts(b) += 1L; n += 1L }
          state.update((counts, n))
          val regs = bc.value
          var ip = 0L
          var b = 0
          while (b < w) {
            ip += counts(b) * regs.getOrElse((j, b), 0L)
            b += 1
          }
          Iterator.single(JoinCardRow(j, ip, n))
      }
  }

  final case class SeasonRow(event_type: String, n_events: Long,
                             chi2: Double, is_diurnal: Boolean)

  /** D39: streaming seasonality monitor — the live twin of B74
    * (`events_seasonality`): per event type a 24-slot hour-of-day count
    * vector lives in state, each batch folds its arrivals in and emits
    * the type's refreshed exact χ²-against-uniform
    * ([[graft.ops.stats.Stats.chi2Hod]] — the SAME integer-ratio,
    * floor(v·1e6+0.5)-quantized kernel the batch query computes, one
    * definition, the twins cannot drift) with the df = 23 α = 0.01 flag.
    * The statistic is a pure function of the commutative count vector,
    * so UNLIKE the order-defined D36/D38 recursions this monitor needs
    * no late-bucket guard at all: any arrival order, any batching, any
    * lateness converges to the identical state and final emission
    * (spec-pinned). The ingest-time read: a source whose live χ² decays
    * toward 0 is going scripted/bot-flat; one that grows is
    * organically diurnal. NULL types/timestamps drop at the door; state
    * per type = 24 longs, bounded by |types| regardless of stream size.
    */
  def seasonalityMonitor(events: DataFrame, tsCol: String = "ts",
                         typeCol: String = "event_type"): Dataset[SeasonRow] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol).cast("string").as("_1"),
        hour(col(tsCol)).cast("int").as("_2")).as[(String, Int)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Int)], state: GroupState[Array[Long]]) =>
          val counts = state.getOption.getOrElse(Array.fill(24)(0L))
          it.foreach { case (_, h) => counts(h) += 1L }
          state.update(counts)
          val (total, chi2) = graft.ops.stats.Stats.chi2Hod(counts)
          Iterator.single(SeasonRow(g, total, chi2, chi2 > 41.638))
      }
  }

  final case class PackAssign(part: Int, id: Long, n_tokens: Long,
                              seq: Int, bin_fill: Long)

  /** D40: streaming sequence packer — the ingest-time face of the C16
    * greedy next-fit kernel ([[graft.ops.text.TextOps.packCounts]]),
    * assigning each arriving document to its training-sequence bin LIVE
    * (the 100 TB shape: sequences ship to the trainer as they fill,
    * no terminal batch repack): per part (pmod(id, partitions), the
    * batch layout), state is just (current bin, current fill) — two
    * numbers, regardless of stream size — and each arrival either joins
    * the open bin or rolls a new one, emitting its (part, id, seq,
    * fill-after). Docs above the budget open a bin alone and overflow
    * it, exactly the batch semantic C111 counts.
    *
    * Order is the contract's edge: next-fit is order-DEFINED, so within
    * a micro-batch arrivals fold in id order (the D36 in-batch sort
    * stance) and across batches in arrival order — an in-id-order feed
    * therefore reproduces the batch kernel's bins row-for-row however
    * batched (spec-pinned), while an out-of-order arrival is packed
    * where it lands (a live packer cannot hold a bin open for stragglers;
    * the declared ingest semantic). NULL ids/counts drop at the door.
    */
  def packMonitor(counts: DataFrame, tokenBudget: Int, partitions: Int,
                  idCol: String = "id", nCol: String = "n_tokens"): Dataset[PackAssign] = {
    require(tokenBudget > 0 && partitions > 0,
      s"packMonitor: tokenBudget and partitions must be positive ($tokenBudget, $partitions)")
    val spark = counts.sparkSession
    import spark.implicits._
    counts
      .where(col(idCol).isNotNull && col(nCol).isNotNull)
      .select(col(idCol).cast("long").as("id"),
        greatest(lit(0L), col(nCol).cast("long")).as("n"),
        pmod(col(idCol).cast("long"), lit(partitions.toLong)).cast("int").as("part"))
      .as[(Long, Long, Int)]
      .groupByKey(_._3)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part: Int, it: Iterator[(Long, Long, Int)], state: GroupState[(Int, Long)]) =>
          var (seq, fill) = state.getOption.getOrElse((0, 0L))
          val out = List.newBuilder[PackAssign]
          it.toList.sortBy(_._1).foreach { case (id, n, _) =>
            if (fill + n > tokenBudget && fill > 0L) { seq += 1; fill = 0L }
            fill += n
            out += PackAssign(part, id, n, seq, fill)
          }
          state.update((seq, fill))
          out.result().iterator
      }
  }

  final case class TripleIn(id: String, key: String, value: String)
  final case class PgState(labels: Seq[String], from: String, to: String,
                           props: Map[String, Seq[String]])
  final case class PgUpsert(id: String, tpe: String, labels: Seq[String],
                            from: String, to: String,
                            props: Map[String, Seq[String]])

  /** D33: streaming triples → PG upsert monitor — the ingest-time face of
    * [[graft.etl.PgGraph.mergeInc]] (A48), completing the round's
    * incremental-ETL story: arriving (id, key, value) triples merge into
    * per-element state exactly like `toPg` collects them (labels and
    * property values as sorted-distinct sets, endpoints latest-write,
    * type recomputed from endpoints), and each batch that touches an
    * element emits its UPDATED snapshot row. Consumers keep the last
    * emission per id (B44 latest-state), and that latest row EQUALS the
    * batch `PgGraph.toPg` of everything streamed so far however the
    * stream was batched (spec-proven) — the same union semantics the A48
    * merge reproduces, so batch reload and live ingest provably converge
    * on the same graph.
    *
    * State per element is its own label/property sets — the element's
    * size, not the stream's; an element that stops receiving triples
    * stops costing anything but residence. NULL ids/values drop at the
    * door (toPg's emit filters them upstream in the batch path).
    */
  final case class TsInterval(key: String, id: Long, s: Long, e: Long,
                              bucket: Long, ts: java.sql.Timestamp)
  final case class OverlapPair(key: String, id_a: Long, id_b: Long,
                               overlap_us: Long)

  /** D35: streaming interval-overlap matcher — the ingest-time face of
    * B68 (`q_interval_join`), the CEP join shape batch can't wait for
    * (live ad impressions × running sessions, readings × open
    * maintenance windows): arriving (key, id, [s, e)) intervals pair
    * with every RETAINED interval of the same key they overlap, exactly
    * once. The B68 bucketization IS the state layout: each interval
    * registers in the `bucketUs`-wide epoch buckets it touches, state
    * lives per (key, bucket) group — so a hot key's members spread over
    * its buckets instead of one ever-growing list — and a pair
    * straddling several shared buckets is CLAIMED only in the bucket
    * containing the overlap's start (`max(s_a, s_b) div bucketUs`, the
    * same arithmetic dedup as batch: no downstream distinct needed).
    * State is bounded twice: per-visit retention pruning on event time
    * plus EventTimeTimeout erasing quiet (key, bucket) groups — the
    * D7b/D30b pattern. Unparseable ids drop at the door (try_cast, the
    * r16 pair-monitor family rule); emits carry the overlap length.
    */
  def intervalOverlapMonitor(intervals: DataFrame, bucketUs: Long,
                             tsCol: String, retention: String = "1 hour",
                             keyCol: String = "key", idCol: String = "id",
                             sCol: String = "s", eCol: String = "e"): Dataset[OverlapPair] = {
    require(bucketUs > 0, s"intervalOverlapMonitor: bucketUs must be positive, got $bucketUs")
    val spark = intervals.sparkSession
    import spark.implicits._
    val exploded = intervals
      .withWatermark(tsCol, retention)
      .where(col(idCol).try_cast("long").isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(idCol).try_cast("long").as("id"),
        col(sCol).cast("long").as("s"), col(eCol).cast("long").as("e"),
        col(tsCol).as("ts"))
      .where(col("s") < col("e"))
      .withColumn("bucket",
        explode(sequence(expr(s"s div $bucketUs"), expr(s"(e - 1) div $bucketUs"))))
      .select(col("key"), col("id"), col("s"), col("e"), col("bucket"), col("ts"))
      .as[TsInterval]
    exploded.groupByKey(d => (d.key, d.bucket))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (kb: (String, Long), it: Iterator[TsInterval], state: GroupState[List[TsInterval]]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val watermark = state.getCurrentWatermarkMs()
            var seen = state.getOption.getOrElse(Nil)
              .filter(_.ts.getTime >= watermark) // retention prune
            val out = List.newBuilder[OverlapPair]
            var maxTs = watermark
            it.foreach { d =>
              seen.foreach { o =>
                if (o.id != d.id && o.s < d.e && d.s < o.e &&
                    kb._2 == math.max(o.s, d.s) / bucketUs) {
                  val (a, b) = if (o.id < d.id) (o.id, d.id) else (d.id, o.id)
                  out += OverlapPair(d.key, a, b,
                    math.min(o.e, d.e) - math.max(o.s, d.s))
                }
              }
              seen ::= d
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            state.update(seen)
            state.setTimeoutTimestamp(maxTs + 1)
            out.result().iterator
          }
      }
  }

  /** D34: live shard-manifest monitor — the ingest-time face of C96
    * (`shard_manifest`), the same pairing as D33/A48: as documents
    * stream in, each md5-assigned shard's running manifest row (n_docs,
    * n_bytes, id range, bit_xor content fingerprint) updates in place.
    * Every term is a commutative mergeable aggregate, so the LATEST
    * emission per shard equals the batch `Sampling.shardManifest` of
    * everything streamed so far HOWEVER the stream was batched — live
    * ingest and the post-hoc batch manifest provably converge, which is
    * what lets a pipeline certify a long-running ingest against the
    * planned corpus without stopping it. Kernel shared verbatim with the
    * batch op ([[graft.ops.sample.Sampling.shardStats]] — the batch twin
    * IS the oracle); state = |shards| aggregate rows, never the stream.
    * Run in Update output mode (Complete also works at |shards| rows).
    */
  def manifestMonitor(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text", nShards: Int = 8,
                      salt: String = ""): DataFrame =
    graft.ops.sample.Sampling.shardStats(docs, idCol, textCol, nShards, salt)

  /** D33 emits `tpe = TombstoneType` when a batch id-deletes an element:
    * a latest-per-id consumer cannot observe absence through silence, so
    * the delete is a visible row to filter on. Matches [[graft.etl.PgGraph
    * .mergeInc]]'s A54 semantics batch-for-batch: an id-level `@delete`
    * wins over same-batch data triples (delete-then-reinsert takes two
    * batches) and clears the element's state entirely (residence cost
    * drops to zero — the one place streaming delete is CHEAPER than
    * retention); a key-level `@delete` unsets that property key after the
    * batch's data merges (wins in-batch), siblings untouched.
    */
  val TombstoneType = "tombstone"

  def pgMergeMonitor(triples: DataFrame): Dataset[PgUpsert] = {
    val spark = triples.sparkSession
    import spark.implicits._
    val in = triples
      .where(col("id").isNotNull && col("id") =!= "" && col("value").isNotNull)
      .select(col("id").cast("string"), col("key").cast("string"),
        col("value").cast("string"))
      .as[TripleIn]
    in.groupByKey(_.id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (id: String, it: Iterator[TripleIn], state: GroupState[PgState]) =>
          // materialised: tombstone precedence must not depend on the
          // iterator's arbitrary cross-partition arrival order
          val batch = it.toList
          val (tombs, data) = batch.partition(_.key == graft.model.Graph.DeleteKey)
          if (tombs.exists(_.value == graft.model.Graph.DeleteAll)) {
            // id-level delete wins over same-batch data; state cleared so
            // a future batch rebuilds from empty
            state.remove()
            Iterator.single(PgUpsert(id, TombstoneType, Nil, null, null, Map.empty))
          } else {
            val s0 = state.getOption.getOrElse(PgState(Nil, null, null, Map.empty))
            var labels = s0.labels.toSet
            var from = s0.from
            var to = s0.to
            var props = s0.props.map { case (k, v) => k -> v.toSet }
            data.foreach { t =>
              t.key match {
                case graft.model.Graph.TypeKey => labels += t.value
                case graft.model.Graph.FromKey => from = t.value
                case graft.model.Graph.ToKey   => to = t.value
                case k => props = props.updated(k, props.getOrElse(k, Set.empty) + t.value)
              }
            }
            // key-level unsets apply AFTER the merge (win in-batch), the
            // A54 stance; unset of an absent key is a no-op
            tombs.foreach(t => props = props.removed(t.value))
            val next = PgState(labels.toSeq.sorted, from, to,
              props.map { case (k, v) => k -> v.toSeq.sorted })
            state.update(next)
            val tpe = if (from != null) graft.model.Graph.EdgeType
                      else graft.model.Graph.NodeType
            Iterator.single(
              PgUpsert(id, tpe, next.labels, next.from, next.to, next.props))
          }
      }
  }

  final case class AcfRow(event_type: String, lag_k: Int, n: Long,
                          acf: Option[Double])

  /** D42: streaming autocorrelation monitor — the live twin of B80
    * (`events_autocorr`), completing the time-series family's pattern
    * symmetry (B74↔D39 seasonality, B71↔D36 CUSUM, B72↔D38 Holt): per
    * event type a bucket→count map in state, each batch folding arrivals
    * and emitting the refreshed exact ACF at lags 1..maxLag via the
    * SHARED [[graft.ops.stats.Stats.acfProfile]] scalar (the same
    * n²-scaled integer sums and floor(v·1e6+0.5) quantization the batch
    * query computes — one arithmetic definition, the twins cannot
    * drift; overflow REFUSES via Math.*Exact). Like D39 the statistic
    * is a pure function of a commutative count map, so ANY arrival
    * order / batching / lateness converges to the identical final
    * emission (spec-pinned against the batch query and a reversed
    * re-batching) — no late-bucket guard exists or is needed. The
    * ingest read: live r₁ collapsing toward 0 = a bursty source going
    * memoryless (scripted), a resurging r_k = a new periodic component.
    *
    * State is the type's OBSERVED bucket map — |span hours| longs, the
    * honest cost of a statistic defined over the whole series (pruning
    * old buckets would silently change the mean); `maxBuckets` refuses
    * loudly past the declared span budget instead of degrading. NULL
    * types/timestamps drop at the door.
    */
  def autocorrMonitor(events: DataFrame, tsCol: String = "ts",
                      typeCol: String = "event_type", maxLag: Int = 6,
                      maxBuckets: Int = 100000): Dataset[AcfRow] = {
    require(maxLag > 0 && maxBuckets > 0,
      s"autocorrMonitor: maxLag/maxBuckets must be positive ($maxLag, $maxBuckets)")
    val hourUs = 3600L * 1000000L
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol).cast("string").as("_1"),
        unix_micros(date_trunc("hour", col(tsCol))).as("_2")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, b) => m += b -> (m.getOrElse(b, 0L) + 1L) }
          if (m.size > maxBuckets) throw new IllegalStateException(
            s"autocorrMonitor: type '$g' exceeds $maxBuckets observed buckets" +
              " — the series span is past the declared budget; raise" +
              " maxBuckets or window the source upstream")
          state.update(m)
          graft.ops.stats.Stats.acfProfile(m, hourUs, maxLag)
            .iterator.map { case (k, n, a) => AcfRow(g, k, n, a) }
      }
  }

  final case class CptRow(event_type: String, n: Long, split_after: Long,
                          n1: Long, n2: Long, mean1: Double, mean2: Double,
                          sse_reduction: Double)

  /** D43: streaming change-point monitor — the live twin of B81
    * (`events_changepoint`), closing the time-series family table
    * (B74↔D39, B71↔D36, B72↔D38, B80↔D42): the same bucket→count state
    * as D42 (one map per type, commutative folds — any order/batching
    * converges, the D39 stance), each batch re-emitting the refreshed
    * best AMOC split via the SHARED [[graft.ops.stats.Stats.changepoint]]
    * scalar (identical IEEE expression shape and quantization as the
    * batch query — one definition, the twins cannot drift; earliest-
    * bucket tie-break preserved). Where D36's CUSUM alarms DURING
    * drift, this keeps the running best "where did the level shift"
    * estimate current for the postmortem that follows the alarm.
    * Series without an interior split emit nothing yet; `maxBuckets`
    * refuses loudly past the declared span (the D42 bound). NULL
    * types/timestamps drop at the door.
    */
  def changepointMonitor(events: DataFrame, tsCol: String = "ts",
                         typeCol: String = "event_type",
                         maxBuckets: Int = 100000): Dataset[CptRow] = {
    require(maxBuckets > 0,
      s"changepointMonitor: maxBuckets must be positive ($maxBuckets)")
    val hourUs = 3600L * 1000000L
    val spark = events.sparkSession
    import spark.implicits._
    events
      .where(col(typeCol).isNotNull && col(tsCol).isNotNull)
      .select(col(typeCol).cast("string").as("_1"),
        unix_micros(date_trunc("hour", col(tsCol))).as("_2")).as[(String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (g: String, it: Iterator[(String, Long)],
         state: GroupState[Map[Long, Long]]) =>
          var m = state.getOption.getOrElse(Map.empty[Long, Long])
          it.foreach { case (_, b) => m += b -> (m.getOrElse(b, 0L) + 1L) }
          if (m.size > maxBuckets) throw new IllegalStateException(
            s"changepointMonitor: type '$g' exceeds $maxBuckets observed" +
              " buckets — raise maxBuckets or window the source upstream")
          state.update(m)
          graft.ops.stats.Stats.changepoint(m, hourUs).iterator.map {
            case (n, sp, n1, n2, m1, m2, red) =>
              CptRow(g, n, sp, n1, n2, m1, m2, red)
          }
      }
  }

  final case class ConcRow(bucket: Long, n_starts: Long, n_ends: Long,
                           peak_concurrency: Long, close_concurrency: Long)

  /** D41: streaming session-concurrency monitor — the live face of B79
    * (`events_concurrency`): as closed session intervals [s, e] (µs,
    * INCLUSIVE end — the B79 touch-counts-as-overlap convention) stream
    * in from an upstream sessionizer (D5), each hour bucket's capacity
    * row (starts, ends, PEAK simultaneous sessions, closing level)
    * refreshes live — the gauge a connection-pool/shard-sizing loop
    * watches during ingest rather than after it.
    *
    * The B79 decomposition IS the state layout: a session contributes to
    * bucket b either as an IN-BUCKET change point (its start/end lands
    * in b) or as BASE (+1 open-at-bucket-start for every bucket it spans
    * past) — base is exactly the batch query's cross-hour cumulative
    * offset, folded here as a single commutative counter. State per
    * bucket = base + the in-bucket delta map (bounded by the bucket's
    * distinct change-point µs, never the stream; a b-spanning session
    * costs one long, not a row). Every term is commutative, so ANY
    * arrival order / batching converges to the batch row (the D39
    * stance — spec-pinned with re-batched and reversed feeds); the
    * LATEST emission per bucket is the batch `events_concurrency` row of
    * everything streamed so far. Watermark + EventTimeTimeout drop a
    * bucket's state once it can no longer change (the D7b bound); a
    * bucket with only base contributions emits nothing, matching the
    * batch's quiet-hour omission. NULL/inverted intervals drop at the
    * door.
    */
  def concurrencyMonitor(sessions: DataFrame, bucketUs: Long,
                         tsCol: String = "ts", retention: String = "1 hour",
                         sCol: String = "s_us", eCol: String = "e_us"): Dataset[ConcRow] = {
    require(bucketUs > 0,
      s"concurrencyMonitor: bucketUs must be positive, got $bucketUs")
    val spark = sessions.sparkSession
    import spark.implicits._
    val exploded = sessions
      .withWatermark(tsCol, retention)
      .select(col(sCol).cast("long").as("s"), col(eCol).cast("long").as("e"),
        col(tsCol).as("ts"))
      .where(col("s").isNotNull && col("e").isNotNull && col("s") <= col("e"))
      .withColumn("bucket", explode(sequence(
        expr(s"s div $bucketUs"), expr(s"e div $bucketUs"))))
      .select(col("bucket"),
        when(expr(s"s div $bucketUs") === col("bucket"), col("s"))
          .otherwise(lit(-1L)).as("sin"),
        when(expr(s"e div $bucketUs") === col("bucket"), col("e"))
          .otherwise(lit(-1L)).as("ein"),
        col("ts"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
    exploded.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (bucket: Long, it: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[(Long, Map[Long, (Long, Long)])]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            var (base, deltas) = state.getOption
              .getOrElse((0L, Map.empty[Long, (Long, Long)]))
            var maxTs = state.getCurrentWatermarkMs()
            it.foreach { case (_, sin, ein, ts) =>
              if (sin >= 0) {
                val d = deltas.getOrElse(sin, (0L, 0L))
                deltas += sin -> ((d._1 + 1, d._2))
              } else base += 1
              if (ein >= 0) {
                val d = deltas.getOrElse(ein, (0L, 0L))
                deltas += ein -> ((d._1, d._2 + 1))
              }
              if (ts.getTime > maxTs) maxTs = ts.getTime
            }
            state.update((base, deltas))
            state.setTimeoutTimestamp(maxTs + 1)
            if (deltas.isEmpty) Iterator.empty
            else {
              var cs = 0L; var ce = 0L; var peak = Long.MinValue
              val sorted = deltas.toSeq.sortBy(_._1)
              sorted.foreach { case (_, (ns, ne)) =>
                cs += ns; ce += ne
                val p = base + cs - ce + ne
                if (p > peak) peak = p
              }
              Iterator.single(ConcRow(bucket,
                sorted.iterator.map(_._2._1).sum,
                sorted.iterator.map(_._2._2).sum,
                peak, base + cs - ce))
            }
          }
      }
  }
}
