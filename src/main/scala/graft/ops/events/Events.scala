package graft.ops.events

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-stream pattern matching (MATCH_RECOGNIZE-lite CEP).
  *
  * The r12 `events_pattern` query hardcoded the view→clicks→purchase motif
  * `vc*p`; this lifts pattern and event-char mapping into arguments on a
  * library operator so any motif — alternation, `+`, bounded repeats,
  * anchors — runs through the same one-keyed-aggregate kernel, and the
  * DuckDB oracle twin ([[matchPatternSql]]) is GENERATED from the same
  * (pattern, mapping) pair, so engine and oracle can never disagree about
  * which motif they count.
  *
  * Semantics: each key's event history reduces to a compact type string
  * (one char per event, (ts, tie)-ordered so timestamp ties are
  * deterministic) and the regex counts leftmost non-overlapping
  * occurrences — the counting rule both java.util.regex (Spark
  * `regexp_extract_all`) and RE2 (DuckDB) implement identically for the
  * supported subset. Patterns must stay in the RE2-compatible subset
  * (no backreferences, no lookaround): that is also the backtracking-safe
  * subset, so a hostile event sequence cannot blow up match time.
  *
  * Scale shape: ONE keyed aggregate builds each key's string — state
  * bounded by that key's event count, the sessionize-class per-key
  * contract — then a narrow scan-side regex over |keys| rows, no window
  * over the global stream and no shuffle beyond the single groupBy.
  * At 100 TB the per-key string is the only memory term; a key with
  * millions of events needs pre-bucketing by (key, day) upstream, same
  * as any per-user sequence analytic.
  */
object Events {

  /** Per-event single-char encoding: explicit `charMap` entries first
    * (event_type → char), default = first char of the type name. Shared
    * by engine and oracle builders below.
    */
  private[graft] def validateCharMap(charMap: Map[String, String]): Unit =
    require(charMap.values.forall(_.length == 1),
      s"matchPattern: charMap values must be single chars, got $charMap")

  private[graft] def encodeCol(typeCol: String, charMap: Map[String, String]): Column = {
    val base = substring(col(typeCol), 1, 1)
    charMap.foldLeft(base) { case (acc, (t, c)) =>
      when(col(typeCol) === t, lit(c)).otherwise(acc)
    }
  }

  /** Count non-overlapping occurrences of `pattern` in each key's
    * (ts, tie)-ordered event-type string. Returns
    * `(key, n_events, n_matches)`; `keepZero = false` (the CEP reading:
    * only keys where the motif fired) drops zero-match keys.
    */
  def matchPattern(events: DataFrame, pattern: String,
                   charMap: Map[String, String] = Map.empty,
                   keyCol: String = "user_id", tsCol: String = "ts",
                   tieCol: String = "event_id", typeCol: String = "event_type",
                   keepZero: Boolean = false): DataFrame = {
    validateCharMap(charMap)
    val seqd = events
      .select(col(keyCol), col(tsCol), col(tieCol),
        encodeCol(typeCol, charMap).as("ch"))
      .groupBy(keyCol)
      .agg(array_join(transform(
        array_sort(collect_list(struct(col(tsCol), col(tieCol), col("ch")))),
        s => s.getField("ch")), "").as("seq"))
      .select(col(keyCol), length(col("seq")).cast("long").as("n_events"),
        size(regexp_extract_all(col("seq"), lit(pattern), lit(0)))
          .cast("long").as("n_matches"))
    val filtered = if (keepZero) seqd else seqd.where(col("n_matches") > 0)
    filtered.orderBy(keyCol)
  }

  /** Time-bounded CEP: count occurrences of a LITERAL contiguous motif
    * (e.g. "vcp" = view, click, purchase with nothing between) per key,
    * plus how many completed WITHIN `withinUs` microseconds first event
    * to last — MATCH_RECOGNIZE's strict-contiguity mode with the
    * `WITHIN` clause, the semantics [[matchPattern]] cannot express
    * because its regex runs over a type string that no longer carries
    * timestamps. A motif that takes a week is usually noise where the
    * same motif inside an hour is signal; `n_within` vs `n_motifs` is
    * exactly that split.
    *
    * Implementation is one window, not a per-key string: each row looks
    * ahead (motif.length−1) rows via lead() over the (ts, tie)-ordered
    * key partition and a match is a per-row predicate — so this plans
    * as the same single keyed sort-window every other event analytic
    * shares (no per-key history materialisation at all, stricter state
    * than matchPattern's string), and the DuckDB twin
    * ([[motifWithinSql]], generated from the same arguments) is the
    * identical lead() formulation. Strict contiguity is what makes the
    * window form exact: occurrences can overlap in TIME but each starts
    * at a distinct row, which is also RE2's leftmost count for a
    * literal pattern.
    */
  def motifWithin(events: DataFrame, motif: String, withinUs: Long,
                  charMap: Map[String, String] = Map.empty,
                  keyCol: String = "user_id", tsCol: String = "ts",
                  tieCol: String = "event_id", typeCol: String = "event_type")
      : DataFrame = {
    require(motif.length >= 2, s"motifWithin: motif needs >= 2 steps, got '$motif'")
    require(withinUs > 0, s"motifWithin: withinUs must be positive, got $withinUs")
    validateCharMap(charMap)
    import org.apache.spark.sql.expressions.Window
    val k = motif.length
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    val base = events.select(col(keyCol), col(tsCol), col(tieCol),
      encodeCol(typeCol, charMap).as("ch"))
    val leads = (1 until k).foldLeft(base) { (df, i) =>
      df.withColumn(s"c$i", lead(col("ch"), i).over(w))
    }.withColumn("span_us",
      unix_micros(lead(col(tsCol), k - 1).over(w)) - unix_micros(col(tsCol)))
    val isMatch = (col("ch") === lit(motif.substring(0, 1))) +:
      (1 until k).map(i => col(s"c$i") === lit(motif.substring(i, i + 1)))
    leads.where(isMatch.reduce(_ && _))
      .groupBy(keyCol)
      .agg(count(lit(1)).as("n_motifs"),
        count(when(col("span_us") <= withinUs, 1)).as("n_within"))
      .orderBy(keyCol)
  }

  /** Bucketized interval-OVERLAP self-join: all pairs (a, b) with the
    * same key, a.id < b.id, and overlapping [start, end) intervals —
    * WITHOUT the per-key quadratic join the naive form costs. Each
    * interval explodes to the `bucketUs`-wide epoch buckets it touches,
    * the join co-locates on (key, bucket) — bounding blowup to
    * per-(key, bucket) volume — and each qualifying pair survives
    * EXACTLY once with no dedup shuffle: it is kept only in the bucket
    * containing the overlap's start (`bucket == max(s_a, s_b) div
    * bucketUs` — the pair's first shared bucket, which both sides
    * provably explode to). Choose bucketUs near the typical interval
    * span: intervals touch ceil(span/bucketUs)+1 buckets, so the
    * explode factor stays ~2 while long buckets would re-grow the
    * per-bucket quadratic.
    *
    * Columns in, columns out: input needs (key, id, s, e) — epoch-us
    * longs, end exclusive; output is one row per overlapping pair
    * (key, id_a, id_b).
    */
  def intervalOverlapPairs(df: DataFrame, keyCol: String, idCol: String,
                           sCol: String, eCol: String,
                           bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"intervalOverlapPairs: bucketUs must be positive, got $bucketUs")
    val b = df.select(col(keyCol).as("key"), col(idCol).as("id"),
        col(sCol).cast("long").as("s"), col(eCol).cast("long").as("e"))
      .where(col("s") < col("e"))
      .withColumn("bucket",
        explode(sequence(expr(s"s div $bucketUs"), expr(s"(e - 1) div $bucketUs"))))
    b.as("a").join(b.as("b"),
        col("a.key") === col("b.key") &&
          col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id") &&
          col("a.s") < col("b.e") && col("b.s") < col("a.e") &&
          col("a.bucket") === expr(s"greatest(a.s, b.s) div $bucketUs"))
      .select(col("a.key").as(keyCol), col("a.id").as("id_a"),
        col("b.id").as("id_b"))
  }

  /** DuckDB oracle twin generated from the SAME arguments as
    * [[motifWithin]] — the identical lead() window formulation.
    */
  def motifWithinSql(motif: String, withinUs: Long,
                     charMap: Map[String, String] = Map.empty,
                     keyCol: String = "user_id", tsCol: String = "ts",
                     tieCol: String = "event_id", typeCol: String = "event_type",
                     table: String = "events"): String = {
    require(motif.length >= 2, s"motifWithin: motif needs >= 2 steps, got '$motif'")
    validateCharMap(charMap)
    val k = motif.length
    val enc =
      if (charMap.isEmpty) s"substr($typeCol, 1, 1)"
      else charMap.map { case (t, c) =>
        s"WHEN $typeCol = '${t.replace("'", "''")}' THEN '$c'"
      }.mkString("CASE ", " ", s" ELSE substr($typeCol, 1, 1) END")
    val leadCols = (1 until k).map(i => s"lead(ch, $i) OVER win AS c$i").mkString(",\n    ")
    val conds = (s"ch = '${motif.substring(0, 1)}'" +:
      (1 until k).map(i => s"c$i = '${motif.substring(i, i + 1)}'")).mkString(" AND ")
    s"""WITH s AS (SELECT $keyCol, $tsCol, $tieCol, $enc AS ch FROM $table),
       |w AS (SELECT $keyCol, ch,
       |    $leadCols,
       |    epoch_us(lead($tsCol, ${k - 1}) OVER win) - epoch_us($tsCol) AS span_us
       |  FROM s WINDOW win AS (PARTITION BY $keyCol ORDER BY $tsCol, $tieCol))
       |SELECT $keyCol, count(*) AS n_motifs,
       |  count(*) FILTER (span_us <= $withinUs) AS n_within
       |FROM w WHERE $conds
       |GROUP BY $keyCol ORDER BY $keyCol""".stripMargin
  }

  /** DuckDB oracle twin generated from the SAME (pattern, charMap) as
    * [[matchPattern]] — single-quote escaping is the only transformation
    * applied to the pattern string.
    */
  def matchPatternSql(pattern: String,
                      charMap: Map[String, String] = Map.empty,
                      keyCol: String = "user_id", tsCol: String = "ts",
                      tieCol: String = "event_id", typeCol: String = "event_type",
                      table: String = "events",
                      keepZero: Boolean = false): String = {
    validateCharMap(charMap)
    val pat = pattern.replace("'", "''")
    val enc =
      if (charMap.isEmpty) s"substr($typeCol, 1, 1)"
      else charMap.map { case (t, c) =>
        s"WHEN $typeCol = '${t.replace("'", "''")}' THEN '$c'"
      }.mkString("CASE ", " ", s" ELSE substr($typeCol, 1, 1) END")
    val filter = if (keepZero) ""
                 else s"\nWHERE len(regexp_extract_all(seq, '$pat')) > 0"
    s"""WITH s AS (SELECT $keyCol,
       |    string_agg($enc, '' ORDER BY $tsCol, $tieCol) AS seq
       |  FROM $table GROUP BY $keyCol)
       |SELECT $keyCol, length(seq)::BIGINT AS n_events,
       |  len(regexp_extract_all(seq, '$pat'))::BIGINT AS n_matches
       |FROM s$filter
       |ORDER BY $keyCol""".stripMargin
  }
}
