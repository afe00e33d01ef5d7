package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.text.TextOps

/** Repetition signals, Gopher-style quality flags, and PII scrubbing —
  * hand-computed expectations on constructed documents (the sf corpora are
  * covered by the DuckDB oracles).
  */
class TextFilterSpec extends SparkSpec {

  import spark.implicits._

  private def rep(text: String) =
    TextOps.repetition(Seq((1L, text)).toDF("doc_id", "text")).head()

  test("repetition signals match hand-computed values") {
    val r = rep("the cat the dog the")
    assert(r.getAs[Long]("n_tokens") === 5L)
    // bigrams: "the cat","cat the","the dog","dog the" — all distinct
    assert(r.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(r.getAs[Double]("top_word_share") === 0.6)
    // counts 3/1/1 over n=5: -(0.6 ln 0.6 + 0.2 ln 0.2 + 0.2 ln 0.2)
    assert(r.getAs[Double]("token_entropy") === 0.950271)
  }

  test("degenerate repetition: constant document") {
    val r = rep("a a a a")
    assert(math.abs(r.getAs[Double]("dup_bigram_frac") - 2.0 / 3) < 1e-9)
    assert(r.getAs[Double]("dup_trigram_frac") === 0.5)
    assert(r.getAs[Double]("top_word_share") === 1.0)
    assert(r.getAs[Double]("token_entropy") === 0.0)
  }

  test("repetition guards: sub-n-gram-length documents score zero, not null") {
    val r = rep("x")
    assert(r.getAs[Double]("dup_bigram_frac") === 0.0)
    assert(r.getAs[Double]("dup_trigram_frac") === 0.0)
    assert(r.getAs[Double]("token_entropy") === 0.0)
  }

  test("repetitious text scores worse than diverse text on every signal") {
    val diverse = rep("the quick brown fox jumps over a lazy dog near the river bank " +
      "while birds sing in tall green trees above quiet water today")
    val loopy = rep(Iterator.continually("buy cheap pills now").take(6).mkString(" "))
    assert(loopy.getAs[Double]("dup_bigram_frac") > diverse.getAs[Double]("dup_bigram_frac"))
    assert(loopy.getAs[Double]("top_word_share") > diverse.getAs[Double]("top_word_share"))
    assert(loopy.getAs[Double]("token_entropy") < diverse.getAs[Double]("token_entropy"))
  }

  private def gopher(text: String) = {
    val cols = TextOps.gopherColumns(col("text")).map { case (n, c) => c.as(n) }
    Seq(text).toDF("text").select(cols: _*).head()
  }

  test("gopher flags: a clean document passes, each rule fails its violator") {
    val clean = gopher("the cat sat on a mat and the dog ran to the park " +
      "while a bird flew over the green field near our quiet house")
    assert(clean.getAs[Int]("pass") === 1)
    // too short
    assert(gopher("the cat sat on a mat").getAs[Int]("ok_token_count") === 0)
    // symbol-heavy
    val symbols = gopher(("## @@ %% " * 10) + "the a of and to in is " * 3)
    assert(symbols.getAs[Int]("ok_symbol_ratio") === 0)
    // numeric words carry no alphabetic characters
    val digits = gopher(Seq.tabulate(30)(i => i.toString).mkString(" "))
    assert(digits.getAs[Int]("ok_alpha_words") === 0)
    assert(digits.getAs[Int]("ok_stopwords") === 0)
    assert(digits.getAs[Int]("pass") === 0)
  }

  private def pii(text: String) = {
    val cols = TextOps.piiColumns(col("text")).map { case (n, c) => c.as(n) }
    Seq(text).toDF("text").select(cols: _*).head()
  }

  test("pii scrub redacts every category exactly once, no double counting") {
    val r = pii("mail bob.smith+x@corp.example.org from 192.168.1.17 " +
      "ssn 123-45-6789 call +1-555-0042 done")
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_ip") === 1L)
    assert(r.getAs[Long]("n_id") === 1L)
    assert(r.getAs[Long]("n_phone") === 1L)
    assert(r.getAs[String]("scrubbed") ===
      "mail <EMAIL> from <IP> ssn <ID> call <PHONE> done")
  }

  test("pii scrub leaves clean text untouched and counts zero") {
    val r = pii("no personal data in this sentence at all")
    assert(r.getAs[Long]("n_email") + r.getAs[Long]("n_ip") +
      r.getAs[Long]("n_id") + r.getAs[Long]("n_phone") === 0L)
    assert(r.getAs[String]("scrubbed") === "no personal data in this sentence at all")
  }

  test("pii category order: the SSN shape is not also counted as a phone") {
    val r = pii("id 123-45-6789 only")
    assert(r.getAs[Long]("n_id") === 1L)
    assert(r.getAs[Long]("n_phone") === 0L)
  }

  test("quality columns survive empty text (ANSI division) and multi-space tokens") {
    val df = Seq((1L, ""), (2L, "a  b"), (3L, "Regular text here")).toDF("doc_id", "text")
    val out = df.select(col("doc_id") +:
        TextOps.qualityColumns(col("text")).map { case (n, c) => c.as(n) }: _*)
      .collect().map(r => r.getLong(0) -> r).toMap
    // Spark 4 runs ANSI mode: an unguarded /length(text) THROWS here
    assert(out(1L).getAs[Double]("punct_ratio") === 0.0)
    assert(out(2L).getAs[Long]("n_tokens") === 3L) // 'a', '', 'b'
    assert(!out.values.exists(r => r.anyNull))
  }

  test("bigram surprisal flags shuffled text that unigram surprisal cannot see") {
    val coherent = "the cat sat on the mat and the dog slept by the fire"
    // same MULTISET of tokens, incoherent order
    val shuffled = "mat the by cat fire and sat dog the on the slept the"
    val df = ((1L to 20L).map(i => (i, coherent)) :+ (21L, shuffled)).toDF("doc_id", "text")

    val bs = TextOps.bigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(bs(21L) > bs(1L) + 1.0,
      s"shuffled doc must score clearly higher: ${bs(21L)} vs ${bs(1L)}")

    // the unigram model sees identical bags of words — identical scores:
    // exactly the blindness the bigram LM exists to fix
    val us = TextOps.unigramSurprisal(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(us(21L) === us(1L))
  }

  test("nbDistill separates a class-signalled corpus and scores mixtures between") {
    val good = (1 to 10).map(i => (i.toLong, true, "clean helpful prose words here"))
    val bad = (11 to 20).map(i => (i.toLong, false, "spam junk noise garbage filler"))
    // a mixed doc, labelled arbitrarily: its tokens pull both ways
    val mixed = Seq((21L, true, "clean helpful spam junk"))
    val df = (good ++ bad ++ mixed).toDF("doc_id", "lab", "text")
    val out = TextOps.nbDistill(df, col("lab"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    (1 to 10).foreach(i => assert(out(i.toLong)._2, s"doc $i should score positive"))
    (11 to 20).foreach(i => assert(!out(i.toLong)._2, s"doc $i should score negative"))
    val (mixedOdds, _) = out(21L)
    assert(mixedOdds > out(11L)._1 && mixedOdds < out(1L)._1,
      s"mixture should land between the classes: $out")
    // pure counting: identical output under any partitioning
    val b = TextOps.nbDistill(df.repartition(7), col("lab"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getBoolean(2))).toMap
    assert(b === out)
  }

  test("nbScore emits a bias-only row for all-out-of-vocabulary documents") {
    val train = Seq((1L, true, "clean prose"), (2L, false, "spam junk"))
      .toDF("doc_id", "lab", "text")
    val model = TextOps.nbTrain(train, col("lab"))
    val out = TextOps.nbScore(
        Seq((9L, "wholly novel vocabulary")).toDF("doc_id", "text"), model)
      .collect()
    assert(out.length === 1, "the OOV doc must not vanish from the output")
    assert(out.head.getDouble(1) ===
      BigDecimal(model.bias).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("NormalizeText: strip -> NFC -> simple fold, order-dependent and idempotent") {
    import graft.functions.NormalizeText
    import org.apache.spark.unsafe.types.UTF8String
    def n(s: String): String =
      NormalizeText.normalize(UTF8String.fromString(s)).toString
    // NFC composes decomposed accents; composed and decomposed spellings
    // land on the SAME normalized string (the dedup motivation)
    assert(n("cafe\u0301") === "caf\u00e9")
    assert(n("caf\u00e9") === "caf\u00e9")
    // zero-width chars and controls stripped; \t \n \r kept
    assert(n("a\u200bb\u200cc\u200dd\ufeffe") === "abcde")
    assert(n("x\u0007y\u0001z\u009fq\u007f!") === "xyzq!")
    assert(n("a\tb\nc\rd") === "a\tb\nc\rd")
    // strip BEFORE NFC: a zero-width char between base and combining mark
    // must not block composition
    assert(n("e\u200b\u0301") === "\u00e9")
    // SIMPLE fold: final-sigma context folds to plain sigma (no
    // contextual \u03c2), dotted I to plain i — matching DuckDB lower
    assert(n("\u03a3\u039f\u03a6\u039f\u03a3") === "\u03c3\u03bf\u03c6\u03bf\u03c3")
    assert(n("\u0130stanbul STRASSE \u00df") === "istanbul strasse \u00df")
    // idempotent: normalizing a normalized string is the identity
    val mixed = "A\u0301 CAFE\u0301 Z\u200bW CTRL\u0007-X \u00c9 \u03a3\u039f\u03a3"
    assert(n(n(mixed)) === n(mixed))
    // the Column route (registered function) agrees with the kernel
    graft.functions.GraftFunctions.register(spark)
    val got = Seq((1L, mixed)).toDF("id", "t")
      .select(call_function("graft_normalize_text", col("t"))).head.getString(0)
    assert(got === n(mixed))
  }
}
