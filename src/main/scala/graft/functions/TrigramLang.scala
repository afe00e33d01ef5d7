package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Argmax trigram-profile language in ONE bounded call — the codegen-safe
  * form of the fold-of-`when`s formulation. A `when`-chain that threads
  * `bestScore` through each step duplicates every earlier score subtree in
  * both the condition and the else branch, so the generated method grows
  * ~2^|langs| × |profile| and blows past Janino's 64 KB method limit as
  * soon as the TRAINED model (langs × top-10 trigrams) is applied — Spark
  * then silently falls back to interpreted eval, a per-row interpreter tax
  * on what is designed as a scan-speed narrow map. Here the whole model is
  * a single reference object and the generated code is one static-shaped
  * call, constant-size no matter how many languages or trigrams the
  * trained model carries.
  *
  * Scoring semantics are IDENTICAL to the literal-replace arithmetic
  * (`(len(text) − len(remove(text, t))) / len(t)`, i.e. non-overlapping
  * left-to-right occurrence counts — `indexOf` stepping by `len(t)` counts
  * exactly what `replace` removes), so the DuckDB oracle SQL is unchanged.
  * Ties keep the FIRST profile (later langs win only on strictly greater),
  * matching both the fold and the oracle's CASE chain.
  */
case class TrigramBestLang(child: Expression,
                           langs: Seq[String], profiles: Seq[Seq[String]])
    extends UnaryExpression {

  require(langs.nonEmpty, "graft_trigram_best: empty profile set")
  require(langs.length == profiles.length,
    s"graft_trigram_best: ${langs.length} langs but ${profiles.length} profiles")
  require(profiles.forall(_.forall(_.nonEmpty)),
    "graft_trigram_best: empty trigram in a profile")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_trigram_best"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string column, got ${other.sql}")
  }

  @transient private lazy val model: TrigramLangModel =
    new TrigramLangModel(langs.toArray, profiles.map(_.toArray).toArray)

  override def nullSafeEval(text: Any): Any =
    model.best(text.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("trigramLangModel", model,
      classOf[TrigramLangModel].getName)
    defineCodeGen(ctx, ev, t => s"$ref.best($t)")
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramBestLang =
    copy(child = newChild)
}

/** The trained model as a plan reference object: langs × topK trigram
  * literals, scored in a tight JVM loop (no per-row expression tree at
  * all). Serializable so the plan ships to executors.
  */
class TrigramLangModel(val langs: Array[String],
                       val profiles: Array[Array[String]]) extends Serializable {

  @transient private lazy val langsU: Array[UTF8String] =
    langs.map(UTF8String.fromString)

  def best(text: UTF8String): UTF8String = {
    val s = text.toString
    var bestIdx = 0
    var bestScore = -1L
    var i = 0
    while (i < profiles.length) {
      val p = profiles(i)
      var score = 0L
      var j = 0
      while (j < p.length) { score += countOcc(s, p(j)); j += 1 }
      if (score > bestScore) { bestScore = score; bestIdx = i }
      i += 1
    }
    langsU(bestIdx)
  }

  // non-overlapping left-to-right occurrences — exactly the count
  // `length(text) - length(replace(text, t, ''))` divides out
  private def countOcc(s: String, t: String): Long = {
    var c = 0L
    var i = s.indexOf(t)
    while (i >= 0) { c += 1; i = s.indexOf(t, i + t.length) }
    c
  }
}
