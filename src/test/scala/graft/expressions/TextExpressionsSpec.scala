package graft.expressions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // All non-ASCII spelled as explicit escapes so the fixtures can't be
  // silently re-normalized by any editor/tool touching this file.
  private val eAcuteDecomp = "éclair"       // e + combining acute
  private val eAcuteNfc = "éclair"           // composed é
  private val ringDecomp = "ÅB"             // A + combining ring
  private val ringNfc = "ÅB"                 // composed Å
  private val sDotsDecomp = "ṩ"       // s + dot-below + dot-above
  private val sDotsNfc = "ṩ"                 // fully composed form

  test("graft_nfc composes decomposed sequences to canonical NFC") {
    GraftFunctions.register(spark)
    val df = Seq(eAcuteDecomp, eAcuteNfc, ringDecomp, "ascii only", sDotsDecomp)
      .toDF("t")
    val out = df.select(expr("graft_nfc(t)")).as[String].collect()
    assert(out(0) == eAcuteNfc)
    assert(out(1) == eAcuteNfc)
    assert(out(2) == ringNfc)
    assert(out(3) == "ascii only")
    assert(out(4) == sDotsNfc)
  }

  test("graft_nfc agrees with java.text.Normalizer on supplementary planes and null propagates") {
    GraftFunctions.register(spark)
    val s = "😀 " + eAcuteDecomp // emoji (surrogate pair) + decomposed é
    val out = Seq(Some(s), None).toDF("t")
      .select(expr("graft_nfc(t)")).collect()
    assert(out(0).getString(0) ==
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    assert(out(1).isNullAt(0))
  }

  test("graft_nfc rejects non-string input at analysis time") {
    GraftFunctions.register(spark)
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(expr("graft_nfc(x)")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"), err.getMessage)
  }
}
