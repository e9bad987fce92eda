package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry hygiene backstop: a query registered WITHOUT an oracle reaches
  * the driver's gate as an unverifiable row (`err: no_oracle`) and a
  * stray oracle without a query is dead text that silently rots — both
  * directions must be structurally impossible, not reviewed for. No
  * allowlist: every non-SQL-expressible operator in this engine lives as
  * a t1 module op with its own spec and is deliberately NOT in `queries`
  * (≙ the reference's contract that every delegated query is verifiable,
  * bq.py:149-163).
  */
class SparkEntrySpec extends AnyFunSuite {

  test("every registered query has an oracle and every oracle a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty,
      s"registered without oracle: ${(q -- o).toSeq.sorted.mkString(", ")}")
    assert((o -- q).isEmpty,
      s"oracle without query: ${(o -- q).toSeq.sorted.mkString(", ")}")
  }

  test("query packs never collide on a key (reduce(++) would silently shadow)") {
    val keyLists = SparkEntry.packs.map(_._1.keySet)
    val dupes = keyLists.flatten.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"key registered by two packs: ${dupes.toSeq.sorted.mkString(", ")}")
    val oKeyLists = SparkEntry.packs.map(_._2.keySet)
    val oDupes = oKeyLists.flatten.groupBy(identity).filter(_._2.size > 1).keys
    assert(oDupes.isEmpty, s"oracle key in two packs: ${oDupes.toSeq.sorted.mkString(", ")}")
  }
}
