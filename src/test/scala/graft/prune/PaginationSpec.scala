package graft.prune

import graft.SparkSpec

class PaginationSpec extends SparkSpec {
  import spark.implicits._

  test("fixture A8: token lifecycle — first page materializes, later pages skip the query, final page has no token") {
    val df = (1 to 25).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    val dest = tmpDir("page") + "/dest"

    val p0 = Pagination.firstPage(df, Seq("id"), 10, dest)
    assert(p0.rows.as[(Long, String)].collect().map(_._1).toSeq == (1L to 10L))
    assert(p0.nextToken.isDefined)

    val p1 = Pagination.nextPage(spark, p0.nextToken.get, Seq("id"))
    assert(p1.rows.as[(Long, String)].collect().map(_._1).toSeq == (11L to 20L))

    val p2 = Pagination.nextPage(spark, p1.nextToken.get, Seq("id"))
    assert(p2.rows.as[(Long, String)].collect().map(_._1).toSeq == (21L to 25L))
    assert(p2.nextToken.isEmpty) // ≙ next_page_token=None terminates
  }

  test("pages are disjoint and cover the whole result exactly once") {
    val df = (1 to 17).map(i => (i.toLong, i % 3)).toDF("id", "g")
    val dest = tmpDir("page2") + "/dest"
    var page = Pagination.firstPage(df, Seq("id"), 5, dest)
    var seen = page.rows.as[(Long, Int)].collect().map(_._1).toVector
    while (page.nextToken.isDefined) {
      page = Pagination.nextPage(spark, page.nextToken.get, Seq("id"))
      seen ++= page.rows.as[(Long, Int)].collect().map(_._1)
    }
    assert(seen == (1L to 17L).toVector)
  }
}
