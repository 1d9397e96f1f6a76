package graft

import org.scalatest.funsuite.AnyFunSuite

class SparkEntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = TestSpark.Sf0001

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs on sf0.001 and returns rows") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      assert(n > 0, s"query $name returned no rows")
    }
  }

  test("every query has an oracle or is explicitly rows-only") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet --
      SparkEntry.rowsOnly
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    // rowsOnly is an allowlist of real queries, not a dumping ground
    assert((SparkEntry.rowsOnly -- SparkEntry.queries.keySet).isEmpty)
    assert((SparkEntry.rowsOnly & SparkEntry.oracleSql.keySet).isEmpty,
      "a query can't be both oracled and rows-only")
  }

  test("knn_cosine: self-match first with similarity 1") {
    val head = SparkEntry.queries("knn_cosine")(spark, dir).head
    assert(head.getLong(0) == 0L)          // vec_id 0 is its own nearest
    assert(head.getDouble(2) == 1.0)
  }

  test("q1_agg: group count matches distinct flag/status pairs") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val expected = li.select("l_returnflag", "l_linestatus").distinct().count()
    assert(SparkEntry.queries("q1_agg")(spark, dir).count() == expected)
  }

  test("bm25_keyword: scores in (0, 2.2] and descending") {
    val rows = SparkEntry.queries("bm25_keyword")(spark, dir)
      .select("score").collect().map(_.getDouble(0))
    assert(rows.nonEmpty && rows.forall(s => s > 0 && s <= 2.2))
    assert(rows.sameElements(rows.sorted(Ordering[Double].reverse)))
  }
}
