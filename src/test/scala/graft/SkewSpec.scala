package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Skew

/** Salting rewrites are value-preserving: salted results equal the
  * unsalted plan's on a corpus with a deliberately spiked key. */
class SkewSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // 1000 rows of key 1 (the hot key), 10 each for keys 2..20
  private lazy val skewed = spark.range(0, 1000).select(lit(1L).as("k"), $"id".as("v"))
    .unionAll(spark.range(0, 190).select(($"id" % 19 + 2).as("k"), ($"id" + 5000).as("v")))

  test("saltedCollectList equals plain collect_list as a multiset, spreads stage 1") {
    val salted = Skew.saltedCollectList(skewed.toDF(), "k", "v", nSalts = 8)
      .select($"k", sort_array($"values").as("values"))
    val plain = skewed.groupBy($"k").agg(sort_array(collect_list($"v")).as("values"))
    val s = salted.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val p = plain.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(s == p)
    assert(s(1L).length == 1000)
    // stage 1 really split the hot key: distinct salts > 1 (the salt
    // the operator actually uses — hash of ALL columns)
    val stage1 = skewed.withColumn("_salt", pmod(xxhash64($"k", $"v"), lit(8L)))
      .filter($"k" === 1).select("_salt").distinct().count()
    assert(stage1 > 1)
  }

  test("saltedCollectList spreads a hot key whose VALUES are all identical") {
    // the "same payload spammed" skew (VERDICT r6): value column is
    // constant for the hot key, but a per-row event id varies — the
    // all-columns salt must still spread stage 1
    val spam = spark.range(0, 1000)
      .select(lit(1L).as("k"), lit(42L).as("v"), $"id".as("event_id"))
    val salted = Skew.saltedCollectList(spam, "k", "v", nSalts = 8)
    val values = salted.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(values(1L).length == 1000 && values(1L).forall(_ == 42L))
    val stage1 = spam
      .withColumn("_salt", pmod(xxhash64($"k", $"v", $"event_id"), lit(8L)))
      .select("_salt").distinct().count()
    assert(stage1 > 1, "identical values must still spread via the row's other columns")
    // FULLY identical rows: content-addressing cannot split them, a
    // caller-supplied disambiguator restores the spread and the result
    // is still the full multiset
    val clones = spark.range(0, 1000).select(lit(1L).as("k"), lit(42L).as("v"))
    val withDis = Skew.saltedCollectList(clones, "k", "v", nSalts = 8,
      disambiguatorCol = Some(monotonically_increasing_id()))
    val got = withDis.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L).length == 1000 && got(1L).forall(_ == 42L))
  }

  test("saltedJoin (inner and left) equals the plain join exactly") {
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (99L, "unmatched"))
      .toDF("k", "label")
    for (jt <- Seq("inner", "left")) {
      val salted = Skew.saltedJoin(skewed.toDF(), dim, "k", nSalts = 4, joinType = jt)
        .orderBy($"k", $"v").collect().map(_.toSeq)
      val plain = skewed.join(dim, Seq("k"), jt)
        .orderBy($"k", $"v").collect().map(_.toSeq)
      assert(salted.sameElements(plain), s"joinType=$jt")
    }
    // fabricating-replica join types are rejected loudly
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(skewed.toDF(), dim, "k", 4, joinType = "right")
    }
  }
}
