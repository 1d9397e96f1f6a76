package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.BucketedStore

/** Bucketed co-located joins: the plan-shape contract (zero exchanges
  * when both sides are bucketed on the join key) and result parity with
  * the plain shuffled join. */
class BucketedStoreSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  test("bucketed-bucketed equi-join plans with zero shuffles and matches the shuffled join") {
    val dir = Files.createTempDirectory("graft_bucketed").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"lang", $"n_chars")
    val scores = docs.select($"doc_id", (length($"lang") + $"n_chars" % 7).as("score"))
    BucketedStore.saveBucketed(docs, "b_docs", "doc_id", nBuckets = 4,
      path = Some(s"$dir/b_docs"))
    BucketedStore.saveBucketed(scores, "b_scores", "doc_id", nBuckets = 4,
      path = Some(s"$dir/b_scores"))
    try {
      val joined = BucketedStore.coLocatedJoin(spark, "b_docs", "b_scores", "doc_id")
      val n = joined.count()
      assert(n == docs.count())
      // the whole point: no exchange anywhere in the executed plan
      assert(BucketedStore.countShuffles(joined) == 0,
        joined.queryExecution.executedPlan.toString)
      // parity with the plain (shuffling) join
      val plain = docs.join(scores, Seq("doc_id")).orderBy($"doc_id")
        .collect().map(_.toSeq)
      val got = joined.orderBy($"doc_id").collect().map(_.toSeq)
      assert(got.sameElements(plain))
      // aggregation on the bucket key also rides the layout shuffle-free
      val agg = spark.table("b_docs").groupBy($"doc_id").agg(count(lit(1)))
      agg.count()
      assert(BucketedStore.countShuffles(agg) == 0,
        agg.queryExecution.executedPlan.toString)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_docs")
      spark.sql("DROP TABLE IF EXISTS b_scores")
    }
  }

  test("one-sided bucketing still shuffles only the unbucketed side") {
    val dir = Files.createTempDirectory("graft_bucketed1").toString
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select($"doc_id", $"lang")
    BucketedStore.saveBucketed(docs, "b_docs_one", "doc_id", nBuckets = 4,
      path = Some(s"$dir/b_docs_one"))
    try {
      val other = spark.range(0, 100).select($"id".as("doc_id"), lit(1).as("x"))
      // disable broadcast so the join really exercises the SMJ path
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val joined = spark.table("b_docs_one").join(other, Seq("doc_id"))
        joined.count()
        // exactly ONE exchange: the unbucketed side aligning to the buckets
        assert(BucketedStore.countShuffles(joined) == 1,
          joined.queryExecution.executedPlan.toString)
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    } finally spark.sql("DROP TABLE IF EXISTS b_docs_one")
  }
}
