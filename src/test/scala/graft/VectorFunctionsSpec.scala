package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): Double =
    Seq(1).toDF("x").select(c.cast("double")).head.getDouble(0)

  test("dot product") {
    assert(one(dotProduct(vecLit(Seq(1, 2, 3)), vecLit(Seq(4, 5, 6)))) == 32.0)
  }

  test("cosine similarity of identical vectors is 1") {
    assert(math.abs(one(cosineSimilarity(vecLit(Seq(0.5, 0.5)), vecLit(Seq(0.5, 0.5)))) - 1.0) < 1e-12)
  }

  test("cosine distance of orthogonal vectors is 1") {
    assert(math.abs(one(cosineDistance(vecLit(Seq(1, 0)), vecLit(Seq(0, 1)))) - 1.0) < 1e-12)
  }

  test("euclidean distance") {
    assert(one(euclideanDistance(vecLit(Seq(0, 0)), vecLit(Seq(3, 4)))) == 5.0)
  }

  test("score = 1 - distance can go negative (reference quirk preserved)") {
    assert(one(score(euclideanDistance(vecLit(Seq(0, 0)), vecLit(Seq(3, 4))))) == -4.0)
  }

  test("l2Normalize yields unit norm; zero vector passes through") {
    val df = Seq((Array(3.0f, 4.0f), Array(0.0f, 0.0f))).toDF("v", "z")
    val row = df.select(
      norm(l2Normalize($"v")).as("n"),
      l2Normalize($"z").as("zn")).head
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12)
    assert(row.getSeq[Double](1) == Seq(0.0, 0.0))
  }

  test("knn over a tiny in-memory collection ranks nearest first") {
    import graft.search.VectorSearch
    val df = Seq(
      ("a", Array(1f, 0f, 0f, 0f)),
      ("b", Array(0f, 1f, 0f, 0f)),
      ("c", Array(0.9f, 0.1f, 0f, 0f))).toDF("id", "vector")
    val got = VectorSearch.knn(df, Seq(1.0, 0.0, 0.0, 0.0), 2).select("id").as[String].collect()
    assert(got.toSeq == Seq("a", "c"))
  }
}
