package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.Clustering

class ClusteringSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // Two tight groups on the 1-axis and two on the 2-axis; k=2 seeded by
  // the two smallest ids (one from each group by construction).
  private def twoBlobs = Seq(
    (0L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (4L, Seq(1.1f, -0.1f)),
    (1L, Seq(0.0f, 1.0f)), (3L, Seq(0.1f, 0.9f)), (5L, Seq(-0.1f, 1.1f))
  ).toDF("vec_id", "embedding")

  test("kmeansAssignQuantized separates two obvious blobs, labels by seed rank") {
    val got = Clustering.kmeansAssignQuantized(twoBlobs, "embedding", "vec_id",
        k = 2, iters = 3)
      .as[(Long, Int)].collect().toMap
    // seed 0 = vec 0 (x-blob), seed 1 = vec 1 (y-blob)
    assert(got == Map(0L -> 0, 2L -> 0, 4L -> 0, 1L -> 1, 3L -> 1, 5L -> 1))
  }

  test("kmeansAssignQuantized is deterministic: hand-replay of one update round") {
    // 1-d corpus, k=2, iters=2: seeds q0=round(0.1e6)=100000, q1=400000.
    // Assign#1: 0.275 -> |275000-100000|=175000 vs |275000-400000|=125000
    //   -> c1; split c0={0.1,0.2}, c1={0.275,0.3,0.4,0.5}.
    // Update: c0=floor(300000/2)=150000, c1=floor(1475000/4)=368750.
    // Assign#2: 0.275 -> d0=125000^2 > d1=93750^2 -> c1; 0.3 -> c1;
    //   0.1/0.2 stay c0, 0.4/0.5 stay c1.
    val df = Seq(
      (0L, Seq(0.1f)), (1L, Seq(0.4f)), (2L, Seq(0.2f)), (3L, Seq(0.5f)),
      (4L, Seq(0.3f)), (5L, Seq(0.275f))).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssignQuantized(df, "embedding", "vec_id",
        k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 2L -> 0, 1L -> 1, 3L -> 1, 4L -> 1, 5L -> 1))
  }

  test("argmin ties break to the lowest cluster id") {
    // k=2, iters=1 (seed centroids only): seeds 0.1 and 0.5; point 0.3
    // is exactly 200000 from both -> cluster 0.
    val df = Seq(
      (0L, Seq(0.1f)), (1L, Seq(0.5f)), (2L, Seq(0.3f))).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssignQuantized(df, "embedding", "vec_id",
        k = 2, iters = 1)
      .as[(Long, Int)].collect().toMap
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 0))
  }

  test("semdedupPairs finds the planted near-dup inside a cluster only") {
    // vecs 0/2 nearly identical (same blob); 1 in the other blob. The
    // cross-blob cosine of (1.0,0) vs (0,1.0) is 0 — but it must be
    // EXCLUDED by clustering, not by the tau filter: plant a cross-blob
    // pair that would pass tau if compared (0.9,0.1)·(0.7,0.71) ≈ 0.76.
    val df = Seq(
      (0L, Seq(1.0f, 0.0f)), (2L, Seq(0.99f, 0.01f)), (4L, Seq(0.9f, 0.1f)),
      (1L, Seq(0.0f, 1.0f)), (3L, Seq(0.7f, 0.71f))
    ).toDF("vec_id", "embedding")
    val pairs = Clustering.semdedupPairs(df, "embedding", "vec_id",
        k = 2, iters = 2, tau = 0.7)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, _) => (a, b) }.toSet
    assert(pairs.contains((0L, 2L)))
    // 3 sits in the y-cluster (closer to seed 1): its high-cosine pair
    // with 4 (x-cluster) must NOT appear — cluster-locality at work
    assert(!pairs.contains((3L, 4L)) && !pairs.contains((4L, 3L)))
    assert(pairs.forall { case (a, b) => a < b })
  }

  test("kmeans handles k > distinct points (empty clusters keep seed centroid)") {
    val df = Seq(
      (0L, Seq(0.0f)), (1L, Seq(0.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    val got = Clustering.kmeansAssignQuantized(df, "embedding", "vec_id",
        k = 3, iters = 2)
      .as[(Long, Int)].collect().toMap
    // seeds: c0=0.0 (vec0), c1=0.0 (vec1), c2=1.0 (vec2); ties -> lowest cid
    assert(got == Map(0L -> 0, 1L -> 0, 2L -> 2))
  }

  test("poolEmbeddings: weighted-mean + L2 normalize matches a hand fold; partition-invariant") {
    // doc 7: chunks (id 70, w 1, [1, 0, 3]), (id 71, w 3, [0, 2, 1])
    //   weighted mean = [(1·1+3·0)/4, (1·0+3·2)/4, (1·3+3·1)/4]
    //                 = [0.25, 1.5, 1.5]; |·| = sqrt(0.0625+2.25+2.25)
    // doc 8: one chunk -> its own unit vector
    val chunks = Seq(
      (7L, 70L, 1, Seq(1.0f, 0.0f, 3.0f)),
      (7L, 71L, 3, Seq(0.0f, 2.0f, 1.0f)),
      (8L, 80L, 5, Seq(0.0f, 4.0f, 3.0f))
    ).toDF("doc", "cid", "w", "vec")
    def run(df: org.apache.spark.sql.DataFrame) =
      Clustering.poolEmbeddings(df, "doc", "cid", "vec", "w", dim = 3)
        .as[(Long, Int, Int, Double)].collect().sortBy(r => (r._1, r._3)).toSeq
    val got = run(chunks)
    def r6(d: Double) = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val m7 = Seq(0.25, 1.5, 1.5)
    val n7 = math.sqrt(m7.foldLeft(0.0)((a, x) => a + x * x))
    val n8 = 5.0 // sqrt(16+9)
    val expected = Seq(
      (7L, 2, 0, r6(m7(0) / n7)), (7L, 2, 1, r6(m7(1) / n7)), (7L, 2, 2, r6(m7(2) / n7)),
      (8L, 1, 0, 0.0), (8L, 1, 1, r6(4.0 / n8)), (8L, 1, 2, r6(3.0 / n8)))
    assert(got == expected)
    // accumulation-order determinism: a different physical partitioning
    // must produce bit-identical values (the sorted-fold contract)
    assert(run(chunks.repartition(7)) == got)
    // null / wrong-dim chunks are skipped, not poisoning the doc
    val dirty = chunks.union(Seq(
      (7L, 72L, 9, null.asInstanceOf[Seq[Float]]),
      (8L, 81L, 9, Seq(1.0f, 2.0f))).toDF("doc", "cid", "w", "vec"))
    assert(run(dirty) == got)
  }
}
