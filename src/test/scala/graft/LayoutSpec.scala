package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.dedup.BloomDedup
import graft.functions.UnicodeNormalize
import graft.pipeline.ZOrder

/** Round-10 additions: Unicode normalization, Z-order layout, and the
  * Bloom-filter incremental-dedup scale path. */
class LayoutSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._

  // ─── UnicodeNormalize ───

  test("UnicodeNormalize NFC composes combining marks; matches java.text reference") {
    val decomposed = "Café naïve ﬁle" // é, ï decomposed; ﬁ ligature
    val df = Seq(decomposed, "plain ascii", null).toDF("t")
    val got = df.select(UnicodeNormalize.normalize($"t").as("nfc"),
                        UnicodeNormalize.normalize($"t", "NFKC").as("nfkc"))
      .as[(String, String)].collect()
    assert(got(0)._1 == "Café naïve ﬁle")        // NFC: compose, keep ligature
    assert(got(0)._2 == "Café naïve file")            // NFKC: compatibility-folds ﬁ
    assert(got(1) == (("plain ascii", "plain ascii")))
    assert(got(2) == ((null, null)))
  }

  test("UnicodeNormalize interpreted eval matches codegen path") {
    // eval via foldable literal path vs codegen over a column
    val texts = Seq("é", "Å", "Å", "x", "")
    val viaCol = texts.toDF("t")
      .select(UnicodeNormalize.normalize($"t")).as[String].collect().toSeq
    val ref = texts.map(java.text.Normalizer.normalize(_, java.text.Normalizer.Form.NFC))
    assert(viaCol == ref)
  }

  test("cleanText strips controls, collapses whitespace, NFC-normalizes") {
    val df = Seq("  a\u0000b\tc\n\nd  e\u0301  ").toDF("t")
    val got = df.select(UnicodeNormalize.cleanText($"t")).as[String].head()
    // NUL stripped; \t and \n are whitespace → collapsed; é composed
    assert(got == "ab c d é")
  }

  // ─── ZOrder ───

  private def mortonRef(xs: Seq[Long], bits: Int): Long = {
    val n = xs.size
    var z = 0L
    for (j <- 0 until n; i <- 0 until bits)
      z |= (((xs(j) & ((1L << bits) - 1)) >>> i) & 1L) << (i * n + j)
    z
  }

  test("ZOrderKey matches the scalar Morton reference (2 and 3 columns)") {
    val rows = Seq((0L, 0L, 0L), (1L, 0L, 7L), (255L, 255L, 255L),
                   (170L, 85L, 1L), (256L, 1L, 300L)) // 256/300 get masked at bits=8
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(ZOrder.zkey(Seq($"a", $"b"), 8)).as[Long].collect().toSeq
    val exp2 = rows.map { case (a, b, _) => mortonRef(Seq(a, b), 8) }
    assert(got2 == exp2)
    val got3 = df.select(ZOrder.zkey(Seq($"a", $"b", $"c"), 8)).as[Long].collect().toSeq
    val exp3 = rows.map { case (a, b, c) => mortonRef(Seq(a, b, c), 8) }
    assert(got3 == exp3)
    // null propagates
    val withNull = Seq((Some(1L), None: Option[Long])).toDF("a", "b")
    assert(withNull.select(ZOrder.zkey(Seq($"a", $"b"), 8)).collect()(0).isNullAt(0))
  }

  test("zkeySql (the oracle form) agrees with the Scala key") {
    val rows = (0 until 200).map(i => (i.toLong * 7 % 256, i.toLong * 13 % 256))
    val df = rows.toDF("a", "b")
    df.createOrReplaceTempView("zt")
    val viaSql = spark.sql(s"SELECT ${ZOrder.zkeySql(Seq("a", "b"), 8)} AS z FROM zt")
      .as[Long].collect().toSeq
    val viaExpr = df.select(ZOrder.zkey(Seq($"a", $"b"), 8)).as[Long].collect().toSeq
    assert(viaSql == viaExpr)
  }

  test("zorderLayout: file min/max boxes prune a box query that a single-column sort cannot") {
    // 64×64 grid, one row per cell; box query = 8×8 corner (64 of 4096 rows)
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val dir = Files.createTempDirectory("zorder").toFile
    val zPath = new java.io.File(dir, "z").getPath
    val yPath = new java.io.File(dir, "ysort").getPath
    ZOrder.zorderLayout(grid, Seq($"x", $"y"), bits = 6, numFiles = 16)
      .write.mode("overwrite").parquet(zPath)
    grid.repartitionByRange(16, $"y").sortWithinPartitions($"y")
      .write.mode("overwrite").parquet(yPath)

    def filesTouched(path: String): Int = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).sorted
      files.count { f =>
        val s = spark.read.parquet(f).agg(
          min($"x"), max($"x"), min($"y"), max($"y")).head()
        // file can contain rows with x<8 AND y<8 only if its boxes overlap
        s.getLong(0) < 8 && s.getLong(2) < 8
      }
    }
    val zTouched = filesTouched(zPath)
    val yTouched = filesTouched(yPath)
    // y-sorted layout: the y<8 stripe spans ALL x values → every file in
    // the first 1/8 of the y-range has min(x)=0; z-order confines the
    // corner to the curve's low end.
    assert(zTouched <= 2, s"z-order touched $zTouched of 16 files")
    assert(yTouched >= zTouched, s"y-sort touched $yTouched, z $zTouched")
    // correctness: both layouts hold all 4096 rows
    assert(spark.read.parquet(zPath).count() == 4096)
    org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  // ─── SQL surface (Registry) ───

  test("graft_nfc and graft_zorder_key SQL functions match the Column DSL") {
    graft.functions.Registry.register(spark)
    Seq(("e\u0301colo", 3L, 5L)).toDF("t", "a", "b").createOrReplaceTempView("sqlreg_t")
    val r = spark.sql(
      """SELECT graft_nfc(t) AS nfc, graft_nfc(t, 'NFKC') AS nfkc,
        |       graft_zorder_key(8, a, b) AS z FROM sqlreg_t""".stripMargin).head()
    assert(r.getString(0) == "\u00e9colo" && r.getString(1) == "\u00e9colo")
    assert(r.getLong(2) == mortonRef(Seq(3L, 5L), 8))
    // bits must be a literal; non-literal errors loudly
    intercept[Exception](spark.sql(
      "SELECT graft_zorder_key(a, a, b) FROM sqlreg_t").collect())
    // distinct-shingle count: default n=3 and explicit n=2
    Seq(Tuple1("a b c a b c a b c")).toDF("t").createOrReplaceTempView("sqlreg_s")
    val sh = spark.sql(
      """SELECT graft_distinct_shingles(t) AS s3,
        |       graft_distinct_shingles(t, 2) AS s2 FROM sqlreg_s""".stripMargin).head()
    assert(sh.getLong(0) == graft.dedup.Dedup.shingleSet("a b c a b c a b c", 3).size)
    assert(sh.getLong(1) == graft.dedup.Dedup.shingleSet("a b c a b c a b c", 2).size)
  }

  // ─── BloomDedup ───

  test("BloomDedup.novelOnly: zero duplicate leakage, bounded novel loss") {
    val history = (0 until 5000).map(i => (i.toLong, s"history doc $i body"))
      .toDF("doc_id", "text")
    val dups = (0 until 2500).map(i => (10000L + i, s"history doc $i body"))
    val novel = (0 until 2500).map(i => (20000L + i, s"novel doc $i body"))
    val incoming = (dups ++ novel).toDF("doc_id", "text")

    val bf = BloomDedup.buildFilter(history, "text", expectedItems = 5000L, fpp = 0.01)
    val out = BloomDedup.novelOnly(incoming, bf, "text")
      .select($"doc_id").as[Long].collect().toSet
    // no false negatives: every true dup is filtered out
    assert(out.forall(_ >= 20000L), "a duplicate leaked through the bloom filter")
    // false positives bounded: keep ≥ (1 - 5×fpp) of novel rows
    assert(out.size >= (2500 * 0.95).toInt, s"kept only ${out.size} of 2500 novel")
  }

  test("BloomDedup: empty history passes the whole first batch through (bootstrap ingest)") {
    val history = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val incoming = (0 until 50).map(i => (i.toLong, s"first batch $i")).toDF("doc_id", "text")
    val bf = BloomDedup.buildFilter(history, "text", expectedItems = 1000L)
    assert(bf != null, "empty history must yield a real empty filter, not SQL NULL")
    assert(BloomDedup.novelOnly(incoming, bf, "text").count() == 50L)
    assert(BloomDedup.novelLossless(history, incoming, "text", 1000L).count() == 50L)
  }

  test("BloomDedup: sizing above Spark's runtime-filter conf caps is honored, not clamped") {
    // 10M items at 1% fpp needs ~95.9M bits — past the default 67.1M
    // maxNumBits cap; without the conf raise the aggregate silently
    // truncates and buildFilter's size check throws
    val history = (0 until 100).map(i => (i.toLong, s"h $i")).toDF("doc_id", "text")
    val bf = BloomDedup.buildFilter(history, "text", expectedItems = 10000000L, fpp = 0.01)
    assert(bf.length.toLong * 8 > 90000000L, s"filter is ${bf.length * 8L} bits")
    // and it still behaves: the 100 known docs are all positive
    val stillDup = BloomDedup.novelOnly(history, bf, "text").count()
    assert(stillDup == 0L)
  }

  test("BloomDedup composes with Structured Streaming: history filter on an ingest stream") {
    // The membership predicate is a stateless per-row codegen filter,
    // so it drops straight into a streaming pipeline — the shape of
    // "dedup the live crawl against yesterday's corpus" with NO
    // streaming state beyond the broadcast-sized filter literal.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val history = (0 until 2000).map(i => (i.toLong, s"seen before $i"))
      .toDF("doc_id", "text")
    val bf = BloomDedup.buildFilter(history, "text", expectedItems = 2000L)
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    stream.addData((0 until 500).map(i => (10000L + i, s"seen before $i")) ++ // dups
      (0 until 500).map(i => (20000L + i, s"brand new $i")))                  // novel
    val out = BloomDedup.novelOnly(
      stream.toDS().toDF("doc_id", "text"), bf, "text")
    val q = out.writeStream.format("memory").queryName("bloom_stream")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val ids = spark.table("bloom_stream").select($"doc_id").as[Long].collect().toSet
    assert(ids.forall(_ >= 20000L), "a known duplicate leaked into the stream output")
    assert(ids.size >= 490, s"kept only ${ids.size} of 500 novel (fpp bound)")
  }

  test("BloomDedup.novelLossless recovers false-positive novel rows exactly") {
    val history = (0 until 3000).map(i => (i.toLong, s"h $i")).toDF("doc_id", "text")
    val incoming = ((0 until 1500).map(i => (10000L + i, s"h $i")) ++
      (0 until 1500).map(i => (20000L + i, s"n $i"))).toDF("doc_id", "text")
    val out = BloomDedup.novelLossless(history, incoming, "text", expectedItems = 3000L)
      .select($"doc_id").as[Long].collect().toSet
    assert(out == (0 until 1500).map(20000L + _).toSet) // exactly the novel half
  }
}
