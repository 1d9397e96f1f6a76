package graft.search

import graft.ann.Ann.IvfModel
import graft.search.PackedIndex.{CellBlock, VecBlock}

/** Resident serving path over a packed collection (VERDICT r3 §Next #1).
  *
  * The reference answers ONE query in 0.2–0.5 ms from its in-process
  * HNSW (`/root/reference/README.md` perf table); a Spark job — however
  * well-packed — pays a per-job scheduling floor of tens of ms, which is
  * fine for fleets (amortized) and 100× too slow for one interactive
  * query. This class closes that gap for collections that fit in driver
  * memory: it holds the SAME [[PackedIndex.VecBlock]]s /
  * [[PackedIndex.CellBlock]]s the distributed index scores and answers
  * queries by running [[Kernels.scoreTile]] locally — zero jobs, zero
  * scheduling, sub-ms at 100k × 64-D.
  *
  * Fleet results (nq ≥ 2) are bit-identical to the distributed path: the
  * blocks are the same bytes, [[Kernels.scoreTile]] is the same code
  * (row-independent arithmetic — thread chunking cannot change any
  * score), and the final merge applies the same `(score DESC, id ASC)`
  * rank. Single-query calls route to the faster [[Kernels.scoreSingle]]
  * (vectorized float lanes, different summation order): same ids/ranks
  * except near-ties, scores within the float tolerance documented on
  * [[Kernels.scoreTile]] (grows with dimension — ~1e-6 relative at
  * 64-D).
  *
  * Scale stance: this is the SERVING tier, deliberately bounded by
  * `maxBytes` (default 4 GiB ≈ 4 B rows at 64-D... practically: 15M
  * rows of 64-D floats). A collection that exceeds the cap stays on the
  * distributed [[PackedIndex]] path ([[ServingSession.fromExact]]
  * returns None and the caller falls back) — the cluster remains the
  * source of truth; this is a driver-held replica of a bounded working
  * set, the same trade a broadcast join makes.
  *
  * Thread-safety: a search allocates its own heaps/scratch; concurrent
  * searches share only the immutable blocks.
  */
object ServingSession {

  /** Default per-collection resident-footprint cap. Single source of
    * truth for the serving-tier budget — the engine cache
    * ([[graft.engine.FusionEngine]].DefaultServingBytes) aliases it. */
  val DefaultMaxBytes: Long = 4L << 30

  /** Work units (rows × queries) below this score single-threaded — the
    * fork-join handoff costs more than the scan itself. A 1-query search
    * of 2k rows stays inline; 10k+ rows (or any real fleet) fan out —
    * review r4 found the old 32k threshold kept the bench's own
    * 25k-row IVF probes sequential, slower than the exact parallel
    * scan of 4× the rows. */
  private val ParallelWorkThreshold = 8 * 1024

  /** Minimum row-equivalents of scan work per parallel worker. Fan-out
    * is work-proportional, not core-count-proportional. Measured with
    * `graft.tools.ServingProbe` (r9 box, dim 64): at 10k rows the scan
    * is cache-resident and task-fork cost dominates — 2 workers beat
    * 10 by ~25% (0.27 vs 0.37 ms p50); at 100k+ the scan is
    * DRAM-bound and memory-level parallelism wins — 24-32 workers sit
    * at the p50 minimum and fewer workers lose linearly. 4096 hits the
    * measured optimum at every probed scale (10k→2, 100k→24, 1M→32
    * workers). Overridable via `-Dgraft.serving.minRowsPerWorker` for
    * hosts where the fork-cost/bandwidth balance moves. */
  private def minRowsPerWorker: Long =
    try sys.props.getOrElse("graft.serving.minRowsPerWorker", "4096").toLong
    catch { case _: Throwable => 4096L }

  /** Worker count for `workRows` row-equivalents over `nBlocks` blocks:
    * capped by cores, blocks, and one worker per [[minRowsPerWorker]]. */
  private def workersFor(workRows: Long, nBlocks: Int): Int =
    math.min(
      math.min(Runtime.getRuntime.availableProcessors(), math.max(1, nBlocks)),
      math.max(1, (workRows / math.max(1L, minRowsPerWorker)).toInt))

  private def rank(heaps: Array[Kernels.TopKHeap], qids: Array[Long],
                   k: Int): Seq[(Long, Long, Double, Int)] = {
    val out = Vector.newBuilder[(Long, Long, Double, Int)]
    var qi = 0
    while (qi < qids.length) {
      val buf = new scala.collection.mutable.ArrayBuffer[(Double, Long)](heaps(qi).size)
      heaps(qi).foreachEntry((s, id) => buf += ((s, id)))
      val sorted = buf.sortBy { case (s, id) => (-s, id) }
      var r = 0
      while (r < sorted.length && r < k) {
        out += ((qids(qi), sorted(r)._2, sorted(r)._1, r + 1))
        r += 1
      }
      qi += 1
    }
    out.result()
  }

  /** Merge worker-local heaps into `into` (same tie-breaking as the
    * distributed driver merge). */
  private def mergeInto(into: Array[Kernels.TopKHeap], from: Array[Kernels.TopKHeap]): Unit = {
    var qi = 0
    while (qi < into.length) {
      val dst = into(qi)
      from(qi).foreachEntry((s, id) => dst.offer(s, id))
      qi += 1
    }
  }

  /** Driver-local exact index: every block of the collection, scored
    * in-process. */
  final class Exact private[ServingSession] (val blocks: Array[VecBlock],
                                             val dim: Int, val n: Long) {

    /** Top-k per query: `(qid, id, score, rank)` — same rows the
      * distributed [[PackedIndex.Exact.search]] returns, no job.
      * Single-query calls route to [[Kernels.scoreSingle]] (vectorized
      * float lanes; near-tied ranks may differ from the fleet tile /
      * declarative paths within the documented float tolerance). */
    def search(queries: Seq[(Long, Array[Double])], k: Int,
               m: VectorSearch.Metric = VectorSearch.Cosine): Seq[(Long, Long, Double, Int)] = {
      val qids = queries.map(_._1).toArray
      val qVecs = queries.map(_._2.map(_.toFloat)).toArray
      if (qids.isEmpty || blocks.isEmpty) return Seq.empty
      val code = m match {
        case VectorSearch.Cosine => Kernels.MetricCosine
        case VectorSearch.CosineUnit => Kernels.MetricCosineUnit
        case VectorSearch.DotProduct => Kernels.MetricDot
        case VectorSearch.Euclidean => Kernels.MetricEuclidean
      }
      if (qids.length == 1) return searchSingle(qids(0), qVecs(0), k, code)
      // row-equivalents: each block row is scored against every query
      val nThreads = workersFor(n * qids.length, blocks.length)
      val heaps =
        if (n * qids.length < ParallelWorkThreshold || nThreads <= 1) {
          val qp = Kernels.packQueries(qVecs)
          val hs = Array.fill(qids.length)(new Kernels.TopKHeap(k))
          val out = new Array[Float](qids.length)
          var b = 0
          while (b < blocks.length) {
            val blk = blocks(b)
            Kernels.scoreTile(code, qp, blk.xs, blk.ids, blk.ids.length, hs, out, blk.norm2)
            b += 1
          }
          hs
        } else {
          // strided block chunks on the common FJ pool; the query pack
          // is immutable and read-only — built ONCE and shared by all
          // workers (review r4: packing per worker repeated the fleet
          // transpose nThreads times); worker-local heaps merged with
          // the same tie-breaking as the final rank
          val qp = Kernels.packQueries(qVecs)
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val hs = Array.fill(qids.length)(new Kernels.TopKHeap(k))
              val out = new Array[Float](qids.length)
              var b = t
              while (b < blocks.length) {
                val blk = blocks(b)
                Kernels.scoreTile(code, qp, blk.xs, blk.ids, blk.ids.length, hs, out, blk.norm2)
                b += nThreads
              }
              hs
            }
            .collect(java.util.stream.Collectors.toList[Array[Kernels.TopKHeap]])
          val merged = Array.fill(qids.length)(new Kernels.TopKHeap(k))
          workers.forEach(w => mergeInto(merged, w))
          merged
        }
      rank(heaps, qids, k)
    }

    /** One interactive query: `(id, score, rank)` top-k. */
    def searchOne(q: Array[Double], k: Int,
                  m: VectorSearch.Metric = VectorSearch.Cosine): Seq[(Long, Double, Int)] =
      search(Seq((0L, q)), k, m).map { case (_, id, s, r) => (id, s, r) }

    private def searchSingle(qid: Long, qv: Array[Float], k: Int,
                             code: Int): Seq[(Long, Long, Double, Int)] = {
      var n2 = 0.0
      var d = 0
      while (d < qv.length) { n2 += qv(d).toDouble * qv(d); d += 1 }
      val invNorm = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
      val nThreads = workersFor(n, blocks.length)
      val heaps =
        if (n < ParallelWorkThreshold || nThreads <= 1) {
          val h = new Kernels.TopKHeap(k)
          var b = 0
          while (b < blocks.length) {
            val blk = blocks(b)
            Kernels.scoreSingle(code, qv, invNorm, n2, blk.xs, blk.ids,
              blk.ids.length, blk.norm2, h)
            b += 1
          }
          Array(h)
        } else {
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val h = new Kernels.TopKHeap(k)
              var b = t
              while (b < blocks.length) {
                val blk = blocks(b)
                Kernels.scoreSingle(code, qv, invNorm, n2, blk.xs, blk.ids,
                  blk.ids.length, blk.norm2, h)
                b += nThreads
              }
              h
            }
            .collect(java.util.stream.Collectors.toList[Kernels.TopKHeap])
          val merged = new Kernels.TopKHeap(k)
          workers.forEach(w => w.foreachEntry((s, id) => merged.offer(s, id)))
          Array(merged)
        }
      rank(heaps, Array(qid), k)
    }
  }

  /** Driver-local SQ8 index: every code block of the collection,
    * scored in-process — the 4×-compressed rung between the float
    * [[Exact]] session and the PQ-8B [[IvfPq]] one (VERDICT r14 #4:
    * the FAISS-SQ8 serving point). Every row is visited (exact scan);
    * scoring is the SYMMETRIC integer cosine ([[Kernels.scoreSq8Tile]]
    * — query quantized once per search, scales cancel), so scores
    * carry both quantization errors; recall contract pinned in
    * ServingRecallSpec. Cosine-only, like the other compressed
    * sessions. */
  final class Sq8 private[ServingSession] (
      val blocks: Array[PackedIndex.Sq8Block], val dim: Int, val n: Long) {

    def search(queries: Seq[(Long, Array[Double])],
               k: Int): Seq[(Long, Long, Double, Int)] = {
      val qids = queries.map(_._1).toArray
      val qVecs = queries.map(_._2.map(_.toFloat)).toArray
      if (qids.isEmpty || blocks.isEmpty) return Seq.empty
      if (qids.length == 1) return searchSingle(qids(0), qVecs(0), k)
      val nThreads = workersFor(n * qids.length, blocks.length)
      val heaps =
        if (n * qids.length < ParallelWorkThreshold || nThreads <= 1) {
          val qp = Kernels.packSq8Queries(qVecs)
          val hs = Array.fill(qids.length)(new Kernels.TopKHeap(k))
          val out = new Array[Int](qids.length)
          var b = 0
          while (b < blocks.length) {
            val blk = blocks(b)
            Kernels.scoreSq8Tile(qp, blk.codes, blk.scales, blk.ids,
              blk.ids.length, hs, out, blk.norm2)
            b += 1
          }
          hs
        } else {
          val qp = Kernels.packSq8Queries(qVecs)
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val hs = Array.fill(qids.length)(new Kernels.TopKHeap(k))
              val out = new Array[Int](qids.length)
              var b = t
              while (b < blocks.length) {
                val blk = blocks(b)
                Kernels.scoreSq8Tile(qp, blk.codes, blk.scales, blk.ids,
                  blk.ids.length, hs, out, blk.norm2)
                b += nThreads
              }
              hs
            }
            .collect(java.util.stream.Collectors.toList[Array[Kernels.TopKHeap]])
          val merged = Array.fill(qids.length)(new Kernels.TopKHeap(k))
          workers.forEach(w => mergeInto(merged, w))
          merged
        }
      rank(heaps, qids, k)
    }

    def searchOne(q: Array[Double], k: Int): Seq[(Long, Double, Int)] =
      search(Seq((0L, q)), k).map { case (_, id, s, r) => (id, s, r) }

    private def searchSingle(qid: Long, qv: Array[Float],
                             k: Int): Seq[(Long, Long, Double, Int)] = {
      val sq = Kernels.quantizeSq8Query(qv)
      val nThreads = workersFor(n, blocks.length)
      val heaps =
        if (n < ParallelWorkThreshold || nThreads <= 1) {
          val h = new Kernels.TopKHeap(k)
          var b = 0
          while (b < blocks.length) {
            val blk = blocks(b)
            Kernels.scoreSq8Single(sq, blk.codes, blk.scales,
              blk.ids, blk.ids.length, blk.norm2, h)
            b += 1
          }
          Array(h)
        } else {
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val h = new Kernels.TopKHeap(k)
              var b = t
              while (b < blocks.length) {
                val blk = blocks(b)
                Kernels.scoreSq8Single(sq, blk.codes, blk.scales,
                  blk.ids, blk.ids.length, blk.norm2, h)
                b += nThreads
              }
              h
            }
            .collect(java.util.stream.Collectors.toList[Kernels.TopKHeap])
          val merged = new Kernels.TopKHeap(k)
          workers.forEach(w => w.foreachEntry((s, id) => merged.offer(s, id)))
          Array(merged)
        }
      rank(heaps, Array(qid), k)
    }
  }

  /** Driver-local IVF index: per-cell blocks, probe-pruned scoring. */
  final class Ivf private[ServingSession] (val model: IvfModel,
                                           val cellBlocks: Array[Array[CellBlock]],
                                           val dim: Int) {

    /** Cosine top-k per query over the probed cells only (per-query
      * [[Kernels.scoreSingle]] — the probe set differs per query, so the
      * fleet tile shape does not apply). */
    def search(queries: Seq[(Long, Seq[Double])], k: Int,
               nProbe: Int): Seq[(Long, Long, Double, Int)] = {
      val qArr = queries.toArray
      val qids = qArr.map(_._1)
      if (qids.isEmpty) return Seq.empty
      val heaps = Array.fill(qids.length)(new Kernels.TopKHeap(k))
      var qi = 0
      while (qi < qArr.length) {
        val qv = qArr(qi)._2.toArray
        val qf = qv.map(_.toFloat)
        var n2 = 0.0
        var d = 0
        while (d < qf.length) { n2 += qf(d).toDouble * qf(d); d += 1 }
        val invNorm = if (n2 > 0) 1.0 / math.sqrt(n2) else 0.0
        val h = heaps(qi)
        // gather the probed blocks, then fan out when the probed work is
        // large enough (a 100k-collection probe at 25% scans ~25k rows —
        // single-threaded it costs more than the exact parallel scan)
        val probed = scala.collection.mutable.ArrayBuffer.empty[CellBlock]
        var probedRows = 0L
        model.nearestCells(qv, nProbe).foreach { c =>
          if (c >= 0 && c < cellBlocks.length)
            cellBlocks(c).foreach { b => probed += b; probedRows += b.ids.length }
        }
        val nThreads = workersFor(probedRows, probed.length)
        if (probedRows < ParallelWorkThreshold || nThreads <= 1) {
          probed.foreach(blk => Kernels.scoreSingle(Kernels.MetricCosine, qf,
            invNorm, n2, blk.xs, blk.ids, blk.ids.length, blk.norm2, h))
        } else {
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val wh = new Kernels.TopKHeap(k)
              var b = t
              while (b < probed.length) {
                val blk = probed(b)
                Kernels.scoreSingle(Kernels.MetricCosine, qf, invNorm, n2,
                  blk.xs, blk.ids, blk.ids.length, blk.norm2, wh)
                b += nThreads
              }
              wh
            }
            .collect(java.util.stream.Collectors.toList[Kernels.TopKHeap])
          workers.forEach(w => w.foreachEntry((s, id) => h.offer(s, id)))
        }
        qi += 1
      }
      rank(heaps, qids, k)
    }

    def searchOne(q: Seq[Double], k: Int, nProbe: Int): Seq[(Long, Double, Int)] =
      search(Seq((0L, q)), k, nProbe).map { case (_, id, s, r) => (id, s, r) }
  }

  /** Driver-local IVF×SQ8 index: per-cell SQ8 code blocks, probe-pruned
    * int8 scoring — the FAISS `IVF,SQ8` serving point (VERDICT r15 #5).
    * Per-query [[Kernels.scoreSq8Single]] (the probe set differs per
    * query, so the fleet tile shape does not apply — same stance as
    * [[Ivf]]); the query quantizes ONCE and is reused across its probed
    * blocks. Recall composes the cell-miss and quantization losses;
    * floor pinned in ServingRecallSpec. */
  final class IvfSq8 private[ServingSession] (
      val model: IvfModel,
      val cellBlocks: Array[Array[PackedIndex.Sq8CellBlock]], val dim: Int) {

    def search(queries: Seq[(Long, Seq[Double])], k: Int,
               nProbe: Int): Seq[(Long, Long, Double, Int)] = {
      val qArr = queries.toArray
      val qids = qArr.map(_._1)
      if (qids.isEmpty) return Seq.empty
      val heaps = Array.fill(qids.length)(new Kernels.TopKHeap(k))
      var qi = 0
      while (qi < qArr.length) {
        val qv = qArr(qi)._2.toArray
        val sq = Kernels.quantizeSq8Query(qv.map(_.toFloat))
        val h = heaps(qi)
        val probed = scala.collection.mutable.ArrayBuffer.empty[PackedIndex.Sq8CellBlock]
        var probedRows = 0L
        model.nearestCells(qv, nProbe).foreach { c =>
          if (c >= 0 && c < cellBlocks.length)
            cellBlocks(c).foreach { b => probed += b; probedRows += b.ids.length }
        }
        val nThreads = workersFor(probedRows, probed.length)
        if (probedRows < ParallelWorkThreshold || nThreads <= 1) {
          probed.foreach(blk => Kernels.scoreSq8Single(sq, blk.codes, blk.scales,
            blk.ids, blk.ids.length, blk.norm2, h))
        } else {
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val wh = new Kernels.TopKHeap(k)
              var b = t
              while (b < probed.length) {
                val blk = probed(b)
                Kernels.scoreSq8Single(sq, blk.codes, blk.scales,
                  blk.ids, blk.ids.length, blk.norm2, wh)
                b += nThreads
              }
              wh
            }
            .collect(java.util.stream.Collectors.toList[Kernels.TopKHeap])
          workers.forEach(w => w.foreachEntry((s, id) => h.offer(s, id)))
        }
        qi += 1
      }
      rank(heaps, qids, k)
    }

    def searchOne(q: Seq[Double], k: Int, nProbe: Int): Seq[(Long, Double, Int)] =
      search(Seq((0L, q)), k, nProbe).map { case (_, id, s, r) => (id, s, r) }
  }

  /** Driver-local IVF-PQ index: per-cell CODE blocks scored by ADC —
    * `m` bytes/vector instead of `4·dim`, so the same [[DefaultMaxBytes]]
    * budget holds ~32× more rows (64-D, m=8) than the float sessions.
    * Scores are the quantized cosine; callers needing exact ordering
    * re-rank the candidates against the source table
    * ([[graft.ann.Pq.refine]] / [[PackedIndex.IvfPq.searchRefined]]). */
  final class IvfPq private[ServingSession] (
      val ivf: graft.ann.Ann.IvfModel, val pq: graft.ann.Pq.PqModel,
      val cellBlocks: Array[Array[PackedIndex.PqCellBlock]],
      val residual: Boolean = false) {

    def search(queries: Seq[(Long, Seq[Double])], k: Int,
               nProbe: Int): Seq[(Long, Long, Double, Int)] = {
      val qArr = queries.toArray
      val qids = qArr.map(_._1)
      if (qids.isEmpty) return Seq.empty
      val heaps = Array.fill(qids.length)(new Kernels.TopKHeap(k))
      val m = pq.m
      var qi = 0
      while (qi < qArr.length) {
        val qv = qArr(qi)._2.toArray
        val qf = graft.ann.Pq.l2normalize(qv.map(_.toFloat))
        val lut = pq.lookupTable(qf)
        val h = heaps(qi)
        // gather the probed blocks (with the residual dot(q, centroid)
        // per-cell constant — see PackedIndex.IvfPq); fan out across
        // threads when the probed row count is large (a 10M-row probe
        // at 12.5% scans 1.25M codes — sequential it is ~30 ms, strided
        // it is ~ms; the LUT is read-only and shared, heaps merge per
        // worker)
        val probed = scala.collection.mutable.ArrayBuffer.empty[PackedIndex.PqCellBlock]
        val probedOff = scala.collection.mutable.ArrayBuffer.empty[Double]
        var probedRows = 0L
        ivf.nearestCells(qv, nProbe).foreach { c =>
          if (c >= 0 && c < cellBlocks.length) {
            val off = if (residual) PackedIndex.qDotCentroid(qf, ivf.centroids(c)) else 0.0
            cellBlocks(c).foreach { b =>
              probed += b; probedOff += off; probedRows += b.ids.length
            }
          }
        }
        @inline def scan(bi: Int, into: Kernels.TopKHeap): Unit = {
          val b = probed(bi)
          val off = probedOff(bi)
          val nRows = b.ids.length
          var r = 0
          while (r < nRows) {
            into.offer(off + pq.adcScore(lut, b.codes, r * m), b.ids(r))
            r += 1
          }
        }
        val nThreads = workersFor(probedRows, probed.length)
        if (probedRows < 64 * 1024 || nThreads <= 1) probed.indices.foreach(scan(_, h))
        else {
          val workers = java.util.stream.IntStream.range(0, nThreads).parallel()
            .mapToObj { t =>
              val wh = new Kernels.TopKHeap(k)
              var b = t
              while (b < probed.length) { scan(b, wh); b += nThreads }
              wh
            }
            .collect(java.util.stream.Collectors.toList[Kernels.TopKHeap])
          workers.forEach(w => w.foreachEntry((s, id) => h.offer(s, id)))
        }
        qi += 1
      }
      rank(heaps, qids, k)
    }

    def searchOne(q: Seq[Double], k: Int, nProbe: Int): Seq[(Long, Double, Int)] =
      search(Seq((0L, q)), k, nProbe).map { case (_, id, s, r) => (id, s, r) }
  }

  /** FLEET-throughput crossover (VERDICT r7 #4). The driver-resident
    * session is unbeatable for SINGLE queries at any resident size —
    * no per-job scheduling floor — but a fleet amortizes that floor
    * across its queries, and past roughly this many resident rows the
    * distributed scan's parallelism wins: r7 bench (64-D, local[32])
    * measured serving 2,866 vs distributed 984 QPS at 100k rows but
    * 215 vs 251 at 1M. Midpoint of the measured bracket; overridable
    * per [[routed]] call for machines where the bracket moves. */
  val FleetCrossoverRows: Long = 512 * 1024

  /** True when a fleet of `nq` queries over `n` rows is expected to run
    * faster on the distributed path than the driver-resident one. */
  def preferDistributedFleet(n: Long, nq: Int,
                             crossoverRows: Long = FleetCrossoverRows): Boolean =
    nq > 1 && n >= crossoverRows

  /** Both exact paths under ONE handle, dispatched per call
    * (VERDICT r7 #4: the 1M crossover was documented in the bench but
    * the caller had to read it — now the handle routes): single queries
    * and small-corpus fleets go driver-resident, fleets at or past
    * [[FleetCrossoverRows]] (or any call when the resident snapshot
    * was refused by the byte cap) go distributed. Both paths return
    * the same rows — same blocks, same kernel, same `(score DESC,
    * id ASC)` rank (see [[Exact]]'s parity note). */
  final class Routed private[ServingSession] (
      val idx: PackedIndex.Exact,
      val resident: Option[Exact],
      val crossoverRows: Long) {
    @volatile private var _lastPath: String = ""
    /** "resident" | "distributed" — which path answered the latest
      * search (bench/test observability). */
    def lastPath: String = _lastPath

    def search(queries: Seq[(Long, Array[Double])], k: Int,
               m: VectorSearch.Metric = VectorSearch.Cosine): Seq[(Long, Long, Double, Int)] =
      resident match {
        case Some(s) if !preferDistributedFleet(idx.n, queries.length, crossoverRows) =>
          _lastPath = "resident"
          s.search(queries, k, m)
        case _ =>
          _lastPath = "distributed"
          collectRanked(idx.search(queries, k, m), queries.map(_._1))
      }
  }

  /** Collect a distributed `(qid, id, score, rank)` result and order
    * it exactly like the resident sessions emit: input-query order,
    * rank ascending — so routed callers see identical row ORDER from
    * both dispatch paths, not just identical rows. Bounded: ≤ nq × k
    * rows. */
  private def collectRanked(df: org.apache.spark.sql.DataFrame,
                            qidOrder: Seq[Long]): Seq[(Long, Long, Double, Int)] = {
    val pos = qidOrder.zipWithIndex.toMap
    df.collect().iterator
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq
      .sortBy { case (qid, _, _, rank) => (pos.getOrElse(qid, Int.MaxValue), rank) }
  }

  /** Routed serving over a packed exact index: pulls the resident
    * snapshot when it fits `maxBytes`, and dispatches each search per
    * [[preferDistributedFleet]]. This is the handle fleet callers
    * should hold instead of choosing a path themselves.
    *
    * CONTRACT: routing picks among EXACT paths only — every dispatch
    * returns the same rank-identical `(score DESC, id ASC)` rows, so a
    * caller can never observe different RESULTS from different corpus
    * sizes, only different latency. That is deliberate: an IVF-backed
    * arm would be faster past the crossover (r8 bench @1M: IVF
    * snapshot 674 QPS recall-1.0 vs distributed-exact 310 QPS) but
    * silently switching a caller from exact to approximate results
    * based on data volume is an API trap. Callers who accept the
    * approximate contract opt in EXPLICITLY with [[routedIvf]] (or a
    * raw [[fromIvf]] / [[fromIvfPq]] session) — the bench's
    * `ivf_fleet_qps` column tracks what that opt-in buys each round. */
  def routed(idx: PackedIndex.Exact, maxBytes: Long = DefaultMaxBytes,
             crossoverRows: Long = FleetCrossoverRows): Routed =
    new Routed(idx, fromExact(idx, maxBytes), crossoverRows)

  /** [[routed]] over an ALREADY-collected resident snapshot — callers
    * that hold one (engine cache, bench) skip the second collect. */
  def routedWith(idx: PackedIndex.Exact, resident: Option[Exact],
                 crossoverRows: Long = FleetCrossoverRows): Routed =
    new Routed(idx, resident, crossoverRows)

  /** The EXPLICIT approximate opt-in [[Routed]]'s scaladoc points at:
    * one handle over both IVF paths. Dispatch is byte-cap only — no
    * fleet crossover, because the resident IVF scan touches probed
    * cells only and stays ahead of the cluster path at every measured
    * size (r9 bench @1M: resident IVF fleet 720 QPS vs 309 for the
    * routed exact handle's distributed dispatch); the only reason to
    * leave the driver is the snapshot not fitting `maxBytes`. Both
    * paths run the same probes and kernel: identical ids/ranks, scores
    * within the documented float tolerance (PackedIndexSpec). Results
    * are APPROXIMATE at the configured `nProbe` — callers hold this
    * handle only when they accept that contract. */
  final class RoutedIvf private[ServingSession] (
      val idx: PackedIndex.Ivf,
      val resident: Option[Ivf]) {
    @volatile private var _lastPath: String = ""
    /** "resident" | "distributed" — which path answered the latest
      * search (bench/test observability). */
    def lastPath: String = _lastPath

    def search(queries: Seq[(Long, Seq[Double])], k: Int,
               nProbe: Int): Seq[(Long, Long, Double, Int)] =
      resident match {
        case Some(s) =>
          _lastPath = "resident"
          s.search(queries, k, nProbe)
        case None =>
          _lastPath = "distributed"
          collectRanked(idx.search(queries, k, nProbe), queries.map(_._1))
      }
  }

  /** Routed approximate serving over a packed IVF index — see
    * [[RoutedIvf]] for the contract. */
  def routedIvf(idx: PackedIndex.Ivf, maxBytes: Long = DefaultMaxBytes): RoutedIvf =
    new RoutedIvf(idx, fromIvf(idx, maxBytes))

  /** The SQ8 twin of [[RoutedIvf]]: one handle over both SQ8 paths,
    * dispatch byte-cap only (the resident scan visits every row, so
    * no probe/crossover subtlety — leave the driver only when the
    * snapshot doesn't fit `maxBytes`). Results are APPROXIMATE by the
    * quantization step — callers hold this handle only when they
    * accept that contract (same explicit-opt-in stance as
    * [[routedIvf]]); both paths run the same blocks and kernel, so a
    * dispatch flip never changes the rows. */
  final class RoutedSq8 private[ServingSession] (
      val idx: PackedIndex.Sq8,
      val resident: Option[Sq8]) {
    @volatile private var _lastPath: String = ""
    /** "resident" | "distributed" — which path answered the latest
      * search (bench/test observability). */
    def lastPath: String = _lastPath

    def search(queries: Seq[(Long, Array[Double])],
               k: Int): Seq[(Long, Long, Double, Int)] =
      resident match {
        case Some(s) =>
          _lastPath = "resident"
          s.search(queries, k)
        case None =>
          _lastPath = "distributed"
          collectRanked(idx.search(queries, k), queries.map(_._1))
      }
  }

  /** Routed quantized serving over a packed SQ8 index — see
    * [[RoutedSq8]] for the contract.
    *
    * ROUTING NOTE (VERDICT r16 #3): the full-scan SQ8 rung exists for
    * the 4× byte cap, not for latency — it still visits every row. A
    * deployment that accepts SQ8's quantization already accepts
    * [[routedIvfSq8]]'s, which prunes to probed cells and superseded
    * the full scan at every measured scale (1.13 ms vs 13.45 ms @1M
    * in BENCH_r16; recall 1.0 at the graded config). Above ~10⁶ rows
    * prefer `routedIvfSq8` (or `routedIvf` when float residency fits);
    * hold THIS handle when the corpus is small enough that scan
    * latency is immaterial or when cells cannot be trained (streaming
    * cold-start). The r17 int-query kernel pass (see
    * [[Kernels.scoreSq8Single]]) narrows the gap but does not change
    * the ranking — a pruned scan beats a full one. */
  def routedSq8(idx: PackedIndex.Sq8, maxBytes: Long = DefaultMaxBytes): RoutedSq8 =
    new RoutedSq8(idx, fromSq8(idx, maxBytes))

  /** The composed twin: one handle over both IVF×SQ8 paths. Dispatch is
    * byte-cap only (same reasoning as [[RoutedIvf]] — the resident scan
    * touches probed cells only and never loses to the cluster path at
    * resident sizes); results are APPROXIMATE both by nProbe and by the
    * int8 step — callers hold this handle only when they accept that
    * composed contract. Both paths run the same probes, blocks and
    * kernel, so a dispatch flip never changes the rows. */
  final class RoutedIvfSq8 private[ServingSession] (
      val idx: PackedIndex.IvfSq8,
      val resident: Option[IvfSq8]) {
    @volatile private var _lastPath: String = ""
    /** "resident" | "distributed" — which path answered the latest
      * search (bench/test observability). */
    def lastPath: String = _lastPath

    def search(queries: Seq[(Long, Seq[Double])], k: Int,
               nProbe: Int): Seq[(Long, Long, Double, Int)] =
      resident match {
        case Some(s) =>
          _lastPath = "resident"
          s.search(queries, k, nProbe)
        case None =>
          _lastPath = "distributed"
          collectRanked(idx.search(queries, k, nProbe), queries.map(_._1))
      }
  }

  /** Routed cell-pruned-quantized serving over a packed IVF×SQ8 index —
    * see [[RoutedIvfSq8]] for the contract. */
  def routedIvfSq8(idx: PackedIndex.IvfSq8, maxBytes: Long = DefaultMaxBytes): RoutedIvfSq8 =
    new RoutedIvfSq8(idx, fromIvfSq8(idx, maxBytes))

  /** Estimated driver bytes for a packed collection: floats + ids +
    * norms per row. */
  private def exactBytes(n: Long, dim: Int): Long = n * (dim.toLong * 4 + 8 + 8)

  /** Driver bytes for a PQ-coded collection: codes + ids per row. */
  private def pqBytes(n: Long, m: Int): Long = n * (m.toLong + 8)

  /** Driver bytes for an SQ8 collection: codes + id + scale + norm
    * per row — ~4× under [[exactBytes]] at serving dims. */
  private def sq8Bytes(n: Long, dim: Int): Long = n * (dim.toLong + 8 + 8 + 8)

  /** Pack driver-resident rows into an [[Exact]] session directly — the
    * engine's serving-cache path, no RDD round-trip. Rows with null or
    * dimension-mismatched vectors are skipped (same stance as the
    * distributed pack). */
  def fromLocalRows(rows: Iterator[(Long, Array[Float])], dim: Int): Exact = {
    val blocks = PackedIndex.packRows(rows, dim).toArray
    val n = blocks.iterator.map(_.ids.length.toLong).sum
    new Exact(blocks, dim, n)
  }

  /** Compact collected blocks into full [[Kernels.TileRows]]-row tiles:
    * a Spark-partitioned source yields rows/partitions-sized fragments
    * (63-row blocks for 2k rows on 32 partitions), and per-block call
    * overhead + lost locality measurably tax small-collection serving.
    * Row ORDER is preserved, so scores, tie-breaks and results are
    * unchanged — only the block boundaries move. */
  private def repack(blocks: Array[VecBlock], dim: Int): Array[VecBlock] = {
    var total = 0L
    blocks.foreach(b => total += b.ids.length)
    if (total == 0) return Array.empty
    val out = Array.newBuilder[VecBlock]
    var dstN = math.min(Kernels.TileRows.toLong, total).toInt
    var dIds = new Array[Long](dstN)
    var dXs = new Array[Float](dstN * dim)
    var dN2 = new Array[Double](dstN)
    var dPos = 0
    var remaining = total
    blocks.foreach { b =>
      var sPos = 0
      val sN = b.ids.length
      while (sPos < sN) {
        val copy = math.min(sN - sPos, dstN - dPos)
        System.arraycopy(b.ids, sPos, dIds, dPos, copy)
        System.arraycopy(b.norm2, sPos, dN2, dPos, copy)
        System.arraycopy(b.xs, sPos * dim, dXs, dPos * dim, copy * dim)
        sPos += copy
        dPos += copy
        if (dPos == dstN) {
          out += VecBlock(dIds, dXs, dN2)
          remaining -= dstN
          dstN = math.min(Kernels.TileRows.toLong, remaining).toInt
          if (dstN > 0) {
            dIds = new Array[Long](dstN)
            dXs = new Array[Float](dstN * dim)
            dN2 = new Array[Double](dstN)
          }
          dPos = 0
        }
      }
    }
    out.result()
  }

  /** Pull a distributed exact index's blocks to the driver when they fit
    * in `maxBytes`; None = stay on the cluster path (caller falls back to
    * [[PackedIndex.Exact.search]]). Blocks are compacted to full tiles
    * ([[repack]]) — same rows, same order, better serving locality. */
  def fromExact(idx: PackedIndex.Exact, maxBytes: Long = DefaultMaxBytes): Option[Exact] =
    if (idx.n <= 0 || exactBytes(idx.n, idx.dim) > maxBytes) None
    else Some(new Exact(repack(idx.blocks.collect(), idx.dim), idx.dim, idx.n))

  /** Pack driver-resident rows straight into an [[Sq8]] session — the
    * 4×-compressed analog of [[fromLocalRows]] (same quantization rule
    * as the distributed pack; bit-parity pinned in PackedIndexSpec). */
  def fromLocalRowsSq8(rows: Iterator[(Long, Array[Float])], dim: Int): Sq8 = {
    val blocks = PackedIndex.packSq8Rows(rows, dim).toArray
    val n = blocks.iterator.map(_.ids.length.toLong).sum
    new Sq8(blocks, dim, n)
  }

  /** Pull a distributed SQ8 index's code blocks to the driver when
    * they fit `maxBytes` — the same budget knob admits ~4× the rows
    * of [[fromExact]] (VERDICT r14 #4: the ladder rung between float32
    * and PQ-8B). None = stay on the cluster path. */
  def fromSq8(idx: PackedIndex.Sq8, maxBytes: Long = DefaultMaxBytes): Option[Sq8] =
    if (idx.n <= 0 || sq8Bytes(idx.n, idx.dim) > maxBytes) None
    else Some(new Sq8(idx.blocks.collect(), idx.dim, idx.n))

  /** Driver-resident PQ serving: collect the CODE blocks (tiny — the
    * whole point) and group by cell. Same budget knob as the float
    * sessions; at m=8 it admits ~400M rows before refusing. */
  def fromIvfPq(idx: PackedIndex.IvfPq, maxBytes: Long = DefaultMaxBytes): Option[IvfPq] = {
    if (idx.n <= 0 || pqBytes(idx.n, idx.pq.m) > maxBytes) None
    else {
      val all = idx.blocks.collect()
      val nCells = idx.ivf.nCells
      val grouped = Array.fill(nCells)(scala.collection.mutable.ArrayBuffer.empty[PackedIndex.PqCellBlock])
      all.foreach(b => if (b.cell >= 0 && b.cell < nCells) grouped(b.cell) += b)
      Some(new IvfPq(idx.ivf, idx.pq, grouped.map(_.toArray), idx.residual))
    }
  }

  /** Pull a distributed IVF×SQ8 index's code blocks to the driver when
    * they fit `maxBytes` — [[sq8Bytes]] sizing, so the same budget knob
    * admits ~4× the rows of [[fromIvf]]. None = stay on the cluster
    * path. */
  def fromIvfSq8(idx: PackedIndex.IvfSq8, maxBytes: Long = DefaultMaxBytes): Option[IvfSq8] = {
    if (idx.n <= 0 || sq8Bytes(idx.n, idx.dim) > maxBytes) None
    else {
      val all = idx.blocks.collect()
      val nCells = idx.model.nCells
      val grouped = Array.fill(nCells)(scala.collection.mutable.ArrayBuffer.empty[PackedIndex.Sq8CellBlock])
      all.foreach(b => if (b.cell >= 0 && b.cell < nCells) grouped(b.cell) += b)
      Some(new IvfSq8(idx.model, grouped.map(_.toArray), idx.dim))
    }
  }

  /** Same for an IVF index: cell blocks grouped by cell id. The size
    * guard uses the index's build-time row count, so nothing is
    * collected when the collection is over the cap. */
  def fromIvf(idx: PackedIndex.Ivf, maxBytes: Long = DefaultMaxBytes): Option[Ivf] = {
    if (idx.n <= 0 || exactBytes(idx.n, idx.dim) > maxBytes) None
    else {
      val all = idx.blocks.collect()
      val nCells = idx.model.nCells
      val grouped = Array.fill(nCells)(scala.collection.mutable.ArrayBuffer.empty[CellBlock])
      all.foreach(b => if (b.cell >= 0 && b.cell < nCells) grouped(b.cell) += b)
      Some(new Ivf(idx.model, grouped.map(_.toArray), idx.dim))
    }
  }
}
