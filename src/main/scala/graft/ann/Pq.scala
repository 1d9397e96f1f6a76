package graft.ann

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory-scale path for vector search.
  *
  * The IVF index ([[Ann]]/[[graft.search.PackedIndex]]) bounds *compute*
  * per query but still holds every vector as float32: 100 TB of raw
  * embeddings is 100 TB of executor storage. PQ bounds *memory*: each
  * vector is cut into `m` subvectors, each quantized to 1 byte against a
  * 256-entry per-subspace codebook, so a 64-D float vector (256 B)
  * becomes an `m`-byte code (8 B at m=8 — 32×). Queries score codes via
  * asymmetric distance computation (ADC): one `m × 256` lookup table of
  * partial dot products per query, then each row costs `m` table adds —
  * no float math per row at all (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011; the same layout FAISS's
  * `IVFPQ` uses).
  *
  * Scale shape: codebooks are tiny (m × 256 × dsub floats ≈ 64 KB) and
  * broadcast; encoding is one narrow pass; codes live either in a
  * column (`Array[Byte]`, parquet-friendly) or packed in RAM
  * ([[graft.search.PackedIndex.buildIvfPq]]). The full-precision
  * vectors can stay ON DISK: [[refine]] re-ranks only the ADC
  * candidates (≤ Q × k × refineFactor rows) against the parquet table —
  * the classic "codes in RAM, floats on disk" serving layout.
  *
  * Mirrors no reference operator (the reference keeps float vectors in
  * its in-process HNSW, `/root/reference/src/index/hnsw.js`); this is
  * part of the beyond-reference LLM-pipeline surface.
  */
object Pq {

  /** Trained PQ codebooks. `codebooks` is laid out
    * `[(sub * ksub + code) * dsub + j]`; `dim = m * dsub`.
    * `residual = true` marks codebooks trained on IVF-cell residuals
    * ([[Pq.trainResidual]]) — the flag travels WITH the model (and
    * through [[IndexStore]] artifacts) so encode/build sites cannot
    * silently pair residual codebooks with raw-space scoring. */
  final case class PqModel(m: Int, dsub: Int, ksub: Int, codebooks: Array[Float],
                           residual: Boolean = false) {
    def dim: Int = m * dsub
    /** Bytes per encoded vector (vs `4 * dim` for float32). */
    def bytesPerVector: Int = m

    /** Nearest code per subspace for one vector. */
    private[graft] def encodeOne(v: Array[Float], out: Array[Byte]): Unit = {
      var sub = 0
      while (sub < m) {
        val vOff = sub * dsub
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < ksub) {
          val cOff = (sub * ksub + c) * dsub
          var d2 = 0.0
          var j = 0
          while (j < dsub) {
            val d = v(vOff + j).toDouble - codebooks(cOff + j)
            d2 += d * d
            j += 1
          }
          if (d2 < bestD) { bestD = d2; best = c }
          c += 1
        }
        out(sub) = best.toByte
        sub += 1
      }
    }

    /** Reconstruction (decode) of a code — for diagnostics/tests. */
    def decode(code: Array[Byte]): Array[Float] = {
      val v = new Array[Float](dim)
      var sub = 0
      while (sub < m) {
        val cOff = (sub * ksub + (code(sub) & 0xff)) * dsub
        System.arraycopy(codebooks, cOff, v, sub * dsub, dsub)
        sub += 1
      }
      v
    }

    /** ADC lookup table for a query: `lut(sub * ksub + c)` = partial dot
      * of the query's sub-vector with codebook entry `c`. The ADC score
      * of a code is the sum of its `m` entries ≈ `dot(q, decode(code))`.
      * For unit-normalized inputs that is the cosine similarity. */
    def lookupTable(q: Array[Float]): Array[Float] = {
      val lut = new Array[Float](m * ksub)
      var sub = 0
      while (sub < m) {
        val qOff = sub * dsub
        var c = 0
        while (c < ksub) {
          val cOff = (sub * ksub + c) * dsub
          var s = 0f
          var j = 0
          while (j < dsub) { s += q(qOff + j) * codebooks(cOff + j); j += 1 }
          lut(sub * ksub + c) = s
          c += 1
        }
        sub += 1
      }
      lut
    }

    /** ADC score of one code against a prebuilt table. */
    @inline def adcScore(lut: Array[Float], codes: Array[Byte], off: Int): Double = {
      var s = 0f
      var sub = 0
      while (sub < m) {
        s += lut(sub * ksub + (codes(off + sub) & 0xff))
        sub += 1
      }
      s.toDouble
    }
  }

  /** Train PQ codebooks with seeded per-subspace Lloyd k-means on a
    * driver-collected sample (the standard protocol — FAISS trains on a
    * bounded sample too; codebooks generalize because subspace
    * distributions are stable). Deterministic: sample = first
    * `maxTrain` rows by id (TakeOrdered — no full sort), k-means++-style
    * seeding from `seed`. Subspaces train independently and in
    * parallel on the driver. */
  def train(df: DataFrame, vecCol: String, idCol: String, m: Int,
            ksub: Int = 256, maxTrain: Int = 20000, iters: Int = 12,
            seed: Long = 42L, normalize: Boolean = true): PqModel = {
    val spark = df.sparkSession
    import spark.implicits._
    val raw: Array[Array[Float]] = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .orderBy(col("id")) // TakeOrderedAndProject with the limit below
      .limit(maxTrain)
      .collect()
      .map { case (_, v) => if (normalize) l2normalize(v) else v }
    trainOnSample(raw, m, ksub, iters, seed)
  }

  /** Train RESIDUAL PQ codebooks — the proper IVF-PQ protocol (Jégou
    * et al. §IV; FAISS `IndexIVFPQ` default): quantize
    * `r = normalize(v) − centroid(cell(v))` instead of `v`. Residuals
    * have far less energy than raw vectors once cells capture the
    * coarse structure, so the same byte budget spends its 256 codes per
    * subspace on a much smaller volume — recall at equal `m` improves
    * on any corpus with real cluster structure. Scoring needs no extra
    * per-row work: `dot(q, v) = dot(q, centroid) + dot(q, r)`, so the
    * ADC table built on `q` still scores residual codes and the
    * per-cell constant `dot(q, centroid)` is added once per probe
    * ([[graft.search.PackedIndex.IvfPq]]).
    *
    * Input: `(id, v, cell)` from [[Ann.assignCells]] — the same table
    * [[encodeCells]] consumes. Sample protocol identical to [[train]]
    * (first `maxTrain` by id, deterministic).
    *
    * Residual mode assumes the IVF centroids live in the same space as
    * the normalized vectors — train [[Ann.trainIvf]] on unit-norm input
    * (the engine normalizes at write; raw corpora should pre-normalize)
    * or pass `normalize = false` here to residualize in raw space. */
  def trainResidual(cells: DataFrame, ivf: Ann.IvfModel, m: Int,
                    ksub: Int = 256, maxTrain: Int = 20000, iters: Int = 12,
                    seed: Long = 42L, normalize: Boolean = true): PqModel = {
    requireUnitSpace(ivf, normalize)
    val spark = cells.sparkSession
    import spark.implicits._
    val raw: Array[Array[Float]] = cells
      .select(col("id").cast("long"), col("v").cast("array<float>"), col("cell").cast("int"))
      .filter(col("v").isNotNull)
      .as[(Long, Array[Float], Int)]
      .orderBy(col("id"))
      .limit(maxTrain)
      .collect()
      .map { case (_, v, cell) =>
        residualize(if (normalize) l2normalize(v) else v, ivf, cell)
      }
    trainOnSample(raw, m, ksub, iters, seed).copy(residual = true)
  }

  /** Catch the residual-space mismatch loudly: with `normalize = true`
    * the IVF centroids must themselves live in unit space (a mean of
    * unit vectors has norm ≤ 1). Raw-space centroids (norms ≫ 1) would
    * produce residuals dominated by the centroid — quantization quality
    * silently collapses (observed as a recall REGRESSION before this
    * guard). */
  private def requireUnitSpace(ivf: Ann.IvfModel, normalize: Boolean): Unit =
    if (normalize) {
      val maxNorm = ivf.centroids.map(c => math.sqrt(c.map(x => x * x).sum)).max
      require(maxNorm <= 1.0 + 1e-3,
        f"residual PQ with normalize=true needs an IVF trained on unit-norm vectors " +
          f"(max centroid norm $maxNorm%.3f > 1) — normalize the corpus before trainIvf, " +
          "or pass normalize=false to residualize in raw space")
    }

  /** `normalize(v) − centroid(cell)`, guarding malformed cell ids (kept
    * raw — a bad assignment must not throw in a cleaning pass). */
  @inline private[graft] def residualize(vv: Array[Float], ivf: Ann.IvfModel,
                                         cell: Int): Array[Float] = {
    if (cell < 0 || cell >= ivf.nCells) vv
    else {
      val c = ivf.centroids(cell)
      if (c.length != vv.length) vv
      else {
        val out = new Array[Float](vv.length)
        var j = 0
        while (j < vv.length) { out(j) = (vv(j) - c(j)).toFloat; j += 1 }
        out
      }
    }
  }

  private def trainOnSample(raw: Array[Array[Float]], m: Int, ksub: Int,
                            iters: Int, seed: Long): PqModel = {
    require(raw.nonEmpty, "PQ training needs at least one vector")
    val dim = raw(0).length
    // dimension-mismatched rows are skipped, same stance as encodeCells
    // (a foreign row must not corrupt the codebooks)
    val sample = raw.filter(_.length == dim)
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val k = math.min(ksub, sample.length)
    val codebooks = new Array[Float](m * ksub * dsub)
    // per-subspace training, parallel on driver threads; a worker
    // failure is rethrown (a silently missing subspace would corrupt
    // every later encode)
    val firstError = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    val threads = (0 until m).map { sub =>
      val t = new Thread(() => try {
        val cents = lloyd(sample, sub * dsub, dsub, k, iters, seed + sub)
        // write into the shared array (disjoint ranges per subspace)
        var c = 0
        while (c < k) {
          System.arraycopy(cents, c * dsub, codebooks, (sub * ksub + c) * dsub, dsub)
          c += 1
        }
        // unused codebook slots (k < ksub) stay zero and are never
        // emitted by encodeOne's argmin over ksub... guard: restrict
        // argmin to k by duplicating the last centroid
        c = k
        while (c < ksub) {
          System.arraycopy(cents, (k - 1) * dsub, codebooks, (sub * ksub + c) * dsub, dsub)
          c += 1
        }
      } catch { case e: Throwable => firstError.compareAndSet(null, e); () })
      t.start(); t
    }
    threads.foreach(_.join())
    if (firstError.get() != null) throw firstError.get()
    PqModel(m, dsub, ksub, codebooks)
  }

  /** Seeded Lloyd iterations over `sample`'s `[off, off+dsub)` slice.
    * k-means++-style init: first center seeded-random, the rest chosen
    * as the farthest-from-current-centers sample (deterministic). */
  private def lloyd(sample: Array[Array[Float]], off: Int, dsub: Int,
                    k: Int, iters: Int, seed: Long): Array[Float] = {
    val n = sample.length
    val rnd = new scala.util.Random(seed)
    val cents = new Array[Float](k * dsub)
    // init: greedy farthest-point (deterministic given seed)
    val minD = Array.fill(n)(Double.MaxValue)
    var first = rnd.nextInt(n)
    System.arraycopy(sample(first), off, cents, 0, dsub)
    var c = 1
    while (c < k) {
      var far = 0
      var farD = -1.0
      var i = 0
      while (i < n) {
        val d = sqDistSlice(sample(i), off, cents, (c - 1) * dsub, dsub)
        if (d < minD(i)) minD(i) = d
        if (minD(i) > farD) { farD = minD(i); far = i }
        i += 1
      }
      System.arraycopy(sample(far), off, cents, c * dsub, dsub)
      c += 1
    }
    val assign = new Array[Int](n)
    val sums = new Array[Double](k * dsub)
    val counts = new Array[Int](k)
    var it = 0
    while (it < iters) {
      java.util.Arrays.fill(sums, 0.0)
      java.util.Arrays.fill(counts, 0)
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var cc = 0
        while (cc < k) {
          val d = sqDistSlice(sample(i), off, cents, cc * dsub, dsub)
          if (d < bestD) { bestD = d; best = cc }
          cc += 1
        }
        assign(i) = best
        counts(best) += 1
        var j = 0
        while (j < dsub) { sums(best * dsub + j) += sample(i)(off + j); j += 1 }
        i += 1
      }
      var cc = 0
      while (cc < k) {
        if (counts(cc) > 0) {
          var j = 0
          while (j < dsub) {
            cents(cc * dsub + j) = (sums(cc * dsub + j) / counts(cc)).toFloat
            j += 1
          }
        } else {
          // empty cluster: re-seed to a deterministic sample point
          System.arraycopy(sample(rnd.nextInt(n)), off, cents, cc * dsub, dsub)
        }
        cc += 1
      }
      it += 1
    }
    cents
  }

  @inline private def sqDistSlice(v: Array[Float], vOff: Int,
                                  cents: Array[Float], cOff: Int, dsub: Int): Double = {
    var s = 0.0
    var j = 0
    while (j < dsub) { val d = v(vOff + j).toDouble - cents(cOff + j); s += d * d; j += 1 }
    s
  }

  private[graft] def l2normalize(v: Array[Float]): Array[Float] = {
    var n2 = 0.0
    var i = 0
    while (i < v.length) { val x = v(i).toDouble; n2 += x * x; i += 1 }
    if (n2 <= 0) v
    else {
      val inv = 1.0 / math.sqrt(n2)
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) * inv).toFloat; i += 1 }
      out
    }
  }

  /** Encode every row to its `m`-byte PQ code — one narrow pass, model
    * broadcast in the closure (~64 KB). Input `(id, v, cell)` from
    * [[Ann.assignCells]]; output `(id, cell, code)`. Dimension-
    * mismatched rows are skipped (cleaning-engine stance, same as the
    * float kernels). Codes are parquet-friendly (`BINARY`) — at 100 TB
    * the encoded table is the ~3 TB one you can actually cache. */
  def encodeCells(cells: DataFrame, model: PqModel,
                  normalize: Boolean = true,
                  residualIvf: Option[Ann.IvfModel] = None): Dataset[(Long, Int, Array[Byte])] = {
    require(residualIvf.isDefined == model.residual,
      if (model.residual) "residual-trained PqModel needs residualIvf (the IVF its residuals were taken against)"
      else "raw-trained PqModel must not encode residuals — train with Pq.trainResidual instead")
    residualIvf.foreach(requireUnitSpace(_, normalize))
    val spark = cells.sparkSession
    import spark.implicits._
    cells.select(col("id").cast("long"), col("v").cast("array<float>"), col("cell").cast("int"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions { it =>
        it.flatMap { case (id, v, cell) =>
          if (v == null || v.length != model.dim) Iterator.empty
          else {
            var vv = if (normalize) l2normalize(v) else v
            residualIvf.foreach(ivf => vv = residualize(vv, ivf, cell))
            val code = new Array[Byte](model.m)
            model.encodeOne(vv, code)
            Iterator((id, cell, code))
          }
        }
      }
  }

  /** Exact re-rank of ADC candidates against the FULL-PRECISION source
    * table — the "codes in RAM, floats on disk" pattern: `cand` is the
    * bounded ADC output (≤ Q × k' rows), broadcast into a join that
    * touches only candidate rows of `df`, rescored with the exact
    * cosine expression and re-ranked per query. Returns
    * `(qid, id, score, rank)`, rank ≤ k, score exact. */
  def refine(df: DataFrame, vecCol: String, idCol: String,
             cand: DataFrame, queries: Seq[(Long, Array[Double])], k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qdf = queries.map { case (qid, qv) => (qid, qv.toSeq) }.toDF("qid", "qv")
    val src = df.select(col(idCol).cast("long").as("id"),
      col(vecCol).cast("array<double>").as("v"))
    val joined = src
      .join(broadcast(cand.select(col("qid").cast("long"), col("id").cast("long"))), Seq("id"))
      .join(broadcast(qdf), Seq("qid"))
      .withColumn("score", graft.functions.VectorFunctions.cosineSimilarity(col("v"), col("qv")))
    val w = Window.partitionBy("qid").orderBy(desc("score"), asc("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("qid", "id", "score", "rank")
  }
}
