package graft.ann

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ann.Ann.IvfModel
import graft.ann.Pq.PqModel

/** Durable index artifacts: IVF centroids and PQ codebooks as small
  * JSON files, encoded vectors as parquet.
  *
  * The reference persists its whole HNSW graph inside JSON snapshots
  * (`/root/reference/src/index/hnsw.js` serialize/deserialize); the
  * Spark analog splits by size class — MODELS are tiny (an IVF
  * quantizer is nCells × dim doubles, PQ codebooks m × 256 × dsub
  * floats ≈ 64 KB) and go to JSON, while the per-row artifacts (cell
  * assignments, PQ codes) are columnar data and go to parquet, where
  * they reload cell-partitioned exactly as the packed-index builders
  * want them. A serving restart is then load + pack — no retraining,
  * no re-encode of a 100 TB corpus.
  *
  * Writes are tmp + ATOMIC_MOVE: a crashed save leaves the previous
  * artifact intact, never a torn file.
  */
object IndexStore {

  // ─── models (JSON) ───

  private def writeAtomic(path: String, content: String): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, content.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  private def fmtArr(a: Iterable[Double]): String =
    a.map(d => java.lang.Double.toString(d)).mkString("[", ",", "]")

  def saveIvf(model: IvfModel, path: String): Unit = {
    val rows = model.centroids.map(c => fmtArr(c)).mkString("[", ",", "]")
    writeAtomic(path, s"""{"format":"graft-ivf-1","n_cells":${model.nCells},"centroids":$rows}""")
  }

  def loadIvf(path: String): IvfModel = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    require(json.contains("\"graft-ivf-1\""), s"$path is not a graft-ivf-1 artifact")
    IvfModel(parseMatrix(json, "centroids").map(_.toArray))
  }

  /** The model's `residual` flag is persisted with the codebooks and
    * restored by [[loadPq]] — a residual-trained artifact cannot be
    * silently re-paired with raw-space encode/scoring (the flag gates
    * `encodeCells`/`buildIvfPq` via [[PqModel.residual]]). */
  def savePq(model: PqModel, path: String): Unit = {
    // codebooks grouped per (sub, code) row for a readable, versioned file
    val rows = (0 until model.m).map { sub =>
      (0 until model.ksub).map { c =>
        val off = (sub * model.ksub + c) * model.dsub
        fmtArr((0 until model.dsub).map(j => model.codebooks(off + j).toDouble))
      }.mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    writeAtomic(path,
      s"""{"format":"graft-pq-1","m":${model.m},"dsub":${model.dsub},"ksub":${model.ksub},"residual":${model.residual},"codebooks":$rows}""")
  }

  def loadPq(path: String): PqModel = {
    val json = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    require(json.contains("\"graft-pq-1\""), s"$path is not a graft-pq-1 artifact")
    val m = intField(json, "m")
    val dsub = intField(json, "dsub")
    val ksub = intField(json, "ksub")
    val books = parseMatrix3(json, "codebooks")
    require(books.length == m && books.forall(_.length == ksub),
      s"codebook shape mismatch in $path")
    val flat = new Array[Float](m * ksub * dsub)
    for (sub <- 0 until m; c <- 0 until ksub; j <- 0 until dsub)
      flat((sub * ksub + c) * dsub + j) = books(sub)(c)(j).toFloat
    // machine-written field (writeAtomic emits exactly `"residual":true`
    // or `"residual":false`); absent in pre-flag artifacts = raw-trained
    PqModel(m, dsub, ksub, flat, residual = json.contains("\"residual\":true"))
  }

  private def intField(json: String, name: String): Int =
    // optional '-': saveBanded accepts any Int seed, so the artifact
    // must round-trip negatives too (ADVICE r6 — "seed":-7 used to
    // fail to load with a misleading 'missing field seed')
    ("\"" + name + "\":\\s*(-?\\d+)").r.findFirstMatchIn(json)
      .map(_.group(1).toInt)
      .getOrElse(throw new IllegalArgumentException(s"missing field $name"))

  /** Parse `"name":[[…],[…]]` into rows of doubles. Artifacts are
    * machine-written by [[saveIvf]] (no spaces, no nested strings), so a
    * split-based parse is exact. */
  private def parseMatrix(json: String, name: String): Array[Seq[Double]] = {
    val body = sliceArray(json, name)
    splitTop(body).map(row =>
      row.stripPrefix("[").stripSuffix("]").split(',').toSeq
        .filter(_.nonEmpty).map(_.toDouble)).toArray
  }

  private def parseMatrix3(json: String, name: String): Array[Array[Seq[Double]]] = {
    val body = sliceArray(json, name)
    splitTop(body).map(sub => splitTop(sub.stripPrefix("[").stripSuffix("]"))
      .map(row => row.stripPrefix("[").stripSuffix("]").split(',').toSeq
        .filter(_.nonEmpty).map(_.toDouble)).toArray).toArray
  }

  /** The bracketed body (exclusive of outer brackets) of `"name":[ … ]`. */
  private def sliceArray(json: String, name: String): String = {
    val key = "\"" + name + "\":"
    val start = json.indexOf(key)
    require(start >= 0, s"missing field $name")
    var i = json.indexOf('[', start + key.length)
    require(i >= 0, s"field $name has no array value")
    var depth = 0
    val from = i + 1
    while (i < json.length) {
      json.charAt(i) match {
        case '[' => depth += 1
        case ']' =>
          depth -= 1
          if (depth == 0) return json.substring(from, i)
        case _ =>
      }
      i += 1
    }
    throw new IllegalArgumentException(s"unterminated array for $name")
  }

  /** Split a bracket sequence at depth 0 commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    var from = 0
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '[' => depth += 1
        case ']' => depth -= 1
        case ',' if depth == 0 =>
          if (i > from) out += s.substring(from, i)
          from = i + 1
        case _ =>
      }
      i += 1
    }
    if (from < s.length) out += s.substring(from)
    out.result()
  }

  // ─── per-row artifacts (parquet) ───

  /** Persist `(id, cell, code)` PQ codes (or `(id, v, cell)` IVF
    * assignments — any cell-keyed dataset) partitioned BY CELL, so a
    * reload prunes to probed cells and the packed-index builders see
    * rows already cell-grouped. */
  def saveCells(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").partitionBy("cell").parquet(path)

  def loadCodes(spark: SparkSession, path: String): org.apache.spark.sql.Dataset[(Long, Int, Array[Byte])] = {
    import spark.implicits._
    spark.read.parquet(path)
      .select(org.apache.spark.sql.functions.col("id").cast("long"),
        org.apache.spark.sql.functions.col("cell").cast("int"),
        org.apache.spark.sql.functions.col("code"))
      .as[(Long, Int, Array[Byte])]
  }

  // ─── banded LSH history index (incremental dedup) ───

  /** Persist the history side of incremental MinHash-LSH dedup: the
    * banded `(id, band, bucket)` table as parquet plus a meta file
    * recording the hash family (`numHashes`/`bands`/`seed`) — stored
    * TOGETHER so the family can never drift from the table that was
    * built with it. ~`bands` ints per document: a petabyte corpus
    * indexes in gigabytes. Reload with [[loadBanded]] and pass to
    * `Dedup.minhashLshPairsBetween(new, old, …, index, maxBucket)`;
    * the per-batch cost is then shingling the NEW batch only.
    *
    * Both artifacts go through the Hadoop FS layer (not java.nio), so
    * hdfs:// / s3a:// paths work like local ones. */
  def saveBanded(df: DataFrame, textCol: String, idCol: String, path: String,
      numHashes: Int = 48, bands: Int = 8, seed: Int = 42): Unit = {
    graft.dedup.Dedup.bandedTable(df, textCol, idCol, numHashes, bands, seed)
      .write.mode("overwrite").parquet(s"$path/banded")
    val meta = s"""{"format":"graft-lsh-banded-1","num_hashes":$numHashes,"bands":$bands,"seed":$seed}"""
    val hPath = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = hPath.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(hPath, true)
    try out.write(meta.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  /** Append a NEW batch's bands to a stored banded index — the
    * maintenance half of the daily-ingest loop: after
    * `minhashLshPairsBetween(newBatch, …, index)` reports the batch's
    * dups against history, the batch itself becomes history. The
    * batch is shingled with the STORED hash family (read from the
    * artifact — a caller-supplied family could silently diverge from
    * the table), so tomorrow's queries see today's rows with bucket
    * semantics identical to a full rebuild. Cost: one narrow pass
    * over the batch + a parquet append — history is never re-read.
    *
    * `skipExistingIds` (default on, same stance as [[appendBatch]])
    * makes retried/replayed batches idempotent via a LEFT ANTI join on
    * the stored band rows' ids (column-pruned id scan). NOTE the
    * anti-join alone assumes the prior append's job COMMIT completed: a
    * doc whose band rows were only partially committed (job killed
    * mid-commit) would be skipped on replay with bands missing. Pass
    * `batchId` to close that window with a per-batch MARKER, written
    * only after the parquet append commits: a replay whose marker
    * exists is a guaranteed no-op (the batch is fully in), and a replay
    * whose marker is absent re-runs the append (the anti-join then
    * skips whatever did commit). The one non-self-healing case — job
    * commit itself interrupted halfway — is detectable (marker absent
    * on a batch that wrote some rows) and repaired by a [[saveBanded]]
    * rebuild (ADVICE r7). */
  def appendBanded(batch: DataFrame, textCol: String, idCol: String, path: String,
      skipExistingIds: Boolean = true, batchId: Option[String] = None): Unit = {
    val spark = batch.sparkSession
    val hConf = spark.sparkContext.hadoopConfiguration
    val marker = batchId.map(id =>
      new org.apache.hadoop.fs.Path(s"$path/_batches/$id"))
    if (marker.exists(m => m.getFileSystem(hConf).exists(m)))
      return // batch fully committed previously: replay is a no-op
    val idx = loadBanded(spark, path) // also validates the meta artifact
    val deduped =
      if (skipExistingIds) {
        val existing = idx.banded
          .select(org.apache.spark.sql.functions.col("id").as("_existing_id")).distinct()
        batch.join(existing,
          org.apache.spark.sql.functions.col(idCol).cast("long") ===
            org.apache.spark.sql.functions.col("_existing_id"), "left_anti")
      } else batch
    graft.dedup.Dedup.bandedTable(deduped, textCol, idCol,
        idx.numHashes, idx.bands, idx.seed)
      .write.mode("append").parquet(s"$path/banded")
    // marker AFTER the append's job commit — its existence certifies
    // the batch is fully in the table
    marker.foreach(m => m.getFileSystem(hConf).create(m, true).close())
  }

  def loadBanded(spark: SparkSession, path: String): graft.dedup.Dedup.BandedIndex = {
    val hPath = new org.apache.hadoop.fs.Path(s"$path/meta.json")
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(hPath)
    val json = try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
    require(json.contains("\"graft-lsh-banded-1\""), s"$path is not a graft-lsh-banded-1 artifact")
    graft.dedup.Dedup.BandedIndex(spark.read.parquet(s"$path/banded"),
      intField(json, "num_hashes"), intField(json, "bands"), intField(json, "seed"))
  }

  /** INCREMENTAL index maintenance — the daily-ingest shape: assign and
    * encode ONLY the new batch against the stored (frozen) models and
    * append its codes to the existing cell-partitioned parquet. No
    * retraining, no re-encode of the resident corpus; the daily cost is
    * one narrow pass over the batch (plus, with `skipExistingIds`, one
    * column-pruned id scan of the stored codes). Rebuild/serve with
    * [[loadCodes]] + `PackedIndex.buildIvfPq` as usual.
    *
    * Guards (review r5): the batch's dimensionality is checked against
    * the frozen model up front — `encodeCells` silently drops
    * mismatched rows, which here would mean a whole mis-pointed batch
    * appending ZERO rows with no error. `skipExistingIds` (default on)
    * makes retried/replayed batches idempotent via a LEFT ANTI join on
    * the already-stored ids; disable it only when the orchestrator
    * guarantees exactly-once.
    *
    * Quantizer drift is the operator's call: when the corpus
    * distribution moves far from the frozen centroids (watch the mean
    * assignment distance), retrain models and re-encode — the classic
    * IVF maintenance tradeoff, same as FAISS. */
  def appendBatch(batch: DataFrame, vecCol: String, idCol: String,
                  ivfPath: String, pqPath: String, codesPath: String,
                  skipExistingIds: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.{col, max, min, size}
    val ivf = loadIvf(ivfPath)
    val pq = loadPq(pqPath)
    // whole-batch guard (one narrow scan of array sizes): min/max skip
    // NULL vectors — those are the tolerated failed-embedder rows that
    // encodeCells drops row-wise — but ANY non-null row off the model's
    // dimensionality fails loudly (a sampled-row check would miss
    // mixed-dim batches and still silently drop the strays)
    batch.agg(min(size(col(vecCol))).as("dmin"), max(size(col(vecCol))).as("dmax"))
      .collect().foreach { r =>
        if (!r.isNullAt(0))
          require(r.getInt(0) == pq.dim && r.getInt(1) == pq.dim,
            s"batch dimensionality range [${r.getInt(0)}, ${r.getInt(1)}] != stored " +
              s"PQ model dim ${pq.dim} — mismatched rows would be silently dropped; " +
              "check the model paths / upstream embedder")
      }
    // codesPath is written through the Hadoop FS layer (spark parquet),
    // so existence must be resolved the same way — java.nio would
    // silently answer false for hdfs:// / s3a:// URIs and a replayed
    // batch would append duplicates despite the guard (ADVICE r5)
    val codesExist = {
      val hPath = new org.apache.hadoop.fs.Path(codesPath)
      hPath.getFileSystem(batch.sparkSession.sparkContext.hadoopConfiguration)
        .exists(hPath)
    }
    val deduped =
      if (skipExistingIds && codesExist) {
        val existing = batch.sparkSession.read.parquet(codesPath)
          .select(col("id").cast("long").as("_existing_id"))
        batch.join(existing,
          col(idCol).cast("long") === col("_existing_id"), "left_anti")
      } else batch
    val cells = Ann.assignCells(deduped, vecCol, idCol, ivf)
    val codes = Pq.encodeCells(cells, pq,
      residualIvf = if (pq.residual) Some(ivf) else None)
    codes.toDF("id", "cell", "code")
      .write.mode("append").partitionBy("cell").parquet(codesPath)
  }
}
