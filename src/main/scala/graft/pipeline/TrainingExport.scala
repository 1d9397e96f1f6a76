package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** The training-reader handoff: write a curated corpus as SHARDS a
  * trainer consumes directly, plus the manifest that makes the layout
  * auditable.
  *
  * Composition of the pipeline's own primitives:
  *  - [[CorpusOps.splitAssign]] — content-addressed train/val/test
  *    (stable across reruns and incremental ingests);
  *  - [[CorpusOps.epochShuffleKey]] — the deterministic epoch order;
  *  - the epoch-shuffle writer contract (spec-pinned in
  *    CorpusOpsSpec): `repartitionByRange` + `sortWithinPartitions` on
  *    the key gives range-DISJOINT output files whose lexicographic
  *    file order IS the global order — a trainer streaming shards in
  *    name order reads the exact epoch permutation, with no shuffle
  *    state materialized anywhere.
  *
  * Output layout: `outDir/split=train/part-*.{parquet,json}` etc. (Hive
  * partitioning on `split`, so a trainer's reader prunes to its split
  * by path). Each task owns one key range; a task writes at most one
  * file per split directory, so within every split directory the file
  * ranges are disjoint and name-ordered.
  *
  * At 100 TB: one range-partition sort (sample → range exchange →
  * per-partition sort) — the identical shape `epochShuffle` benches at
  * 500k — then a single write pass; `numShards` ≈ corpus_bytes / 1 GB.
  */
object TrainingExport {

  /** Write epoch-`epoch` shards of `df` under `outDir` and return the
    * manifest: one row per output file with
    * `(split, file, rows, min_key, max_key)`, ordered by file name.
    * `format` is `"parquet"` (default) or `"json"` (JSONL shards for
    * text-native trainers). */
  def writeShards(df: DataFrame, idCol: String, outDir: String,
                  seed: Long, epoch: Int, numShards: Int,
                  format: String = "parquet",
                  keyCol: String = "shuffle_key"): DataFrame = {
    require(Set("parquet", "json")(format), s"format must be parquet|json, got $format")
    // Sort by (split, key) — NOT key alone: the dynamic-partition
    // writer requires task rows ordered by the partition columns and
    // inserts its own non-stable SortExec(split) otherwise, which would
    // destroy the key order inside each file. With split leading, the
    // child ordering already satisfies the writer's requirement, so no
    // extra sort is planned and keys stay ascending within every file.
    val keyed = df
      .withColumn("split", CorpusOps.splitAssign(col(idCol)))
      .withColumn(keyCol, CorpusOps.epochShuffleKey(col(idCol), seed, epoch))
      .repartitionByRange(numShards, col(keyCol))
      .sortWithinPartitions(col("split"), col(keyCol), col(idCol))
    keyed.write.mode(SaveMode.Overwrite)
      .partitionBy("split")
      .format(format)
      .save(outDir)
    manifest(df.sparkSession, outDir, format, keyCol)
  }

  /** Re-derive the manifest from a shard directory (also usable on a
    * pre-existing export): per-file row count + key range, read
    * straight from the files with `input_file_name` — one scan, no
    * driver listing. */
  def manifest(spark: org.apache.spark.sql.SparkSession, outDir: String,
               format: String = "parquet",
               keyCol: String = "shuffle_key"): DataFrame =
    spark.read.format(format).load(outDir)
      .groupBy(col("split"), input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"), max(col(keyCol)).as("max_key"))
      .orderBy(col("split"), col("file"))
}
