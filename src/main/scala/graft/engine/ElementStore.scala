package graft.engine

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.cell.Grid

/**
 * Keyed, spatially-partitioned feature state — the raw-entity MERGE of the
 * reference's replication ingest (dags/osm_replication.py:261-298 upserts
 * node/way/relation rows keyed by id per sequence batch; SURVEY.md §2.1 S2,
 * §2.10 T4) re-expressed as a bounded-work parquet MERGE:
 *
 *  - DATA is partitioned by `cb` (a square cell-block id, default 10 km —
 *    Grid.cellOf packing), so the spatial reads that drive matching are
 *    partition-pruned to the dirty region;
 *  - a narrow KEY INDEX (key columns -> cb) is hash-partitioned by `kb =
 *    xxhash(key) % idxBuckets`, so a batch's previous locations are found by
 *    reading only the touched index buckets — this is what keeps a MOVED
 *    feature correct: its stale row in the old block is found via the index
 *    and dropped, without any full-table scan.
 *
 * Per-batch work is O(batch + touched partitions), never O(history): merge
 * reads exactly the dirty blocks plus ≤idxBuckets narrow index slices and
 * dynamically overwrites only those partitions. On a real cluster both
 * layers map 1:1 onto Iceberg MERGE INTO with the same partition specs.
 */
class ElementStore(spark: SparkSession, path: String,
                   val blockMeters: Double = 10000.0, idxBuckets: Int = 64) {

  /** native block id of a point — the Column form of Grid.cellOf's packing
    * at blockMeters (shares Grid.OFF: kRing decodes these ids, so the two
    * sides must never drift). */
  def blockCol(cx: Column, cy: Column): Column = {
    val OFF = Grid.OFF.toLong
    shiftleft(floor(cx / blockMeters).cast("long") + OFF, 32)
      .bitwiseOR(floor(cy / blockMeters).cast("long") + OFF)
  }

  /** dirty blocks padded by a 1-block ring (block size >> any match radius,
    * so one ring covers every feature reachable from a dirty feature). */
  def ring(blocks: Seq[Long]): Seq[Long] =
    blocks.flatMap(b => Grid.kRing(b, 1)).distinct

  private def dataPath(name: String) = s"$path/$name/data"
  private def idxPath(name: String) = s"$path/$name/idx"

  /** current state (optionally partition-pruned to `blocks`). */
  def read(name: String, blocks: Option[Seq[Long]] = None): DataFrame = {
    val p = dataPath(name)
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
      s"element store '$name' not initialized")
    // partition-dir values re-infer — pin cb back to long
    val df = spark.read.parquet(p).withColumn("cb", col("cb").cast("long"))
    blocks match {
      case Some(bs) => df.filter(col("cb").isin(bs: _*)) // partition pruning
      case None     => df
    }
  }

  def exists(name: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dataPath(name)))

  /**
   * MERGE `batch` (upsert by `keyCols`) into sub-store `name`. The batch must
   * carry cx/cy (point-ish centroid meters). Returns the DIRTY block ids
   * (batch blocks ∪ previous blocks of moved keys) — the caller's recompute
   * frontier.
   */
  def merge(name: String, keyCols: Seq[String], batch: DataFrame,
            recencyCol: Option[String] = None): Seq[Long] = {
    // A micro-batch may carry several rows for one key (the same element
    // updated twice inside one AvailableNow batch): the left_anti below only
    // removes OLD rows, so an un-deduped batch would write duplicate key rows
    // (ADVICE r2). Keep exactly one row per key — by `recencyCol` desc when
    // the caller has one, else an arbitrary-but-single representative
    // (dropDuplicates), matching the index-side dedup rule.
    val b0 = batch.withColumn("cb", blockCol(col("cx"), col("cy")))
    val bd = recencyCol match {
      case Some(rc) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keyCols.map(col): _*).orderBy(col(rc).desc)
        b0.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => b0.dropDuplicates(keyCols)
    }
    val b = bd.cache()
    val keyHash = pmod(xxhash64(keyCols.map(col): _*), lit(idxBuckets.toLong)).cast("int")
    val bKeys = b.select(keyCols.map(col): _*).distinct().cache()

    val first = !exists(name)
    if (!first) ensureIndex(name, keyCols)
    val dirtyBlocks: Seq[Long] =
      if (first) b.select("cb").distinct().collect().map(_.getLong(0)).toSeq
      else {
        // previous locations of the batch's keys, via the touched index buckets
        val touchedKb = bKeys.select(keyHash.as("kb")).distinct()
          .collect().map(_.getInt(0)).toSeq
        val idx = spark.read.parquet(idxPath(name)) // ensureIndex guarantees it
          .withColumn("cb", col("cb").cast("long"))
          .filter(col("kb").isin(touchedKb: _*))
        val oldBlocks = idx.join(bKeys, keyCols, "left_semi")
          .select("cb").distinct().collect().map(_.getLong(0))
        (b.select("cb").distinct().collect().map(_.getLong(0)) ++ oldBlocks).distinct.toSeq
      }

    // An EMPTY batch must not touch the store: a zero-row first write would
    // leave a parquet dir with only _SUCCESS, making exists() true while
    // read() fails on schema inference (ADVICE r2) — skip both writes and
    // leave the store uninitialized (or untouched).
    if (dirtyBlocks.isEmpty) { b.unpersist(); bKeys.unpersist(); return Nil }

    // --- data merge: read ONLY dirty blocks, drop batch keys, add batch ---
    val dataCols = b.columns.map(col)
    val out =
      if (first) b
      else read(name, Some(dirtyBlocks))
        .join(bKeys, keyCols, "left_anti")
        .select(dataCols: _*)
        .unionByName(b.select(dataCols: _*))
    // enumerate surviving blocks BEFORE the overwrite — `out` is a lazy plan
    // over the files the write replaces
    val written =
      if (first) Set.empty[Long]
      else out.select("cb").distinct().collect().map(_.getLong(0)).toSet
    out.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("cb").parquet(dataPath(name))
    // a dirty block whose last row vanished is absent from `out` and thus not
    // overwritten — clear its directory explicitly (Iceberg MERGE would)
    if (!first) {
      dirtyBlocks.filterNot(written).foreach { cb =>
        val dir = java.nio.file.Paths.get(dataPath(name), s"cb=$cb")
        if (java.nio.file.Files.exists(dir)) {
          java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => java.nio.file.Files.delete(p))
        }
      }
    }

    // --- index merge: same pattern over the narrow (key -> cb) table ---
    val idxNew = b.select((keyCols.map(col) :+ col("cb")): _*)
      .dropDuplicates(keyCols)
      .withColumn("kb", keyHash)
    val idxOut =
      if (first) idxNew
      else {
        val touchedKb = idxNew.select("kb").distinct().collect().map(_.getInt(0)).toSeq
        spark.read.parquet(idxPath(name)) // ensureIndex guarantees existence
          .filter(col("kb").isin(touchedKb: _*))
          .withColumn("cb", col("cb").cast("long"))
          .join(bKeys, keyCols, "left_anti")
          .select(idxNew.columns.map(col): _*)
          .unionByName(idxNew)
      }
    idxOut.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("kb").parquet(idxPath(name))

    b.unpersist(); bKeys.unpersist()
    dirtyBlocks
  }

  /** Crash-recovery: a failure between merge's data write and index write
    * leaves data without an index — the old readOrEmpty fallback then threw
    * on the missing `kb` column, permanently sticking the checkpoint, and a
    * silently-empty index would skip moved-key cleanup (duplicate rows).
    * REBUILD the index from data instead: one bounded scan, then the normal
    * per-bucket merge proceeds. (Mid-write partial index overwrites need a
    * transactional table format — the Iceberg mapping in the scaladoc — and
    * are out of scope for the parquet stand-in.) */
  private def ensureIndex(name: String, keyCols: Seq[String]): Unit = {
    val ip = idxPath(name)
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(ip))) {
      val keyHash = pmod(xxhash64(keyCols.map(col): _*), lit(idxBuckets.toLong)).cast("int")
      read(name).select((keyCols.map(col) :+ col("cb")): _*)
        .dropDuplicates(keyCols)
        .withColumn("kb", keyHash)
        .write.mode(SaveMode.Overwrite).partitionBy("kb").parquet(ip)
    }
  }
}
