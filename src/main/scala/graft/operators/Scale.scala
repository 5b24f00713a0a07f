package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cluster-scale join machinery (no reference analog — the reference is
  * single-machine; these are the tools that make its operators hold at
  * 100 TB, per the build brief's partitioning/skew rules).
  */
object Scale {

  /** Write a frame bucketed+sorted by the join key. Two tables bucketed
    * the same way equi-join with ZERO shuffle (SortMergeJoin reads
    * co-located buckets) — the plan-level proof lives in ScaleSpec.
    */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      numBuckets: Int, mode: String = "overwrite"): Unit = {
    require(keys.nonEmpty, "need at least one bucket key")
    df.write
      .mode(mode)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two same-bucketing tables on their bucket keys — shuffle-free
    * when both sides were written with [[writeBucketed]] and
    * spark.sql.sources.bucketing.enabled (default true).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      keys: Seq[String], joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), keys, joinType)

  /** Write a frame Hive-partitioned by the DAY of a timestamp column —
    * the standard event-lake layout: a time-range query then reads only
    * its days' directories (partition pruning, proven plan-level in
    * ScaleSpec), which at 100 TB is the difference between scanning a
    * day and scanning a decade. The partition value is a plain
    * `yyyy-MM-dd` string so any engine (and the Hive metastore) prunes
    * on it without timestamp-semantics traps.
    */
  def writeDayPartitioned(df: DataFrame, tsCol: String, path: String,
      mode: String = "overwrite", partCol: String = "p_day"): Unit = {
    require(!df.columns.contains(partCol),
      s"input already has a $partCol column")
    df.withColumn(partCol, col(tsCol).cast("date").cast("string"))
      .write.mode(mode).partitionBy(partCol).parquet(path)
  }

  /** Skew-safe equi-join: salt the skewed (big) side's key with a random
    * 0..salt-1 suffix and explode the small side across every salt value,
    * so one hot key fans out over `salt` reducers instead of one. Result
    * is row-identical to the plain join (verified in ScaleSpec); AQE's
    * skew handling covers moderate skew — this is the explicit tool for
    * the pathological key.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keys: Seq[String],
      salt: Int = 16, seed: Long = 42L, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // right/full outer would emit `salt` copies of unmatched small-side
    // rows (the exploded copies all miss) — only big-side-preserving
    // join types keep the row-identical contract.
    val ok = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti")
    require(ok.contains(joinType.toLowerCase),
      s"saltedJoin supports big-side-preserving join types only, got '$joinType'")
    require(keys.nonEmpty, "need at least one join key")
    val sc = "__graft_salt" // collision-proof temp name
    require(!big.columns.contains(sc) && !small.columns.contains(sc),
      s"input already has a $sc column")
    val saltedBig = big.withColumn(sc, (rand(seed) * salt).cast("int"))
    val saltedSmall = small.withColumn(sc, explode(sequence(lit(0), lit(salt - 1))))
    saltedBig
      .join(saltedSmall, keys :+ sc, joinType)
      .drop(sc)
  }

  /** Write a frame Z-ORDER clustered on two integer dimensions: rows are
    * range-partitioned and sorted by their Morton code
    * ([[Sketches.zOrderValue]]), so parquet row-group min/max statistics
    * become tight boxes in BOTH dimensions at once — a predicate on
    * either column (or a 2-D box) skips most row groups at the scan,
    * where a single-column sort can only serve its own column. The
    * row-group-statistics proof lives in ScaleSpec (footers are read
    * back and the overlap fraction asserted), the Morton math in
    * SketchesSpec.
    *
    * The z column is KEPT in the output (dropping it would force
    * readers to recompute the clustering key for range predicates);
    * callers who want the original schema drop it after read.
    */
  def writeZOrdered(df: DataFrame, xCol: Column, yCol: Column, path: String,
      numFiles: Int = 8, bits: Int = 21, zCol: String = "zval",
      mode: String = "overwrite"): Unit = {
    require(!df.columns.contains(zCol), s"input already has a $zCol column")
    df.withColumn(zCol, Sketches.zOrderValue(xCol, yCol, bits))
      .repartitionByRange(numFiles, col(zCol))
      .sortWithinPartitions(zCol)
      .write.mode(mode).parquet(path)
  }

  /** Deterministic shard assignment for training-data output: shard =
    * low bits of the portable md5 hash of the id — stable across runs,
    * engines and cluster sizes (no round-robin, no partition-id
    * dependence), and uniform by the hash. `nShards` must be a power of
    * two so the bit-mask equals the mod and the oracle replays it from
    * md5 hex nibbles exactly.
    */
  def shardOf(idCol: Column, nShards: Int): Column = {
    require(nShards > 0 && (nShards & (nShards - 1)) == 0,
      s"nShards must be a power of two, got $nShards")
    graft.functions.TextFunctions.md5Bits64(idCol.cast("string"))
      .bitwiseAND(lit((nShards - 1).toLong))
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetBytes` files — the maintenance pass every long-lived lake
    * needs (streaming sinks and per-partition writers accrete small
    * files; at 100 TB the scan's task-scheduling overhead and namenode
    * pressure are dominated by file COUNT, not bytes). Reads the source
    * listing's total size, repartitions to ceil(total/target), and
    * writes to a NEW directory — never in place, so a failed rewrite
    * leaves the source untouched (swap is the caller's atomic rename).
    * Row content is preserved exactly; ordering is not (parquet files
    * carry no inter-file order contract).
    */
  def compactTo(spark: SparkSession, srcPath: String, destPath: String,
      targetBytes: Long = 128L << 20): Unit = {
    require(targetBytes > 0, "targetBytes must be positive")
    require(srcPath != destPath, "compactTo never rewrites in place")
    val fs = new org.apache.hadoop.fs.Path(srcPath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val total = fs.getContentSummary(new org.apache.hadoop.fs.Path(srcPath)).getLength
    val nFiles = math.max(1, ((total + targetBytes - 1) / targetBytes).toInt)
    spark.read.parquet(srcPath)
      .repartition(nFiles)
      .write.mode("errorifexists").parquet(destPath)
  }

  /** Write the final training shards: one directory per shard
    * (`shard=K/`), rows within a shard in the deterministic md5 order —
    * the global-shuffle step at the end of a curation pipeline, as a
    * layout ANY trainer (and any engine) can reproduce and read
    * selectively. Each shard directory is written by the partition that
    * owns it (repartition on the shard value), so `nShards` output
    * streams run in parallel and no two tasks write one shard.
    */
  def writeShards(df: DataFrame, idCol: String, nShards: Int, path: String,
      mode: String = "overwrite"): Unit = {
    require(!df.columns.contains("shard"), "input already has a shard column")
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .withColumn("__ord", graft.functions.TextFunctions.md5Bits64(
        concat_ws(":", lit("ord"), col(idCol).cast("string"))))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("__ord"))
      .drop("__ord")
      .write.mode(mode).partitionBy("shard").parquet(path)
  }

  /** Content-addressed integrity manifest (EXT): per-bucket row count +
    * order-independent XOR fingerprint of a 48-bit md5 of each row's
    * (key, payload). Verifying a 100 TB copy costs one scan per side
    * and a |buckets|-row diff — any corrupted, missing, or duplicated
    * row flips its bucket's xor (a false negative needs a second
    * corruption in the same bucket with the identical bit pattern,
    * ~2^-48). The aggregation state is 8 bytes per bucket: fully
    * map-side-combining, mergeable across partitions, files, or whole
    * clusters, and partitioning/order-independent by construction —
    * the manifest of a replica computed on a different cluster with a
    * different layout still matches bit for bit.
    */
  def contentFingerprints(df: DataFrame, keyCol: String, payloadCol: String,
      nBuckets: Int = 64): DataFrame = {
    require(nBuckets >= 1 && nBuckets <= 256, "need 1 <= nBuckets <= 256")
    val h = md5(concat(col(keyCol).cast("string"), lit(":"),
      col(payloadCol).cast("string")))
    df.select(
        (conv(substring(h, 13, 2), 16, 10).cast("int") % nBuckets).as("bucket"),
        conv(substring(h, 1, 12), 16, 10).cast("long").as("_h"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), expr("bit_xor(_h)").as("fingerprint"))
  }
}
