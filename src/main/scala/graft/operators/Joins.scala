package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's built-in equi-join surface lacks
  * (EXT — the reference has no theta/range/as-of joins either, SURVEY
  * §2.2, but any event-log pipeline needs them). Both are expressed so
  * the data-sized side never meets a quadratic plan: the as-of join is
  * ONE shuffle and zero joins (union + ordered window), the range join
  * turns the inequality predicate into a bucket equi-join.
  */
object Joins {

  /** Backward as-of join: for every left row, attach the LATEST right
    * row with `right.ts <= left.ts` within the same key (the
    * time-series lookup join: "price as of trade time", "last config
    * before event"). Left rows with no prior right row keep nulls
    * (left-outer semantics, matching ASOF LEFT JOIN in engines that
    * ship it natively).
    *
    * Shape — NO join operator at all: both sides project to a common
    * schema and UNION, right rows sorting before left rows at equal ts
    * (backward as-of includes ties); one window per key in ts order
    * carries the last non-null right payload forward; left rows then
    * filter back out. That is ONE hash partitioning on the key and one
    * sort — at 100 TB the same cost as the groupBy any aggregation
    * pays, with no risk of a skewed range condition exploding (the
    * naive formulation `left JOIN right ON key AND rts <= lts` +
    * row_number is a per-key cross product before ranking).
    *
    * `rightVals` columns land as `{prefix}{name}`. Rows of `right`
    * duplicated on (key, ts) are tie-broken by the payload struct's
    * ordering (total, deterministic) — pre-aggregate the right side if
    * that order is not the one you want.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
      tsCol: String, rightVals: Seq[String],
      prefix: String = "asof_"): DataFrame = {
    require(rightVals.nonEmpty, "asofJoin: need at least one right value column")
    val leftCols = left.columns.toSeq
    val rStruct = struct(rightVals.map(col): _*)
    val rType = right.select(rStruct.as("_r")).schema("_r").dataType
    val lStruct = struct(leftCols.map(col): _*)
    val lType = left.select(lStruct.as("_l")).schema("_l").dataType
    val l = left.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(1).as("_tag"), lStruct.as("_l"), lit(null).cast(rType).as("_r"))
    val r = right.select(col(keyCol).as("_k"), col(tsCol).as("_ts"),
      lit(0).as("_tag"), lit(null).cast(lType).as("_l"), rStruct.as("_r"))
    // right (_tag 0) sorts before left (_tag 1) at equal ts: backward
    // as-of is inclusive; _r last for duplicate right (key, ts) rows
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_ts").asc, col("_tag").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = l.unionByName(r)
      .withColumn("_rv", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
    val lefts = leftCols.map(c => col("_l").getField(c).as(c))
    val rights = rightVals.map(c => col("_rv").getField(c).as(prefix + c))
    out.select(lefts ++ rights: _*)
  }

  /** Range (interval containment) join: each point row pairs with every
    * interval row of the same key whose `[start, end)` contains the
    * point's timestamp. The inequality predicate becomes an EQUI-join
    * on time buckets of `bucketSeconds`: intervals explode to the
    * buckets they cover, points map to exactly ONE bucket — so every
    * qualifying (point, interval) pair meets in precisely one bucket
    * and the result needs no dedup. Output: all point columns plus all
    * interval columns (caller projects).
    *
    * Scale: size `bucketSeconds` near the typical interval length —
    * each interval then explodes to <= 2 rows and the join is linear.
    * An interval spanning more than `maxBucketsPerInterval` buckets
    * fails LOUDLY (raise_error) rather than silently fanning out; a
    * degenerate interval (end <= start) matches nothing and is dropped
    * up front.
    */
  def rangeJoin(points: DataFrame, pTsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketSeconds: Long, keyCols: Seq[String] = Nil,
      maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketSeconds > 0, "rangeJoin: bucketSeconds must be positive")
    val bm = bucketSeconds * 1000000L
    // NTZ-safe: parquet timestamps read as TIMESTAMP_NTZ; the session
    // pins UTC, so the cast to instant is exact (the sessionize idiom)
    def micros(c: Column): Column = unix_micros(c.cast("timestamp"))
    def bucketOf(c: Column): Column = floor(micros(c) / bm).cast("long")
    val lastBucket = floor((micros(col(endCol)) - 1) / bm).cast("long")
    val ib = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("_nb", lastBucket - bucketOf(col(startCol)) + 1)
      .withColumn("_b", explode(when(col("_nb") > maxBucketsPerInterval,
          raise_error(concat(lit(s"rangeJoin: interval spans more than " +
            s"$maxBucketsPerInterval buckets of ${bucketSeconds}s — " +
            "resize bucketSeconds"), lit(" (span="), col("_nb"), lit(")")))
            .cast("array<long>"))
        .otherwise(sequence(bucketOf(col(startCol)), lastBucket))))
      .drop("_nb")
    val pb = points.withColumn("_b", bucketOf(col(pTsCol)))
    pb.join(ib, Seq("_b") ++ keyCols)
      .filter(col(pTsCol) >= col(startCol) && col(pTsCol) < col(endCol))
      .drop("_b")
  }
}
