package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-window operators (reference `algorithm.py:71-92` gaussian
  * smoothing, `numpy.py:185-241` split_with_overlap, running totals via
  * pandas cumsum).
  *
  * Scale note: these operators are defined over ONE global ordering, like
  * the reference's 1-D arrays. Used bare they funnel into a single window
  * partition; every entry point therefore takes optional partition columns
  * (per-series smoothing / per-key splitting), which is the shape a 100 TB
  * pipeline actually runs (millions of independent series), and the
  * single-series case is documented as driver-bounded.
  */
object Windows {

  /** scipy-compatible truncated Gaussian weights: radius =
    * floor(truncate*sigma + 0.5) (gaussian_filter1d's `lw`), normalized to
    * sum 1 over the full window.
    */
  def gaussianWeights(sigma: Double, truncate: Double = 4.0): Array[Double] = {
    require(sigma >= 0, "sigma must be >= 0")
    if (sigma == 0) Array(1.0)
    else {
      val r = math.floor(truncate * sigma + 0.5).toInt
      val raw = (-r to r).map(i => math.exp(-(i.toDouble * i) / (2 * sigma * sigma))).toArray
      val s = raw.sum
      raw.map(_ / s)
    }
  }

  /** 1-D Gaussian smoothing of `valueCol` over `orderBy` (within optional
    * `partitionBy` series). Edge mode: truncated-renormalize (divide by
    * the weight mass actually present) — documented divergence from
    * scipy's default 'reflect' (SURVEY §7.4.6).
    *
    * Implemented as 2r+1 lead/lag taps over ONE window spec — Spark
    * evaluates them in a single WindowExec pass; σ=0 short-circuits to the
    * input (reference `algorithm.py:92`).
    */
  def gaussianSmooth(df: DataFrame, orderBy: Seq[String], valueCol: String,
      sigma: Double, partitionBy: Seq[String] = Nil, as: String = "smoothed"): DataFrame = {
    if (sigma == 0) return df.withColumn(as, col(valueCol).cast("double"))
    val w0 = gaussianWeights(sigma)
    val r = w0.length / 2
    val base = if (partitionBy.isEmpty) Window.orderBy(orderBy.map(col): _*)
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(col): _*)
    def tap(i: Int): Column =
      if (i < 0) lag(col(valueCol), -i).over(base)
      else if (i > 0) lead(col(valueCol), i).over(base)
      else col(valueCol)
    val num = (-r to r).map(i => lit(w0(i + r)) * coalesce(tap(i).cast("double"), lit(0.0))).reduce(_ + _)
    val den = (-r to r).map(i => lit(w0(i + r)) * when(tap(i).isNotNull, lit(1.0)).otherwise(lit(0.0))).reduce(_ + _)
    df.withColumn(as, num / den)
  }

  /** Running total with an exact DECIMAL accumulator (order-independent
    * within each prefix; deterministic under any partitioning).
    */
  def runningTotal(df: DataFrame, orderBy: Seq[String], valueCol: String,
      partitionBy: Seq[String] = Nil, as: String = "running"): DataFrame = {
    val base = if (partitionBy.isEmpty) Window.orderBy(orderBy.map(col): _*)
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(col): _*)
    val w = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as,
      sum(col(valueCol).cast("decimal(30,2)")).over(w).cast("double"))
  }

  /** Split an ordered sequence into length-`len` segments overlapping by
    * `overlap` (`numpy.py:185-241`). Long-form output: one row per
    * (segment, position); `partials=false` drops tail segments shorter
    * than `len` (the reference's MaskedArray tail ~ partials=true).
    *
    * Row index comes from `row_number` over the given order; each row then
    * explodes into the segments that contain it (at most
    * ceil(len/stride)), so output size is input x overlap-factor with no
    * driver materialization.
    */
  def splitWithOverlap(df: DataFrame, orderBy: Seq[String], len: Int, overlap: Int,
      partials: Boolean = true, partitionBy: Seq[String] = Nil): DataFrame = {
    require(len > 0 && overlap >= 0 && overlap < len, "need 0 <= overlap < len")
    val stride = len - overlap
    val base = if (partitionBy.isEmpty) Window.orderBy(orderBy.map(col): _*)
      else Window.partitionBy(partitionBy.map(col): _*).orderBy(orderBy.map(col): _*)
    // first/last segment ids containing row rn (1-based rn; 0-based seg).
    // All operands non-negative, so truncating div == floor div — the
    // formulas are portable to SQL's // operator. The row_number is
    // materialized in its own projection first (window expressions can't
    // nest inside explode()).
    val rn = col("_rn")
    val hi = floor(((rn - 1) / stride)).cast("long")
    val lo = when(rn <= len, lit(0L))
      .otherwise(floor(((rn - len + stride - 1) / stride)).cast("long"))
    val exploded = df
      .withColumn("_rn", row_number().over(base))
      .withColumn("seg", explode(sequence(lo, hi)))
      .withColumn("pos", (col("_rn") - 1 - col("seg") * stride).cast("long"))
      .drop("_rn")
    if (partials) exploded
    else {
      val segW = if (partitionBy.isEmpty) Window.partitionBy(col("seg"))
        else Window.partitionBy((partitionBy.map(col) :+ col("seg")): _*)
      exploded
        .withColumn("_segn", count(lit(1)).over(segW))
        .filter(col("_segn") === len)
        .drop("_segn")
    }
  }
}
