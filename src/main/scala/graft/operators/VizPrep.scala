package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-prep halves of the reference's grouped-aggregation/visualization
  * layer (`plot.py`): the rendering stays driver-side, but every input
  * table it draws is a distributed aggregation with a well-defined shape.
  * Output tables are small (≤ thousands of rows) by construction.
  */
object VizPrep {

  /** Threshold→"Others" collapse for pie charts (`plot.py:115-124`):
    * categories whose fraction ≤ threshold merge into one `Others` slice,
    * then re-aggregate. Two 1-row-broadcast passes, no window-over-all.
    */
  def pieOthers(df: DataFrame, cat: Column, threshold: Double,
      othersLabel: String = "Others"): DataFrame = {
    val counts = df.groupBy(cat.as("category")).agg(count(lit(1)).as("cnt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tot = counts.agg(sum("cnt").as("_g"))
    counts.crossJoin(broadcast(tot))
      .withColumn("_frac", col("cnt").cast("double") / col("_g"))
      .withColumn("slice",
        when(col("_frac") <= threshold, lit(othersLabel))
          .otherwise(col("category").cast("string")))
      .groupBy(col("slice"))
      .agg(sum("cnt").as("cnt"))
      .crossJoin(broadcast(tot))
      .withColumn("fraction", col("cnt").cast("double") / col("_g"))
      .select("slice", "cnt", "fraction")
  }

  /** Two-level pie prep (`plot.py:140-242`): (cat, subcat) weights, share
    * of each subcat within its cat, small subcats (< `othersFrac` of the
    * cat total) collapsed into a per-cat `=OTHERS=` wedge, ordered by cat
    * total desc then wedge weight desc (the reference's
    * `transform('sum')` sort, `plot.py:222-226`).
    */
  def twoLevelPie(df: DataFrame, cat: Column, subcat: Column,
      weight: Option[Column] = None, othersFrac: Double = 0.0): DataFrame = {
    val w = weight.getOrElse(lit(1L))
    val counts = df.groupBy(cat.as("category"), subcat.as("subcategory"))
      .agg(sum(w).as("weight"))
      .filter(col("weight") > 0) // reference drops <=0 (plot.py:197-202)
    val catW = Window.partitionBy("category")
    val tagged = counts
      .withColumn("_cat_total", sum(col("weight")).over(catW))
      .withColumn("wedge",
        when(col("weight").cast("double") / col("_cat_total") < othersFrac, lit("=OTHERS="))
          .otherwise(col("subcategory").cast("string")))
    tagged
      .groupBy(col("category"), col("wedge"))
      .agg(sum("weight").as("weight"))
      .withColumn("cat_total", sum(col("weight")).over(catW))
      .withColumn("ratio", col("weight").cast("double") / col("cat_total"))
      .orderBy(col("cat_total").desc, col("category"), col("weight").desc, col("wedge"))
  }

  /** Bin-count strategies for [[groupHist]] (numpy
    * `histogram_bin_edges` strategies used at `plot.py:410`): computed
    * from one global aggregation — 'sturges' needs n; 'doane' adds the
    * skewness correction term (the reference explicitly supports it).
    */
  def binCount(df: DataFrame, value: Column, strategy: String): Int = strategy match {
    case "sturges" =>
      val n = df.filter(value.isNotNull).count()
      math.max(1, math.ceil(math.log(n.toDouble) / math.log(2.0) + 1).toInt)
    case "doane" =>
      val row = df.filter(value.isNotNull)
        .agg(count(lit(1)).as("n"), skewness(value.cast("double")).as("g1"))
        .collect()(0)
      val n = row.getLong(0).toDouble
      val g1 = if (row.isNullAt(1)) 0.0 else row.getDouble(1)
      val sigmaG1 = math.sqrt(6.0 * (n - 2) / ((n + 1) * (n + 3)))
      math.max(1, math.ceil(
        1 + math.log(n) / math.log(2.0) +
          math.log(1 + math.abs(g1) / sigmaG1) / math.log(2.0)).toInt)
    case other =>
      throw new IllegalArgumentException(s"unknown bin strategy: $other")
  }

  /** Grouped continuous histogram on SHARED bin edges (`plot.py:337-424`):
    * one global min/max pass broadcast into the bucketing expression, then
    * a single (group, bucket) aggregation; per-group density normalization
    * = count / (group_total * bin_width), numpy `density=True` semantics.
    */
  def groupHist(df: DataFrame, grp: Column, value: Column, bins: Int): DataFrame = {
    val mm = df.agg(min(value).cast("double").as("_lo"), max(value).cast("double").as("_hi"))
    val bucket = least(
      floor((value.cast("double") - col("_lo")) / (col("_hi") - col("_lo")) * bins),
      lit(bins - 1)).cast("int")
    val counts = df
      .filter(value.isNotNull)
      .crossJoin(broadcast(mm))
      .groupBy(grp.as("grp"), bucket.as("bucket"), col("_lo"), col("_hi"))
      .agg(count(lit(1)).as("cnt"))
    val gw = Window.partitionBy("grp")
    counts
      .withColumn("_gtotal", sum(col("cnt")).over(gw))
      .withColumn("lo", col("_lo") + (col("_hi") - col("_lo")) / bins * col("bucket"))
      .withColumn("hi", col("_lo") + (col("_hi") - col("_lo")) / bins * (col("bucket") + 1))
      .withColumn("density",
        col("cnt").cast("double") /
          (col("_gtotal") * ((col("_hi") - col("_lo")) / bins)))
      .select("grp", "bucket", "lo", "hi", "cnt", "density")
      .orderBy("grp", "bucket")
  }

  /** Sort policies for [[groupBarHist]] (`plot.py:488-496`): explicit
    * value order, cross-group mean (the reference's argsort-by-mean),
    * or a single named group's column.
    */
  sealed trait BarSort
  object BarSort {
    case object CrossGroupMean extends BarSort
    final case class ByGroup(group: String) extends BarSort
    final case class Explicit(order: Seq[String]) extends BarSort
  }

  /** Discrete grouped histogram pivoted groups→columns, per-group
    * normalized to percent (`plot.py:427-501`): value rows, one column per
    * group, sorted per [[BarSort]], top-k.
    */
  def groupBarHist(df: DataFrame, grp: Column, value: Column,
      groups: Seq[String], topK: Int = Int.MaxValue,
      sort: BarSort = BarSort.CrossGroupMean): DataFrame = {
    val counts = df.groupBy(value.as("value"), grp.as("grp")).agg(count(lit(1)).as("cnt"))
    val gw = Window.partitionBy("grp")
    val pct = counts
      .withColumn("pct", col("cnt").cast("double") / sum(col("cnt")).over(gw) * 100.0)
    val wide = pct.groupBy("value").pivot("grp", groups).agg(first(col("pct")))
    val filled = groups.foldLeft(wide)((acc, g) =>
      acc.withColumn(g, coalesce(col(s"`$g`"), lit(0.0))))
    val sortKey = sort match {
      case BarSort.CrossGroupMean =>
        groups.map(g => col(s"`$g`")).reduce(_ + _) / groups.size
      case BarSort.ByGroup(g) =>
        require(groups.contains(g), s"unknown group '$g'")
        col(s"`$g`")
      case BarSort.Explicit(order) =>
        // position in the explicit list; unlisted values sort last
        order.zipWithIndex.foldLeft(lit(order.size)) { case (acc, (v, i)) =>
          when(col("value") === v, lit(i)).otherwise(acc)
        } * -1 // align with the desc sort below
    }
    filled
      .withColumn("_sk", sortKey)
      .orderBy(col("_sk").desc, col("value"))
      .limit(topK)
      .drop("_sk")
  }

  /** Zigzag permutation of scores (`plot.py:222-237`): order wedges so
    * sizes alternate large/small around the pie — largest, smallest,
    * second-largest, second-smallest, … Driver-side over ≤ dozens of
    * groups, exactly like the reference.
    */
  def zigzagOrder[T](items: Seq[T], score: T => Double): Seq[T] = {
    val sorted = items.sortBy(score).reverse.toVector // descending
    val out = scala.collection.mutable.ArrayBuffer.empty[T]
    var lo = 0
    var hi = sorted.length - 1
    var takeBig = true
    while (lo <= hi) {
      if (takeBig) { out += sorted(lo); lo += 1 }
      else { out += sorted(hi); hi -= 1 }
      takeBig = !takeBig
    }
    out.toSeq
  }

  /** 2-D histogram prep + Pearson correlation (`plot.py:278-334`):
    * (bucket_x, bucket_y, count) over shared global extents.
    */
  def hist2d(df: DataFrame, x: Column, y: Column, bins: Int): DataFrame = {
    val mm = df.agg(
      min(x).cast("double").as("_xlo"), max(x).cast("double").as("_xhi"),
      min(y).cast("double").as("_ylo"), max(y).cast("double").as("_yhi"))
    def bucket(v: Column, lo: Column, hi: Column): Column =
      least(floor((v.cast("double") - lo) / (hi - lo) * bins), lit(bins - 1)).cast("int")
    df.filter(x.isNotNull && y.isNotNull)
      .crossJoin(broadcast(mm))
      .groupBy(
        bucket(x, col("_xlo"), col("_xhi")).as("bucket_x"),
        bucket(y, col("_ylo"), col("_yhi")).as("bucket_y"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("bucket_x", "bucket_y")
  }

  /** imagesc MultiIndex gridlines (`plot.py:656-664`): positions where
    * the first-level key changes in a sorted two-level key sequence —
    * the boundaries the renderer draws between level-0 blocks.
    * Driver-side over the (pivoted, display-sized) axis labels.
    */
  def gridlineBoundaries(sortedKeys: Seq[(String, String)]): Seq[Int] =
    sortedKeys.zip(sortedKeys.drop(1)).zipWithIndex.collect {
      case (((l0a, _), (l0b, _)), i) if l0a != l0b => i + 1
    }

  /** log-x plot prep (`plot.py:22-43`): prepend a 0 point. */
  def logxPrep(df: DataFrame, x: Column, y: Column): DataFrame = {
    val base = df.select(x.cast("double").as("x"), y.cast("double").as("y"))
    base.sparkSession.range(1).select(lit(0.0).as("x"), lit(0.0).as("y"))
      .unionByName(base)
  }
}
