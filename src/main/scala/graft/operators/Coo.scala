package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Labeled sparse matrix as a long-form COO frame `(row_key, col_key,
  * value)` — the Spark-canonical form of the reference's `SparseDataFrame`
  * (`sparse.py:22-167`); the reference's own `stack()` produces exactly
  * this shape, so `stack` here is the identity.
  *
  * Dense views pivot on demand; slicing is a filter/join (pushed to the
  * scan); density is a count over known dimensions. Nothing materializes
  * a dense matrix distributed-side unless `todense` is asked for.
  */
object Coo {

  /** Build a COO frame from any df: (row, col, sum(value)). */
  def fromDf(df: DataFrame, rowCol: String, colCol: String, valueCol: String): DataFrame =
    df.groupBy(col(rowCol).as("row_key"), col(colCol).as("col_key"))
      .agg(sum(col(valueCol)).as("value"))

  /** nnz / (nRows * nCols) (`sparse.py:65-75`). Dimensions are explicit
    * (label-domain sizes), as in the reference's constructor.
    */
  def density(coo: DataFrame, nRows: Long, nCols: Long): DataFrame =
    coo.agg((count(lit(1)).cast("double") / (nRows.toDouble * nCols.toDouble)).as("density"))

  /** Label slice = pushed-down filter (`sparse.py:94-104`). */
  def slice(coo: DataFrame, rows: Seq[Any] = Nil, cols: Seq[Any] = Nil): DataFrame = {
    val afterRows = if (rows.isEmpty) coo else coo.filter(col("row_key").isin(rows: _*))
    if (cols.isEmpty) afterRows else afterRows.filter(col("col_key").isin(cols: _*))
  }

  /** Positional (iloc-style) slice (`sparse.py:94-104` also accepts
    * integer positions): position = rank of the key in its sorted label
    * domain. The label domains are TWO SMALL DISTINCT SETS (matrix axis
    * labels, like the reference's in-memory index arrays) — ranked with a
    * dense_rank window and joined back broadcast-style; the data frame
    * itself never sorts globally. Positions are 0-based, half-open
    * ranges, like iloc.
    */
  def sliceAt(coo: DataFrame, rowRange: Option[(Long, Long)] = None,
      colRange: Option[(Long, Long)] = None): DataFrame = {
    // two-phase rank, not a partition-less dense_rank window: axis label
    // domains are usually small, but a COO matrix with corpus-scale axes
    // must not funnel a whole domain through one task
    def ranked(keyCol: String): DataFrame =
      Relational.twoPhaseDenseIds(coo.select(col(keyCol)).distinct(), Seq(keyCol), "_pos1")
        .withColumn("_pos", col("_pos1") - 1).drop("_pos1")
    def bound(df: DataFrame, keyCol: String, range: Option[(Long, Long)]): DataFrame =
      range match {
        case None => df
        case Some((lo, hi)) =>
          val r = ranked(keyCol).filter(col("_pos") >= lo && col("_pos") < hi).drop("_pos")
          df.join(broadcast(r), Seq(keyCol), "left_semi")
      }
    // joins reorder columns (key first); restore the input order
    bound(bound(coo, "row_key", rowRange), "col_key", colRange)
      .select(coo.columns.map(col): _*)
  }

  /** Dense pivot (`sparse.py:106-129` todense): one row per row_key, one
    * column per col_key value. `colValues` pins the output schema (and
    * avoids Spark's extra distinct-scan job); missing entries fill with
    * the given value (the reference's CSR fill is 0).
    */
  def todense(coo: DataFrame, colValues: Seq[String], fill: Double = 0.0): DataFrame = {
    val p = coo.groupBy(col("row_key"))
      .pivot("col_key", colValues)
      .agg(first(col("value")))
    colValues.foldLeft(p)((acc, c) =>
      acc.withColumn(c, coalesce(col(s"`$c`").cast("double"), lit(fill))))
  }

  /** `stack()` (`sparse.py:153-167`): identity on the canonical form. */
  def stack(coo: DataFrame): DataFrame = coo

  /** Matrix transpose: swap the key roles — a projection. */
  def transpose(coo: DataFrame): DataFrame =
    coo.select(col("col_key").as("row_key"), col("row_key").as("col_key"), col("value"))
}
