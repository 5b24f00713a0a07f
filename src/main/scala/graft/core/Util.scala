package graft.core

import org.apache.spark.sql.{DataFrame, Row}

/** Small driver-facing utilities from the reference inventory. */
object Util {

  /** iterrows (`utils.py:844-875`): a SIZED row iterator — count computed
    * up front (the reference exposes len for progress bars), rows stream
    * through `toLocalIterator` (one partition in memory at a time, never a
    * full collect).
    */
  def iterrows(df: DataFrame): (Long, Iterator[Row]) = {
    import scala.jdk.CollectionConverters._
    (df.count(), df.toLocalIterator().asScala)
  }

  /** sizeof (`utils.py:451-466`): engine-estimated deep size in bytes of
    * the materialized frame (Catalyst plan statistics).
    */
  def sizeof(df: DataFrame): BigInt =
    df.queryExecution.optimizedPlan.stats.sizeInBytes

  /** dropna rows (`numpy.py:127-166` + pandas na.drop semantics):
    * how in {"any","all"} over the given columns (all columns if empty).
    */
  def dropna(df: DataFrame, how: String = "any", cols: Seq[String] = Nil): DataFrame =
    if (cols.isEmpty) df.na.drop(how) else df.na.drop(how, cols)

  /** Hard-bounded driver collect: rides a limit(cap+1) so the driver
    * read is provably at most cap+1 rows no matter what the frame turns
    * out to contain, then fails loudly (with the caller's context) if
    * the sentinel row arrived. The guard for every "metadata-sized
    * aggregate read driver-side" site (stratified allocation, Markov
    * transition matrix) — a 100 TB misuse (stratifying on an id column)
    * raises instead of OOMing the driver.
    */
  def boundedCollect(df: DataFrame, cap: Int, what: String): Array[Row] = {
    require(cap >= 1, s"boundedCollect: need cap>=1, got $cap")
    val rows = df.limit(cap + 1).collect()
    require(rows.length <= cap,
      s"$what: driver-side read exceeded $cap rows — " +
        "the key is not metadata-sized; fix the key or raise the cap deliberately")
    rows
  }

  /** dropna columns (`numpy.py:146-153` axis=columns): drop columns whose
    * null-fraction exceeds `maxNullFrac` — one aggregation pass for all
    * columns, then a driver-side schema prune (SURVEY #31 mapping).
    */
  def dropnaColumns(df: DataFrame, maxNullFrac: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.functions._
    val aggs = df.columns.map(c =>
      (sum(when(col(s"`$c`").isNull, 1L).otherwise(0L)) / count(lit(1))).as(c))
    val fracs = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    // empty frame -> null fractions -> no nulls exist -> keep everything
    val keep = df.columns.zipWithIndex.collect {
      case (c, i) if fracs.isNullAt(i) || fracs.getDouble(i) <= maxNullFrac => c
    }
    df.select(keep.map(c => col(s"`$c`")): _*)
  }
}
