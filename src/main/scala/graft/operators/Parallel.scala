package graft.operators

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import org.apache.spark.sql.{DataFrame, Dataset, Encoder}

/** The reference's parallel-apply engine (`parallel.py:16-93` papply,
  * `create.py:136-143` worker pools) — in Spark the row axis IS the
  * cluster, so these helpers are thin, deliberate wrappers:
  *
  *  - row-parallel apply  -> `mapPartitions` on a typed Dataset (the
  *    reference's chunk-apply with the process pool replaced by executor
  *    tasks; `gen_slices` batch balancing is Spark partitioning);
  *  - column-parallel apply (papply axis=1, `parallel.py:61-72`) ->
  *    concurrent INDEPENDENT Spark jobs, one per column, sharing the
  *    scheduler — the analogue of the reference's per-column worker fanout
  *    in `column_stats` (`utils.py:803-808`).
  */
object Parallel {

  /** Row-wise parallel apply: partition-at-a-time, like papply's
    * chunk.apply with ordered concat (Spark preserves partition order).
    */
  def papplyRows[T, U: Encoder](ds: Dataset[T], f: Iterator[T] => Iterator[U],
      numPartitions: Int = 0): Dataset[U] = {
    val in = if (numPartitions > 0) ds.repartition(numPartitions) else ds
    in.mapPartitions(f)
  }

  /** Column-wise parallel apply: run `f(column)` as concurrent Spark jobs
    * and collect the (small) per-column results in input order. `f`
    * returns a driver-side value (the reference's per-column Series
    * results were also driver-held before the final concat).
    *
    * `timeout` bounds the driver block — a hung column job (e.g. a
    * starved scheduler pool) fails the whole call with a
    * `TimeoutException` instead of wedging the driver forever. The
    * default is deliberately finite; pass `Duration.Inf` only when the
    * caller owns its own watchdog.
    */
  def papplyColumns[R](df: DataFrame, cols: Seq[String], f: (DataFrame, String) => R,
      timeout: Duration = Duration("1h"))
      (implicit ec: ExecutionContext = ExecutionContext.global): Seq[R] = {
    val futures = cols.map(c => Future(f(df, c)))
    Await.result(Future.sequence(futures), timeout)
  }
}
