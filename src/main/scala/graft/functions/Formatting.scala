package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Human-readable magnitude formatting (reference `format.py:10-62`
  * `_HumanReadableFormatter`): SI (1000-step) or binary (1024-step)
  * prefix selection. The numeric half — (mantissa, suffix) — is engine-
  * deterministic and oracle-checkable; the final string assembly (which
  * needs locale/precision printf parity no two engines share) is the
  * driver-side [[format]] helper, mirroring how the reference uses it
  * only at render time.
  */
object Formatting {

  private val siSuffixes = Seq("", "K", "M", "G", "T", "P")
  private val binSuffixes = Seq("", "Ki", "Mi", "Gi", "Ti", "Pi")

  /** Magnitude tier 0..5: largest k with |v| >= step^k. */
  def tier(v: Column, step: Double): Column =
    (1 to 5).foldLeft(lit(0)) { (acc, k) =>
      when(abs(v) >= math.pow(step, k), lit(k)).otherwise(acc)
    }

  /** Mantissa after dividing by step^tier (raw double — no rounding, so
    * both engines agree bit-for-bit).
    */
  def mantissa(v: Column, step: Double = 1000.0): Column =
    v / pow(lit(step), tier(v, step).cast("double"))

  def suffix(v: Column, binary: Boolean = false): Column = {
    val step = if (binary) 1024.0 else 1000.0
    val names = if (binary) binSuffixes else siSuffixes
    val sel = names.zipWithIndex.foldLeft(lit(names.head)) { case (acc, (s, k)) =>
      when(tier(v, step) === k, lit(s)).otherwise(acc)
    }
    // null value -> null suffix, matching mantissa's null propagation
    when(v.isNull, lit(null).cast("string")).otherwise(sel)
  }

  /** Driver-side string assembly (render-time only, like format.py:24). */
  def format(value: Double, binary: Boolean = false, precision: Int = 1): String = {
    val step = if (binary) 1024.0 else 1000.0
    val names = if (binary) binSuffixes else siSuffixes
    val k = names.indices.reverse.find(i => math.abs(value) >= math.pow(step, i)).getOrElse(0)
    s"%.${precision}f%s".formatLocal(java.util.Locale.ROOT, value / math.pow(step, k), names(k))
  }
}
