package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraints (EXT per SURVEY north star; the
  * Deequ/Great-Expectations shape re-expressed Spark-first): a
  * constraint suite compiles to ONE aggregation pass over the table —
  * every row-level predicate becomes a conditional count, uniqueness
  * becomes count vs approx-free exact distinct, and referential
  * integrity is the lone extra join (a LEFT ANTI against the referenced
  * keys). Output: one row per constraint,
  * (constraint, violations, checked, pass).
  *
  * Scale shape (100 TB): all row-level constraints share a single
  * map-side-combinable aggregate (one scan, no shuffle beyond the
  * 1-row combine); each `unique` adds one count_distinct (Spark
  * expands to Expand+partial aggregates — still one pass over the
  * scan); each `references` is a LEFT ANTI equi-join that AQE
  * broadcasts when the referenced key set is small.
  */
object Checks {

  /** One declarative constraint: `name` labels the output row. */
  sealed trait Constraint { def name: String }
  /** Rows where `cond` is FALSE or NULL count as violations. */
  case class Satisfies(name: String, cond: Column) extends Constraint
  case class NotNull(col0: String) extends Constraint {
    def name = s"not_null($col0)"
  }
  case class Unique(col0: String) extends Constraint {
    def name = s"unique($col0)"
  }
  case class InSet(col0: String, values: Seq[String]) extends Constraint {
    def name = s"in_set($col0)"
  }
  case class InRange(col0: String, lo: Double, hi: Double) extends Constraint {
    def name = s"in_range($col0)"
  }
  /** Every non-null `col0` value must exist in `ref`'s `refCol`. */
  case class References(col0: String, ref: DataFrame, refCol: String)
      extends Constraint {
    def name = s"references($col0)"
  }

  /** Run the suite; one row per constraint in the given order. */
  def check(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "Checks.check: empty constraint suite")
    val total = count(lit(1))
    def violCount(c: Constraint): Option[Column] = c match {
      case Satisfies(_, cond) =>
        Some(sum(when(coalesce(cond, lit(false)), 0L).otherwise(1L)))
      case NotNull(f) => Some(sum(when(col(f).isNull, 1L).otherwise(0L)))
      case InSet(f, vs) =>
        Some(sum(when(col(f).isin(vs: _*), 0L).otherwise(1L)))
      case InRange(f, lo, hi) =>
        Some(sum(when(col(f) >= lo && col(f) <= hi, 0L).otherwise(1L)))
      case Unique(f) => Some(total - count_distinct(col(f)) -
        sum(when(col(f).isNull, 1L).otherwise(0L)))
      case _: References => None
    }
    val aggs = constraints.flatMap(c => violCount(c).map(_.as(s"v_${c.name}")))
    val onePass = df.agg(total.as("_checked"), aggs: _*)
    val spark = df.sparkSession
    import spark.implicits._
    val refRows = constraints.collect { case r @ References(f, ref, rc) =>
      val viol = df.select(col(f)).filter(col(f).isNotNull)
        .join(ref.select(col(rc).as(f)), Seq(f), "left_anti")
        .count()
      (r.name, viol)
    }.toMap
    val base = onePass.head()
    val checked = base.getLong(0)
    val rows = constraints.map { c =>
      val v = c match {
        case r: References => refRows(r.name)
        case _ => base.getAs[Long](s"v_${c.name}")
      }
      (c.name, v, checked, v == 0L)
    }
    rows.toDF("constraint", "violations", "checked", "pass")
  }

  /** Referential-integrity audit across a schema's FK edges — the
    * warehouse-wide companion to a single [[References]] constraint:
    * one row per edge with the child row count, null-key count, orphan
    * count (non-null child keys absent from the parent) and rate.
    * Fully distributed: per edge ONE anti-join against the
    * DISTINCT-projected parent key (never the full parent row) plus one
    * 1-row aggregate, combined via a broadcast 1-row cross — no
    * driver-side counting, so a 100 TB fact table audits in one pass
    * per edge. Edges are (label, child, childKey, parent, parentKey).
    */
  def riAudit(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    require(edges.nonEmpty, "Checks.riAudit: empty edge list")
    edges.map { case (name, child, ck, parent, pk) =>
      val base = child.agg(count(lit(1)).as("_n"),
        sum(when(col(ck).isNull, 1L).otherwise(0L)).as("_nk"))
      val orphans = child.select(col(ck)).filter(col(ck).isNotNull)
        .join(parent.select(col(pk).as(ck)).distinct(), Seq(ck), "left_anti")
        .agg(count(lit(1)).as("_o"))
      base.crossJoin(broadcast(orphans))
        .select(lit(name).as("fk"), col("_n").as("child_rows"),
          col("_nk").as("null_keys"), col("_o").as("orphans"),
          round(col("_o").cast("double") / col("_n").cast("double"), 6)
            .as("orphan_rate"),
          (col("_o") === 0L && col("_nk") === 0L).as("pass"))
    }.reduce(_ unionByName _)
  }
}
