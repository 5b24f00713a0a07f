package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Iterable ingestion with an accreting schema (reference
  * `create.py:19-213` df_from_iterable / series_from_iterable).
  *
  * Reference semantics reproduced:
  *  - a datum is a (possibly nested) key->value map; nested maps flatten
  *    with '_'-joined keys (`create.py:119-127`, `create.py:28-36`);
  *  - `None`/null sub-values are DROPPED, sparse-style (`create.py:34-35`);
  *  - a `transform` returning None drops the datum (`create.py:37-41`);
  *  - the schema ACCRETES: new keys start a column null-backfilled for
  *    prior rows; missing keys read as null (`create.py:146-159`) —
  *    pandas' NaN becomes honest SQL null;
  *  - per-column dtype pins apply as casts (`create.py:170-171`).
  *
  * Scale shape (SURVEY §7.4.7): schema discovery is a per-partition
  * StructType merge reduced on the driver (two narrow passes), never a
  * row-at-a-time driver loop; rows then materialize in executors against
  * the merged schema.
  */
object Ingest {

  type Datum = Map[String, Any]

  /** Flatten one level-arbitrary nested map with '_'-joined keys,
    * dropping null values.
    */
  def flatten(m: Datum, prefix: String = ""): Datum =
    m.flatMap {
      case (_, null) => Nil
      case (k, v: Map[_, _]) =>
        flatten(v.asInstanceOf[Datum], s"$prefix${k}_")
      case (k, v) => Seq(s"$prefix$k" -> v)
    }

  private def typeOf(v: Any): DataType = v match {
    case _: Int => LongType // accreting schema: widen ints to long up front
    case _: Long => LongType
    case _: Float => DoubleType
    case _: Double => DoubleType
    case _: Boolean => BooleanType
    case _: Array[Byte] => BinaryType
    case _: java.sql.Timestamp => TimestampType
    case _ => StringType
  }

  private def merge(a: DataType, b: DataType): DataType =
    if (a == b) a
    else if (Set(a, b) == Set(LongType: DataType, DoubleType: DataType)) DoubleType
    else StringType

  /** Build a DataFrame from an iterable of nested maps. */
  def dfFromIterable(
      spark: SparkSession,
      data: Iterable[Datum],
      transform: Datum => Option[Datum] = d => Some(d),
      dtypes: Map[String, DataType] = Map(),
      numSlices: Int = 0): DataFrame = {
    val sc = spark.sparkContext
    val slices = if (numSlices > 0) numSlices else sc.defaultParallelism
    // No cache: the source Iterable is driver-held, so re-running the
    // flatten for pass 2 is a cheap map (a cache here would leak block
    // storage for the app lifetime with no unpersist hook). `transform`
    // therefore runs once per pass and must be side-effect-free.
    val rdd = sc.parallelize(data.toSeq, math.max(1, math.min(slices, data.size)))
      .flatMap(d => transform(d).map(flatten(_)))
    // pass 1: per-partition schema merge, reduced driver-side (small)
    val fields = rdd
      .mapPartitions { it =>
        val acc = scala.collection.mutable.LinkedHashMap[String, DataType]()
        it.foreach(_.foreach { case (k, v) =>
          val t = typeOf(v)
          acc(k) = acc.get(k).map(merge(_, t)).getOrElse(t)
        })
        Iterator(acc.toSeq)
      }
      .reduce { (a, b) =>
        val acc = scala.collection.mutable.LinkedHashMap[String, DataType](a: _*)
        b.foreach { case (k, t) => acc(k) = acc.get(k).map(merge(_, t)).getOrElse(t) }
        acc.toSeq
      }
    val ordered = fields.map { case (k, t) => k -> dtypes.getOrElse(k, t) }.sortBy(_._1)
    val schema = StructType(ordered.map { case (k, t) => StructField(k, t, nullable = true) })
    // pass 2: materialize rows against the merged schema
    val rows = rdd.map { d =>
      Row.fromSeq(ordered.map { case (k, t) =>
        d.get(k).map(coerce(_, t)).orNull
      })
    }
    val out = spark.createDataFrame(rows, schema)
    out
  }

  private def coerce(v: Any, t: DataType): Any = (v, t) match {
    case (x: Int, LongType) => x.toLong
    case (x: Int, DoubleType) => x.toDouble
    case (x: Long, DoubleType) => x.toDouble
    case (x: Float, DoubleType) => x.toDouble
    // bytes merged into a string column: content-deterministic base64,
    // never Array.toString (a JVM identity string)
    case (x: Array[Byte], StringType) => java.util.Base64.getEncoder.encodeToString(x)
    case (x, StringType) => x.toString
    case (x: Int, IntegerType) => x
    case (x: Long, IntegerType) => x.toInt
    case (x, _) => x
  }

  /** series_from_iterable (`create.py:175-213`): single `value` column. */
  def seriesFromIterable(
      spark: SparkSession,
      data: Iterable[Any],
      transform: Any => Option[Any] = v => Some(v)): DataFrame =
    dfFromIterable(spark, data.map(v => Map("value" -> v)),
      d => transform(d("value")).map(v => Map("value" -> v)))
}
