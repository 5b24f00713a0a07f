package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Parquet table loader for the driver test layout (`TESTDATA.md`):
  * one parquet file/dir per table under an sf directory. Centralizing the
  * read keeps scan options (and, at cluster scale, bucketing / FS config)
  * in one place.
  *
  * The driver's `events` table stores TIMESTAMP(NANOS), which Spark's
  * parquet reader rejects; sessions set
  * `spark.sql.legacy.parquet.nanosAsLong=true` and this loader converts
  * the long back to a timestamp. The data is micro-aligned (verified:
  * nanos % 1000 == 0 at every sf), and `div 1000` is exact integer
  * division (a double division would lose precision above 2^53), so the
  * round-trip is lossless.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None => df
    }
  }
}
