package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver test layout (`TESTDATA.md`):
  * one parquet file/dir per table under an sf directory. Centralizing the
  * read keeps scan options (and, at cluster scale, bucketing / FS config)
  * in one place.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
