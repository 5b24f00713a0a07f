package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.operators.{Coo, Relational, VizPrep}
import graft.sources.LoadDump

class CoverageGapsSpec extends SparkSpec {
  import spark.implicits._

  test("stackIndices: struct composite key (utils.py:611-627)") {
    val df = Seq((1, "a", 5.0), (2, "b", 6.0)).toDF("k1", "k2", "v")
    val out = Relational.stackIndices(df, Seq("k1", "k2"))
    val key = out.select("key").head().getStruct(0)
    assert(key.getInt(0) == 1 && key.getString(1) == "a")
    assert(out.select(col("key.k2")).collect().map(_.getString(0)).toSet == Set("a", "b"))
  }

  test("null predicates: NaN vs null are distinct in Spark (A3 fixture, numpy.py:16-52)") {
    val df = Seq(Some(1.0), Some(Double.NaN), None, Some(2.0)).toDF("x")
    assert(df.filter(isnan(col("x"))).count() == 1)          // only NaN
    assert(df.filter(col("x").isNull).count() == 1)          // only null
    assert(df.filter(isnan(col("x")) || col("x").isNull).count() == 2)
    // fillnullscalar analogue: coalesce fills null but NOT NaN
    val filled = df.select(coalesce(col("x"), lit(-1.0)).as("x"))
    assert(filled.filter(col("x") === -1.0).count() == 1)
    assert(filled.filter(isnan(col("x"))).count() == 1)
    // nanvl handles the NaN side
    val both = df.select(coalesce(nanvl(col("x"), lit(-1.0)), lit(-1.0)).as("x"))
    assert(both.filter(col("x") === -1.0).count() == 2)
  }

  test("binaryFile source: file bytes as BinaryType (numpy.py:75-124 asnpbytearray)") {
    val tmp = Files.createTempDirectory("graft_bin")
    Files.write(tmp.resolve("blob.bin"), "hello graft".getBytes("UTF-8"))
    val df = LoadDump.load(spark, s"$tmp/blob.bin")
    val row = df.select("length", "content").head()
    assert(row.getLong(0) == 11L)
    assert(new String(row.getAs[Array[Byte]](1), "UTF-8") == "hello graft")
    // feed straight into the byte machinery
    val e = df.select(graft.functions.ByteFunctions.shannon_entropy(col("content")))
      .head().getDouble(0)
    assert(e > 0.0 && e < 8.0)
  }

  test("Coo: slice/density/todense/transpose/stack (sparse.py:22-167)") {
    val coo = Seq((1, "a", 2.0), (1, "b", 3.0), (2, "a", 4.0))
      .toDF("row_key", "col_key", "value")
    assert(Coo.density(coo, 2, 2).head().getDouble(0) == 0.75)
    assert(Coo.slice(coo, rows = Seq(1)).count() == 2)
    assert(Coo.slice(coo, rows = Seq(1), cols = Seq("b")).count() == 1)
    val dense = Coo.todense(coo, Seq("a", "b")).orderBy("row_key").collect()
    assert(dense(0).getDouble(1) == 2.0 && dense(0).getDouble(2) == 3.0)
    assert(dense(1).getDouble(1) == 4.0 && dense(1).getDouble(2) == 0.0) // fill
    val t = Coo.transpose(coo)
    assert(t.columns.toSeq == Seq("row_key", "col_key", "value"))
    assert(t.filter(col("row_key") === "b").count() == 1)
    assert(Coo.stack(coo).collect().length == 3)
  }

  test("Coo.sliceAt: positional half-open ranges over sorted label domains") {
    val coo = Seq((10, "a", 1.0), (20, "b", 2.0), (30, "a", 3.0), (30, "c", 4.0))
      .toDF("row_key", "col_key", "value")
    // row positions: 10->0, 20->1, 30->2; col: a->0, b->1, c->2
    assert(Coo.sliceAt(coo, rowRange = Some((0L, 2L))).count() == 2) // rows 10,20
    val cells = Coo.sliceAt(coo, rowRange = Some((1L, 3L)), colRange = Some((0L, 2L)))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(cells == Set((20, "b"), (30, "a")))
    assert(Coo.sliceAt(coo).count() == 4) // no bounds = identity
  }

  test("logxPrep: prepends the (0,0) point (plot.py:22-43)") {
    val df = Seq((1.0, 10.0), (2.0, 20.0)).toDF("a", "b")
    val out = VizPrep.logxPrep(df, col("a"), col("b")).orderBy("x").collect()
    assert(out.length == 3 && out.head.getDouble(0) == 0.0 && out.head.getDouble(1) == 0.0)
  }

  test("LoadDump.resolve: autoload Either surface (utils.py:516-554)") {
    val tmp = Files.createTempDirectory("graft_auto").toString
    val df = Seq((1, "x")).toDF("k", "v")
    LoadDump.dump(df, s"$tmp/t.parquet")
    assert(LoadDump.resolve(spark, Left(df)).count() == 1)
    assert(LoadDump.resolve(spark, Right(s"$tmp/t.parquet")).count() == 1)
  }
}
