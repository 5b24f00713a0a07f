package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph data prep (reference `networkx.py:21-151` draw_graph): the graph
  * is a pair of DataFrames — `vertices(id, attrs…)` and
  * `edges(src, dst, attrs…)` (GraphFrames convention) — and every
  * driver-side table the reference's renderer consumes is a distributed
  * aggregation here. Rendering itself stays out of engine scope
  * (SURVEY #36).
  */
object Graph {

  /** Node-attribute table (`networkx.py:90`): vertices left-joined with an
    * attribute frame on id (the reference's `reindex` onto the node list).
    */
  def nodeAttrTable(vertices: DataFrame, attrs: DataFrame, idCol: String): DataFrame =
    vertices.join(attrs, Seq(idCol), "left")

  /** Color-group table (`networkx.py:95-111`): group nodes by a color
    * attribute; the reference builds {color -> node list} — here the group
    * plus member count and the (sorted) member sample the renderer needs.
    */
  def colorGroups(vertices: DataFrame, idCol: String, colorCol: String,
      sampleSize: Int = 100): DataFrame = {
    // counts over ALL nodes, but collect_list only over the first
    // `sampleSize` ids per color (window-ranked) — aggregation state stays
    // bounded even when one color dominates a billion-vertex graph.
    val counts = vertices
      .groupBy(col(colorCol).as("color"))
      .agg(count(lit(1)).as("n_nodes"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(colorCol)).orderBy(col(idCol).asc)
    val sample = vertices
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= sampleSize)
      .groupBy(col(colorCol).as("color"))
      .agg(sort_array(collect_list(col(idCol))).as("node_sample"))
    counts.join(sample, Seq("color"), "left").orderBy("color")
  }

  /** Degree table: in/out/total degree per vertex from the edge list —
    * two hash aggregations + one outer join, no vertex-side shuffle of
    * attributes.
    */
  def degrees(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val out = edges.groupBy(col(srcCol).as("id")).agg(count(lit(1)).as("out_degree"))
    val in = edges.groupBy(col(dstCol).as("id")).agg(count(lit(1)).as("in_degree"))
    out.join(in, Seq("id"), "full_outer")
      .select(col("id"),
        coalesce(col("out_degree"), lit(0L)).as("out_degree"),
        coalesce(col("in_degree"), lit(0L)).as("in_degree"))
      .withColumn("degree", col("out_degree") + col("in_degree"))
  }

  /** Edge-label extraction (`networkx.py:144-149`): (src, dst, label)
    * from an edge attribute, nulls dropped like the reference's
    * non-null label filter.
    */
  def edgeLabels(edges: DataFrame, srcCol: String, dstCol: String, attr: String): DataFrame =
    edges
      .filter(col(attr).isNotNull)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"), col(attr).cast("string").as("label"))
}
