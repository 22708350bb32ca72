package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** One batch step of incremental connected components (the q249
  * maintenance loop, exposed so the absorption paths can be
  * spec-tested on synthetic edge sequences).
  *
  * Contract: `labels` is the current (id, cluster_id) table holding
  * the min-member-id label invariant; `edges` is the batch's new
  * (id_a, id_b) pairs. Returns exactly the rows to UPSERT — new
  * nodes with their final labels plus every member of a component
  * absorbed into a smaller label. Cost is O(|edges| + members of
  * changed components); the label-contraction CC runs on a frame of
  * at most 2|edges| label nodes (component-cardinality metadata),
  * via the same two-tier fixpoint as the batch path
  * ([[Dedup.connectedComponents]]). Applying the returned upserts
  * preserves the invariant, so any edge-arrival order converges to
  * the one-shot batch CC bit-for-bit.
  */
object IncrementalCc {

  def labelSchema: StructType = StructType(Seq(
    StructField("id", LongType), StructField("cluster_id", LongType)))

  def emptyLabels(s: SparkSession): DataFrame =
    s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row], labelSchema)

  def applyBatch(s: SparkSession, labels: DataFrame, edges: DataFrame): DataFrame = {
    val lab = labels.select(col("id"), col("cluster_id"))
    val eps = edges.select(col("id_a").as("id"))
      .unionByName(edges.select(col("id_b").as("id"))).distinct()
    val withLbl = eps.join(lab, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("lbl"))
      .localCheckpoint(true)
    val contraction = edges
      .join(withLbl.select(col("id").as("id_a"), col("lbl").as("la")), "id_a")
      .join(withLbl.select(col("id").as("id_b"), col("lbl").as("lb")), "id_b")
      .select(col("la"), col("lb")).filter(col("la") =!= col("lb"))
    val mapping =
      if (contraction.isEmpty)
        s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(Seq(StructField("old_lbl", LongType), StructField("new_lbl", LongType))))
      else Dedup.connectedComponents(contraction, "la", "lb")
        .select(col("id").as("old_lbl"), col("cluster_id").as("new_lbl"))
    val withFinal = withLbl
      .join(mapping, withLbl("lbl") === mapping("old_lbl"), "left")
      .select(col("id"), coalesce(col("new_lbl"), col("lbl")).as("cluster_id"))
    val newNodes = withFinal.join(lab.select(col("id")), Seq("id"), "left_anti")
    val absorbed = lab.as("l")
      .join(mapping.filter(col("new_lbl") =!= col("old_lbl")),
        col("l.cluster_id") === col("old_lbl"))
      .select(col("l.id").as("id"), col("new_lbl").as("cluster_id"))
    newNodes.unionByName(absorbed)
  }
}
