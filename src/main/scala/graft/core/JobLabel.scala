package graft.core

import org.apache.spark.sql.SparkSession

/** Job labelling (optimization guide §1.5): multi-job protocol paths
  * (sink commits, iterative CC/graph rounds, per-batch index steps)
  * set a thread-local job description so profilers and the UI can
  * attribute each launched job to its phase — foreachBatch bodies all
  * inherit the stream-start call site otherwise. Zero plan impact;
  * the previous description is restored on exit (phases nest).
  */
object JobLabel {
  def apply[T](spark: SparkSession, label: String)(body: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getLocalProperty("spark.job.description")
    sc.setJobDescription(label)
    try body
    finally sc.setJobDescription(prev)
  }
}
