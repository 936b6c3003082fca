package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Single-shot keyed local checkpoint (r19 — the r18 two-step pin's
  * second E-materialization removed).
  *
  * `Dataset.localCheckpoint()` records the PHYSICAL plan's output
  * partitioning on the checkpointed `LogicalRDD`; under AQE the final
  * plan is an `AdaptiveSparkPlanExec` whose partitioning reads
  * `UnknownPartitioning` before execution, so a checkpointed
  * `repartition(n, key)` loses its `HashPartitioning` and every
  * downstream join/aggregate re-shuffles — the r18 workaround was a
  * TWO-step pin (materialize under AQE, then re-repartition+checkpoint
  * with AQE forced off), which wrote the edge list twice and toggled a
  * session-global conf.
  *
  * This builder sidesteps both costs: execute `repartition(n, key)`
  * normally (upstream keeps full AQE planning — broadcast demotion,
  * interior coalescing), locally checkpoint the result RDD, and
  * DECLARE the partitioning on the rebuilt `LogicalRDD` ourselves.
  * The declaration is sound because a user `repartition(n, cols)`
  * shuffle carries the `REPARTITION_BY_NUM` origin, which AQE never
  * coalesces or skew-splits: the physical rows land exactly by
  * `pmod(murmur3(key), n)` — the same `HashPartitioning(key, n)`
  * Catalyst would have recorded from a statically planned exchange.
  *
  * Lives under the `org.apache.spark.sql` namespace for the same
  * reason as [[ColumnBridge]]: `classic.Dataset.ofRows` and the
  * `LogicalRDD` constructor are `private[sql]`.
  */
object KeyedCheckpoint {

  /** Hash-repartition `df` on `key` into `n` partitions and return an
    * eagerly-materialized local checkpoint whose `LogicalRDD` carries
    * `HashPartitioning(key, n)`. One E-sized shuffle, one E-sized
    * block write.
    */
  def apply(df: DataFrame, key: String, n: Int): DataFrame = {
    val repart = df.repartition(n, org.apache.spark.sql.functions.col(key))
    val ds = repart.asInstanceOf[Dataset[_]]
    val session = ds.sparkSession.asInstanceOf[SparkSession]
    // same materialization steps as Dataset.localCheckpoint(eager=true):
    // copy the reused UnsafeRows, mark the RDD, force one computation
    val rdd = ds.queryExecution.toRdd.map(_.copy())
    rdd.localCheckpoint()
    rdd.count()
    val output = ds.queryExecution.analyzed.output
    val keyAttr = output.find(_.name == key).getOrElse(throw new IllegalArgumentException(
      s"KeyedCheckpoint: no column '$key' in ${output.map(_.name).mkString(", ")}"))
    Dataset.ofRows(session,
      LogicalRDD(output, rdd, HashPartitioning(Seq(keyAttr), n))(session))
  }
}
