package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD

/** Frees the executor storage behind a Dataset regardless of HOW it
  * was materialized. `Dataset.unpersist` only talks to the
  * CacheManager, so it releases `.cache()`/`.persist()` entries but is
  * a silent NO-OP for `localCheckpoint` blocks — those live as
  * RDD-level persistence under a `LogicalRDD` leaf the public API
  * never exposes. Without this, every checkpointed round of an
  * iterative job (connected components) leaks executor storage until
  * eviction pressure. Lives inside the org.apache.spark.sql package
  * namespace solely for access to the `private[sql]` plan node; no
  * Spark internals are modified.
  */
object BlockShim {
  def unpersist(df: Dataset[_], blocking: Boolean = false): Unit = {
    df.unpersist(blocking)
    df.queryExecution.logical match {
      case lr: LogicalRDD => lr.rdd.unpersist(blocking)
      case _              => ()
    }
  }
}
