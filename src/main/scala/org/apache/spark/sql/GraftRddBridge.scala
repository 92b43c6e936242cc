package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge to the sql-private [[LogicalRDD]]: a localCheckpointed Dataset's
 *  analyzed plan is a LogicalRDD over the persisted checkpoint RDD — this
 *  returns that exact RDD handle so iterative algorithms can unpersist a
 *  SUPERSEDED checkpoint generation precisely, instead of diffing
 *  `sc.getPersistentRDDs` (which races with any concurrent job persisting
 *  its own RDDs in the same SparkContext). */
object GraftRddBridge {
  def checkpointRdd(df: Dataset[_]): Option[RDD[_]] =
    df.queryExecution.analyzed match {
      case l: LogicalRDD => Some(l.rdd)
      case _             => None
    }
}
