package org.apache.spark.graftbridge

import org.apache.hadoop.conf.Configuration
import org.apache.spark.SparkContext
import org.apache.spark.broadcast.Broadcast
import org.apache.spark.util.SerializableConfiguration

/** Serializable broadcast of the session Hadoop configuration, usable
  * from executor tasks (Spark's SerializableConfiguration is
  * private[spark]; this shim is the same access pattern as
  * [[org.apache.spark.sql.graftbridge.ExpressionBridge]]). */
class HadoopConfBroadcast private[graftbridge] (
    bc: Broadcast[SerializableConfiguration]) extends Serializable {
  def value: Configuration = bc.value.value
}

object ConfBridge {
  def broadcast(sc: SparkContext): HadoopConfBroadcast =
    new HadoopConfBroadcast(SerializableConfiguration.broadcast(sc))
}
