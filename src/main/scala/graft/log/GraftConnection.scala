package graft.log

import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** 1:1 face of the reference's `Connection` (kafkaish
  * `src/connection.js`): a root under which topics are prepared and
  * cached. `connect()` is establishing the SparkSession + storage root;
  * `prepareTopic` returns the cached topic or creates its
  * infrastructure (connection.js:40-56).
  */
final class GraftConnection(val spark: SparkSession, val root: String) {
  private val topics = TrieMap.empty[String, TopicLog]

  /** prepareTopic: idempotent create-or-get (connection.js:42-55).
    * A cache hit with a DIFFERENT partition count is refused — every
    * offset/idempotence computation keys off numPartitions, so
    * silently returning the old topic would corrupt the caller's
    * routing assumptions. The cache guard only covers THIS process;
    * the durable backstop is TopicLog's on-disk `_partitions` pin,
    * which refuses a wrong-count reopen from any process (r9). */
  def prepareTopic(name: String, numPartitions: Int = 8): TopicLog = {
    val t = topics.getOrElseUpdate(name,
      TopicLog.prepare(spark, s"$root/$name", numPartitions))
    require(t.numPartitions == numPartitions,
      s"topic '$name' already prepared with ${t.numPartitions} " +
        s"partitions; asked for $numPartitions")
    t
  }

  /** The reference's close() drops the db handle; here topics are
    * just paths — clear the cache. */
  def close(): Unit = topics.clear()
}

object GraftConnection {
  /** kafkaish(uri).connect() analogue. */
  def connect(spark: SparkSession, root: String): GraftConnection =
    new GraftConnection(spark, root)
}
