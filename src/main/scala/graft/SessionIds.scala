package graft

import org.apache.spark.sql.SparkSession

/** Stable per-session identity for memo keys (broadcast caches, catalog
  * registrations, trained models).
  *
  * `System.identityHashCode(spark)` is NOT a stable identity: identity
  * hashes are reused, so after an old session is GC'd a NEW session can
  * land on the same hash and be handed cached `Broadcast` handles from a
  * stopped SparkContext — failing obscurely or serving a stale model.
  * Each live session instead gets one `applicationId|UUID` key, held in a
  * WeakHashMap so the entry (and with it the key) dies with the session
  * and can never be re-issued.
  */
object SessionIds {
  private val ids = new java.util.WeakHashMap[SparkSession, String]()

  def of(spark: SparkSession): String = ids.synchronized {
    var v = ids.get(spark)
    if (v == null) {
      v = spark.sparkContext.applicationId + "|" +
        java.util.UUID.randomUUID().toString
      ids.put(spark, v)
    }
    v
  }
}
