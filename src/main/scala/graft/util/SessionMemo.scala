package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Application-scoped DataFrame memo (the ErQueries.Shared pattern for
  * plain persisted frames): entries are keyed by
  * `applicationId|discriminator`; on every access, entries from OTHER
  * applications (stopped sessions) are unpersisted and evicted, and the
  * requested entry is built + persisted at most once per application.
  * One implementation so the eviction semantics cannot drift between the
  * memo sites (minhash pair table, ANN top-k tables). */
object SessionMemo {

  def cached(
      memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      spark: SparkSession,
      key: String)(build: => DataFrame): DataFrame = {
    val app = spark.sparkContext.applicationId
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey.startsWith(app + "|")) {
        try e.getValue.unpersist(false) catch { case _: Throwable => () }
        it.remove()
      }
    }
    memo.computeIfAbsent(s"$app|$key", _ =>
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
  }
}
