package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Application-scoped memo (the ErQueries.Shared pattern): entries are
  * keyed by `applicationId|discriminator`; on every access, entries from
  * OTHER applications (stopped sessions) are released and evicted, and
  * the requested entry is built at most once per application. One
  * implementation so the eviction semantics cannot drift between the
  * memo sites (minhash pair table, ANN top-k tables, the survivor
  * index). */
object SessionMemo {

  /** Typed variant: `release` frees a stale entry's resources (failures
    * swallowed — a stopped session's frames may already be gone). */
  def cachedEntry[T](
      memo: java.util.concurrent.ConcurrentHashMap[String, T],
      spark: SparkSession,
      key: String)(build: => T)(release: T => Unit): T = {
    val app = spark.sparkContext.applicationId
    val it = memo.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (!e.getKey.startsWith(app + "|")) {
        try release(e.getValue) catch { case _: Throwable => () }
        it.remove()
      }
    }
    memo.computeIfAbsent(s"$app|$key", _ => build)
  }

  /** DataFrame entries: persisted on build, unpersisted on eviction. */
  def cached(
      memo: java.util.concurrent.ConcurrentHashMap[String, DataFrame],
      spark: SparkSession,
      key: String)(build: => DataFrame): DataFrame =
    cachedEntry(memo, spark, key)(
      build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))(
      _.unpersist(false))
}
