package graft.operators

import org.apache.spark.sql.SparkSession

/** The ONE home for the per-session shared-stage cache lifecycle.
  * Three operator families memoize persisted DataFrames per
  * (session, fixture dir) — the ANN shared stages
  * ([[SimilarityQueries]]), the dedup CC labels ([[DedupQueries]]),
  * and the graph build stages ([[GraphQueries]]) — and each needs the
  * same two lifecycle rules:
  *  - EVICT entries whose session has stopped (a dead session's
  *    persisted frames are pure leak), checked on every cache access;
  *  - RELEASE a live session's entries on demand
  *    ([[graft.GraftSession.release]]), unpersisting BLOCKING so
  *    cached blocks are gone on return.
  * Writing the rules once means a lifecycle fix applies to every
  * family instead of drifting across three hand-copies. */
private[graft] object StageCaches {

  type Cache[T] = scala.collection.concurrent.TrieMap[(SparkSession, String), T]

  /** Evict dead-session entries, then memoize `build` per
    * (session, dir). `build` runs on a cache MISS only — use it to
    * persist the built value. */
  def memo[T](cache: Cache[T], s: SparkSession, dir: String)(
      build: => T): T = {
    cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    cache.getOrElseUpdate((s, dir), build)
  }

  /** Drop this session's entries, running `unpersist` on each removed
    * value (pass a blocking unpersist so blocks are gone on return). */
  def release[T](cache: Cache[T], s: SparkSession)(unpersist: T => Unit): Unit =
    cache.keys.toList.filter(_._1 eq s).foreach { key =>
      cache.remove(key).foreach(unpersist)
    }
}
