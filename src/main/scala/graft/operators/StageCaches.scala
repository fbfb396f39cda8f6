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
    * persist the built value. TrieMap.getOrElseUpdate is not atomic
    * for concurrent first callers (both evaluate `build`; one result
    * is dropped), so the race is resolved putIfAbsent-style and the
    * LOSING build is handed to `discard` — pass the family's blocking
    * unpersist so a lost race can't leak cache blocks for the life of
    * the session. */
  def memo[T](cache: Cache[T], s: SparkSession, dir: String)(
      build: => T)(discard: T => Unit): T = {
    cache.filterInPlace { case ((sess, _), _) => !sess.sparkContext.isStopped }
    val key = (s, dir)
    cache.get(key) match {
      case Some(v) => v
      case None =>
        val built = build
        cache.putIfAbsent(key, built) match {
          case None => built            // we won; our value is cached
          case Some(winner) =>          // lost the race: free our copy
            discard(built)
            winner
        }
    }
  }

  /** Drop this session's entries, running `unpersist` on each removed
    * value (pass a blocking unpersist so blocks are gone on return). */
  def release[T](cache: Cache[T], s: SparkSession)(unpersist: T => Unit): Unit =
    cache.keys.toList.filter(_._1 eq s).foreach { key =>
      cache.remove(key).foreach(unpersist)
    }
}
