package graft.queries

import scala.collection.mutable.ArrayBuffer

/** Instrumentation for the session-cache getters (star, splitGrams,
  * candidatePairs, components, corpus): each getter calls
  * [[record]] on EVERY access — cache hit or fill — and a sweep harness
  * brackets each query's construction with [[setQuery]]. The recorded
  * (query, cache) pairs are ground truth for
  * [[QueryCatalog.sessionCaches]]' declared consumer sets, verified by
  * CacheLifecycleSpec: an undeclared consumer fails the spec instead of
  * silently shifting a release point and re-creating the round-5
  * eviction churn (q81 1.0s → 18.9s from one hand-maintained entry).
  *
  * Accesses happen at DataFrame CONSTRUCTION time — the getters run
  * inside the query builder functions, not inside Spark jobs — so the
  * spec can sweep the whole catalog without executing a single query.
  * Recording is a no-op-cheap append; when no sweep is active the query
  * context is simply "" and the log grows by a few tuples per build,
  * bounded by [[clear]] in the harness.
  */
object CacheAccess {
  private val log = ArrayBuffer.empty[(String, String)]
  @volatile private var current: String = ""

  /** Set the query-name context for subsequent [[record]] calls (sweep
    * harness only; single-threaded by construction).
    */
  def setQuery(name: String): Unit = current = name

  /** Called by each cache getter with its cache name. */
  def record(cache: String): Unit =
    log.synchronized { log += ((current, cache)) }

  /** All (query, cache) accesses since the last [[clear]]. */
  def accesses: Seq[(String, String)] =
    log.synchronized { log.toVector }

  def clear(): Unit = {
    log.synchronized { log.clear() }
    current = ""
  }
}
