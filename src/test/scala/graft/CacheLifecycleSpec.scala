package graft

import graft.queries.{CacheAccess, QueryCatalog}

/** Verifies QueryCatalog.sessionCaches — the DECLARED cache→consumers
  * sets the release schedule is derived from — against the INSTRUMENTED
  * accesses the cache getters record during a cold sorted catalog sweep.
  * The getters run at DataFrame construction time, so the sweep builds
  * every query (priming each cache once, at sf0.001) without executing
  * the query bodies.
  *
  * Why this spec exists: the release points used to be a hand-maintained
  * map keyed by "the last sorted consumer" read off the query list by a
  * human. Adding q100 to the catalog silently shifted the gram cache's
  * hold-span across 40 queries and recreated the round-5 storage-pool
  * eviction churn (q81 1.0s → 18.9s) before a bench run caught it. Now:
  *  - an UNDECLARED consumer (a new query touching a cache) fails here,
  *    forcing the consumer-set edit that moves the release automatically;
  *  - a STALE declared consumer (query renamed/dropped, or no longer
  *    touching the cache) fails here, so the release point can't silently
  *    trail the real last reader.
  */
class CacheLifecycleSpec extends SparkSpec {

  test("declared cache consumer sets match instrumented accesses on a cold sorted sweep") {
    // cold start: sibling suites share the session and may have primed
    // caches for this sfDir, which would hide transitive first-consumer
    // accesses (e.g. q106 reaching candidatePairs through the components
    // builder only when components is cold)
    QueryCatalog.sessionCaches.foreach(_.invalidate(spark, sf))
    CacheAccess.clear()

    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
    sorted.foreach { case (name, fn) =>
      CacheAccess.setQuery(name)
      fn(spark, sf) // construction only — getters record here
      QueryCatalog.cacheReleaseAfter.get(name)
        .foreach(_.foreach(release => release(spark, sf)))
    }
    val accessed: Map[String, Set[String]] = CacheAccess.accesses
      .groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    CacheAccess.clear()

    val declared = QueryCatalog.sessionCaches.map(c => c.name -> c).toMap
    // 1. every recorded access is declared — no silent new consumer
    for ((cache, queries) <- accessed) {
      val c = declared.getOrElse(cache,
        fail(s"cache '$cache' records accesses but declares no SessionCache"))
      val undeclared = queries -- c.consumers
      assert(undeclared.isEmpty,
        s"cache '$cache' has UNDECLARED consumers $undeclared — add them to " +
          "QueryCatalog.sessionCaches so the release point follows")
    }
    // 2. every declared consumer really reads the cache — no stale entry
    //    pinning the release later than the true last reader
    for (c <- QueryCatalog.sessionCaches) {
      val seen = accessed.getOrElse(c.name, Set.empty)
      val stale = c.consumers -- seen
      assert(stale.isEmpty,
        s"cache '${c.name}' declares consumers $stale that never accessed it " +
          "in the sweep — remove them (they pin the release point)")
    }
    // 3. the schedule invariant the derivation guarantees, asserted
    //    end-to-end: each cache's release runs at its last sorted consumer
    for (c <- QueryCatalog.sessionCaches) {
      assert(QueryCatalog.cacheReleaseAfter.contains(c.lastConsumer),
        s"cache '${c.name}': no release scheduled at last consumer ${c.lastConsumer}")
    }
  }

  test("LSH-family driver queries leak ZERO storage blocks once released " +
       "(q19/q25/q54/q89 executed end-to-end)") {
    // The r10 verdict's cache-pressure-roulette note: per-call checkpoint
    // blocks that waited on driver GC + ContextCleaner. Now every block is
    // owned — by a session cache (released at its invalidate) or by the
    // output ledger (released after the consuming action) — so a full
    // execute → release → invalidate cycle must leave the storage pool
    // exactly as it found it.
    val sc = spark.sparkContext
    QueryCatalog.sessionCaches.foreach(_.invalidate(spark, sf))
    graft.dedup.Checkpoints.releaseOutputs()
    val pre = sc.getPersistentRDDs.keySet
    for (name <- Seq("q19_minhash_pairs", "q25_lsh_ann_topk",
                     "q54_dedup_clusters", "q89_incremental_ingest")) {
      SparkEntry.queries(name)(spark, sf)
        .write.format("noop").mode("overwrite").save()
      QueryCatalog.cacheReleaseAfter.get(name)
        .foreach(_.foreach(release => release(spark, sf)))
      graft.dedup.Checkpoints.releaseOutputs()
      // caches the query primed whose release points are OTHER queries
      // (candidatePairs' last sorted consumer is q87, components' q54, …)
      QueryCatalog.sessionCaches.foreach(_.invalidate(spark, sf))
      val leaked = sc.getPersistentRDDs.keySet -- pre
      assert(leaked.isEmpty,
        s"$name leaked persisted RDDs ${leaked.toSeq.sorted}: " +
          leaked.toSeq.sorted.map(id => sc.getPersistentRDDs(id).name).mkString("; "))
    }
  }
}
