package graft.queries

import org.apache.spark.sql.SparkSession
import graft.io.Tables

/** The pure-SQL surface of the engine: table views over an sf directory,
  * scalar SQL macros, and SQL table-valued functions (Spark 4 SQL UDFs —
  * `CREATE TEMPORARY FUNCTION … RETURN <expr|SELECT>`). A SQL-only consumer
  * gets the same operators the Column API exposes:
  *
  * {{{
  *   GraftSql.register(spark, "/data/sf0.1")
  *   spark.sql("SELECT * FROM gap_sessions(1800)")
  *   spark.sql("SELECT graft_surrogate_key(c_custkey, c_name) FROM customer")
  * }}}
  *
  * Macro bodies are SQL spellings of the exact Column expressions in
  * [[graft.ops.CoreOps]]/[[graft.dedup.Dedup]]/[[QueryCatalog]] — SQL UDFs
  * inline into the plan at parse time (they are macros, not runtime
  * calls), so Catalyst sees the same tree either way; GraftSqlSpec pins
  * twin-for-twin equality, and q84 drives the TVF path under the DuckDB
  * oracle. The native expressions (minhash_sig, simhash64, …) are
  * registered separately by [[graft.functions.GraftFunctions]].
  */
object GraftSql {

  private val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register views + all SQL macros/TVFs on the session (idempotent). */
  def register(s: SparkSession, dir: String): Unit = {
    tables.foreach(t => Tables.table(s, dir, t).createOrReplaceTempView(t))
    graft.functions.GraftFunctions.register(s)
    scalarMacros.foreach(s.sql(_))
    tableFunctions.foreach(s.sql(_))
  }

  /** Scalar macros: each body is the SQL spelling of its Column twin. */
  val scalarMacros: Seq[String] = Seq(
    // CoreOps.surrogateKey (the dbt surrogate-key macro, 2-arg arity;
    // SQL UDFs are not variadic)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_surrogate_key(a STRING, b STRING)
      |RETURNS STRING
      |RETURN md5(concat_ws('-', coalesce(a, '_null_'), coalesce(b, '_null_')))""".stripMargin,
    // CoreOps.roundPortable: floor(x*10^d + 0.5)/10^d — the engine-portable
    // rounding every checked double goes through
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_round_portable(x DOUBLE, d INT)
      |RETURNS DOUBLE
      |RETURN floor(x * power(10.0, d) + 0.5d) / power(10.0, d)""".stripMargin,
    // TextOps.tokenCount
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_token_count(t STRING)
      |RETURNS INT
      |RETURN CASE WHEN length(trim(t)) = 0 THEN 0
      |            ELSE size(split(trim(t), '\\s+')) END""".stripMargin,
    // Dedup.jaccard over two string arrays
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_jaccard(a ARRAY<STRING>, b ARRAY<STRING>)
      |RETURNS DOUBLE
      |RETURN CASE WHEN size(a) + size(b) - size(array_intersect(a, b)) = 0 THEN 0.0d
      |            ELSE CAST(size(array_intersect(a, b)) AS DOUBLE)
      |                 / CAST(size(a) + size(b) - size(array_intersect(a, b)) AS DOUBLE) END""".stripMargin,
    // Dedup.shingles: ALL word n-grams (n a macro arg; < n words => one gram)
    """CREATE OR REPLACE TEMPORARY FUNCTION graft_shingles(t STRING, n INT)
      |RETURNS ARRAY<STRING>
      |RETURN CASE
      |  WHEN size(split(trim(lower(t)), '\\s+')) < n
      |    THEN array(array_join(split(trim(lower(t)), '\\s+'), ' '))
      |  ELSE transform(
      |    sequence(1, size(split(trim(lower(t)), '\\s+')) - n + 1),
      |    i -> array_join(slice(split(trim(lower(t)), '\\s+'), i, n), ' '))
      |END""".stripMargin)

  /** Table-valued functions over the registered views. */
  val tableFunctions: Seq[String] = Seq(
    // EventStreams.gapSessions / q64 at second granularity, gap as an arg.
    // Spelled as the lag/cumsum island form rather than `session_window`:
    // the SessionWindowing analyzer rule does not survive SQL-UDF parameter
    // inlining (the grouped window expression fails to re-unify after
    // substitution), and the two forms are equivalent — merge-at-boundary
    // semantics pinned against each other by Round5Spec and the q64 oracle.
    """CREATE OR REPLACE TEMPORARY FUNCTION gap_sessions(gap_seconds INT)
      |RETURNS TABLE (user_id BIGINT, session_start STRING, session_end STRING,
      |               n_events BIGINT, session_value DOUBLE)
      |RETURN
      |  SELECT user_id,
      |    date_format(min(ts_sec), 'yyyy-MM-dd HH:mm:ss') AS session_start,
      |    date_format(max(ts_sec) + make_dt_interval(0, 0, 0, gap_seconds), 'yyyy-MM-dd HH:mm:ss') AS session_end,
      |    count(1) AS n_events,
      |    CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS session_value
      |  FROM (
      |    SELECT user_id, ts_sec, value,
      |      sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC
      |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |    FROM (
      |      SELECT user_id, event_id, ts_sec, value,
      |        CASE WHEN lag(ts_sec) OVER w IS NULL
      |               OR unix_timestamp(ts_sec) - unix_timestamp(lag(ts_sec) OVER w) > gap_seconds
      |             THEN 1 ELSE 0 END AS is_new
      |      FROM (SELECT user_id, event_id, date_trunc('second', ts) AS ts_sec, value FROM events)
      |      WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec ASC, event_id ASC)))
      |  GROUP BY user_id, sid""".stripMargin,
    // QueryCatalog.ngramCounts (q62) with n and k as args. Top-k rides
    // the native bounded-heap aggregate (topk_structs): state is a
    // constant-bounded sorted buffer at every node of the partial/merge
    // tree, so the global top-k shuffles partitions×cap entries —
    // scale-parity with the Column API's TakeOrderedAndProject, where
    // the former `row_number() OVER (ORDER BY …)` form sorted EVERY
    // distinct gram through one partition (the r10 verdict's
    // SQL-surface trap). The UDF-body analyzer allows the parameter k
    // in neither LIMIT (must be foldable) nor inside an aggregate call
    // (no outer refs in aggregate functions), so the aggregate keeps a
    // fixed 4096-entry cap and `pos < k` trims outside it — the macro
    // surface therefore serves k ≤ 4096 (beyond that is a frequency
    // REPORT, not a top-k; the Column-API q62 path has no cap). The cap
    // is ENFORCED in the body: k > 4096 raise_errors instead of silently
    // returning 4096 rows presented as the top-k (the CASE keeps the
    // raise lazy, so in-cap calls never evaluate it). The guard wraps the
    // AGGREGATE's array — a global aggregate yields exactly one row even
    // over zero input rows, so an over-cap k raises unconditionally (a
    // per-row WHERE guard would silently return empty on an empty corpus
    // — the r12 advisory). Sort key = struct field order:
    // (-count, gram) = count DESC, gram ASC.
    """CREATE OR REPLACE TEMPORARY FUNCTION doc_ngrams(n INT, k INT)
      |RETURNS TABLE (gram STRING, n_occurrences BIGINT, n_docs BIGINT)
      |RETURN
      |  SELECT s.gram AS gram, s.n_occurrences AS n_occurrences, s.n_docs AS n_docs
      |  FROM (
      |    SELECT posexplode(CASE WHEN k > 4096
      |             THEN raise_error('doc_ngrams: k must be <= 4096 (bounded-heap cap)')
      |             ELSE arr END) AS (pos, s)
      |    FROM (
      |      SELECT topk_structs(
      |               struct(-n_occurrences AS neg_occ, gram, n_occurrences, n_docs),
      |               4096) AS arr
      |      FROM (SELECT gram, count(1) AS n_occurrences, count(DISTINCT doc_id) AS n_docs
      |            FROM (SELECT doc_id, explode(sh) AS gram
      |                  FROM (SELECT doc_id, graft_shingles(text, n) AS sh FROM documents))
      |            GROUP BY gram)))
      |  WHERE pos < k
      |  ORDER BY n_occurrences DESC, gram ASC""".stripMargin,
    // QueryCatalog.quotaSample (q71) with the per-stratum quota as an
    // arg. Same bounded-heap surface as doc_ngrams: the former per-source
    // row_number window sorted a whole stratum through one task; the
    // topk_structs aggregate carries ≤ 4096 entries of state at every
    // partial/merge node. The aggregate keeps the fixed cap (the UDF-body
    // analyzer bans outer refs in aggregate calls) and `pos < quota`
    // trims; an over-cap quota raises via the aggregate-level guard (one
    // row per source even over an empty stratum — and on a fully empty
    // corpus there is nothing to sample, so no raise is the right
    // semantics for a per-GROUP aggregate).
    """CREATE OR REPLACE TEMPORARY FUNCTION quota_sample(quota INT)
      |RETURNS TABLE (doc_id BIGINT, source STRING, rk INT)
      |RETURN
      |  SELECT s.doc_id AS doc_id, source, CAST(pos + 1 AS INT) AS rk
      |  FROM (
      |    SELECT source, posexplode(CASE WHEN quota > 4096
      |             THEN raise_error('quota_sample: quota must be <= 4096 (bounded-heap cap)')
      |             ELSE arr END) AS (pos, s)
      |    FROM (
      |      SELECT source, topk_structs(struct(h, doc_id), 4096) AS arr
      |      FROM (SELECT doc_id, source,
      |              CAST(conv(substring(md5(concat_ws('|', 'qs', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT) AS h
      |            FROM documents)
      |      GROUP BY source))
      |  WHERE pos < quota""".stripMargin)
}
