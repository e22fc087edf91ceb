package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.queries.{GraftSql, QueryCatalog => Q}
import graft.ops.CoreOps
import graft.text.TextOps
import graft.dedup.Dedup

/** The SQL surface must be macro-for-macro identical to its Column-API
  * twins: SQL UDFs inline at parse time, so any divergence is a spelling
  * bug in GraftSql, not a runtime difference. Every comparison here is
  * exact (collected rows compared value-for-value).
  */
class GraftSqlSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    GraftSql.register(spark, sf)
  }

  private def sameRows(a: DataFrame, b: DataFrame): Unit = {
    val (ra, rb) = (a.collect().toSeq, b.collect().toSeq)
    assert(ra.size == rb.size, s"row counts differ: ${ra.size} vs ${rb.size}")
    ra.zip(rb).foreach { case (x, y) => assert(x == y, s"row mismatch: $x vs $y") }
  }

  test("graft_surrogate_key == CoreOps.surrogateKey (incl. NULL sentinel)") {
    sameRows(
      spark.sql("""SELECT graft_surrogate_key(CAST(c_custkey AS STRING), c_mktsegment) AS k
                  |FROM customer ORDER BY c_custkey""".stripMargin),
      graft.io.Tables.table(spark, sf, "customer")
        .orderBy("c_custkey")
        .select(CoreOps.surrogateKey(col("c_custkey"), col("c_mktsegment")).as("k")))
    // NULL argument hits the sentinel, not SQL NULL propagation
    val viaSql = spark.sql("SELECT graft_surrogate_key(NULL, 'x') AS k").head.getString(0)
    val viaCol = spark.range(1)
      .select(CoreOps.surrogateKey(lit(null).cast("string"), lit("x")).as("k")).head.getString(0)
    assert(viaSql == viaCol && viaSql != null)
  }

  test("graft_round_portable == CoreOps.roundPortable on adversarial ties") {
    val vals = Seq(0.00005, 1.23455, -1.23455, 2.675, 1e-9, 123456.789125, 0.0)
    import spark.implicits._
    val df = vals.toDF("x")
    df.createOrReplaceTempView("round_probe")
    sameRows(
      spark.sql("SELECT graft_round_portable(x, 4) AS r FROM round_probe"),
      df.select(CoreOps.roundPortable(col("x"), 4).as("r")))
  }

  test("graft_token_count == TextOps.tokenCount (incl. empty string)") {
    sameRows(
      spark.sql("SELECT graft_token_count(text) AS n FROM documents ORDER BY doc_id"),
      graft.io.Tables.table(spark, sf, "documents").orderBy("doc_id")
        .select(TextOps.tokenCount(col("text")).as("n")))
    assert(spark.sql("SELECT graft_token_count('   ') AS n").head.getInt(0) == 0)
  }

  test("graft_shingles / graft_jaccard == Dedup twins") {
    val docs = graft.io.Tables.table(spark, sf, "documents")
    sameRows(
      spark.sql("SELECT graft_shingles(text, 3) AS sh FROM documents ORDER BY doc_id"),
      docs.orderBy("doc_id").select(Dedup.shingles(col("text"), 3).as("sh")))
    // jaccard over consecutive-doc shingle SETS
    docs.orderBy("doc_id").limit(50)
      .select(col("doc_id"), Dedup.shingleSet(col("text"), 3).as("sh"))
      .createOrReplaceTempView("jac_probe")
    sameRows(
      spark.sql("""SELECT graft_jaccard(a.sh, b.sh) AS j
                  |FROM jac_probe a JOIN jac_probe b ON b.doc_id = a.doc_id + 1
                  |ORDER BY a.doc_id""".stripMargin),
      spark.sql("""SELECT a.sh AS sa, b.sh AS sb, a.doc_id
                  |FROM jac_probe a JOIN jac_probe b ON b.doc_id = a.doc_id + 1
                  |ORDER BY a.doc_id""".stripMargin)
        .select(Dedup.jaccard(col("sa"), col("sb")).as("j")))
  }

  test("gap_sessions TVF == sessionWindows query (q64 twin)") {
    sameRows(
      spark.sql("SELECT * FROM gap_sessions(1800) ORDER BY user_id, session_start"),
      Q.sessionWindows(spark, sf))
  }

  test("doc_ngrams TVF == ngramCounts query (q62 twin)") {
    sameRows(
      spark.sql("SELECT * FROM doc_ngrams(3, 100)"),
      Q.ngramCounts(spark, sf))
  }

  test("doc_ngrams TVF plans NO window — bounded-heap aggregate, not a " +
       "single-partition row_number sort") {
    // the r10 verdict's SQL-surface trap: the former TVF body ranked via
    // `row_number() OVER (ORDER BY …)`, a global window that sorts every
    // distinct gram through ONE partition. The rewrite aggregates with
    // topk_structs (≤ 4096-entry buffer at every partial/merge node), so
    // no Window node — of any partitioning — may appear in the plan.
    val qe = spark.sql("SELECT * FROM doc_ngrams(3, 100)").queryExecution
    val windows = qe.executedPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"doc_ngrams plans a Window:\n${qe.executedPlan}")
    assert(qe.executedPlan.toString.contains("topk_structs"),
      s"doc_ngrams does not ride the bounded-heap aggregate:\n${qe.executedPlan}")
    // top-k semantics survive the cap plumbing: k > |grams| returns all
    // grams; k = 1 returns exactly the most frequent one
    val all = spark.sql("SELECT * FROM doc_ngrams(3, 4096)").collect()
    val one = spark.sql("SELECT * FROM doc_ngrams(3, 1)").collect()
    assert(one.length == 1 && all.nonEmpty && one.head == all.head)
  }

  test("doc_ngrams TVF rejects k beyond the bounded-heap cap loudly") {
    // an over-cap k must raise, never silently return 4096 rows dressed
    // as the top-k (the r11 advisory); the guard is lazy, so the green
    // in-cap calls above never evaluate the raise branch
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM doc_ngrams(3, 4097)").collect()
    }
    assert(e.getMessage.contains("4096"),
      s"over-cap doc_ngrams must name the cap: ${e.getMessage}")
  }

  test("doc_ngrams cap raises even over an EMPTY corpus (guard is not per-row)") {
    // the r12 advisory: with the guard in the per-row WHERE, zero input
    // rows meant zero guard evaluations — an over-cap k silently returned
    // empty. The guard now wraps the global aggregate's array (exactly
    // one row regardless of input), so it raises unconditionally.
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW documents AS " +
      "SELECT * FROM parquet.`" + sf + "/documents.parquet` WHERE false")
    try {
      val e = intercept[Exception] {
        spark.sql("SELECT * FROM doc_ngrams(3, 4097)").collect()
      }
      assert(e.getMessage.contains("4096"),
        s"empty-corpus over-cap call must still raise: ${e.getMessage}")
      // and an in-cap call over the empty corpus is a clean empty result
      assert(spark.sql("SELECT * FROM doc_ngrams(3, 10)").collect().isEmpty)
    } finally graft.queries.GraftSql.register(spark, sf) // restore the view
  }

  test("quota_sample TVF == quotaSample query (q71 twin)") {
    sameRows(
      spark.sql("SELECT * FROM quota_sample(20) ORDER BY source, rk"),
      Q.quotaSample(spark, sf))
  }

  test("SQL macros inline: no UDF call nodes in the optimized plan") {
    val plan = spark.sql("SELECT graft_token_count(text) FROM documents")
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), s"macro did not inline:\n$plan")
  }
}
