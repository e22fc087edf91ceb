package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FilterExec
import graft.queries.QueryCatalog

/** The custom DataSourceV2 TSV connector (graft.sources.GraftTsv):
  * registration, schema inference, \N nulls, and — the point of a V2
  * source — that filters and projections actually push INTO the scan.
  */
class SourcesSpec extends SparkSpec {

  private val path = graft.sources.GraftTsv.seedTsvPath

  private def seed = spark.read.format("graft-tsv")
    .schema("id string, iso string, name string, nicename string, " +
      "iso3 string, numcode string, phonecode string")
    .option("path", path).load()

  test("reads the full seed: 239 rows, \\N becomes null") {
    assert(seed.count() == 239)
    val noIso3 = seed.filter(col("iso3").isNull).count()
    assert(noIso3 > 0, "the seed has \\N iso3 rows; they must read as null")
    assert(seed.filter(col("iso").isNull).count() == 0)
  }

  test("shortname registration + schema inference (c0..c6 all-string)") {
    val inferred = spark.read.format("graft-tsv").option("path", path).load()
    assert(inferred.schema.fieldNames.toSeq == (0 to 6).map(i => s"c$i"))
    assert(inferred.schema.fields.forall(_.dataType.typeName == "string"))
    assert(inferred.count() == 239)
  }

  test("filters push into the reader: no post-scan Filter node, pushed list visible") {
    val df = seed.filter(col("iso") >= "M" && col("iso3").isNotNull)
      .select("iso", "nicename", "phonecode")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    val filters = plan.collect { case f: FilterExec => f }
    assert(filters.isEmpty,
      s"every predicate is pushable; none may survive as a Filter node:\n$plan")
    val desc = plan.toString
    assert(desc.contains("PushedFilters") && desc.contains("IsNotNull(iso3)"),
      s"scan must advertise its pushed filters:\n${desc.take(1200)}")
  }

  test("column pruning reaches the scan: output schema is the projection only") {
    val df = seed.select("iso", "phonecode")
    df.write.format("noop").mode("overwrite").save()
    val scanOutput = df.queryExecution.executedPlan.collectLeaves().head.output
    assert(scanOutput.map(_.name) == Seq("iso", "phonecode"),
      s"scan must emit only the pruned columns, got ${scanOutput.map(_.name)}")
  }

  test("pushed-filter evaluation matches Spark's own post-scan filtering") {
    // same predicates, once pushed (V2 path) and once forced residual by
    // filtering AFTER a materializing barrier — row sets must be equal
    val pushedRows = seed.filter(col("iso") >= "M" && col("iso3").isNotNull)
      .select("iso").collect().map(_.getString(0)).sorted.toSeq
    val residualRows = seed.localCheckpoint()
      .filter(col("iso") >= "M" && col("iso3").isNotNull)
      .select("iso").collect().map(_.getString(0)).sorted.toSeq
    assert(pushedRows == residualRows && pushedRows.nonEmpty)
  }

  test("write path: commit-protocol roundtrip, \\N nulls, overwrite truncates, temps invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv_w").toString + "/out"
    val df = seed.select("iso", "nicename", "iso3") // iso3 carries nulls → \N roundtrip
    df.repartition(3).write.format("graft-tsv").option("path", dir).mode("overwrite").save()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(files.nonEmpty && files.forall(f => f.startsWith("part-") && f.endsWith(".tsv")),
      s"only committed parts may be visible: $files")
    def readBack = spark.read.format("graft-tsv")
      .schema("iso string, nicename string, iso3 string").option("path", dir).load()
    val a = df.collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    val b = readBack.collect().map(r => (r.getString(0), r.getString(1), Option(r.getString(2)))).toSet
    assert(a == b && b.exists(_._3.isEmpty), "roundtrip must preserve rows AND nulls")
    // overwrite truncates the previous committed parts
    Seq(("ZZ", "Zed", null: String)).toDF("iso", "nicename", "iso3")
      .write.format("graft-tsv").option("path", dir).mode("overwrite").save()
    assert(readBack.count() == 1)
  }

  test("line-range splits: small split_bytes plans a multi-partition scan with identical rows") {
    val whole = seed.collect().map(_.toSeq).toSet
    val split = spark.read.format("graft-tsv")
      .schema("id string, iso string, name string, nicename string, " +
        "iso3 string, numcode string, phonecode string")
      .option("path", path).option("split_bytes", "512").load()
    assert(split.rdd.getNumPartitions > 4,
      s"512-byte splits over the ~6KB seed must plan several partitions, " +
        s"got ${split.rdd.getNumPartitions}")
    assert(split.collect().map(_.toSeq).toSet == whole && whole.size == 239,
      "byte-range splits must partition the line set exactly (no dup/loss at boundaries)")
  }

  private def typedSeed = spark.read.format("graft-tsv")
    .schema("id int, iso string, name string, nicename string, " +
      "iso3 string, numcode int, phonecode bigint")
    .option("path", path).load()

  test("typed schema: numeric comparisons push into the reader and compare numerically") {
    val df = typedSeed.filter(col("numcode") > 300 && col("phonecode") <= 100)
      .select("iso", "numcode", "phonecode")
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan
    assert(plan.collect { case f: FilterExec => f }.isEmpty,
      s"typed comparisons must push; none may survive as a Filter node:\n$plan")
    assert(plan.toString.contains("GreaterThan(numcode,300)"),
      s"scan must advertise the pushed numeric filter:\n${plan.toString.take(1200)}")
    val rows = df.collect()
    assert(rows.nonEmpty && rows.forall(r => r.getInt(1) > 300 && r.getLong(2) <= 100),
      "numeric pushdown must compare as numbers, not strings")
    // the numeric-vs-string distinction that makes typed pushdown matter:
    // string compare would call "1000" < "300" true
    val big = typedSeed.filter(col("numcode") >= 1000).select("numcode").collect()
    assert(big.forall(_.getInt(0) >= 1000))
  }

  test("typed IN-set pushdown evaluates inside the reader") {
    val df = typedSeed.filter(col("numcode").isin(4, 8, 12)).select("iso", "numcode")
    df.write.format("noop").mode("overwrite").save()
    assert(df.queryExecution.executedPlan.collect { case f: FilterExec => f }.isEmpty,
      "IN on a typed column must push")
    assert(df.collect().map(_.getInt(1)).toSet.subsetOf(Set(4, 8, 12)))
  }

  test("malformed input fails with file/byte/line context, never an index error") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv_bad")
    val f = dir.resolve("bad.tsv")
    java.nio.file.Files.writeString(f, "a\tb\tc\nshort\tline\n")
    val df = spark.read.format("graft-tsv").schema("x string, y string, z string")
      .option("path", f.toString).load()
    val e = intercept[org.apache.spark.SparkException] { df.collect() }
    val msg = e.getCause.getMessage
    assert(msg.contains("bad.tsv") && msg.contains("expected 3") && msg.contains("short\tline"),
      s"error must name the file and offending line: $msg")
    val g = dir.resolve("badnum.tsv")
    java.nio.file.Files.writeString(g, "1\tok\nnotanint\tok\n")
    val dg = spark.read.format("graft-tsv").schema("n int, s string")
      .option("path", g.toString).load()
    val e2 = intercept[org.apache.spark.SparkException] { dg.collect() }
    assert(e2.getCause.getMessage.contains("declared int") &&
      e2.getCause.getMessage.contains("notanint"))
  }

  test("append never overwrites a prior commit: job-unique part names, union on read-back") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv_app").toString + "/out"
    Seq(("AA", "first")).toDF("iso", "nicename")
      .write.format("graft-tsv").option("path", dir).mode("overwrite").save()
    Seq(("BB", "second")).toDF("iso", "nicename")
      .write.format("graft-tsv").option("path", dir).mode("append").save()
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted.toSeq
    assert(files.size == 2 && files.distinct.size == 2,
      s"two single-partition commits must leave two distinct parts: $files")
    val back = spark.read.format("graft-tsv").schema("iso string, nicename string")
      .option("path", dir).load().collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(back == Set(("AA", "first"), ("BB", "second")),
      s"append must preserve the prior commit's rows: $back")
  }

  test("writer rejects tab/newline in values instead of corrupting the file") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tsv_esc").toString + "/out"
    val e = intercept[org.apache.spark.SparkException] {
      Seq(("AA", "has\ttab")).toDF("iso", "nicename")
        .write.format("graft-tsv").option("path", dir).mode("overwrite").save()
    }
    assert(e.getMessage.contains("unescapable") ||
      Option(e.getCause).exists(_.getMessage.contains("unescapable")))
  }

  test("aggregate pushdown: COUNT/MIN/MAX evaluate in-reader, one partial row per split") {
    val df = typedSeed.agg(
      count(lit(1)).as("n"), count(col("iso3")).as("n_iso3"),
      min(col("numcode")).as("min_nc"), max(col("phonecode")).as("max_pc"),
      min(col("iso")).as("min_iso"))
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"),
      s"scan must advertise the pushed aggregates:\n${plan.take(1500)}")
    val r = df.collect().head
    // reference values computed through the non-pushed path (a projection
    // blocks aggregate pushdown)
    val raw = typedSeed.select("iso", "iso3", "numcode", "phonecode").collect()
    assert(r.getLong(0) == 239 && r.getLong(1) == raw.count(!_.isNullAt(1)))
    assert(r.getInt(2) == raw.filter(!_.isNullAt(2)).map(_.getInt(2)).min)
    assert(r.getLong(3) == raw.filter(!_.isNullAt(3)).map(_.getLong(3)).max)
    assert(r.getString(4) == raw.map(_.getString(0)).min)
    // and the partial rows merge correctly across many byte-range splits
    val split = spark.read.format("graft-tsv")
      .schema("id int, iso string, name string, nicename string, " +
        "iso3 string, numcode int, phonecode bigint")
      .option("path", path).option("split_bytes", "512").load()
      .agg(count(lit(1)), min(col("numcode")), max(col("phonecode"))).collect().head
    assert(split.getLong(0) == 239 && split.getInt(1) == r.getInt(2)
      && split.getLong(2) == r.getLong(3))
  }

  test("limit pushdown: each split stops early, global limit stays exact") {
    val df = seed.limit(7)
    df.write.format("noop").mode("overwrite").save()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedLimit: 7"),
      s"scan must advertise the pushed limit:\n${plan.take(1200)}")
    assert(df.count() == 7)
    // limit composes with pushed filters: the cap applies to SURVIVORS
    val filtered = seed.filter(col("iso") >= "M").limit(5)
    assert(filtered.collect().length == 5)
    assert(filtered.collect().forall(_.getString(1) >= "M"))
  }

  test("q124 query shape: rows nonempty, ordered by iso, filter-only column pruned from output") {
    val rows = QueryCatalog.tsvSourceCountries(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) >= "M"))
    val isos = rows.map(_.getString(0)).toSeq
    assert(isos == isos.sorted)
    assert(rows.head.schema.fieldNames.toSeq == Seq("iso", "nicename", "phonecode"))
  }
}
