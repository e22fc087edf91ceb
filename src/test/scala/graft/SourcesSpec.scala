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

  test("q124 query shape: rows nonempty, ordered by iso, filter-only column pruned from output") {
    val rows = QueryCatalog.tsvSourceCountries(spark, sf).collect()
    assert(rows.nonEmpty && rows.forall(_.getString(0) >= "M"))
    val isos = rows.map(_.getString(0)).toSeq
    assert(isos == isos.sorted)
    assert(rows.head.schema.fieldNames.toSeq == Seq("iso", "nicename", "phonecode"))
  }
}
