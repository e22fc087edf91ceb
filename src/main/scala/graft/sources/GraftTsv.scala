package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSourceV2 connector: headerless TSV with `\N` nulls
  * (the MySQL dump convention the reference's country seed uses,
  * `include/table/country.sql`), demonstrating the full V2 read-path
  * machinery the built-in formats hide:
  *
  *   - `TableProvider` + `DataSourceRegister` (`format("graft-tsv")`),
  *     user-supplied or inferred (c0..cN, all-string) schema;
  *   - `SupportsPushDownRequiredColumns`: the reader PARSES every line
  *     but EMITS only the pruned columns — `.explain` shows the narrowed
  *     ReadSchema;
  *   - `SupportsPushDownFilters`: string comparisons, null tests and
  *     prefix matches evaluate INSIDE the reader; pushed filters are
  *     removed from the post-scan plan entirely (no Filter node), so
  *     correctness rides on the reader's own evaluation — which the
  *     q124 DuckDB oracle checks row-for-row. Filters may reference
  *     columns OUTSIDE the pruned projection (evaluated on the parsed
  *     line, not the emitted row) — the planner guarantees nothing
  *     about that on purpose, and this source handles it.
  *
  * All columns are strings by design (the TSV carries no types); cast
  * downstream. Comparisons are binary/lexicographic — identical
  * semantics in Spark (UTF8String), this reader (String.compareTo on
  * ASCII) and DuckDB (default binary collation), which is what lets the
  * oracle cross-check the pushed-filter evaluation.
  *
  * Scale note: the seed is one partition by design (239 rows). A real
  * deployment splits by line-range offsets per file block — the
  * `planInputPartitions` seam is where those splits go; nothing else
  * changes.
  */
class GraftTsv extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-tsv"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = GraftTsv.pathOf(options)
    val first = {
      val src = scala.io.Source.fromFile(path, "UTF-8")
      try src.getLines().nextOption().getOrElse("") finally src.close()
    }
    val n = if (first.isEmpty) 0 else first.split('\t').length
    StructType((0 until n).map(i =>
      org.apache.spark.sql.types.StructField(s"c$i", StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    TsvTable(schema, properties.get("path"))
}

object GraftTsv {
  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-tsv: `path` option is required")
    p
  }
  /** `\N` → null, else the raw field (MySQL dump convention). */
  private[sources] def field(raw: String): String =
    if (raw == "\\N") null else raw

  /** The country-seed TSV as a real filesystem path: the classpath
    * resource may live inside a jar (sbt fork), which neither this
    * connector's file reader nor the DuckDB oracle can open — so it is
    * materialized once to a deterministic temp path shared by the q124
    * query and its oracle SQL.
    */
  lazy val seedTsvPath: String = {
    val target = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_country_seed.tsv")
    val in = getClass.getResourceAsStream("/graft/country_seed.tsv")
    try java.nio.file.Files.copy(in, target,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target.toString
  }
}

final case class TsvTable(tableSchema: StructType, path: String) extends Table with SupportsRead {
  require(path != null, "graft-tsv: `path` option is required")
  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-tsv:$path"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema, path)
}

final class TsvScanBuilder(fullSchema: StructType, path: String)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _: String)            => fullSchema.fieldNames.contains(a)
    case GreaterThan(a, _: String)        => fullSchema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _: String) => fullSchema.fieldNames.contains(a)
    case LessThan(a, _: String)           => fullSchema.fieldNames.contains(a)
    case LessThanOrEqual(a, _: String)    => fullSchema.fieldNames.contains(a)
    case StringStartsWith(a, _)           => fullSchema.fieldNames.contains(a)
    case IsNotNull(a)                     => fullSchema.fieldNames.contains(a)
    case IsNull(a)                        => fullSchema.fieldNames.contains(a)
    case And(l, r)                        => supported(l) && supported(r)
    case _                                => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition(supported)
    pushed = take
    residual // Spark keeps ONLY these in the post-scan plan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = TsvScan(fullSchema, required, pushed, path)
}

final case class TsvScan(fullSchema: StructType, required: StructType,
                         pushed: Array[Filter], path: String) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path, PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(TsvPartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    TsvReaderFactory(fullSchema.fieldNames, required.fieldNames, pushed)
}

final case class TsvPartition(path: String) extends InputPartition

final case class TsvReaderFactory(allCols: Array[String], requiredCols: Array[String],
                                  pushed: Array[Filter]) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new TsvPartitionReader(partition.asInstanceOf[TsvPartition].path,
      allCols, requiredCols, pushed)
}

final class TsvPartitionReader(path: String, allCols: Array[String],
                               requiredCols: Array[String], pushed: Array[Filter])
  extends PartitionReader[InternalRow] {

  private val idx = allCols.zipWithIndex.toMap
  private val outIdx = requiredCols.map(idx)
  private val src = scala.io.Source.fromFile(path, "UTF-8")
  private val lines = src.getLines()
  private var current: InternalRow = _

  /** Evaluate one pushed filter on the FULL parsed line (null-safe SQL
    * semantics: a comparison on null is not-true).
    */
  private def eval(f: Filter, row: Array[String]): Boolean = f match {
    case EqualTo(a, v: String)            => row(idx(a)) != null && row(idx(a)) == v
    case GreaterThan(a, v: String)        => row(idx(a)) != null && row(idx(a)).compareTo(v) > 0
    case GreaterThanOrEqual(a, v: String) => row(idx(a)) != null && row(idx(a)).compareTo(v) >= 0
    case LessThan(a, v: String)           => row(idx(a)) != null && row(idx(a)).compareTo(v) < 0
    case LessThanOrEqual(a, v: String)    => row(idx(a)) != null && row(idx(a)).compareTo(v) <= 0
    case StringStartsWith(a, p)           => row(idx(a)) != null && row(idx(a)).startsWith(p)
    case IsNotNull(a)                     => row(idx(a)) != null
    case IsNull(a)                        => row(idx(a)) == null
    case And(l, r)                        => eval(l, row) && eval(r, row)
    case other => throw new IllegalStateException(s"unpushable filter leaked: $other")
  }

  override def next(): Boolean = {
    while (lines.hasNext) {
      // -1: keep trailing empty fields, the seed has none but a general
      // TSV may
      val parsed = lines.next().split("\t", -1).map(GraftTsv.field)
      if (pushed.forall(eval(_, parsed))) {
        current = new GenericInternalRow(
          outIdx.map(i => UTF8String.fromString(parsed(i))): Array[Any])
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = src.close()
}
