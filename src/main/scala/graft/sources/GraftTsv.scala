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
    val first = GraftTsv.dataFiles(path).headOption.map { f =>
      val src = scala.io.Source.fromFile(f, "UTF-8")
      try src.getLines().nextOption().getOrElse("") finally src.close()
    }.getOrElse("")
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

  /** null → `\N`, else the raw value (the writer-side dual). */
  private[sources] def unfield(v: String): String =
    if (v == null) "\\N" else v

  /** A path is either a single TSV file or a directory of `part-*.tsv`
    * files (what [[TsvBatchWrite]] commits); dotfiles and in-flight
    * `.tmp-*` task outputs are never visible to readers.
    */
  private[sources] def dataFiles(path: String): Seq[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.isDirectory(p)) {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.list(p)
      try s.iterator().asScala.map(_.toString)
        .filter { f =>
          val name = java.nio.file.Paths.get(f).getFileName.toString
          name.endsWith(".tsv") && !name.startsWith(".")
        }.toList.sorted
      finally s.close()
    } else List(path)
  }

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

final case class TsvTable(tableSchema: StructType, path: String)
  extends Table with SupportsRead
  with org.apache.spark.sql.connector.catalog.SupportsWrite {
  require(path != null, "graft-tsv: `path` option is required")
  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-tsv:$path"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema, path)
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.WriteBuilder =
    new TsvWriteBuilder(info.schema(), path)
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
    GraftTsv.dataFiles(path).map(f => TsvPartition(f): InputPartition).toArray
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

// ---- write path: the V2 commit protocol in miniature ---------------------
// Each task writes dir/.tmp-<uuid>; its commit MESSAGE carries the temp
// name; only the driver-side job commit renames temps to part-<i>.tsv
// (readers never list dotfiles, so uncommitted and aborted task output is
// invisible). Truncate (SaveMode.Overwrite) deletes committed parts at
// job commit, after the new temps are safely written.

import org.apache.spark.sql.connector.write._

final class TsvWriteBuilder(schema: StructType, path: String)
  extends WriteBuilder with SupportsTruncate {
  require(schema.fields.forall(_.dataType == StringType),
    s"graft-tsv writes string columns only (cast upstream); got ${schema.simpleString}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = TsvBatchWrite(schema, path, doTruncate)
  }
}

final case class TsvCommit(tmpName: String) extends WriterCommitMessage

final case class TsvBatchWrite(schema: StructType, path: String, doTruncate: Boolean)
  extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    TsvWriterFactory(path, schema.length)
  }
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    if (doTruncate) GraftTsv.dataFiles(path).foreach(f =>
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(f)))
    messages.zipWithIndex.foreach { case (TsvCommit(tmp), i) =>
      java.nio.file.Files.move(dir.resolve(tmp), dir.resolve(f"part-$i%05d.tsv"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val dir = java.nio.file.Paths.get(path)
    messages.foreach {
      case TsvCommit(tmp) => java.nio.file.Files.deleteIfExists(dir.resolve(tmp))
      case _ => ()
    }
  }
}

final case class TsvWriterFactory(path: String, nCols: Int) extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new TsvDataWriter(path, nCols)
}

final class TsvDataWriter(path: String, nCols: Int) extends DataWriter[InternalRow] {
  private val tmpName = s".tmp-${java.util.UUID.randomUUID()}"
  private val out = java.nio.file.Files.newBufferedWriter(
    java.nio.file.Paths.get(path).resolve(tmpName), java.nio.charset.StandardCharsets.UTF_8)

  override def write(record: InternalRow): Unit = {
    val fields = (0 until nCols).map { i =>
      GraftTsv.unfield(if (record.isNullAt(i)) null else record.getUTF8String(i).toString)
    }
    out.write(fields.mkString("\t"))
    out.write("\n")
  }
  override def commit(): WriterCommitMessage = { out.close(); TsvCommit(tmpName) }
  override def abort(): Unit = {
    out.close()
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path).resolve(tmpName))
  }
  override def close(): Unit = ()
}
