package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.expressions.aggregate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType, StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A from-scratch DataSourceV2 connector: headerless TSV with `\N` nulls
  * (the MySQL dump convention the reference's country seed uses,
  * `include/table/country.sql`), demonstrating the full V2 read-path
  * machinery the built-in formats hide:
  *
  *   - `TableProvider` + `DataSourceRegister` (`format("graft-tsv")`),
  *     user-supplied typed schema (string/int/bigint/double) or inferred
  *     (c0..cN, all-string);
  *   - `SupportsPushDownRequiredColumns`: the reader PARSES every line
  *     but EMITS only the pruned columns — `.explain` shows the narrowed
  *     ReadSchema;
  *   - `SupportsPushDownFilters`: comparisons (typed per the declared
  *     column — int/long/double compare numerically, strings binary),
  *     null tests, prefix matches, IN sets, AND/OR evaluate INSIDE the
  *     reader; pushed filters are removed from the post-scan plan
  *     entirely (no Filter node), so correctness rides on the reader's
  *     own evaluation — which the q124 DuckDB oracle checks row-for-row.
  *     Filters may reference columns OUTSIDE the pruned projection
  *     (evaluated on the parsed line, not the emitted row) — the planner
  *     guarantees nothing about that on purpose, and this source handles
  *     it. Declaring a column as a numeric type is what makes numeric
  *     predicates pushable: on an all-string schema Catalyst wraps the
  *     attribute in a Cast, which is not translatable to a source Filter
  *     — typed pushdown is a property of the schema, not of the filter.
  *   - line-range SPLITS: each file is divided into `split_bytes`-sized
  *     byte ranges aligned to line boundaries ('\n' never occurs inside
  *     a UTF-8 multibyte sequence, so byte-level splitting is UTF-8
  *     safe); a split owns every line that STARTS inside it, the first
  *     split also owns offset 0. One task per split — the same contract
  *     FileScan gives parquet.
  *
  * String comparisons are binary/lexicographic — identical semantics in
  * Spark (UTF8String), this reader (String.compareTo) and DuckDB
  * (default binary collation), which is what lets the oracle cross-check
  * the pushed-filter evaluation. A line with the wrong field count or an
  * unparsable numeric field fails with the file, byte offset, and line
  * text — never an index error.
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
  /** Default split size; `split_bytes` option overrides (min 1). */
  val DefaultSplitBytes: Long = 32L * 1024 * 1024

  private[sources] def pathOf(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "graft-tsv: `path` option is required")
    p
  }

  private[sources] def splitBytesOf(options: CaseInsensitiveStringMap): Long = {
    val raw = options.get("split_bytes")
    if (raw == null) DefaultSplitBytes
    else {
      val v = try raw.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(s"graft-tsv: split_bytes must be a long, got '$raw'")
      }
      require(v >= 1, s"graft-tsv: split_bytes must be >= 1, got $v")
      v
    }
  }

  /** `\N` → null, else the raw field (MySQL dump convention). */
  private[sources] def field(raw: String): String =
    if (raw == "\\N") null else raw

  /** null → `\N`, else the raw value (the writer-side dual). */
  private[sources] def unfield(v: String): String =
    if (v == null) "\\N" else v

  private[sources] val readableTypes: Set[DataType] =
    Set(StringType, IntegerType, LongType, DoubleType)

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
  require(tableSchema.fields.forall(f => GraftTsv.readableTypes.contains(f.dataType)),
    s"graft-tsv columns must be string/int/bigint/double; got ${tableSchema.simpleString}")
  override def schema(): StructType = tableSchema
  override def name(): String = s"graft-tsv:$path"
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new TsvScanBuilder(schema, path, GraftTsv.splitBytesOf(options))
  override def newWriteBuilder(
      info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
    : org.apache.spark.sql.connector.write.WriteBuilder =
    new TsvWriteBuilder(info.schema(), path)
}

/** A pushed aggregate: evaluated per split, merged by Spark's final
  * aggregation (partial pushdown — `supportCompletePushDown` stays
  * false, so multi-split scans stay correct for free).
  */
private[sources] sealed trait TsvAgg
private[sources] case object TsvCountStar extends TsvAgg
private[sources] final case class TsvCount(colName: String) extends TsvAgg
private[sources] final case class TsvMin(colName: String) extends TsvAgg
private[sources] final case class TsvMax(colName: String) extends TsvAgg

final class TsvScanBuilder(fullSchema: StructType, path: String, splitBytes: Long)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns
  with SupportsPushDownAggregates with SupportsPushDownLimit {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema
  private var aggs: Option[Seq[TsvAgg]] = None
  private var limit: Option[Int] = None

  private def refName(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
    e match {
      case nr: org.apache.spark.sql.connector.expressions.NamedReference
        if nr.fieldNames.length == 1 && fullSchema.fieldNames.contains(nr.fieldNames.head) =>
        Some(nr.fieldNames.head)
      case _ => None
    }

  /** Ungrouped COUNT(*)/COUNT(col)/MIN/MAX evaluate inside the reader —
    * one row out per split instead of the raw stream; Spark's final
    * aggregation merges the partials (sum of counts, min of mins).
    */
  override def pushAggregation(aggregation: aggregate.Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: aggregate.CountStar            => Some(TsvCountStar)
      case c: aggregate.Count if !c.isDistinct => refName(c.column).map(TsvCount)
      case m: aggregate.Min                  => refName(m.column).map(TsvMin)
      case m: aggregate.Max                  => refName(m.column).map(TsvMax)
      case _                                 => None
    }
    if (specs.contains(None)) false
    else { aggs = Some(specs.flatten); true }
  }

  /** Per-split row cap; Spark still applies the global limit on top
    * (isPartiallyPushed), so multi-split scans stay exact while each
    * split stops reading as soon as it has n rows.
    */
  override def pushLimit(n: Int): Boolean = { limit = Some(n); true }
  override def isPartiallyPushed(): Boolean = true

  /** A comparison is pushable when the literal's runtime type matches the
    * DECLARED column type — Catalyst has already coerced literals to the
    * attribute type, so a mismatch means an implicit cast we must not
    * second-guess.
    */
  private def typed(a: String, v: Any): Boolean =
    fullSchema.fields.find(_.name == a).exists { f =>
      (f.dataType, v) match {
        case (StringType, _: String)             => true
        case (IntegerType, _: java.lang.Integer) => true
        case (LongType, _: java.lang.Long)       => true
        case (DoubleType, _: java.lang.Double)   => true
        case _                                   => false
      }
    }

  private def isString(a: String): Boolean =
    fullSchema.fields.exists(f => f.name == a && f.dataType == StringType)

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, v)            => typed(a, v)
    case GreaterThan(a, v)        => typed(a, v)
    case GreaterThanOrEqual(a, v) => typed(a, v)
    case LessThan(a, v)           => typed(a, v)
    case LessThanOrEqual(a, v)    => typed(a, v)
    case In(a, vs)                => vs.forall(v => v == null || typed(a, v))
    case StringStartsWith(a, _)   => isString(a)
    case IsNotNull(a)             => fullSchema.fieldNames.contains(a)
    case IsNull(a)                => fullSchema.fieldNames.contains(a)
    case And(l, r)                => supported(l) && supported(r)
    case Or(l, r)                 => supported(l) && supported(r)
    case _                        => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (take, residual) = filters.partition(supported)
    pushed = take
    residual // Spark keeps ONLY these in the post-scan plan
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    TsvScan(fullSchema, required, pushed, path, splitBytes, aggs, limit)
}

final case class TsvScan(fullSchema: StructType, required: StructType,
                         pushed: Array[Filter], path: String, splitBytes: Long,
                         aggs: Option[Seq[TsvAgg]] = None,
                         limit: Option[Int] = None)
  extends Scan with Batch {
  /** With aggregates pushed, the scan's output IS the partial-aggregate
    * row: count columns as non-null longs, min/max as the column type.
    */
  override def readSchema(): StructType = aggs match {
    case None => required
    case Some(specs) => StructType(specs.map {
      case TsvCountStar => org.apache.spark.sql.types.StructField(
        "count_star", org.apache.spark.sql.types.LongType, nullable = false)
      case TsvCount(c) => org.apache.spark.sql.types.StructField(
        s"count_$c", org.apache.spark.sql.types.LongType, nullable = false)
      case TsvMin(c) => org.apache.spark.sql.types.StructField(
        s"min_$c", fullSchema(c).dataType, nullable = true)
      case TsvMax(c) => org.apache.spark.sql.types.StructField(
        s"max_$c", fullSchema(c).dataType, nullable = true)
    })
  }
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-tsv $path, PushedFilters: [${pushed.mkString(", ")}]" +
      aggs.fold("")(a => s", PushedAggregates: [${a.mkString(", ")}]") +
      limit.fold("")(n => s", PushedLimit: $n")
  override def planInputPartitions(): Array[InputPartition] =
    GraftTsv.dataFiles(path).flatMap { f =>
      val size = java.nio.file.Files.size(java.nio.file.Paths.get(f))
      (0L until size by splitBytes).map(start =>
        TsvPartition(f, start, math.min(start + splitBytes, size)))
    }.map(p => p: InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    TsvReaderFactory(fullSchema, required.fieldNames, pushed, aggs, limit)
}

/** One byte range of one file; owns every line that STARTS in
  * [start, end) (offset 0 belongs to the first split).
  */
final case class TsvPartition(path: String, start: Long, end: Long) extends InputPartition

final case class TsvReaderFactory(fullSchema: StructType, requiredCols: Array[String],
                                  pushed: Array[Filter],
                                  aggs: Option[Seq[TsvAgg]] = None,
                                  limit: Option[Int] = None) extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[TsvPartition]
    val base = new TsvPartitionReader(p.path, p.start, p.end, fullSchema,
      if (aggs.isDefined) fullSchema.fieldNames else requiredCols, pushed, limit)
    aggs.fold(base: PartitionReader[InternalRow])(specs =>
      new TsvAggReader(base, fullSchema, specs))
  }
}

/** Partial-aggregate reader: drains the underlying line reader (pushed
  * filters already applied there), folds the aggregates, emits ONE row.
  * An empty split yields count 0 and null min/max — exactly the partial
  * state Spark's final aggregation merges away.
  */
final class TsvAggReader(base: TsvPartitionReader, fullSchema: StructType,
                         specs: Seq[TsvAgg]) extends PartitionReader[InternalRow] {
  private val idx = fullSchema.fieldNames.zipWithIndex.toMap
  private var emitted = false
  private var current: InternalRow = _

  private def lt(a: Any, b: Any): Boolean = (a, b) match {
    case (x: UTF8String, y: UTF8String) => x.compareTo(y) < 0
    case (x: Int, y: Int)               => x < y
    case (x: Long, y: Long)             => x < y
    case (x: Double, y: Double)         => x < y
    case _ => throw new IllegalStateException(s"incomparable partial values: $a / $b")
  }

  override def next(): Boolean = {
    if (emitted) return false
    val counts = new Array[Long](specs.length)
    val extrema = new Array[Any](specs.length)
    while (base.next()) {
      val row = base.get()
      var i = 0
      specs.foreach { s =>
        s match {
          case TsvCountStar => counts(i) += 1
          case TsvCount(c)  => if (!row.isNullAt(idx(c))) counts(i) += 1
          case TsvMin(c) =>
            val v = if (row.isNullAt(idx(c))) null
                    else row.get(idx(c), fullSchema(c).dataType)
            if (v != null && (extrema(i) == null || lt(v, extrema(i)))) extrema(i) = v
          case TsvMax(c) =>
            val v = if (row.isNullAt(idx(c))) null
                    else row.get(idx(c), fullSchema(c).dataType)
            if (v != null && (extrema(i) == null || lt(extrema(i), v))) extrema(i) = v
        }
        i += 1
      }
    }
    current = new GenericInternalRow(specs.zipWithIndex.map {
      case (TsvCountStar, i) => counts(i): Any
      case (TsvCount(_), i)  => counts(i): Any
      case (_, i)            => extrema(i)
    }.toArray)
    emitted = true
    true
  }
  override def get(): InternalRow = current
  override def close(): Unit = base.close()
}

final class TsvPartitionReader(path: String, start: Long, end: Long,
                               fullSchema: StructType,
                               requiredCols: Array[String], pushed: Array[Filter],
                               limit: Option[Int] = None)
  extends PartitionReader[InternalRow] {

  private var emitted = 0

  private val allCols = fullSchema.fieldNames
  private val types: Array[DataType] = fullSchema.fields.map(_.dataType)
  private val idx = allCols.zipWithIndex.toMap
  private val outIdx = requiredCols.map(idx)

  private val in = new java.io.BufferedInputStream(
    new java.io.FileInputStream(path), 64 * 1024)
  private var pos: Long = 0L
  private var current: InternalRow = _

  // seek to the split start, then discard the partial line the previous
  // split owns ('\n' is never a UTF-8 continuation byte, so scanning raw
  // bytes for it is encoding-safe)
  locally {
    var toSkip = start
    while (toSkip > 0) {
      val n = in.skip(toSkip)
      if (n <= 0) toSkip = 0 else toSkip -= n
    }
    pos = start
    if (start > 0) {
      var b = in.read()
      while (b != -1 && b != '\n') { pos += 1; b = in.read() }
      if (b == '\n') pos += 1
    }
  }

  /** Read the next raw line (without terminator), or null at EOF.
    * Advances `pos` past the line and its '\n'.
    */
  private def readLine(): String = {
    val buf = new java.io.ByteArrayOutputStream(128)
    var b = in.read()
    if (b == -1) return null
    while (b != -1 && b != '\n') { buf.write(b); pos += 1; b = in.read() }
    if (b == '\n') pos += 1
    val s = buf.toString("UTF-8")
    if (s.nonEmpty && s.last == '\r') s.init else s
  }

  private def malformed(lineStart: Long, line: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"graft-tsv: malformed line in $path at byte $lineStart: $why; line: '$line'")

  /** Parse one line into typed field values per the declared schema. */
  private def parse(line: String, lineStart: Long): Array[Any] = {
    // -1: keep trailing empty fields, the seed has none but a general TSV may
    val raw = line.split("\t", -1)
    if (raw.length != allCols.length)
      malformed(lineStart, line,
        s"expected ${allCols.length} tab-separated fields, got ${raw.length}")
    Array.tabulate[Any](raw.length) { i =>
      val s = GraftTsv.field(raw(i))
      if (s == null) null
      else types(i) match {
        case StringType  => s
        case IntegerType => try s.toInt catch { case _: NumberFormatException =>
          malformed(lineStart, line, s"column '${allCols(i)}' declared int, got '$s'") }
        case LongType    => try s.toLong catch { case _: NumberFormatException =>
          malformed(lineStart, line, s"column '${allCols(i)}' declared bigint, got '$s'") }
        case DoubleType  => try s.toDouble catch { case _: NumberFormatException =>
          malformed(lineStart, line, s"column '${allCols(i)}' declared double, got '$s'") }
        case other => throw new IllegalStateException(s"unreadable type $other")
      }
    }
  }

  /** Typed three-way compare; both sides are non-null values of the
    * column's declared type.
    */
  private def cmp(x: Any, v: Any): Int = (x, v) match {
    case (a: String, b: String) => a.compareTo(b)
    case (a: Int, b: Int)       => java.lang.Integer.compare(a, b)
    case (a: Long, b: Long)     => java.lang.Long.compare(a, b)
    case (a: Double, b: Double) => java.lang.Double.compare(a, b)
    case _ => throw new IllegalStateException(s"type-mismatched pushed comparison: $x vs $v")
  }

  /** Evaluate one pushed filter on the FULL parsed line (null-safe SQL
    * semantics: a comparison on null is not-true).
    */
  private def eval(f: Filter, row: Array[Any]): Boolean = f match {
    case EqualTo(a, v)            => row(idx(a)) != null && cmp(row(idx(a)), v) == 0
    case GreaterThan(a, v)        => row(idx(a)) != null && cmp(row(idx(a)), v) > 0
    case GreaterThanOrEqual(a, v) => row(idx(a)) != null && cmp(row(idx(a)), v) >= 0
    case LessThan(a, v)           => row(idx(a)) != null && cmp(row(idx(a)), v) < 0
    case LessThanOrEqual(a, v)    => row(idx(a)) != null && cmp(row(idx(a)), v) <= 0
    case In(a, vs)                =>
      row(idx(a)) != null && vs.exists(v => v != null && cmp(row(idx(a)), v) == 0)
    case StringStartsWith(a, p)   =>
      row(idx(a)) != null && row(idx(a)).asInstanceOf[String].startsWith(p)
    case IsNotNull(a)             => row(idx(a)) != null
    case IsNull(a)                => row(idx(a)) == null
    case And(l, r)                => eval(l, row) && eval(r, row)
    case Or(l, r)                 => eval(l, row) || eval(r, row)
    case other => throw new IllegalStateException(s"unpushable filter leaked: $other")
  }

  override def next(): Boolean = {
    // per-split pushed limit: stop reading as soon as n rows are out
    // (Spark's global limit finishes the job across splits)
    if (limit.exists(emitted >= _)) return false
    // a line belongs to this split iff it STARTS before `end`
    while (pos < end) {
      val lineStart = pos
      val line = readLine()
      if (line == null) return false
      val parsed = parse(line, lineStart)
      if (pushed.forall(eval(_, parsed))) {
        current = new GenericInternalRow(
          outIdx.map[Any](i => parsed(i) match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }))
        emitted += 1
        return true
      }
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}

// ---- write path: the V2 commit protocol in miniature ---------------------
// Each task writes dir/.tmp-<uuid>; its commit MESSAGE carries the temp
// name; only the driver-side job commit renames temps to
// part-<jobId>-<i>.tsv (readers never list dotfiles, so uncommitted and
// aborted task output is invisible). Part names carry a per-job id so a
// SaveMode.Append job can never collide with — and silently overwrite —
// a previous commit's files. Truncate (SaveMode.Overwrite) deletes
// committed parts at job commit, after the new temps are safely written.

import org.apache.spark.sql.connector.write._

final class TsvWriteBuilder(schema: StructType, path: String)
  extends WriteBuilder with SupportsTruncate {
  require(schema.fields.forall(_.dataType == StringType),
    s"graft-tsv writes string columns only (cast upstream); got ${schema.simpleString}")
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = TsvBatchWrite(schema, path, doTruncate,
      java.util.UUID.randomUUID().toString.take(8))
  }
}

final case class TsvCommit(tmpName: String) extends WriterCommitMessage

final case class TsvBatchWrite(schema: StructType, path: String, doTruncate: Boolean,
                               jobId: String)
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
      // job-unique target names: no REPLACE_EXISTING — a collision is a
      // bug and must surface, never silently drop a prior commit's data
      java.nio.file.Files.move(dir.resolve(tmp), dir.resolve(f"part-$jobId%s-$i%05d.tsv"))
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
      val v = GraftTsv.unfield(if (record.isNullAt(i)) null else record.getUTF8String(i).toString)
      // the read side has no escaping convention, so a tab/newline in a
      // value would silently corrupt the file (extra columns/rows on
      // read-back); reject rather than write unreadable data
      if (v.indexOf('\t') >= 0 || v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0)
        throw new IllegalArgumentException(
          s"graft-tsv: value contains an unescapable tab/newline (column $i): '$v'")
      v
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
