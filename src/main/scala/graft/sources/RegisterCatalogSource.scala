package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 reader for register-catalog files — the table-driven
  * decode map the reference keeps as a text file (registers.txt:28-65:
  * one register per line with address, word count, and scale). Our
  * format is one whitespace-separated line per register:
  *
  * {{{
  *   # name  address  quantity  scale  unit
  *   dc_voltage  109  1  0.1  V
  *   total_yield 672  2  0.1  kWh
  * }}}
  *
  * `spark.read.format("register-catalog").load(path)` yields the
  * typed catalog dimension that drives decode joins (s13). The point
  * is the API surface: a complete minimal DSv2 source (TableProvider →
  * ScanBuilder → Batch → PartitionReader) with the FULL pushdown
  * surface a production connector exposes:
  *
  *  - `SupportsPushDownRequiredColumns`: the scan materializes only
  *    the projected columns (a `select(name)` never parses scales);
  *  - `SupportsPushDownFilters`: comparison/In/StartsWith predicates
  *    evaluate inside the reader — rows Spark never sees — with the
  *    standard residual contract (unsupported filters are returned to
  *    Spark for re-evaluation above the scan, and pushed filters are
  *    still re-checked by Spark only if the planner keeps them —
  *    `pushedFilters()` reports what the scan enforces so it doesn't).
  *
  * `Scan.description()` surfaces `PushedFilters`/`ReadSchema` exactly
  * like the parquet scan does, so plan audits can assert pushdown
  * reached the source (SourcesSpec).
  */
class RegisterCatalogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "register-catalog"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RegisterCatalogSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new RegisterCatalogTable(properties.asScala.getOrElse("path",
      throw new IllegalArgumentException("register-catalog: 'path' option is required")))
}

object RegisterCatalogSource {
  val Schema: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("address", IntegerType, nullable = false),
    StructField("quantity", IntegerType, nullable = false),
    StructField("scale", DoubleType, nullable = false),
    StructField("unit", StringType, nullable = false)))

  /** Which source filters the reader can evaluate natively. Everything
    * else is a residual Spark re-applies above the scan. */
  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _) => Schema.fieldNames.contains(a)
    case GreaterThan(a, _) => Schema.fieldNames.contains(a)
    case GreaterThanOrEqual(a, _) => Schema.fieldNames.contains(a)
    case LessThan(a, _) => Schema.fieldNames.contains(a)
    case LessThanOrEqual(a, _) => Schema.fieldNames.contains(a)
    case In(a, _) => Schema.fieldNames.contains(a)
    case StringStartsWith(a, _) => Schema.fieldNames.contains(a)
    case IsNotNull(a) => Schema.fieldNames.contains(a) // vacuous: schema is non-null
    case _ => false
  }

  /** Evaluate a pushed filter against a parsed record. Numeric
    * comparisons promote to double (the catalog's two numeric columns
    * are int and double); strings compare lexicographically. */
  private[sources] def eval(f: Filter, rec: Map[String, Any]): Boolean = {
    def cmp(a: Any, b: Any): Int = (a, b) match {
      case (x: Int, y: Number) => java.lang.Double.compare(x.toDouble, y.doubleValue())
      case (x: Double, y: Number) => java.lang.Double.compare(x, y.doubleValue())
      case (x: String, y: String) => x.compareTo(y)
      case other => throw new IllegalArgumentException(
        s"register-catalog: cannot compare $other")
    }
    f match {
      case EqualTo(a, v) => cmp(rec(a), v) == 0
      case GreaterThan(a, v) => cmp(rec(a), v) > 0
      case GreaterThanOrEqual(a, v) => cmp(rec(a), v) >= 0
      case LessThan(a, v) => cmp(rec(a), v) < 0
      case LessThanOrEqual(a, v) => cmp(rec(a), v) <= 0
      case In(a, vs) => vs.exists(v => cmp(rec(a), v) == 0)
      case StringStartsWith(a, p) => rec(a).asInstanceOf[String].startsWith(p)
      case IsNotNull(_) => true
      case other => throw new IllegalArgumentException(
        s"register-catalog: unpushable filter $other")
    }
  }
}

private class RegisterCatalogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"register-catalog($path)"
  override def schema(): StructType = RegisterCatalogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RegisterScanBuilder(path)
}

private class RegisterScanBuilder(path: String) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var required: StructType = RegisterCatalogSource.Schema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (sup, residual) = filters.partition(RegisterCatalogSource.supported)
    pushed = sup
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve catalog column order; an empty projection (count(*))
    // legally prunes every column
    required = StructType(RegisterCatalogSource.Schema.fields
      .filter(f => requiredSchema.fieldNames.contains(f.name)))
  override def build(): Scan = new RegisterScan(path, required, pushed)
}

private class RegisterScan(path: String, required: StructType, pushed: Array[Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"register-catalog $path, PushedFilters: [${pushed.mkString(", ")}], " +
      s"ReadSchema: ${required.catalogString}"
  override def planInputPartitions(): Array[InputPartition] =
    Array(RegisterFilePartition(path))
  override def createReaderFactory(): PartitionReaderFactory =
    new RegisterReaderFactory(required.fieldNames, pushed)
}

private case class RegisterFilePartition(path: String) extends InputPartition

private class RegisterReaderFactory(columns: Array[String], pushed: Array[Filter])
    extends PartitionReaderFactory {
  // Only the fields a pushed filter references or the projection keeps
  // are ever parsed — this is what makes the pruning/pushdown contract
  // real at the byte level: `select(name)` never runs `toDouble` on
  // scales, and a malformed field in a projected-away column cannot
  // fail the scan.
  private val needed: Array[String] =
    (columns ++ pushed.flatMap(_.references)).distinct

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[RegisterFilePartition].path
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(path)
      private val it = lines.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
      private var row: InternalRow = _
      private def parse(field: String, f: Array[String]): Any = field match {
        case "name" => f(0)
        case "address" => f(1).toInt
        case "quantity" => f(2).toInt
        case "scale" => f(3).toDouble
        case "unit" => f(4)
      }
      override def next(): Boolean = {
        var found = false
        while (!found && it.hasNext) {
          val f = it.next().split("\\s+")
          require(f.length == 5, s"register-catalog: expected 5 fields, got '${f.mkString(" ")}'")
          val rec: Map[String, Any] =
            needed.iterator.map(n => n -> parse(n, f)).toMap
          if (pushed.forall(RegisterCatalogSource.eval(_, rec))) {
            row = InternalRow.fromSeq(columns.toSeq.map { c =>
              rec(c) match {
                case s: String => UTF8String.fromString(s)
                case other => other
              }
            })
            found = true
          }
        }
        found
      }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
