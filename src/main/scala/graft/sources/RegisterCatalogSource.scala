package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
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
  * ScanBuilder → Batch → PartitionReader) with one input partition per
  * catalog file, so even the config plane goes through the same
  * declarative reader stack as the data plane.
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
}

private class RegisterCatalogTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"register-catalog($path)"
  override def schema(): StructType = RegisterCatalogSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = RegisterCatalogSource.Schema
      override def toBatch: Batch = this
      override def planInputPartitions(): Array[InputPartition] =
        Array(RegisterFilePartition(path))
      override def createReaderFactory(): PartitionReaderFactory =
        new RegisterReaderFactory
    }
}

private case class RegisterFilePartition(path: String) extends InputPartition

private class RegisterReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[RegisterFilePartition].path
    new PartitionReader[InternalRow] {
      private val lines = scala.io.Source.fromFile(path)
      private val it = lines.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
      private var row: InternalRow = _
      override def next(): Boolean =
        if (!it.hasNext) false
        else {
          val f = it.next().split("\\s+")
          require(f.length == 5, s"register-catalog: expected 5 fields, got '${f.mkString(" ")}'")
          row = InternalRow(UTF8String.fromString(f(0)), f(1).toInt, f(2).toInt,
            f(3).toDouble, UTF8String.fromString(f(4)))
          true
        }
      override def get(): InternalRow = row
      override def close(): Unit = lines.close()
    }
  }
}
