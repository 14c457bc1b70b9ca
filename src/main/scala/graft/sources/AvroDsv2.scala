package graft.sources

import java.util.{Map => JMap}

import org.apache.avro.file.{DataFileReader, SeekableFileInput}
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** DataSource V2 reader for Avro object container files —
  * `spark.read.format("graft-avro").load(path)` — the PARALLEL bulk-
  * ingest path over the same record loop as [[Avro.read]] (which stays
  * the driver-side upload-contract tier). The container format is
  * splittable by design: every block ends at a 16-byte sync marker, so
  * each input partition is a byte range [start, end) read with the
  * classic sync protocol — seek to the first sync AFTER start, consume
  * records until past the first sync after end. A record's block
  * belongs to exactly one range, so adjacent splits never duplicate or
  * drop rows, and a 100 TB directory of container files fans out to
  * (files × blocks/splitBytes) independent tasks with zero shuffle.
  *
  * Column pruning is pushed down (SupportsPushDownRequiredColumns): the
  * datum reader still decodes each record (Avro is row-major), but only
  * the requested fields are converted and shipped as InternalRow
  * columns, so a 2-column projection over a 50-field feed moves 2
  * columns through the scan.
  *
  * Types: the same five primitives as [[Avro]] (long, int, double,
  * string, boolean as nullable unions) — the upload-contract schema
  * this engine writes. `load(dir)` expands to the directory's *.avro
  * files; `graft.splitbytes` overrides the split size (tests force tiny
  * splits to exercise multi-partition reads on small files).
  */
class AvroDataSourceV2 extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-avro"

  override def supportsExternalMetadata(): Boolean = true

  private def filesOf(options: CaseInsensitiveStringMap): Seq[String] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-avro requires a path"))
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".avro")).map(_.getPath).sorted
      else Array(path)
    require(files.nonEmpty, s"no .avro files under $path")
    files.toIndexedSeq
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val reader = new DataFileReader[GenericRecord](
      new java.io.File(filesOf(options).head),
      new GenericDatumReader[GenericRecord]())
    try {
      StructType(reader.getSchema.getFields.asScala.toSeq.map(f =>
        StructField(f.name, AvroDsv2.sparkTypeOf(f.schema), nullable = true)))
    } finally reader.close()
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new AvroTable(schema,
      filesOf(new CaseInsensitiveStringMap(properties)),
      Option(properties.get("graft.splitbytes")).map(_.toLong)
        .getOrElse(32L << 20))
}

private[sources] object AvroDsv2 {
  def sparkTypeOf(s: org.apache.avro.Schema): org.apache.spark.sql.types.DataType = {
    import org.apache.avro.Schema.Type._
    import org.apache.spark.sql.types._
    s.getType match {
      case LONG    => LongType
      case INT     => IntegerType
      case DOUBLE  => DoubleType
      case STRING  => StringType
      case BOOLEAN => BooleanType
      case UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != NULL)
        require(nonNull.size == 1, s"unsupported union $s")
        sparkTypeOf(nonNull.head)
      case t => throw new IllegalArgumentException(
        s"graft-avro cannot map Avro type $t")
    }
  }
}

private[sources] class AvroTable(schema: StructType, files: Seq[String],
    splitBytes: Long) extends Table with SupportsRead {
  override def name(): String = s"graft-avro(${files.head}…)"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new AvroScanBuilder(schema, files, splitBytes)
}

private[sources] class AvroScanBuilder(fullSchema: StructType,
    files: Seq[String], splitBytes: Long)
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve ONLY requested fields (Spark hands them back in read order)
    required = requiredSchema
  override def build(): Scan = new AvroScan(required, files, splitBytes)
}

private[sources] class AvroScan(required: StructType, files: Seq[String],
    splitBytes: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-avro ${files.size} file(s), ReadSchema: ${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    files.flatMap { path =>
      val len = new java.io.File(path).length()
      val step = math.max(1L, splitBytes)
      (0L until math.max(1L, (len + step - 1) / step)).map { i =>
        AvroSplit(path, i * step, math.min(len, (i + 1) * step))
      }
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new AvroReaderFactory(required.fieldNames)
}

private[sources] case class AvroSplit(path: String, start: Long, end: Long)
  extends InputPartition

private[sources] class AvroReaderFactory(fieldNames: Array[String])
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val split = partition.asInstanceOf[AvroSplit]
    new PartitionReader[InternalRow] {
      private val reader = new DataFileReader[GenericRecord](
        new SeekableFileInput(new java.io.File(split.path)),
        new GenericDatumReader[GenericRecord]())
      // the split protocol: first sync after start; stop past end's sync
      reader.sync(split.start)
      private var rec: GenericRecord = _
      override def next(): Boolean =
        if (reader.hasNext && !reader.pastSync(split.end)) {
          rec = reader.next(rec); true
        } else false
      override def get(): InternalRow = {
        val vals = new Array[Any](fieldNames.length)
        var i = 0
        while (i < fieldNames.length) {
          vals(i) = rec.get(fieldNames(i)) match {
            case null => null
            case u: org.apache.avro.util.Utf8 => UTF8String.fromString(u.toString)
            case s: java.lang.CharSequence => UTF8String.fromString(s.toString)
            case v => v
          }
          i += 1
        }
        new GenericInternalRow(vals)
      }
      override def close(): Unit = reader.close()
    }
  }
}
