package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Distributed Avro container EGRESS — the parallel write half of the
  * `graft-avro` bulk path ([[AvroDataSourceV2]] is the read half). Each
  * input partition streams its rows into its own deflate-compressed
  * container file (`part-<pid>.avro`) through the Hadoop FileSystem of
  * the target URI — no driver materialization (the [[Avro.write]]
  * upload-contract tier stays for small driver-side interchange), no
  * shuffle, 100 TB fans out to one writer task per partition.
  *
  * Every file gets a `<file>.stats.json` SIDECAR with per-column
  * min/max/null-count plus the row count. A sidecar, not container
  * metadata, by format necessity: Avro metadata lives in the HEADER and
  * is fixed at create time, but min/max are only known after the last
  * row (parquet solves this with footer stats; a header format cannot).
  * [[AvroScan]] reads the sidecars at planning time and SKIPS whole
  * files whose [min, max] cannot satisfy the pushed filters — zone-map
  * pruning for the ingest format, the "block-level min/max skipping
  * once the writer records them" rung of the r14 verdict. Readers
  * ignore unknown sidecars, so stats are purely additive; files written
  * by other tools (no sidecar) are never skipped.
  *
  * Task naming is deterministic per partition id, so a retried or
  * speculated task overwrites its own file rather than duplicating it.
  * Empty partitions write nothing. The driver stamps `_SUCCESS` after
  * the job completes.
  *
  * Types: the same five-primitive upload contract as [[Avro]]
  * (long/int/double/string/boolean as nullable unions).
  */
object AvroSink {

  /** Per-column stats a writer task accumulates; min/max only once a
    * non-null value was seen (booleans carry counts only — a 2-value
    * domain gains nothing from range pruning).
    */
  private final class ColAcc(val dt: DataType) {
    var nulls = 0L
    var minD = Double.NaN; var maxD = Double.NaN
    var minS: String = null; var maxS: String = null
    def seenNumeric: Boolean = !minD.isNaN
    def addNull(): Unit = nulls += 1
    def addD(v: Double): Unit = {
      if (minD.isNaN || v < minD) minD = v
      if (maxD.isNaN || v > maxD) maxD = v
    }
    def addS(v: String): Unit = {
      if (minS == null || v.compareTo(minS) < 0) minS = v
      if (maxS == null || v.compareTo(maxS) > 0) maxS = v
    }
  }

  def write(df: DataFrame, dir: String, overwrite: Boolean = false): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(Seq(LongType, IntegerType, DoubleType, StringType, BooleanType)
        .contains(f.dataType),
        s"graft-avro sink supports long/int/double/string/boolean, " +
          s"got ${f.dataType} for '${f.name}'")
    }
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val target = new Path(dir)
    val fs = target.getFileSystem(conf)
    if (fs.exists(target)) {
      if (overwrite)
        fs.listStatus(target).foreach { st =>
          val n = st.getPath.getName
          if (n.endsWith(".avro") || n.endsWith(".stats.json") || n == "_SUCCESS")
            fs.delete(st.getPath, false)
        }
    } else fs.mkdirs(target)
    val fieldMeta: Seq[(String, String)] = // (name, typeName) — serializable
      schema.fields.toIndexedSeq.map(f => (f.name, f.dataType.typeName))
    val dirStr = target.toString
    // toRdd: write the EXACT physical rows of the plan, distributed —
    // the one place a custom sink legitimately drops below the DataFrame
    // API (there is no DataFrame-level hook for a custom file format)
    df.queryExecution.toRdd.foreachPartition { it =>
      if (it.hasNext) {
        val avroSch = AvroSink.avroSchemaOf(fieldMeta)
        val conf2 = new Configuration()
        val out = new Path(s"$dirStr/part-${f"${org.apache.spark.TaskContext.getPartitionId()}%05d"}.avro")
        val fs2 = out.getFileSystem(conf2)
        val writer = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](avroSch))
        writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        writer.create(avroSch, fs2.create(out, true))
        val accs = fieldMeta.map { case (_, tn) => new ColAcc(typeOf(tn)) }
        var rows = 0L
        try {
          while (it.hasNext) {
            val row = it.next()
            val rec = new GenericData.Record(avroSch)
            var i = 0
            while (i < fieldMeta.length) {
              val (name, tn) = fieldMeta(i)
              if (row.isNullAt(i)) { accs(i).addNull(); rec.put(name, null) }
              else tn match {
                case "long" =>
                  val v = row.getLong(i); accs(i).addD(v.toDouble)
                  rec.put(name, java.lang.Long.valueOf(v))
                case "integer" =>
                  val v = row.getInt(i); accs(i).addD(v.toDouble)
                  rec.put(name, java.lang.Integer.valueOf(v))
                case "double" =>
                  val v = row.getDouble(i); accs(i).addD(v)
                  rec.put(name, java.lang.Double.valueOf(v))
                case "string" =>
                  val v = row.getUTF8String(i).toString; accs(i).addS(v)
                  rec.put(name, v)
                case "boolean" =>
                  rec.put(name, java.lang.Boolean.valueOf(row.getBoolean(i)))
                case other => throw new IllegalStateException(other)
              }
              i += 1
            }
            writer.append(rec)
            rows += 1
          }
        } finally writer.close()
        // stats sidecar: what the scan's zone-map pruning reads
        val om = new com.fasterxml.jackson.databind.ObjectMapper()
        val root = om.createObjectNode()
        root.put("rows", rows)
        val cols = root.putObject("cols")
        fieldMeta.zip(accs).foreach { case ((name, tn), a) =>
          val c = cols.putObject(name)
          c.put("nulls", a.nulls)
          tn match {
            case "string" =>
              if (a.minS != null) { c.put("min", a.minS); c.put("max", a.maxS) }
            case "boolean" => // counts only
            case _ =>
              if (a.seenNumeric) { c.put("min", a.minD); c.put("max", a.maxD) }
          }
        }
        val sOut = fs2.create(new Path(s"$out.stats.json"), true)
        try sOut.write(om.writeValueAsBytes(root)) finally sOut.close()
      }
    }
    val succ = fs.create(new Path(target, "_SUCCESS"), true)
    succ.close()
  }

  private def typeOf(tn: String): DataType = tn match {
    case "long" => LongType
    case "integer" => IntegerType
    case "double" => DoubleType
    case "string" => StringType
    case "boolean" => BooleanType
    case other => throw new IllegalArgumentException(other)
  }

  private[sources] def avroSchemaOf(fields: Seq[(String, String)]): Schema = {
    val fs = fields.map { case (name, tn) =>
      val base = tn match {
        case "long" => Schema.create(Schema.Type.LONG)
        case "integer" => Schema.create(Schema.Type.INT)
        case "double" => Schema.create(Schema.Type.DOUBLE)
        case "string" => Schema.create(Schema.Type.STRING)
        case "boolean" => Schema.create(Schema.Type.BOOLEAN)
        case other => throw new IllegalArgumentException(other)
      }
      new Schema.Field(name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), base),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("graft_row", null, "graft", false, fs.toList.asJava)
  }
}
