package graft.sources

import java.io.File
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.types._

/** Avro container export/import — the Kafka-ecosystem wire format
  * beside CSV/JSON/ORC (dataManager.ts:190-305 is the export/import
  * analog). Spark's bundled `spark-avro` module is not on this
  * build's classpath, so the codec is built directly on the PUBLIC
  * Avro Java library (org.apache.avro, which Spark itself ships):
  * a self-describing Avro Object Container File per partition on
  * export, and Spark's `binaryFile` source + per-task
  * [[DataFileReader]] decode on import — the multimodal batch
  * boundary discipline (bytes decode inside mapPartitions; records
  * never ride a shuffle undecoded).
  *
  * Supported Spark types: the flat primitive set an interchange
  * feed carries (boolean/int/long/float/double/string/binary), each
  * nullable via the standard `union(null, T)`. Anything else fails
  * loudly at schema derivation — a silent coercion would defeat the
  * round-trip fidelity proof.
  *
  * 100 TB: one container file per partition (no driver funnel unless
  * `singleFile`), records stream through the writer without
  * buffering the partition, and import parallelism = file count via
  * the binaryFile source. The known honest limit: each container is
  * decoded from one in-memory blob (binaryFile's unit), so export
  * partition sizing bounds import memory — the same contract as any
  * blob-table pipeline here.
  */
object AvroCodec {

  /** Derive the Avro record schema for a flat Spark schema; every
    * field is `union(null, T)` (Spark parquet fields are nullable by
    * default, and null-bearing interchange is the realistic case).
    */
  private[sources] def avroSchemaFor(schema: StructType, name: String): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType => Schema.create(Schema.Type.LONG)
      case FloatType => Schema.create(Schema.Type.FLOAT)
      case DoubleType => Schema.create(Schema.Type.DOUBLE)
      case StringType => Schema.create(Schema.Type.STRING)
      case BinaryType => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Avro export: $other")
    }
    val fields = schema.fields.map { f =>
      new Schema.Field(f.name,
        Schema.createUnion(Schema.create(Schema.Type.NULL), prim(f.dataType)),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft.avro", false, fields.toSeq.asJava)
  }

  /** Inverse map: the imported DataFrame's Spark schema. */
  private[sources] def sparkSchemaFor(schema: Schema): StructType = {
    def unwrap(s: Schema): Schema =
      if (s.getType == Schema.Type.UNION)
        s.getTypes.asScala.find(_.getType != Schema.Type.NULL).getOrElse(
          throw new IllegalArgumentException("union of only null"))
      else s
    StructType(schema.getFields.asScala.map { f =>
      val dt = unwrap(f.schema()).getType match {
        case Schema.Type.BOOLEAN => BooleanType
        case Schema.Type.INT => IntegerType
        case Schema.Type.LONG => LongType
        case Schema.Type.FLOAT => FloatType
        case Schema.Type.DOUBLE => DoubleType
        case Schema.Type.STRING => StringType
        case Schema.Type.BYTES => BinaryType
        case other => throw new IllegalArgumentException(
          s"unsupported Avro type on import: $other")
      }
      StructField(f.name(), dt, nullable = true)
    }.toSeq)
  }

  /** Distributed export: one self-describing `.avro` container per
    * partition plus a `_schema.avsc` sidecar (the import fast path;
    * the containers alone stay sufficient — Avro files carry their
    * schema in the header).
    */
  def exportAvro(df: DataFrame, path: String, singleFile: Boolean = false): Unit = {
    val d = if (singleFile) df.coalesce(1) else df
    val avroSchema = avroSchemaFor(d.schema, "GraftRow")
    val schemaJson = avroSchema.toString
    val sparkSchema = d.schema
    val dir = new File(path)
    if (dir.exists()) { // overwrite semantics, matching the sibling codecs
      Files.walk(Paths.get(path)).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
    dir.mkdirs()
    Files.write(Paths.get(path, "_schema.avsc"),
      schemaJson.getBytes(StandardCharsets.UTF_8))
    d.foreachPartition { (rows: Iterator[Row]) =>
      val schema = new Schema.Parser().parse(schemaJson)
      val tc = TaskContext.get()
      val pid = tc.partitionId()
      // Retried/speculative attempts of the same partition must never
      // write the same file concurrently (a half-written container is
      // silent corruption): stream into a task-attempt-UNIQUE temp name
      // and atomically rename on success — last committer wins, losers
      // leave only a temp file the next overwrite sweeps.
      val finalFile = new File(path, f"part-$pid%05d.avro")
      val tmpFile = new File(path, f".part-$pid%05d-attempt-${tc.taskAttemptId()}.avro.tmp")
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, tmpFile)
      try {
        rows.foreach { r =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            val v = if (r.isNullAt(i)) null else sparkSchema(i).dataType match {
              case BinaryType => ByteBuffer.wrap(r.getAs[Array[Byte]](i))
              case _ => r.get(i).asInstanceOf[AnyRef]
            }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
        }
        writer.close()
        Files.move(tmpFile.toPath, finalFile.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        ()
      } catch {
        case e: Throwable =>
          try writer.close() catch { case _: Throwable => () }
          Files.deleteIfExists(tmpFile.toPath)
          throw e
      }
    }
  }

  /** Type-preserving import: schema from the sidecar (or any
    * container's own header when the sidecar is absent), then the
    * binaryFile source fans the containers out and each decodes
    * inside one task.
    */
  def importAvro(spark: SparkSession, path: String): DataFrame = {
    val bin = spark.read.format("binaryFile").load(s"$path/*.avro")
      .select("content")
    val sidecar = Paths.get(path, "_schema.avsc")
    val schemaJson =
      if (Files.exists(sidecar))
        new String(Files.readAllBytes(sidecar), StandardCharsets.UTF_8)
      else { // bounded driver artifact: ONE container's header
        val head = bin.limit(1).collect()
        require(head.nonEmpty, s"no .avro containers under $path")
        val r = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(head(0).getAs[Array[Byte]](0)),
          new GenericDatumReader[GenericRecord]())
        try r.getSchema.toString finally r.close()
      }
    val sparkSchema = sparkSchemaFor(new Schema.Parser().parse(schemaJson))
    val nCols = sparkSchema.length
    val types = sparkSchema.fields.map(_.dataType)
    bin.as(Encoders.BINARY).mapPartitions { blobs =>
      blobs.flatMap { bytes =>
        val reader = new DataFileReader[GenericRecord](
          new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
        new Iterator[Row] {
          private var open = true
          def hasNext: Boolean = {
            val h = open && reader.hasNext
            if (!h && open) { reader.close(); open = false }
            h
          }
          def next(): Row = {
            val rec = reader.next()
            Row.fromSeq((0 until nCols).map { i =>
              rec.get(i) match {
                case null => null
                case u: org.apache.avro.util.Utf8 => u.toString
                case b: ByteBuffer =>
                  val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
                case v if types(i) == StringType => v.toString
                case v => v
              }
            })
          }
        }
      }
    }(Encoders.row(sparkSchema))
  }
}
