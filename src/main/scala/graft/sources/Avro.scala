package graft.sources

import scala.collection.JavaConverters._

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Avro Object Container File source/sink — the row-oriented
  * interchange sibling of the parquet tables: OCF is what streaming
  * buses and ingestion edges hand off (schema travels IN the file,
  * blocks are splittable and compressible). Spark 4 ships avro-core
  * but not the `spark-avro` connector on this classpath, so this is
  * a from-scratch reader/writer over the PUBLIC container spec via
  * the Avro Java API — the same shape as [[TarArchive]]: files are
  * the unit of parallelism, decoded executor-side, nothing collected.
  *
  * Type contract (documented, enforced): Avro null/boolean/int/long/
  * float/double/string/bytes, plus the nullable union [null, T] —
  * mapped 1:1 onto Spark NullType-free primitives with
  * `nullable = true` everywhere (Spark's reading convention).
  * Records/arrays/maps/enums/fixed/logical types are OUT of the
  * contract and fail loudly at schema mapping — no silent coercion.
  *
  * Distribution model: one OCF file per task. `read` takes the
  * writer schema from the FIRST file (driver opens one header — a
  * metadata peek, not a data read) and decodes every file with it as
  * the reader schema, so heterogeneous-but-compatible shards resolve
  * by Avro's own schema-resolution rules. `write` emits one
  * `part-NNNNN.avro` per partition through the Hadoop filesystem —
  * cluster-portable paths, no driver funnel. */
object Avro {

  /** Spark type for an Avro schema node; Some(nullable union branch)
    * unwrapped. */
  private def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT     => IntegerType
    case Schema.Type.LONG    => LongType
    case Schema.Type.FLOAT   => FloatType
    case Schema.Type.DOUBLE  => DoubleType
    case Schema.Type.STRING  => StringType
    case Schema.Type.BYTES   => BinaryType
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(branches.size == 1,
        s"unsupported Avro union (only [null, T]): $s")
      sparkType(branches.head)
    case other =>
      throw new IllegalArgumentException(
        s"Avro type out of the graft contract: $other ($s)")
  }

  private def structFor(schema: Schema): StructType = {
    require(schema.getType == Schema.Type.RECORD,
      s"top-level Avro schema must be a record, got: ${schema.getType}")
    StructType(schema.getFields.asScala.toSeq.map(f =>
      StructField(f.name, sparkType(f.schema), nullable = true)))
  }

  private def fromAvro(v: Any): Any = v match {
    case null                       => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case s: CharSequence            => s.toString
    case b: java.nio.ByteBuffer =>
      val a = new Array[Byte](b.remaining); b.duplicate().get(a); a
    case other                      => other
  }

  /** Read a directory/glob of OCF files. The first file's writer
    * schema becomes the reader schema for every file. */
  def read(spark: SparkSession, path: String): DataFrame = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new Path(path)
    val fs = FileSystem.get(p.toUri, conf)
    val files = {
      val listed = if (fs.isDirectory(p)) fs.listStatus(p).toSeq
        else fs.globStatus(p).toSeq
      listed.filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
        .map(_.getPath)
    }
    require(files.nonEmpty, s"no .avro files at $path")
    val readerSchema = {
      val in = fs.open(files.head)
      try new DataFileStream(in,
        new GenericDatumReader[GenericRecord]()).getSchema
      finally in.close()
    }
    val struct = structFor(readerSchema)
    val schemaJson = readerSchema.toString
    val names = struct.fieldNames
    val binary = spark.read.format("binaryFile")
      .load(files.map(_.toString): _*)
      .select("content")
    val enc = RowEncoder.encoderFor(struct)
    binary.mapPartitions { it =>
      val reader = new Schema.Parser().parse(schemaJson)
      it.flatMap { row =>
        val bytes = row.getAs[Array[Byte]](0)
        val stream = new DataFileStream(
          new java.io.ByteArrayInputStream(bytes),
          new GenericDatumReader[GenericRecord](null, reader))
        val out = Iterator.continually(stream)
          .takeWhile(_.hasNext)
          .map { s =>
            val rec = s.next()
            Row.fromSeq(names.toSeq.map(n => fromAvro(rec.get(n))))
          }.toVector
        stream.close()
        out
      }
    }(enc)
  }

  /** Avro schema (record of nullable unions) for a Spark struct. */
  private[sources] def avroSchema(struct: StructType): Schema = {
    def prim(dt: DataType): Schema = dt match {
      case BooleanType => Schema.create(Schema.Type.BOOLEAN)
      case IntegerType => Schema.create(Schema.Type.INT)
      case LongType    => Schema.create(Schema.Type.LONG)
      case FloatType   => Schema.create(Schema.Type.FLOAT)
      case DoubleType  => Schema.create(Schema.Type.DOUBLE)
      case StringType  => Schema.create(Schema.Type.STRING)
      case BinaryType  => Schema.create(Schema.Type.BYTES)
      case other => throw new IllegalArgumentException(
        s"Spark type out of the Avro sink contract: $other")
    }
    val fields = struct.fields.toSeq.map { f =>
      val s = Schema.createUnion(
        List(Schema.create(Schema.Type.NULL), prim(f.dataType)).asJava)
      new Schema.Field(f.name, s, null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord("row", null, "graft", false, fields.asJava)
  }

  private def toAvro(v: Any): Any = v match {
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case other          => other
  }

  /** Write `df` as one OCF file per partition under `path`
    * (overwrite). */
  def write(df: DataFrame, path: String): Unit = {
    val schemaJson = avroSchema(df.schema).toString
    val names = df.schema.fieldNames
    val out = new Path(path)
    val fsConf = df.sparkSession.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(out.toUri, fsConf)
    if (fs.exists(out)) fs.delete(out, true)
    fs.mkdirs(out)
    df.foreachPartition { it: Iterator[Row] =>
      if (it.hasNext) {
        val schema = new Schema.Parser().parse(schemaJson)
        val part = TaskContext.getPartitionId()
        val file = new Path(path, f"part-$part%05d.avro")
        val fsx = FileSystem.get(file.toUri, new Configuration())
        val os = fsx.create(file, true)
        val writer = new DataFileWriter(
          new GenericDatumWriter[GenericRecord](schema)).create(schema, os)
        try it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < names.length) {
            rec.put(names(i), toAvro(row.get(i))); i += 1
          }
          writer.append(rec)
        } finally writer.close()
      }
    }
  }
}
