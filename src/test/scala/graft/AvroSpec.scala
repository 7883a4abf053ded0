package graft

import graft.sources.{AvroSource, Sources}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import java.io.File
import java.nio.file.Files
import java.time.LocalDateTime

/** Native avro container source/sink: roundtrip, interop with files
  * written by the raw Avro API (not just self-consistency), byte-range
  * splitting, modes, and the declarative Sources dispatch. */
class AvroSpec extends SparkSpec {
  private def tmp(): String = Files.createTempDirectory("avrospec").toString

  private val wideSchema = StructType(Seq(
    StructField("i", IntegerType),
    StructField("l", LongType),
    StructField("d", DoubleType),
    StructField("f", FloatType),
    StructField("b", BooleanType),
    StructField("s", StringType),
    StructField("bin", BinaryType),
    StructField("dt", DateType),
    StructField("ts", TimestampType),
    StructField("ntz", TimestampNTZType),
    StructField("dec", DecimalType(10, 2)),
    StructField("arr", ArrayType(IntegerType)),
    StructField("m", MapType(StringType, StringType)),
    StructField("st", StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType))))))

  private def wideRows = Seq(
    Row(1, 2L, 3.5, 4.5f, true, "x", Array[Byte](1, 2), java.sql.Date.valueOf("2024-03-01"),
      java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"),
      LocalDateTime.parse("2024-03-01T10:30:00.000123"),
      new java.math.BigDecimal("123.45"), Seq(1, 2, 3), Map("k" -> "v"), Row(7, "in")),
    Row(2, null, null, null, null, null, null, null, null, null, null, null, null, null))

  test("roundtrip all supported types incl. nulls") {
    val dir = s"${tmp()}/wide"
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(wideRows.toSeq), wideSchema)
    assert(AvroSource.write(df, dir) == 2L)
    val back = AvroSource.read(spark, dir)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      wideSchema.fields.map(f => (f.name, f.dataType)).toSeq)
    val rows = back.orderBy("i").collect()
    assert(rows.length == 2)
    val r = rows(0)
    assert(r.getInt(0) == 1 && r.getLong(1) == 2L && r.getString(5) == "x")
    assert(r.getAs[Array[Byte]]("bin").toSeq == Seq[Byte](1, 2))
    assert(r.getDate(7) == java.sql.Date.valueOf("2024-03-01"))
    assert(r.getTimestamp(8) == java.sql.Timestamp.valueOf("2024-03-01 10:30:00.123456"))
    assert(r.getAs[LocalDateTime]("ntz") == LocalDateTime.parse("2024-03-01T10:30:00.000123"))
    assert(r.getDecimal(10) == new java.math.BigDecimal("123.45"))
    assert(r.getSeq[Int](11) == Seq(1, 2, 3))
    assert(r.getMap[String, String](12) == Map("k" -> "v"))
    assert(r.getStruct(13) == Row(7, "in"))
    assert(rows(1).isNullAt(1) && rows(1).isNullAt(8) && rows(1).isNullAt(13))
  }

  test("reads files written by the raw avro API (interop, not self-consistency)") {
    val dir = new File(tmp(), "raw"); dir.mkdirs()
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |{"name":"id","type":"long"},
        |{"name":"name","type":["null","string"],"default":null}]}""".stripMargin)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new File(dir, "data.avro"))
    (1L to 5L).foreach { i =>
      val rec = new GenericData.Record(schema)
      rec.put("id", i); rec.put("name", if (i == 3) null else s"n$i")
      w.append(rec)
    }
    w.close()
    val df = AvroSource.read(spark, dir.toString)
    assert(df.schema == StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType))))
    assert(df.count() == 5 && df.filter("name is null").count() == 1)
    assert(df.agg(sum("id")).head.getLong(0) == 15L)
  }

  test("byte-range splits cover every row exactly once") {
    val dir = s"${tmp()}/big"
    val df = spark.range(20000).select(col("id"),
      concat(lit("payload_"), col("id")).as("payload"))
    AvroSource.write(df.repartition(1), dir, codec = "null")
    // force many small splits over the single file
    val back = AvroSource.read(spark, dir, maxSplitBytes = 64 * 1024)
    assert(back.rdd.getNumPartitions > 3,
      s"expected >3 byte-range splits, got ${back.rdd.getNumPartitions}")
    assert(back.count() == 20000)
    assert(back.agg(sum("id")).head.getLong(0) == (0L until 20000L).sum)
    assert(back.select("payload").distinct().count() == 20000)
  }

  test("write modes: overwrite replaces, append adds, error fails, ignore skips") {
    val dir = s"${tmp()}/modes"
    val a = spark.range(10).toDF("id")
    AvroSource.write(a, dir)
    AvroSource.write(a, dir, mode = "append")
    assert(AvroSource.read(spark, dir).count() == 20)
    AvroSource.write(a, dir, mode = "overwrite")
    assert(AvroSource.read(spark, dir).count() == 10)
    assert(AvroSource.write(a, dir, mode = "ignore") == 0L)
    intercept[IllegalArgumentException] { AvroSource.write(a, dir, mode = "error") }
  }

  test("empty frame still leaves a schema-bearing readable sink") {
    val dir = s"${tmp()}/empty"
    AvroSource.write(spark.range(5).toDF("id").filter("id < 0"), dir)
    val back = AvroSource.read(spark, dir)
    assert(back.count() == 0 && back.schema.fieldNames.toSeq == Seq("id"))
  }

  test("declarative Sources read/write dispatch avro") {
    val dir = s"${tmp()}/decl"
    val df = spark.range(7).select(col("id"), (col("id") % 2 === 0).as("even"))
    assert(Sources.writeWithStats(df, dir,
      Sources.WriteConfig(format = "avro", coalescePartitions = Some(1))) == 7L)
    val back = Sources.read(spark, Sources.ReadConfig("avro", path = Some(dir)))
    assert(back.count() == 7 && back.filter("even").count() == 4)
    // partition_by is not supported on the native avro sink — fail fast
    intercept[IllegalArgumentException] {
      Sources.writeWithStats(df, dir,
        Sources.WriteConfig(format = "avro", partitionBy = Seq("even")))
    }
  }

  test("invalid avro field names fail fast on write") {
    val df = spark.range(3).select(col("id").as("bad name"))
    intercept[IllegalArgumentException] { AvroSource.write(df, s"${tmp()}/bad") }
  }

  test("wider unions fail fast with a clear message") {
    val schema = new org.apache.avro.Schema.Parser().parse(
      """{"type":"record","name":"t","fields":[
        |{"name":"u","type":["int","string"]}]}""".stripMargin)
    val e = intercept[IllegalArgumentException] { AvroSource.toSparkType(schema) }
    assert(e.getMessage.contains("union"))
  }
}
