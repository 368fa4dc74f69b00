package graft.io

import java.nio.file.Files

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation.TimeUnit
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT64
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType, TimestampNTZType, TimestampType}

import graft.SparkSpec

/** Both-layouts fixture spec for the schema-adaptive events reader
  * (`Tables.loadEvents`). The events table's physical `ts` layout has
  * shipped as INT64 TIMESTAMP(NANOS) and INT64 TIMESTAMP(MICROS,
  * isAdjustedToUTC=false) across testdata generations; rounds 6–7 lost the
  * whole events family to an untested layout switch. This spec drives
  * every branch of `loadEvents` against tiny fixture files so a testdata
  * regen can never silently dark the family again:
  *
  *  - NANOS fixture (written with the parquet example API — Spark cannot
  *    write NANOS): read through the legacy-conf + `div 1000` path, values
  *    must equal the nano ticks truncated to micros.
  *  - MICROS-NTZ fixture (written by Spark as TimestampNTZ): read through
  *    the NTZ→Timestamp cast path, values identical under UTC session tz.
  *  - Unannotated INT64: the tick unit is unknowable — must throw, not
  *    silently guess nanos (a wrong guess collapses timestamps to ~1970).
  *  - Non-timestamp `ts` (e.g. DATE): must throw.
  */
class EventsLayoutSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("events-layout").toString

  /** Write a single-column-pair parquet file via the example Group API so
    * the test controls the exact physical annotation (Spark's writer never
    * emits NANOS or unannotated INT64 timestamps). */
  private def writeRaw(file: String, schema: MessageType,
                       rows: Seq[(Long, Long)]): Unit = {
    val writer = ExampleParquetWriter.builder(new HPath(file))
      .withConf(spark.sessionState.newHadoopConf())
      .withType(schema)
      .build()
    val f = new SimpleGroupFactory(schema)
    try rows.foreach { case (ts, uid) =>
      writer.write(f.newGroup().append("ts", ts).append("user_id", uid))
    } finally writer.close()
  }

  private def eventsSchema(ann: LogicalTypeAnnotation): MessageType = {
    val b = Types.buildMessage()
    val tsField =
      if (ann == null) Types.required(INT64)
      else Types.required(INT64).as(ann)
    b.addField(tsField.named("ts"))
      .addField(Types.required(INT64).named("user_id"))
      .named("events")
  }

  // 2023-11-14T22:13:20.123456789 UTC as nano ticks
  private val nanoTicks = 1700000000123456789L
  private val wantMicros = 1700000000123456L // truncated, what DuckDB casts to

  test("NANOS layout: footer-dispatched legacy read, ticks div 1000") {
    val file = s"${tmpDir()}/events.parquet"
    writeRaw(file,
      eventsSchema(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)),
      Seq((nanoTicks, 1L), (nanoTicks + 210L, 2L))) // .…456789+210 = .…456999 ns — sub-µs truncates away
    try {
      val df = Tables.loadEvents(spark, file)
      assert(df.schema("ts").dataType == TimestampType)
      val got = df.orderBy("user_id")
        .select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
        .collect().toSeq
      assert(got == Seq(wantMicros, wantMicros))
    } finally
      // the nanos path sets the legacy conf session-wide (required at scan
      // execution time); restore the shared test session's default
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
  }

  test("MICROS-NTZ layout: native read, cast identical under UTC tz") {
    val dir = s"${tmpDir()}/events.parquet"
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      1700000000L, 123456000, java.time.ZoneOffset.UTC)
    val rows = java.util.Arrays.asList(
      org.apache.spark.sql.Row(ldt, 1L), org.apache.spark.sql.Row(ldt, 2L))
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(dir)

    val df = Tables.loadEvents(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    val got = df.orderBy("user_id")
      .select(unix_micros(col("ts"))).as[Long](spark.implicits.newLongEncoder)
      .collect().toSeq
    assert(got == Seq(wantMicros, wantMicros))
  }

  test("unannotated INT64 ts: refuses to guess the tick unit") {
    val file = s"${tmpDir()}/events.parquet"
    writeRaw(file, eventsSchema(null), Seq((nanoTicks, 1L)))
    val e = intercept[IllegalStateException](Tables.loadEvents(spark, file))
    assert(e.getMessage.contains("unannotated INT64"))
  }

  test("non-timestamp ts: rejected loudly") {
    val dir = s"${tmpDir()}/events.parquet"
    import spark.implicits._
    Seq((java.sql.Date.valueOf("2023-11-14"), 1L)).toDF("ts", "user_id")
      .write.mode("overwrite").parquet(dir)
    val e = intercept[IllegalStateException](Tables.loadEvents(spark, dir))
    assert(e.getMessage.contains("unsupported physical type"))
  }

  test("mixed NANOS/MICROS directory: refused loudly, not first-file-decoded") {
    val dir = s"${tmpDir()}/events.parquet"
    Files.createDirectories(java.nio.file.Paths.get(dir))
    writeRaw(s"$dir/part-00000.parquet",
      eventsSchema(LogicalTypeAnnotation.timestampType(false, TimeUnit.NANOS)),
      Seq((nanoTicks, 1L)))
    writeRaw(s"$dir/part-00001.parquet",
      eventsSchema(LogicalTypeAnnotation.timestampType(false, TimeUnit.MICROS)),
      Seq((wantMicros, 2L)))
    val e = intercept[IllegalStateException](Tables.loadEvents(spark, dir))
    assert(e.getMessage.contains("mixes"))
  }

  test("footer probe: directory of part files dispatches like a single file") {
    // Spark writes a DIRECTORY; the NANOS test above covers the single-file
    // probe path. This pins the directory path: an NTZ directory must NOT
    // be classified as nanos.
    val dir = s"${tmpDir()}/events.parquet"
    val ldt = java.time.LocalDateTime.ofEpochSecond(1700000000L, 0,
      java.time.ZoneOffset.UTC)
    val rows = java.util.Arrays.asList(org.apache.spark.sql.Row(ldt, 1L))
    val schema = StructType(Seq(
      StructField("ts", TimestampNTZType), StructField("user_id",
        org.apache.spark.sql.types.LongType)))
    spark.createDataFrame(rows, schema).repartition(3)
      .write.mode("overwrite").parquet(dir)
    val df = Tables.loadEvents(spark, dir)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() == 1)
  }
}
