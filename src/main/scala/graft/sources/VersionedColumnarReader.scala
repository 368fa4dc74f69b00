package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}
import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
import org.apache.parquet.hadoop.ParquetInputFormat
import org.apache.parquet.schema.MessageType

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read.PartitionReader
import org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader
import org.apache.spark.sql.sources.Filter
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
import org.apache.spark.unsafe.types.UTF8String

/** Columnar (vectorized) reader for UNMASKED file partitions — the
  * connector's bulk-scan fast path (r15).
  *
  * The row reader pays per-row record assembly in parquet-mr plus a
  * boxed `GenericInternalRow` per row; Spark's own
  * [[VectorizedParquetRecordReader]] (a public Java class, the same
  * engine `spark.read.parquet` uses) decodes whole column chunks into
  * `ColumnarBatch`es that feed whole-stage codegen directly. The
  * snapshot-normalization duties the custom reader exists for map onto
  * it cleanly:
  *
  *  - column mapping: the requested Catalyst schema is issued in the
  *    file's PHYSICAL names (output consumption is positional, so the
  *    logical names never need to reach the decoder);
  *  - evolution defaults + the `_group` metadata column: columns
  *    physically absent from this file ride `initBatch`'s partition
  *    constants — one constant vector each, zero per-row work (the
  *    exact mechanism Spark uses for hive partition columns);
  *  - column order: the batch lays out file-served columns then
  *    constants; a one-time reordering wrapper restores the scan's
  *    required order (vector objects are stable across batches).
  *
  * MOR-masked groups keep the row reader (per-row key probes cannot be
  * expressed on a shared batch without copying); the factory disables
  * columnar for the WHOLE scan when any planned group carries a
  * deletion vector, because Spark refuses mixed row/columnar scans.
  * Files are written by Spark or parquet-mr with standard STRING/DATE
  * annotations and no timestamps, so rebase modes are CORRECTED. */
private[sources] class VersionedColumnarReader(file: String, group: String,
    required: StructType, pushed: Array[Filter],
    logicalToPhysical: Map[String, String],
    defaultValues: Map[String, Any])
    extends PartitionReader[ColumnarBatch] {

  private val conf = VersionedPartitionReader.freshConf()
  private val path = new Path(file)
  private val fileSchema: MessageType =
    VersionedPartitionReader.schemaOf(path, conf)
  private val present: Set[String] =
    fileSchema.getFields.asScala.map(_.getName).toSet

  private val physName: Array[String] =
    required.fields.map(f => logicalToPhysical.getOrElse(f.name, f.name))

  /** Required indices served by the FILE vs by a CONSTANT vector. */
  private val (servedIdx, constIdx) =
    required.fields.indices.partition(i =>
      required.fields(i).name != VersionedSource.GroupCol &&
        present.contains(physName(i)))

  private val requestedSchema = StructType(servedIdx.map(i =>
    required.fields(i).copy(name = physName(i))))
  private val constSchema = StructType(constIdx.map(i => required.fields(i)))
  private val constRow: InternalRow = new GenericInternalRow(
    constIdx.map { i =>
      val f = required.fields(i)
      if (f.name == VersionedSource.GroupCol) UTF8String.fromString(group)
      else defaultValues.getOrElse(physName(i), null) // internal-format
    }.toArray[Any])

  /** required index → column index in the (served ++ const) batch. */
  private val outOrder: Array[Int] = {
    val m = (servedIdx.zipWithIndex ++
      constIdx.zipWithIndex.map { case (r, j) => r -> (servedIdx.length + j) }
      ).toMap
    Array.tabulate(required.length)(m)
  }

  private val reader: VectorizedParquetRecordReader = {
    // the stable conf key Spark's ParquetReadSupport.init reads; every
    // other key falls back to its SQLConf default (binaryAsString off,
    // int96AsTimestamp — no timestamps here either way)
    conf.set("org.apache.spark.sql.parquet.row.requested_schema",
      requestedSchema.json)
    conf.set(ParquetInputFormat.READ_SUPPORT_CLASS,
      "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
    // Spark normally copies every SQL conf into the task's hadoop conf
    // (SessionState.newHadoopConf); the schema converter reads these
    // with a bare .toBoolean, so they must exist. Values are the SQLConf
    // defaults — the connector's files carry explicit STRING/DATE
    // annotations and no INT96/nano timestamps, so none of them bind.
    conf.set("spark.sql.parquet.binaryAsString", "false")
    conf.set("spark.sql.parquet.int96AsTimestamp", "true")
    conf.set("spark.sql.caseSensitive", "false")
    conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    // pushed filters (physical names) → parquet row-group/page skipping;
    // Spark re-applies every filter as a residual, so this is purely an
    // I/O reduction exactly like the row reader's FilterCompat use
    VersionedPartitionReader.toParquetPredicate(
      pushed.map(VersionedPartitionReader.toPhysicalFilter(_,
        logicalToPhysical)),
      fileSchema.getFields.asScala.collect {
        case p: org.apache.parquet.schema.PrimitiveType => p.getName -> p
      }.toMap)
      .foreach(p => ParquetInputFormat.setFilterPredicate(conf, p))
    val r = new VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC",
      /* useOffHeap = */ false, /* capacity = */ 4096)
    val fileLen = path.getFileSystem(conf).getFileStatus(path).getLen
    // the base reader casts to the LEGACY mapred FileSplit
    val split = new org.apache.hadoop.mapred.FileSplit(
      path, 0, fileLen, Array.empty[String])
    val attempt = new TaskAttemptContextImpl(conf,
      new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0))
    r.initialize(split, attempt)
    r.initBatch(constSchema, constRow)
    r.enableReturningBatches()
    r
  }

  private var outBatch: ColumnarBatch = _

  override def next(): Boolean = reader.nextKeyValue()

  override def get(): ColumnarBatch = {
    val b = reader.getCurrentValue.asInstanceOf[ColumnarBatch]
    if (outBatch == null) {
      // vector objects are reused across batches — reorder once
      val cols = new Array[ColumnVector](required.length)
      var i = 0
      while (i < required.length) { cols(i) = b.column(outOrder(i)); i += 1 }
      outBatch = new ColumnarBatch(cols, b.numRows())
    }
    outBatch.setNumRows(b.numRows())
    outBatch
  }

  override def close(): Unit = reader.close()
}
