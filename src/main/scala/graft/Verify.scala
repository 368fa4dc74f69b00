package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query subset (builder-side fast
    // iteration; the driver's 2-arg call dumps everything)
    val subset = args.lift(2).map(_.split(",").map(_.trim).toSet)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    // ---- preflight: print each testdata table's PHYSICAL parquet schema
    // (footer message type, one line per table). Rounds 6/7 lost 22 queries
    // to a silent testdata-layout change (events.ts NANOS → MICROS);
    // absence-of-row read as pass. This makes the physical layout visible
    // in every round's log, and the dumped/declared accounting below makes
    // a shrinking board loud instead of silent.
    for (t <- graft.io.Tables.names) {
      val line = try {
        import org.apache.hadoop.fs.{Path => HPath}
        import org.apache.parquet.hadoop.ParquetFileReader
        import org.apache.parquet.hadoop.util.HadoopInputFile
        val conf = spark.sessionState.newHadoopConf()
        val p = new HPath(s"$sfDir/$t.parquet")
        val fs = p.getFileSystem(conf)
        val file =
          if (fs.getFileStatus(p).isDirectory)
            fs.listStatus(p).map(_.getPath)
              .filter(f => !f.getName.startsWith("_") && !f.getName.startsWith("."))
              .sortBy(_.getName).head
          else p
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
        try r.getFooter.getFileMetaData.getSchema.toString
          .replaceAll("\\s+", " ").trim
        finally r.close()
      } catch { case e: Throwable => s"UNREADABLE: ${e.getMessage}" }
      System.err.println(s"[preflight] $t: $line")
    }

    // canonical per-query digest (r11 g-family post-mortem): the driver's
    // hash gate is a boolean, so a driver-vs-builder disagreement gives
    // nothing to diff. This digest — computed from the DUMPED parquet
    // (exactly the bytes the driver's checker reads), columns sorted by
    // name, values cast to string, per-row md5 summed order-insensitively
    // — is dumped alongside, so two Verify runs (driver box vs builder
    // box) can be compared value-for-value without rerunning queries.
    def digestOf(df: org.apache.spark.sql.DataFrame): (Long, String) = {
      import org.apache.spark.sql.functions._
      val cols = df.columns.sorted
        .map(c => coalesce(col(c).cast("string"), lit("\u0000NULL")))
      val agg = df
        .select(md5(concat_ws("\u0001", cols.toIndexedSeq: _*)).as("h"))
        .agg(count(lit(1)).as("n"),
          sum(conv(substring(col("h"), 1, 15), 16, 10)
            .cast("decimal(38,0)")).as("s"))
        .collect()(0)
      (agg.getLong(0),
        Option(agg.getDecimal(1)).map(_.toBigInteger.toString(16))
          .getOrElse("empty"))
    }
    val declared = SparkEntry.queries
      .filter { case (name, _) => subset.forall(_.contains(name)) }
    var failed = List.empty[String]
    var digests = List.empty[(String, Long, String)]
    declared.foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // the digest is DIAGNOSTIC: a failure on this re-read must not
        // mark a fully-dumped query as failed (the dumped/declared
        // accounting would under-report while check.py happily passes
        // the dump — exactly the silent disagreement it exists to catch)
        try {
          val (n, dg) = digestOf(spark.read.parquet(s"$outDir/$name"))
          digests ::= ((name, n, dg))
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name dumped but digest failed: " +
            e.getMessage)
        }
      } catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    Files.writeString(Paths.get(s"$outDir/row_digests.json"),
      digests.sortBy(_._1).map { case (n, rows, dg) =>
        s""""$n":{"rows":$rows,"digest":"$dg"}""" }
        .mkString("{", ",", "}"))
    System.err.println(
      s"[preflight] dumped ${declared.size - failed.size} of ${declared.size} " +
        s"declared queries" +
        (if (failed.nonEmpty) s"; FAILED: ${failed.sorted.mkString(",")}" else ""))
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => subset.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
