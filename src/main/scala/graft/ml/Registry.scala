package graft.ml

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Model registry / governance (SURVEY.md M8, reference `ml/registry.py`):
  * stage state machine None → Staging → Production → Archived, required
  * tags, expiry, and a governance report — re-implemented without MLflow as
  * an append-only JSONL event log + a derived current-state view (an
  * event-sourced register; the derived view is one window query, so the
  * registry scales to any number of models/versions).
  */
object Registry {

  val Stages: Seq[String] = Seq("None", "Staging", "Production", "Archived")

  /** Promotion rules (`ml/registry.py:99-142`): linear promotion plus
    * archive-from-anywhere and rollback Production→Staging. */
  val AllowedTransitions: Set[(String, String)] = Set(
    ("None", "Staging"), ("Staging", "Production"),
    ("Production", "Staging"),
    ("None", "Archived"), ("Staging", "Archived"), ("Production", "Archived"))

  /** Tags every registered model must carry (`ml/registry.py:20-35`). */
  val RequiredTags: Seq[String] = Seq("owner", "dataset", "training_date")

  /** Max model age before it is flagged expired: 90 days
    * (`ml/registry.py:361`). */
  val MaxAgeDays = 90

  final case class Event(
      model: String, version: Int, stage: String, atMillis: Long,
      tags: Map[String, String], metrics: Map[String, Double],
      seq: Long = -1L)

  final case class TransitionRejected(from: String, to: String)
    extends RuntimeException(s"illegal stage transition $from -> $to")

  /** One in-JVM monitor per log file (canonicalized path), so every
    * EventLog instance over the same file shares the same lock. */
  private val pathLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def pathLock(path: String): Object =
    pathLocks.computeIfAbsent(
      Paths.get(path).toAbsolutePath.normalize.toString, _ => new Object)

  /** In-memory event-log registry with the reference's state machine;
    * persisted as JSONL so a Spark job can read it as a table. */
  final class EventLog(path: String) {
    /** JSON string escape — a model name or tag value carrying a quote,
      * backslash, or control char must not corrupt the log (one bad line
      * would parse as a corrupt record and wedge the whole register). */
    private def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    private def line(e: Event): String = {
      def m(kv: Map[String, String]) =
        kv.toSeq.sorted.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString("{", ",", "}")
      def md(kv: Map[String, Double]) =
        kv.toSeq.sorted.map { case (k, v) => s""""${esc(k)}":$v""" }
          .mkString("{", ",", "}")
      s"""{"model":"${esc(e.model)}","version":${e.version},"stage":"${e.stage}",""" +
        s""""at_millis":${e.atMillis},"seq":${e.seq},""" +
        s""""tags":${m(e.tags)},"metrics":${md(e.metrics)}}"""
    }

    // Next seq and the file size it was derived at. Guarded by a JVM-wide
    // per-path lock (two in-process EventLog instances on one file must
    // serialize BEFORE the FileLock — JVM file locks are per-process and
    // throw OverlappingFileLockException on in-process overlap); the
    // exclusive FileLock in append() serializes cross-process writers, and
    // the size check detects a foreign append (size moved under us →
    // recount). Steady-state appends are O(1); the O(lines) recount runs
    // once per instance or after a foreign write.
    private[this] val lock = Registry.pathLock(path)
    private[this] var nextSeq = 0L
    private[this] var knownSize = -1L

    def append(e: Event): Unit = lock.synchronized {
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      // monotonic per-log sequence number: at_millis alone cannot break
      // ties between events appended within the same millisecond.
      val ch = java.nio.channels.FileChannel.open(p,
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.APPEND)
      try {
        val fl = ch.lock()
        try {
          val sz = ch.size()
          if (sz != knownSize) {
            nextSeq =
              if (sz == 0L) 0L
              else { val s = Files.lines(p); try s.count() finally s.close() }
          }
          val bytes = (line(e.copy(seq = nextSeq)) + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          ch.write(java.nio.ByteBuffer.wrap(bytes))
          nextSeq += 1
          knownSize = sz + bytes.length
        } finally fl.release()
      } finally ch.close()
    }

    def register(model: String, version: Int, atMillis: Long,
        tags: Map[String, String], metrics: Map[String, Double]): Unit = {
      val missing = RequiredTags.filterNot(tags.contains)
      require(missing.isEmpty, s"missing required tags: ${missing.mkString(", ")}")
      append(Event(model, version, "None", atMillis, tags, metrics))
    }

    def currentStage(spark: SparkSession, model: String, version: Int): Option[String] = {
      val st = state(spark).filter(col("model") === model && col("version") === version)
        .select("stage").collect()
      st.headOption.map(_.getString(0))
    }

    /** Transition with state-machine enforcement (throws on illegal). */
    def transition(spark: SparkSession, model: String, version: Int,
        toStage: String, atMillis: Long): Unit = {
      require(Stages.contains(toStage), s"unknown stage $toStage")
      val from = currentStage(spark, model, version).getOrElse(
        throw new NoSuchElementException(s"$model v$version is not registered"))
      if (!AllowedTransitions.contains((from, toStage)))
        throw TransitionRejected(from, toStage)
      append(Event(model, version, toStage, atMillis, Map.empty, Map.empty))
    }

    /** Current state per (model, version): latest event wins — ordered
      * by (at_millis, seq) so same-millisecond appends resolve in log
      * order, deterministically. */
    def state(spark: SparkSession): DataFrame = {
      val w = Window.partitionBy("model", "version")
        .orderBy(col("at_millis").desc, col("seq").desc)
      spark.read.json(path)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn")
    }

    /** Governance report (`ml/registry.py:361-468`): per model/version
      * stage, age vs the injected `nowMillis`, expiry flag. */
    def governanceReport(spark: SparkSession, nowMillis: Long): DataFrame = {
      val first = spark.read.json(path)
        .groupBy("model", "version").agg(min("at_millis").as("registered_at"))
      state(spark).select("model", "version", "stage")
        .join(first, Seq("model", "version"))
        .withColumn("age_days",
          ((lit(nowMillis) - col("registered_at")) / lit(86400000L)).cast("long"))
        .withColumn("expired", col("age_days") > MaxAgeDays)
        .orderBy("model", "version")
    }
  }
}
