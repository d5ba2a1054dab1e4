package graft.util

import java.io.{FileWriter, PrintWriter, StringWriter}
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

/** Structured logging for the pipeline — the Scala port of reference
  * `utils/logging_utils.py:10-113` (JSONFormatter + setup_logging +
  * log_with_metrics).
  *
  * One JSON object per event: timestamp, level, logger, message, plus
  * caller-supplied metric fields and an exception stack when present —
  * the shape log aggregators ingest without a parse config. A plain
  * `ts - name - LEVEL - message` format is available for consoles
  * (`useJson = false`), mirroring the reference's non-JSON formatter.
  */
object JsonLog {

  sealed abstract class Level(val rank: Int, val name: String)
  case object Debug extends Level(0, "DEBUG")
  case object Info extends Level(1, "INFO")
  case object Warn extends Level(2, "WARNING")
  case object Error extends Level(3, "ERROR")

  def levelOf(s: String): Level = s.toUpperCase match {
    case "DEBUG" => Debug
    case "INFO" => Info
    case "WARN" | "WARNING" => Warn
    case "ERROR" | "CRITICAL" => Error
    case other => sys.error(s"unknown log level: $other")
  }

  /** Configure a logger (reference `setup_logging`): console always,
    * plus an optional append-mode log file. */
  def setup(name: String = "graft_etl", logLevel: String = "INFO",
      logFile: Option[String] = None,
      useJson: Boolean = true): JsonLogger = {
    val sinks = Seq[String => Unit](line => Console.out.println(line)) ++
      logFile.map { f => (line: String) =>
        val w = new FileWriter(f, true)
        try w.write(line + "\n") finally w.close()
      }
    new JsonLogger(name, levelOf(logLevel), sinks, useJson)
  }

  private[util] def escape(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.toString
  }

  private[util] def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    // NaN/Infinity are not valid JSON tokens — emit null so one
    // non-finite metric (e.g. a rate over zero rows) can't make the
    // whole line unparseable to a log aggregator.
    case n: Float => if (n.isNaN || n.isInfinite) "null" else n.toString
    case n: Double => if (n.isNaN || n.isInfinite) "null" else n.toString
    case other => "\"" + escape(other.toString) + "\""
  }
}

/** Leveled logger writing one line per event to each sink. Sinks are
  * injectable (`String => Unit`) so tests capture output directly. */
final class JsonLogger(val name: String, val level: JsonLog.Level,
    sinks: Seq[String => Unit], useJson: Boolean) {
  import JsonLog._

  private val tsFmt = DateTimeFormatter.ISO_LOCAL_DATE_TIME

  def withSink(sink: String => Unit): JsonLogger =
    new JsonLogger(name, level, Seq(sink), useJson)

  private def emit(lvl: Level, message: String,
      fields: Seq[(String, Any)], t: Option[Throwable]): Unit = {
    if (lvl.rank < level.rank) return
    val ts = LocalDateTime.now().format(tsFmt)
    val line = if (useJson) {
      val base = Seq(
        "timestamp" -> ts, "level" -> lvl.name,
        "logger" -> name, "message" -> message)
      val exc = t.map { e =>
        val sw = new StringWriter()
        e.printStackTrace(new PrintWriter(sw))
        "exception" -> (sw.toString: Any)
      }
      (base ++ fields ++ exc)
        .map { case (k, v) => "\"" + escape(k) + "\": " + jsonValue(v) }
        .mkString("{", ", ", "}")
    } else {
      val extra =
        if (fields.isEmpty) ""
        else fields.map { case (k, v) => s"$k=$v" }.mkString(" [", " ", "]")
      val excStr = t.map(e => s" ! ${e.getClass.getName}: ${e.getMessage}")
        .getOrElse("")
      s"$ts - $name - ${lvl.name} - $message$extra$excStr"
    }
    sinks.foreach(_(line))
  }

  def debug(message: String, fields: (String, Any)*): Unit =
    emit(Debug, message, fields, None)
  def info(message: String, fields: (String, Any)*): Unit =
    emit(Info, message, fields, None)
  def warn(message: String, fields: (String, Any)*): Unit =
    emit(Warn, message, fields, None)
  def error(message: String, fields: (String, Any)*): Unit =
    emit(Error, message, fields, None)
  def error(message: String, t: Throwable, fields: (String, Any)*): Unit =
    emit(Error, message, fields, Some(t))

  /** reference `log_with_metrics`: level by name + metric fields. */
  def logWithMetrics(levelName: String, message: String,
      metrics: Map[String, Any]): Unit =
    emit(levelOf(levelName), message, metrics.toSeq, None)
}
