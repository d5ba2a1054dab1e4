package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.{JsonLog, JsonLogger}

/** Port of reference `utils/logging_utils.py` behaviors: JSON event
  * shape, level filtering, metric fields, exception capture, file sink,
  * plain-format fallback. */
class JsonLogSpec extends AnyFunSuite {

  private def capture(level: String = "INFO", useJson: Boolean = true)
      : (JsonLogger, collection.mutable.Buffer[String]) = {
    val buf = collection.mutable.Buffer.empty[String]
    val lg = new JsonLogger("t", JsonLog.levelOf(level),
      Seq(line => buf += line), useJson)
    (lg, buf)
  }

  test("json events carry timestamp/level/logger/message + metric fields") {
    val (lg, buf) = capture()
    lg.info("rows written", "rows" -> 42L, "table" -> "bronze")
    assert(buf.size === 1)
    val line = buf.head
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(line.contains("\"level\": \"INFO\""))
    assert(line.contains("\"logger\": \"t\""))
    assert(line.contains("\"message\": \"rows written\""))
    assert(line.contains("\"rows\": 42"))          // numeric, unquoted
    assert(line.contains("\"table\": \"bronze\"")) // string, quoted
    assert(line.contains("\"timestamp\": \""))
  }

  test("level filtering: below-threshold events are dropped") {
    val (lg, buf) = capture(level = "WARNING")
    lg.debug("nope"); lg.info("nope")
    lg.warn("kept"); lg.error("kept too")
    assert(buf.size === 2)
    assert(buf.forall(_.contains("kept")))
  }

  test("strings are JSON-escaped; exceptions carry the stack") {
    val (lg, buf) = capture()
    lg.info("quote \" backslash \\ newline \n done")
    assert(buf.head.contains("""quote \" backslash \\ newline \n done"""))
    lg.error("boom", new IllegalStateException("bad state"))
    assert(buf(1).contains("\"exception\": \""))
    assert(buf(1).contains("IllegalStateException"))
  }

  test("logWithMetrics mirrors the reference helper") {
    val (lg, buf) = capture()
    lg.logWithMetrics("warning", "dq failed", Map("nulls" -> 3))
    assert(buf.head.contains("\"level\": \"WARNING\""))
    assert(buf.head.contains("\"nulls\": 3"))
  }

  test("plain (non-json) format: ts - name - LEVEL - message") {
    val (lg, buf) = capture(useJson = false)
    lg.info("hello", "k" -> 1)
    assert(buf.head.matches(""".+ - t - INFO - hello \[k=1\]"""), buf.head)
  }

  test("setup writes to an append-mode log file") {
    val f = java.nio.file.Files.createTempFile("graft-log", ".jsonl")
    val lg = JsonLog.setup("filelog", logFile = Some(f.toString))
    lg.info("first"); lg.info("second")
    val lines = java.nio.file.Files.readAllLines(f)
    assert(lines.size === 2)
    assert(lines.get(0).contains("\"message\": \"first\""))
  }
}
