package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Pins README.md's query catalog to the actual registries, so the
  * docs can't drift when a query lands (the r8 verdict caught the
  * TrainingData range stale at q85 while q86 was green). No Spark
  * session needed — pure string/registry comparison. */
class ReadmeCatalogSpec extends AnyFunSuite {

  private val readme = Files.readString(Paths.get("README.md"))

  /** Expand every `qNN` / `qNN-qMM` token in `s` to its int set. */
  private def nums(s: String): Set[Int] =
    """q(\d+)(?:-q(\d+))?""".r.findAllMatchIn(s).flatMap { m =>
      val a = m.group(1).toInt
      val b = Option(m.group(2)).map(_.toInt).getOrElse(a)
      a to b
    }.toSet

  private def keyNums(keys: Set[String]): Set[Int] =
    keys.map { k =>
      """^q(\d+)_""".r.findFirstMatchIn(k)
        .getOrElse(fail(s"registry key without qNN_ prefix: $k"))
        .group(1).toInt
    }

  test("README operator-catalog line matches the registries exactly") {
    val line = readme.linesIterator
      .find(_.contains("operator catalog:"))
      .getOrElse(fail("README lost its 'operator catalog:' line"))
    def seg(name: String): String = {
      val i = line.indexOf(name + " (")
      assert(i >= 0, s"catalog line lost its $name segment")
      line.substring(i, line.indexOf(')', i))
    }
    assert(nums(seg("Relational")) ===
      keyNums(graft.queries.Relational.queries.keySet))
    assert(nums(seg("TrainingData")) ===
      keyNums(graft.queries.TrainingData.queries.keySet))
    assert(nums(seg("Analytics")) ===
      keyNums(graft.queries.Analytics.queries.keySet))
  }

  test("every registered query number is mentioned somewhere in README") {
    val missing = keyNums(SparkEntry.queries.keySet) -- nums(readme)
    assert(missing.isEmpty, s"queries undocumented in README: $missing")
  }

  test("README mentions no query number the registry lacks") {
    // prose ranges expand, so compare against the registry's full span;
    // a mention beyond the registered set means stale-ahead docs
    val phantom = nums(readme) -- keyNums(SparkEntry.queries.keySet)
    assert(phantom.isEmpty, s"README mentions unregistered queries: $phantom")
  }

  test("every registered query number has a SCALE.md entry") {
    // the r10 verdict caught q180/q181 landing with no SCALE.md
    // rationale — the repo's own step-4 discipline, now enforced like
    // catalog drift already is. SCALE.md uses en-dash ranges, so
    // expand both dash forms.
    val scale = Files.readString(Paths.get("SCALE.md"))
    val mentioned = """q(\d+)(?:[-–]q(\d+))?""".r
      .findAllMatchIn(scale).flatMap { m =>
        val a = m.group(1).toInt
        val b = Option(m.group(2)).map(_.toInt).getOrElse(a)
        a to b
      }.toSet
    val missing = keyNums(SparkEntry.queries.keySet) -- mentioned
    assert(missing.isEmpty,
      s"queries with no SCALE.md scale rationale: $missing")
  }

  test("quiet-bench ratchet covers every registered query") {
    // the r7 AND r8 verdicts both flagged the same process gap: new
    // queries landing without a recorded best, leaving the regression
    // gate blind to them. Make the gap loud: every registry key must
    // have a ratchet entry (re-record with
    // `python3 tools/bench_gate.py bench.sf0.1.json --update` after
    // adding a query).
    val best = Files.readString(Paths.get("tools/bench_best.sf0.1.json"))
    val recorded = """"(q\d+_[a-z0-9_]+)"""".r
      .findAllMatchIn(best).map(_.group(1)).toSet
    val missing = SparkEntry.queries.keySet -- recorded
    assert(missing.isEmpty,
      s"queries without a recorded quiet-bench best: $missing")
  }
}
