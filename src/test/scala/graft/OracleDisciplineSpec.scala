package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static enforcement of oracle-authoring rule #1 (README "Oracle-authoring
  * rules"): every DuckDB integer aggregate in an oracle SQL string must be
  * wrapped in `CAST(... AS BIGINT)`. DuckDB's `sum(BIGINT)` (plain or
  * windowed) returns HUGEINT, which the driver's pandas bridge widens to
  * float64 and hash-mismatches against Spark's int64 even when every value
  * is identical — the defect class that shipped q28, q46/q47, and q155
  * across three separate rounds while the rule lived only in prose.
  *
  * The check is a conservative lexical scan over [[SparkEntry.oracleSql]]
  * (the static registry; generated ANN/winnowing oracles are produced by
  * audited templates in `queries/AnnOracles.scala` / `DedupOracles.scala`
  * and are not re-scanned here). A `sum(` occurrence is SAFE when:
  *   - it sits inside any `CAST( ... )` span (the fix shape), or
  *   - its argument carries an explicit double marker (decimal literal,
  *     `::DOUBLE`, `AS DOUBLE`) so DuckDB sums doubles, or
  *   - it immediately feeds or is fed by a division (`/` directly before
  *     the `sum` or after its closing paren / OVER clause) — an integer
  *     sum divided by a DOUBLE is already DOUBLE (rule #1's exemption).
  * Anything else is FLAGGED and must appear in the per-query allowlist
  * below with its reviewed reason — adding a new uncast integer sum fails
  * this spec until the author either CASTs it or consciously allowlists it.
  */
class OracleDisciplineSpec extends AnyFunSuite {

  /** query -> number of flagged-but-reviewed `sum(` sites, with why each
    * is safe under the driver's pandas bridge despite the lexical flag. */
  private val allowlist: Map[String, Int] = Map(
    // sum over DOUBLE column l_quantity (testdata lineitem schema) — DuckDB
    // sums doubles, no HUGEINT involved.
    "q02_flag_status_demand" -> 1,
    // CTE sum (qt) feeds the final SELECT's double divisions only.
    "q115_curriculum" -> 1,
    // windowed CDF sums feed the ECDF ratio (division by total) downstream.
    "q120_length_ks" -> 2,
    // rolling count/sum/sumsq feed mean/std double arithmetic downstream.
    "q124_rolling_anomaly" -> 2,
    // scaled-integer sums are CTE intermediates divided by counts (DOUBLE)
    // in the final projection.
    "q125_label_separation" -> 2,
    "q130_zipf_slope" -> 4,
    // ORDER BY sum(freq) — sort key only, never materialized in output.
    "q152_bpe_apply" -> 2,
    // sum(new_sess) OVER builds the session id consumed by a later GROUP BY
    // whose outputs are all CAST/count/double (q46/q47 fix pattern).
    "q47_sessionize" -> 1,
    "q158_streaming_sessionize" -> 1, // same sid-only windowed sum
    "q169_session_window" -> 1, // same sid-only windowed sum
    // len_d CTE feeds TF-IDF / BM25 double scoring only.
    "q59_tfidf_topterms" -> 1,
    "q60_bm25_topterms" -> 1,
    "q88_bm25_index" -> 1,
    "q89_bm25_index_delete" -> 1
  )

  private val SumRe = "(?i)\\bsum\\s*\\(".r
  private val CastRe = "(?i)\\bCAST\\s*\\(".r
  private val OverRe = "(?i)^OVER\\s*\\(".r
  private val DoubleArgRe = "(?i)\\d\\.\\d|::DOUBLE|AS DOUBLE|\\.0\\b".r

  /** index just past the paren that closes the group opened before `from`. */
  private def closeParen(sql: String, from: Int): Int = {
    var depth = 1; var i = from
    while (i < sql.length && depth > 0) {
      sql.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case _   =>
      }
      i += 1
    }
    i
  }

  private def flaggedSums(sql: String): Seq[String] = {
    val castSpans = CastRe.findAllMatchIn(sql).map { m =>
      (m.start, closeParen(sql, m.end))
    }.toList
    SumRe.findAllMatchIn(sql).toList.flatMap { m =>
      val s = m.start
      val end = closeParen(sql, m.end)
      val arg = sql.substring(m.end, end - 1)
      val inCast = castSpans.exists { case (a, b) => a <= s && s < b }
      val doubleArg = DoubleArgRe.findFirstIn(arg).isDefined
      // position after the aggregate, skipping an OVER (...) window clause
      var j = end
      while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
      OverRe.findFirstMatchIn(sql.substring(j)).foreach { mo =>
        j = closeParen(sql, j + mo.end)
        while (j < sql.length && sql.charAt(j).isWhitespace) j += 1
      }
      val feedsDivision = j < sql.length && sql.charAt(j) == '/'
      var k = s - 1
      while (k >= 0 && sql.charAt(k).isWhitespace) k -= 1
      val isDenominator = k >= 0 && sql.charAt(k) == '/'
      if (inCast || doubleArg || feedsDivision || isDenominator) Nil
      else Seq(sql.substring(math.max(0, s - 25), math.min(sql.length, end + 5))
        .replace('\n', ' ').trim)
    }
  }

  test("every uncast integer sum in the oracle registry is allowlisted") {
    val violations = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val flagged = flaggedSums(sql)
        val allowed = allowlist.getOrElse(name, 0)
        if (flagged.size == allowed) Nil
        else Seq(
          s"$name: ${flagged.size} uncast sum(s), allowlist expects $allowed" +
            flagged.map(f => s"\n    $f").mkString)
    }
    assert(violations.isEmpty,
      "\nOracle rule #1 (README): wrap integer aggregates in CAST(... AS " +
        "BIGINT), or review and update the allowlist:\n  " +
        violations.mkString("\n  "))
  }

  test("scanner flags the exact q155 defect shape and accepts its fix") {
    val uncast =
      """SELECT user_id, sum(epoch_us(least(a_end, b_end))
         - epoch_us(greatest(a_start, b_start))) AS total_overlap_us
         FROM t GROUP BY 1"""
    assert(flaggedSums(uncast).nonEmpty,
      "the r9-shipped q155 oracle shape must be flagged")
    val fixed =
      """SELECT user_id, CAST(sum(epoch_us(least(a_end, b_end))
         - epoch_us(greatest(a_start, b_start))) AS BIGINT) AS total_overlap_us
         FROM t GROUP BY 1"""
    assert(flaggedSums(fixed).isEmpty, "the CAST fix shape must pass")
  }

  test("allowlist carries no stale entries") {
    val stale = allowlist.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"allowlisted queries no longer registered: $stale")
  }
}
