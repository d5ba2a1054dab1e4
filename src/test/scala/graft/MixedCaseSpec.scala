package graft

import org.scalatest.funsuite.AnyFunSuite

/** The query catalogs reference lowercase column names throughout;
  * `Tables.load` normalizes the source schema case-insensitively at
  * the load boundary (the reference's pervasive lowercase-match
  * semantic, etl/silver_job.py:56-57). This spec points the catalogs
  * at a MIXED-CASE copy of the tables and requires identical results
  * to the lowercase originals. */
class MixedCaseSpec extends AnyFunSuite {
  import graft.queries.{Tables, TrainingData, Analytics}

  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private def mixedCase(name: String): String =
    name.split('_').map(_.capitalize).mkString("_") match {
      case s if s == name => name.toUpperCase(java.util.Locale.ROOT)
      case s => s
    }

  test("catalogs produce identical results over a mixed-case schema copy") {
    val dir = Fixtures.tempDir("graft-mixedcase")
    Seq("documents", "embeddings").foreach { t =>
      val df = Tables.load(spark, sf, t)
      val renamed = df.columns.foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, mixedCase(c)))
      assert(renamed.columns.exists(c => c != c.toLowerCase),
        s"fixture for $t must actually be mixed-case")
      renamed.coalesce(1).write.parquet(s"$dir/$t.parquet")
    }
    def rows(q: (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame, d: String) =
      q(spark, d).collect().map(_.toSeq).toSeq
    for (q <- Seq(
        TrainingData.queries("q18_token_stats"),
        TrainingData.queries("q26_knn_cosine_brute"),
        Analytics.queries("q53_repetition"))) {
      assert(rows(q, dir) === rows(q, sf),
        "mixed-case source must match the lowercase original")
    }
  }
}
