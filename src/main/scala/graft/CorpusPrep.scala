package graft

import org.apache.spark.sql.functions.col

import graft.pipeline.CorpusPipeline
import graft.pipeline.CorpusPipeline.Recipe

/** CLI for the end-to-end training-corpus pipeline
  * ([[graft.pipeline.CorpusPipeline]]):
  *
  * {{{
  * runMain graft.CorpusPrep --docs <parquet> --out <dir>
  *   [--bench <parquet>]                benchmark docs to decontaminate against
  *   [--lang en|xx|und|any]             language gate (default en; any = off)
  *   [--min-quality 0.2]
  *   [--max-top-bigram 0.6]
  *   [--near-dup-threshold 0.8]
  *   [--weights src0=2.5,src1=0.4]      fractional epochs per source
  *   [--default-weight 1.0]
  *   [--val-frac 0.1] [--test-frac 0.1]
  *   [--no-pii]                         skip PII redaction
  *   [--no-report]                      skip the per-stage census jobs
  * }}}
  *
  * Output is written partitioned by `split` (train/val/test dirs —
  * the layout a trainer consumes), and the census is printed as one
  * JSON line per stage. With `--versioned` the output commits to a
  * manifest-log versioned table instead: every prep run becomes a
  * version with history / time travel / restore — re-running with a
  * new recipe never loses the previous corpus.
  */
object CorpusPrep {

  private val flagNames = Set("no-pii", "no-report", "versioned")

  private[graft] def parseWeights(s: String): Map[String, Double] =
    s.split(',').filter(_.nonEmpty).map { kv =>
      kv.split('=') match {
        case Array(k, v) => k.trim -> v.trim.toDouble
        case _ => sys.error(s"bad --weights entry '$kv' (want source=w)")
      }
    }.toMap

  private def parseArgs(args: Array[String]): Map[String, String] = {
    @annotation.tailrec
    def loop(rest: List[String], acc: Map[String, String]): Map[String, String] =
      rest match {
        case Nil => acc
        case k :: tail if k.startsWith("--") =>
          val name = k.drop(2)
          if (flagNames(name)) loop(tail, acc + (name -> "true"))
          else tail match {
            case v :: t2 if !v.startsWith("--") => loop(t2, acc + (name -> v))
            case _ => sys.error(s"missing value for --$name")
          }
        case other :: _ => sys.error(s"unexpected argument: $other")
      }
    loop(args.toList, Map.empty)
  }

  def main(args: Array[String]): Unit = {
    val opts = parseArgs(args)
    val docsPath = opts.getOrElse("docs",
      sys.error("--docs <parquet> is required"))
    val outDir = opts.getOrElse("out", sys.error("--out <dir> is required"))

    val recipe = Recipe(
      lang = opts.getOrElse("lang", "en") match {
        case "any" => None
        case l => Some(l)
      },
      minQuality = opts.getOrElse("min-quality", "0.2").toDouble,
      maxTopBigramFrac = opts.getOrElse("max-top-bigram", "0.6").toDouble,
      redactPii = !opts.contains("no-pii"),
      nearDupThreshold = opts.getOrElse("near-dup-threshold", "0.8").toDouble,
      sourceWeights = opts.get("weights").map(parseWeights).getOrElse(Map.empty),
      defaultWeight = opts.getOrElse("default-weight", "1.0").toDouble,
      valFrac = opts.getOrElse("val-frac", "0.1").toDouble,
      testFrac = opts.getOrElse("test-frac", "0.1").toDouble)

    val spark = graft.core.Sessions.local("graft-corpus-prep",
      cores = Runtime.getRuntime.availableProcessors())
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(docsPath)
    val bench = opts.get("bench").map(spark.read.parquet(_))
      // no benchmark: decontaminate against a GUARANTEED-empty frame
      // (a doc_id-is-null filter would promote any null-id rows to
      // benchmark docs and then decontaminate real docs against them)
      .getOrElse(docs.limit(0))

    val (out, censusThunk) = CorpusPipeline.run(docs, bench, recipe,
      report = !opts.contains("no-report"))
    val version = if (opts.contains("versioned")) {
      val vt = new graft.io.VersionedTable(spark, outDir)
      Some(vt.write(out, partitionBy = Some(Seq("split"))))
    } else {
      out.write.mode("overwrite").partitionBy("split").parquet(outDir)
      None
    }
    // census rides the write action above via observe() — no extra
    // jobs, and no re-read of the written output: rows written ==
    // the mix_split survivor count
    val census = censusThunk()
    census.foreach { c =>
      println(s"""{"stage":"${c.stage}","docs":${c.docs}}""")
    }
    version.foreach(v => println(s"""{"stage":"committed","version":$v}"""))
    val writtenDocs = census.collectFirst {
      case c if c.stage == "mix_split" => s""","docs":${c.docs}"""
    }.getOrElse("")
    println(s"""{"stage":"written"$writtenDocs,"out":"$outDir"}""")
  }
}
