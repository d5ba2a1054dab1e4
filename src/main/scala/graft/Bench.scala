package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // local-FS commit hygiene: java.nio chmod instead of a /bin/chmod
      // fork per permissioned mkdir/create (libhadoop is absent here);
      // inert on cluster filesystems — see graft.io.FastLocalFileSystem
      .config("spark.hadoop.fs.file.impl", "graft.io.FastLocalFileSystem")
      // same fix for the FileContext API (streaming checkpoint
      // renames fork readlink/stat per file otherwise)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "graft.io.FastLocalFs")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/scheduler so the first measured query
    // isn't charged for session initialization.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "events", "documents", "embeddings",
      "customer", "nation").foreach { t =>
      try {
        graft.queries.Tables.load(spark, sfDir, t).limit(100).count()
      } catch { case _: Throwable => () }
    }
    // Stable order (sorted by name), and each query measured from a
    // clean cache: several operators persist reused intermediates
    // (signature/bucket tables), and letting 30+ queries' caches pile
    // up makes later measurements pay the earlier queries' memory
    // pressure instead of their own cost.
    //
    // Each query runs `reps` times and reports the MIN: a single-shot
    // sample is one machine-co-tenancy blip away from reading 2x slow
    // (round 3 recorded 66.5 s for a commit that measures 27 s quiet),
    // and the downstream 2x-of-baseline gate consumes this number. The
    // min across reps is the steady-state cost — noise only ever adds.
    val reps = math.max(1,
      sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt)
    // a crashing query must be VISIBLE, not recorded as a fast timing:
    // the downstream gate reads these numbers, and a query that dies in
    // 0.2s would otherwise look like a speedup and ratchet the baseline
    var failures = List.empty[String]
    // optional arg: regex over query names — local focused re-measure
    // only (the driver always runs the full registry)
    val nameFilter = args.headOption.getOrElse(".*")
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.matches(nameFilter)).map { case (name, fn) =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() } catch {
          case _: Throwable => if (!failures.contains(name)) failures ::= name
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // same isolation rationale for STREAMING state: unload
        // accumulated state-store providers so late stateful queries
        // aren't charged for earlier queries' residue (q172/q202 read
        // 2x slow late in a 200-query session, fast in a fresh JVM)
        org.apache.spark.sql.graftbridge.StateStoreHygiene.unloadAll()
        dt
      }
      name -> times.min
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fq = failures.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // "registry" = the TOTAL registered-query count, independent of any
    // name filter: the downstream gate classifies the run's measurement
    // context (full vs focused) against it, instead of against baseline
    // names that can go stale
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"registry":${SparkEntry.queries.size},"failures":$fq}"""
    println(line)
    // Also write the JSON to a file: sbt decorates the forwarded stdout
    // with "[info] " prefixes, which breaks machine parsing of the
    // printed line (BENCH_r01 recorded parsed:null for that reason).
    // Default filename carries the scale factor: bench totals are only
    // comparable within one sf (a bench.json silently re-recorded at a
    // different sf reads as a bogus 100x speedup/regression).
    val sfName = new java.io.File(sfDir).getName
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", s"bench.$sfName.json")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(outPath), (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
