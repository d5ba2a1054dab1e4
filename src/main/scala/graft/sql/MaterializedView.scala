package graft.sql

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.VersionedTable
import graft.plans.{MvDef, MvHandle, MvRewrite}

/** The SQL surface of the materialized-view tier (Databricks
  * `CREATE MATERIALIZED VIEW` semantics, reduced to the incrementally
  * maintainable aggregate shape):
  *
  *   - `CREATE MATERIALIZED VIEW mv AS
  *        SELECT dims…, sum(m) AS s, count(*) AS n [, count(m) AS c]
  *        FROM base GROUP BY dims…`
  *     runs the aggregate once (CTAS of the summary as `mv`'s v0,
  *     stamped with the base version it reflects), persists the
  *     definition next to the table, and registers the
  *     [[graft.plans.MvRewrite]] rewrite so any `GROUP BY` over the
  *     base re-plans onto the summary while it is fresh.
  *   - `REFRESH MATERIALIZED VIEW mv` folds the base's CHANGE FEED
  *     since the recorded basis into the summary — the signed IVM
  *     fold (inserts +, deletes −; q73/q254 machinery), never a
  *     re-aggregation of the base — and advances the basis in the
  *     same commit.
  *   - `DROP MATERIALIZED VIEW mv` deregisters the rewrite and drops
  *     the backing table.
  *
  * Allowed aggregates are the ADDITIVE ones — `sum(m)`, `count(*)`
  * (required: it detects emptied groups), `count(m)` (what `avg(m)`
  * rewrites divide by) — the classic IVM boundary; `min`/`max` are
  * not decrementable and are refused at CREATE with the alternative
  * spelled out. Measures must be integral (long sums are exact under
  * any delta order; double sums are not, so an IVM-maintained double
  * sum would drift from a recompute).
  *
  * Durability: the definition is a sidecar (`_mv_def.txt`) written
  * once at CREATE; the BASIS VERSION rides in the backing table's own
  * commit history (`basis=<v>` in the operation string), so it
  * advances atomically with the data — a crash between fold and
  * metadata cannot double-apply a delta, and a reader of a
  * half-refreshed MV sees the OLD basis, which makes the rewrite
  * decline (stale → base plan, never wrong totals). Registration is
  * per-JVM: [[registerAll]] re-arms every persisted definition in a
  * fresh session.
  *
  * Scale: CREATE costs one aggregation of the base; each REFRESH
  * shuffles O(changed rows) + a join against the KB-scale summary;
  * the served dashboard query reads the summary. The parse is
  * O(|SQL|) driver-side. */
object MaterializedView {

  private val ident = "[A-Za-z_][A-Za-z0-9_]*"
  private val selectRe = (s"(?is)^SELECT\\s+(.*?)\\s+FROM\\s+($ident)" +
    "\\s+GROUP\\s+BY\\s+(.*)$").r
  private val sumRe = s"(?is)^SUM\\s*\\(\\s*($ident)\\s*\\)\\s+AS\\s+($ident)$$".r
  private val cntStarRe =
    s"(?is)^COUNT\\s*\\(\\s*(?:\\*|1)\\s*\\)\\s+AS\\s+($ident)$$".r
  private val cntColRe =
    s"(?is)^COUNT\\s*\\(\\s*($ident)\\s*\\)\\s+AS\\s+($ident)$$".r
  private val minMaxRe = "(?is)^(MIN|MAX)\\s*\\(.*".r
  private val avgRe = s"(?is)^AVG\\s*\\(\\s*($ident)\\s*\\).*".r

  /** One parsed, persisted definition. `sums`/`counts` map base
    * measure → MV column; `countStar` is the MV's `count(*)` column
    * (mandatory). */
  final case class Def(baseName: String, dims: Seq[String],
      sums: Map[String, String], counts: Map[String, String],
      countStar: String) {
    private[sql] def encode: String =
      Seq(s"base=$baseName",
        s"dims=${dims.mkString(",")}",
        s"sums=${sums.toSeq.sorted.map { case (m, c) => s"$m>$c" }
          .mkString(",")}",
        s"counts=${counts.toSeq.sorted.map { case (m, c) => s"$m>$c" }
          .mkString(",")}",
        s"countStar=$countStar").mkString("\n")
  }

  private def decodeDef(text: String): Def = {
    val kv = text.linesIterator.filter(_.contains('='))
      .map { l => val i = l.indexOf('='); l.take(i) -> l.drop(i + 1) }
      .toMap
    def pairs(s: String): Map[String, String] =
      s.split(',').filter(_.nonEmpty).map { p =>
        val Array(m, c) = p.split('>'); m -> c
      }.toMap
    Def(kv("base"), kv("dims").split(',').filter(_.nonEmpty).toSeq,
      pairs(kv.getOrElse("sums", "")), pairs(kv.getOrElse("counts", "")),
      kv("countStar"))
  }

  private def defPath(catalog: GraftCatalog, name: String): Path =
    new Path(catalog.rootOf(name), "_mv_def.txt")

  private def fsOf(catalog: GraftCatalog, name: String) =
    defPath(catalog, name)
      .getFileSystem(catalog.spark.sparkContext.hadoopConfiguration)

  /** Is `name` a materialized view of this warehouse (has a persisted
    * definition sidecar)? */
  def isMaterializedView(catalog: GraftCatalog, name: String): Boolean =
    fsOf(catalog, name).exists(defPath(catalog, name))

  private def readDef(catalog: GraftCatalog, name: String): Def = {
    val p = defPath(catalog, name)
    val fs = fsOf(catalog, name)
    require(fs.exists(p),
      s"$name is not a materialized view (no definition at $p)")
    val in = fs.open(p)
    try decodeDef(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
    finally in.close()
  }

  private val basisRe = """basis=(\d+)""".r.unanchored

  /** The base version the MV currently reflects — recorded in the
    * backing table's commit history, so it advances atomically with
    * the fold itself. */
  def currentBasis(spark: SparkSession, mvRoot: String): Long = {
    val vt = new VersionedTable(spark, mvRoot)
    vt.history(limit = Int.MaxValue)
      .collectFirst { case h if basisRe.findFirstMatchIn(h.operation)
        .isDefined =>
        basisRe.findFirstMatchIn(h.operation).get.group(1).toLong }
      .getOrElse(sys.error(s"no basis recorded in the history of " +
        s"$mvRoot — not a materialized view's backing table"))
  }

  // one rewrite registration per MV root per JVM: re-running
  // registerAll (or CREATE after DROP) must not stack duplicate defs
  private val registrations =
    scala.collection.concurrent.TrieMap.empty[String, MvHandle]

  private def register(catalog: GraftCatalog, name: String,
      d: Def): Unit = {
    val spark = catalog.spark
    val mvRoot = catalog.rootOf(name)
    val baseRoot = catalog.rootOf(d.baseName)
    registrations.remove(mvRoot).foreach(_.deregister())
    val handle = MvRewrite.register(MvDef(
      baseRoot = baseRoot,
      mv = () => new VersionedTable(spark, mvRoot).read(),
      dims = d.dims,
      sums = d.sums,
      count = Some(d.countStar),
      counts = d.counts,
      // re-read per rewrite: a REFRESH in between is picked up, a
      // base commit after the basis makes the rule decline (stale →
      // base plan)
      basisVersion = () => Some(currentBasis(spark, mvRoot))))
    registrations.put(mvRoot, handle)
  }

  /** Re-arm the rewrite for every persisted MV of the warehouse — a
    * fresh JVM's session bootstrap. Idempotent per root. */
  def registerAll(catalog: GraftCatalog): Unit =
    catalog.tables.keys.filter(isMaterializedView(catalog, _))
      .foreach(n => register(catalog, n, readDef(catalog, n)))

  /** CREATE MATERIALIZED VIEW: parse the SELECT, aggregate the base
    * ONCE at its current version, commit as the MV's v0 (basis
    * stamped), persist the definition, register the rewrite. Returns
    * the committed version. */
  def create(catalog: GraftCatalog, name: String,
      selectSql: String): Long = {
    val spark = catalog.spark
    require(!catalog.exists(name),
      s"table $name already exists in ${catalog.warehouse}")
    val d = parseSelect(catalog, selectSql)
    val baseVt = new VersionedTable(spark, catalog.rootOf(d.baseName))
    val basis = baseVt.currentVersion.getOrElse(
      sys.error(s"base table ${d.baseName} does not exist"))
    // plan the aggregate against the PINNED basis version: a commit
    // racing between the aggregate and the basis stamp would otherwise
    // leave the MV claiming a version it does not reflect
    val agg = aggregate(baseVt.readVersion(basis), d)
    val mvVt = new VersionedTable(spark, catalog.rootOf(name))
    val v = mvVt.write(agg,
      operation = s"CREATE MATERIALIZED VIEW basis=$basis")
    val p = defPath(catalog, name)
    val fs = fsOf(catalog, name)
    val out = fs.create(p, true)
    try out.write(d.encode.getBytes("UTF-8")) finally out.close()
    register(catalog, name, d)
    v
  }

  /** REFRESH: fold `base.changes(basis, current)` into the summary —
    * the signed IVM delta (inserts +1/+x, deletes −1/−x, CDF update
    * images as signed pairs), one full-outer merge against the
    * KB-scale MV, the base never re-aggregated — and advance the
    * basis in the same commit. No-op (returns the current MV version)
    * when already fresh. */
  def refresh(catalog: GraftCatalog, name: String): Long = {
    val spark = catalog.spark
    val d = readDef(catalog, name)
    val mvRoot = catalog.rootOf(name)
    val mvVt = new VersionedTable(spark, mvRoot)
    val baseVt = new VersionedTable(spark, catalog.rootOf(d.baseName))
    val basis = currentBasis(spark, mvRoot)
    val cur = baseVt.currentVersion.getOrElse(
      sys.error(s"base table ${d.baseName} does not exist"))
    require(cur >= basis, s"base ${d.baseName} is at v$cur but the MV " +
      s"basis is v$basis — the base was RESTOREd behind the MV; drop " +
      "and re-create the view")
    if (cur == basis) return mvVt.currentVersion.get
    val changes = baseVt.changes(basis, cur)
    val sign =
      when(col("_change_type").isin("insert", "update_postimage"), lit(1L))
        .when(col("_change_type").isin("delete", "update_preimage"),
          lit(-1L))
        .otherwise(raise_error(concat(
          lit("MV refresh: unsupported _change_type '"),
          col("_change_type"), lit("'"))))
    def dcol(c: String) = s"_delta_$c"
    def dkey(k: String) = s"_delta_key_$k"
    val deltaAggs: Seq[org.apache.spark.sql.Column] =
      Seq(sum(sign).as(dcol(d.countStar))) ++
        d.sums.toSeq.map { case (m, c) =>
          sum(col(m) * sign).as(dcol(c)) } ++
        d.counts.toSeq.map { case (m, c) =>
          sum(when(col(m).isNotNull, sign).otherwise(0L)).as(dcol(c)) }
    val delta = changes.groupBy(d.dims.map(col): _*).agg(
        deltaAggs.head, deltaAggs.tail: _*)
      .select(d.dims.map(k => col(k).as(dkey(k))) ++
        (d.countStar +: (d.sums.values.toSeq ++ d.counts.values.toSeq))
          .map(c => col(dcol(c))): _*)
    val prior = mvVt.read()
    // null-safe merge: NULL is a real group to groupBy, so it must be
    // to the join too (IncrementalAgg's contract)
    val cond = d.dims.map(k => prior(k) <=> col(dkey(k))).reduce(_ && _)
    val merged = prior.join(delta, cond, "full_outer")
    val newN = (coalesce(col(d.countStar), lit(0L)) +
      coalesce(col(dcol(d.countStar)), lit(0L)))
    // measure → its count(m) MV column, when materialized: folds the
    // sum back to NULL when the group's last non-null value left
    // (coalesce-zero alone would freeze an all-NULL group's sum at 0)
    val cntOf: Map[String, String] = d.counts
    def foldedSum(m: String, c: String): org.apache.spark.sql.Column = {
      val zero = lit(0L).cast(prior.schema(c).dataType)
      val s = coalesce(col(c), zero) + coalesce(col(dcol(c)), zero)
      cntOf.get(m) match {
        case Some(cc) =>
          val n = coalesce(col(cc), lit(0L)) +
            coalesce(col(dcol(cc)), lit(0L))
          when(n === 0L, lit(null).cast(prior.schema(c).dataType))
            .otherwise(s)
        case None => s
      }
    }
    val outCols: Seq[org.apache.spark.sql.Column] =
      d.dims.map(k => coalesce(prior(k), col(dkey(k))).as(k)) ++
        prior.columns.toSeq.filterNot(d.dims.contains).map { c =>
          if (c == d.countStar) newN.as(c)
          else d.sums.find(_._2 == c) match {
            case Some((m, _)) => foldedSum(m, c).as(c)
            case None =>
              val zero = lit(0L).cast(prior.schema(c).dataType)
              (coalesce(col(c), zero) + coalesce(col(dcol(c)), zero)).as(c)
          }
        }
    val folded = merged.select(outCols: _*)
      .filter(col(d.countStar) > 0) // a group only ever reaches EXACTLY 0
    mvVt.write(folded, operation = s"REFRESH MATERIALIZED VIEW basis=$cur")
  }

  /** The warehouse's MV listing with FRESHNESS — the ops question "is
    * my dashboard stale, and by how many base commits?": one row per
    * persisted MV — (name, base, basis version, base's current
    * version, fresh flag). Driver-side metadata only (a definition
    * read + two manifest-HEAD probes per MV); a row is exactly as
    * fresh as the rewrite's own decision, since both read the same
    * recorded basis. */
  def list(catalog: GraftCatalog): Seq[(String, String, Long, Long,
      Boolean)] =
    catalog.tables.keys.toSeq.sorted
      .filter(isMaterializedView(catalog, _))
      .map { n =>
        val d = readDef(catalog, n)
        val basis = currentBasis(catalog.spark, catalog.rootOf(n))
        val cur = new VersionedTable(catalog.spark,
          catalog.rootOf(d.baseName)).currentVersion.getOrElse(-1L)
        (n, d.baseName, basis, cur, basis == cur)
      }

  /** DROP: deregister the rewrite, drop the backing table (definition
    * sidecar goes with the directory). */
  def drop(catalog: GraftCatalog, name: String): Unit = {
    require(isMaterializedView(catalog, name),
      s"$name is not a materialized view in ${catalog.warehouse}")
    registrations.remove(catalog.rootOf(name)).foreach(_.deregister())
    catalog.dropTable(name)
  }

  /** The CREATE's initial aggregation, exactly the shape REFRESH
    * maintains. */
  private def aggregate(base: DataFrame, d: Def): DataFrame = {
    val aggs: Seq[org.apache.spark.sql.Column] =
      Seq(count(lit(1)).as(d.countStar)) ++
        d.sums.toSeq.map { case (m, c) => sum(col(m)).as(c) } ++
        d.counts.toSeq.map { case (m, c) => count(col(m)).as(c) }
    base.groupBy(d.dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Parse `SELECT dims…, aggs… FROM base GROUP BY dims…` into a
    * [[Def]]. Loud on everything outside the maintainable shape. */
  private[sql] def parseSelect(catalog: GraftCatalog,
      selectSql: String): Def = {
    val (items, baseName, groupBy) = selectSql.trim match {
      case selectRe(itemsTxt, base, gb) =>
        (GraftSql.splitTopList(itemsTxt), base, GraftSql.splitTopList(gb))
      case other => sys.error("CREATE MATERIALIZED VIEW expects " +
        "`SELECT dims…, aggs… FROM <table> GROUP BY dims…`, got: " + other)
    }
    groupBy.foreach(g => require(g.matches(ident),
      s"GROUP BY must list bare dimension columns, got: $g"))
    val dims = groupBy
    var sums = Map.empty[String, String]
    var counts = Map.empty[String, String]
    var countStar = Option.empty[String]
    items.map(_.trim).foreach {
      case d if d.matches(ident) && dims.contains(d) => () // a dim
      case cntStarRe(as) =>
        require(countStar.isEmpty, "duplicate count(*) in the SELECT")
        countStar = Some(as)
      case sumRe(m, as) =>
        require(!sums.contains(m), s"duplicate sum($m) in the SELECT")
        sums += m -> as
      case cntColRe(m, as) =>
        require(!counts.contains(m), s"duplicate count($m) in the SELECT")
        counts += m -> as
      case avgRe(m) => sys.error(
        s"avg($m) is DERIVED, not materialized: declare `sum($m) AS " +
          s"sum_$m, count($m) AS cnt_$m` instead — avg() queries over " +
          "the base then rewrite onto those partials automatically " +
          "(exact under NULLs; a materialized avg column could not be " +
          "incrementally maintained or re-rolled-up)")
      case mm if minMaxRe.findFirstIn(mm).isDefined => sys.error(
        "min/max are not incrementally maintainable (deleting the " +
          "current extremum needs the group's other rows) — " +
          "materialize them as a plain CTAS table instead: " + mm)
      case other => sys.error("CREATE MATERIALIZED VIEW supports dims, " +
        "sum(col) AS name, count(*) AS name, count(col) AS name — " +
        s"got: $other")
    }
    require(countStar.isDefined, "CREATE MATERIALIZED VIEW requires a " +
      "count(*) column — it is how REFRESH detects emptied groups " +
      "(and what count(*) rollups serve from)")
    val outNames = dims ++ (sums.values.toSeq ++ counts.values.toSeq) ++
      countStar.toSeq
    val dupNames = outNames.diff(outNames.distinct).distinct
    require(dupNames.isEmpty, "duplicate output column(s) in the MV " +
      s"SELECT: ${dupNames.mkString(", ")}")
    val baseRoot = catalog.rootOf(baseName)
    val base = new VersionedTable(catalog.spark, baseRoot)
    require(base.currentVersion.isDefined,
      s"base table $baseName does not exist in ${catalog.warehouse}")
    val schema = base.read().schema
    dims.foreach(dd => require(schema.fieldNames.contains(dd),
      s"dimension $dd is not a column of $baseName"))
    val measures = sums.keySet ++ counts.keySet
    measures.foreach { m =>
      require(schema.fieldNames.contains(m),
        s"measure $m is not a column of $baseName")
      require(!dims.contains(m), s"$m cannot be both a dim and a measure")
    }
    sums.keys.foreach { m =>
      val t = schema(m).dataType
      require(Seq("byte", "short", "integer", "long")
        .contains(t.typeName), s"sum($m) must be integral for exact " +
        s"IVM maintenance (got ${t.typeName}) — double sums drift " +
        "under delta reordering; cast to cents/long first")
    }
    Def(baseName, dims, sums, counts, countStar.get)
  }
}
