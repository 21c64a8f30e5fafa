package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

import graft.functions.TimeBucket

/** Materialized-rollup routing — the engine-owned analog of ClickHouse
  * materialized-view reads (SURVEY.md §4.3): an optimizer rule that
  * rewrites an OHLCV aggregate over the BASE candle table into the same
  * aggregate over the coarsest sufficient materialized rollup, merging
  * carrier columns instead of raw rows. The reference does this
  * routing *manually* by table choice (notebooks/ohlcv_views.ipynb
  * `TABLES` dict); here Catalyst does it transparently.
  *
  * Lives under `org.apache.spark.sql` (like most Spark extensions'
  * internals) for access to `LogicalRelation`.
  *
  * Scope (fail-safe: when in doubt, don't rewrite):
  *   - plan shape `Aggregate [keys..., TimeBucket(ts, G)] over
  *     (key-only Filter)? (trivial Project)? base relation`;
  *   - every aggregate is one of argMin/argMax/min/max over the value
  *     column, an exact decimal sum of it, or count(1)/count(*);
  *   - G is a multiple of a registered rollup grain (the coarsest such
  *     grain wins).
  *
  * Rewrites: min_by(v,ts)→min_by(open,open_ts), max_by(v,ts)→
  * max_by(close,close_ts), min(v)→min(low), max(v)→max(high),
  * sum(floor(v*100+0.5)) (the [[graft.functions.Cents]] cent sum)→
  * sum(vol_cents), count(1)→sum(trades) (KnownNotNull keeps the
  * output schema's nullability). Output aliases keep their exprIds, so
  * downstream operators are untouched.
  */
object RollupRouter {

  /** A registered route: base parquet path suffix → rollup tables
    * (grain seconds → carrier-rollup path written by
    * `RollupStore.buildWithCarriers`).
    */
  final case class Route(
      basePath: String,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      grains: Map[Long, String])

  private val routes = TrieMap.empty[String, Route]
  private val warnedLegacyVolume = TrieMap.empty[String, Unit]

  def register(route: Route): Unit = routes.put(route.basePath, route)
  def clear(): Unit = routes.clear()

  /** Manifest filename `RollupStore.buildWithCarriers` drops inside
    * each rollup directory. Underscore prefix: Spark's parquet file
    * listing treats it as metadata and never reads it as data, so the
    * rollup stays a clean parquet dir.
    */
  val ManifestFile = "_graft_route.properties"

  /** Source parquet path of a frame, ONLY when the frame IS a bare
    * single-path file scan (modulo aliasing) — how the store build
    * learns which base table a rollup derives from without being
    * told. None for anything filtered, joined, projected, or
    * multi-path: a manifest recorded from a derived frame would claim
    * the rollup covers the whole base table, and after a restart the
    * route rule would silently rewrite full-table aggregates to a
    * partial store. collectFirst on the plan is NOT enough — the
    * relation must be the entire plan.
    */
  def sourcePath(df: org.apache.spark.sql.DataFrame): Option[String] = {
    @scala.annotation.tailrec
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case a: SubqueryAlias => unwrap(a.child)
      case other => other
    }
    unwrap(df.queryExecution.analyzed) match {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.length == 1 =>
          Some(fs.location.rootPaths.head.toString)
        case _ => None
      }
      case _ => None
    }
  }

  /** Write a route manifest into `rollupPath` via the path's own
    * Hadoop FileSystem (works on HDFS/S3, not just local disk).
    */
  def writeManifest(
      spark: SparkSession,
      basePath: String,
      keyCols: Seq[String],
      tsCol: String,
      valueCol: String,
      grainSeconds: Long,
      rollupPath: String
  ): Unit = {
    val props = new java.util.Properties()
    props.setProperty("version", "1")
    props.setProperty("base_path", basePath)
    props.setProperty("key_cols", keyCols.mkString(","))
    props.setProperty("ts_col", tsCol)
    props.setProperty("value_col", valueCol)
    props.setProperty("grain_seconds", grainSeconds.toString)
    val p = new org.apache.hadoop.fs.Path(rollupPath, ManifestFile)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try props.store(out, "graft rollup route manifest")
    finally out.close()
  }

  /** Rebuild the routing table from the store: register every route
    * manifest found under `root` (recursively). This is the
    * process-restart path — a fresh session recovers exactly the
    * routes its store's `buildWithCarriers` runs recorded, instead of
    * depending on in-process `register()` calls that die with the JVM.
    * Manifests sharing (base, keys, ts, value) merge into one Route
    * carrying every discovered grain. Returns the number of routes
    * registered.
    */
  def registerFromStore(spark: SparkSession, root: String): Int = {
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(rootPath)) return 0
    val found = scala.collection.mutable.ArrayBuffer.empty[(Route, Long, String)]
    val it = fs.listFiles(rootPath, true)
    while (it.hasNext) {
      val st = it.next()
      if (st.getPath.getName == ManifestFile) {
        val props = new java.util.Properties()
        val in = fs.open(st.getPath)
        try props.load(in) finally in.close()
        found += ((
          Route(
            props.getProperty("base_path"),
            props.getProperty("key_cols").split(",").toSeq,
            props.getProperty("ts_col"),
            props.getProperty("value_col"),
            Map.empty),
          props.getProperty("grain_seconds").toLong,
          st.getPath.getParent.toString))
      }
    }
    val merged = found
      .groupBy { case (r, _, _) => (r.basePath, r.keyCols, r.tsCol, r.valueCol) }
      .values
      .map { rows =>
        rows.head._1.copy(grains = rows.map { case (_, g, p) => g -> p }.toMap)
      }
    merged.foreach(register)
    merged.size
  }

  private def routeFor(rel: LogicalRelation): Option[Route] =
    rel.relation match {
      case fs: HadoopFsRelation =>
        val paths = fs.location.rootPaths.map(_.toString)
        routes.values.find(r => paths.exists(p => p == r.basePath || p.endsWith(r.basePath)))
      case _ => None
    }

  /** A pulled-out grouping bucket: PullOutGroupingExpressions hoists
    * complex grouping expressions into `Alias(TimeBucket(ts, us),
    * "_groupingexpression")` in a Project below the Aggregate.
    */
  private final case class PulledBucket(
      aliasId: ExprId, name: String, tsId: ExprId, bucketUs: Long)

  /** Strip projects inserted by column pruning (attribute-only) or by
    * PullOutGroupingExpressions (attributes + one TimeBucket alias).
    */
  private def stripTrivial(
      plan: LogicalPlan
  ): Option[(Option[Expression], Option[PulledBucket], LogicalRelation)] =
    plan match {
      case rel: LogicalRelation => Some((None, None, rel))
      case Project(pl, child) =>
        val nonAttrs = pl.filterNot(_.isInstanceOf[AttributeReference])
        val pulled = nonAttrs match {
          case Seq() => Some(None)
          case Seq(a @ Alias(FixedBucket(t, us), _)) =>
            Some(Some(PulledBucket(a.exprId, a.name, t.exprId, us)))
          case _ => None
        }
        pulled.flatMap { pb =>
          stripTrivial(child).flatMap {
            case (f, None, rel) => Some((f, pb, rel))
            case _ => None // one bucket-project max
          }
        }
      case Filter(cond, child) =>
        stripTrivial(child).flatMap {
          case (None, None, rel) => Some((Some(cond), None, rel))
          case _ => None // one filter max, below any bucket project
        }
      case _ => None
    }

  /** A foldable timestamp operand (literal, or cast-of-literal before
    * constant folding), evaluated to epoch micros.
    */
  private object FoldableTs {
    def unapply(e: Expression): Option[Long] =
      if (e.foldable && e.dataType == org.apache.spark.sql.types.TimestampType)
        Option(e.eval(null)).map(_.asInstanceOf[Long])
      else None
  }

  /** Any fixed-width epoch-aligned bucketing of a timestamp attribute:
    * the engine's own `TimeBucket`, or SQL `date_trunc` when its unit
    * is fixed-width AND the truncation grid equals the epoch grid —
    * 'minute'/'second' in any real zone (every zone offset is a whole
    * minute), 'hour'/'day' only under UTC (a +05:45 zone's hour-trunc
    * is NOT epoch-hour-aligned). Week/month/quarter/year are not
    * fixed-width and never match. Value-equal matches may be rewritten
    * to `TimeBucket(bucket_ts, us)` regardless of original form.
    */
  private object FixedBucket {
    // ASSUMPTION (minute/second rows): every zone offset is a whole
    // minute. True for all standardized time (post-1900 everywhere, and
    // for any data this engine ingests); false only for LMT-era
    // offsets with seconds components (e.g. America/New_York pre-1883
    // at -4:56:02), where a minute-trunc is not epoch-aligned. Routing
    // therefore assumes post-standardization timestamps; hour/day are
    // additionally gated to UTC-normalized zones below because whole
    // fractional-hour offsets (+05:45) are real and current.
    private def unitUs(u: String): Option[Long] = u.toLowerCase match {
      case "second" => Some(1000000L)
      case "minute" => Some(60000000L)
      case "hour" => Some(3600000000L)
      case "day" | "dd" => Some(86400000000L)
      case _ => None
    }
    private def isUtc(tz: Option[String]): Boolean = tz.exists { z =>
      try java.time.ZoneId.of(z).normalized() == java.time.ZoneOffset.UTC
      catch { case _: java.time.DateTimeException => false }
    }
    def unapply(e: Expression): Option[(AttributeReference, Long)] = e match {
      case TimeBucket(a: AttributeReference, us) => Some((a, us))
      case tt @ TruncTimestamp(Literal(fmt, org.apache.spark.sql.types.StringType),
          a: AttributeReference, _) if fmt != null =>
        unitUs(fmt.toString).filter(us => us <= 60000000L || isUtc(tt.timeZoneId))
          .map(us => (a, us))
      case _ => None
    }
  }

  /** The [[graft.functions.Cents]] per-row cent quantization of the
    * value attribute — `floor(v * 100 + 0.5)` (long), possibly wrapped
    * in a redundant long cast and with the literals either folded
    * (100.0 / 0.5) or still cast-wrapped, depending on where in the
    * optimizer the rule runs. A sum of this expression over the base
    * table is exactly the stored `vol_cents` carrier.
    */
  private def isCentsOf(e: Expression, vId: ExprId): Boolean = {
    def isLit(x: Expression, want: Double): Boolean = x match {
      case Cast(inner, _, _, _) => isLit(inner, want)
      case Literal(v, _) if v != null =>
        v match {
          case d: Double => d == want
          case f: Float => f.toDouble == want
          case i: Int => i.toDouble == want
          case l: Long => l.toDouble == want
          case dec: org.apache.spark.sql.types.Decimal => dec.toDouble == want
          case _ => false
        }
      case _ => false
    }
    e match {
      case Cast(inner, org.apache.spark.sql.types.LongType, _, _) =>
        isCentsOf(inner, vId)
      case Floor(Add(Multiply(a: AttributeReference, l, _), h, _))
          if a.exprId == vId && isLit(l, 100d) && isLit(h, 0.5) => true
      case _ => false
    }
  }

  final class RouteRule(spark: SparkSession) extends Rule[LogicalPlan] with PredicateHelper {

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (routes.isEmpty) return plan
      plan.transformUp {
        case agg @ Aggregate(grouping, resultExprs, child, _) =>
          (for {
            (filterOpt, pulledOpt, rel) <- stripTrivial(child)
            route <- routeFor(rel)
            rewritten <- tryRewrite(agg, grouping, resultExprs, filterOpt, pulledOpt, rel, route)
          } yield rewritten).getOrElse(agg)
      }
    }

    private def tryRewrite(
        agg: Aggregate,
        grouping: Seq[Expression],
        resultExprs: Seq[NamedExpression],
        filterOpt: Option[Expression],
        pulledOpt: Option[PulledBucket],
        rel: LogicalRelation,
        route: Route
    ): Option[LogicalPlan] = {
      val attrByName = rel.output.map(a => a.name -> a).toMap
      val tsAttr = attrByName.get(route.tsCol)
      val valAttr = attrByName.get(route.valueCol)
      if (tsAttr.isEmpty || valAttr.isEmpty) return None
      val ts = tsAttr.get
      val v = valAttr.get
      val keyAttrs = route.keyCols.flatMap(attrByName.get)
      if (keyAttrs.size != route.keyCols.size) return None

      // the single TimeBucket (inline or pulled out) decides the grain
      val queryUs = pulledOpt match {
        case Some(pb) =>
          if (pb.tsId != ts.exprId) return None
          pb.bucketUs
        case None =>
          val buckets = grouping.flatMap(_.collect {
            case e @ FixedBucket(a, us) if a.exprId == ts.exprId => us
          })
          if (buckets.size != 1) return None
          buckets.head
      }
      if (queryUs % 1000000L != 0) return None
      val querySec = queryUs / 1000000L

      // classify filter conjuncts; each must be one of
      //   (a) key-only — rewritten by attribute substitution;
      //   (b) an aligned half-open ts range (ts >= L / ts < L, either
      //       operand order) — routable because a grain-aligned bound
      //       never splits a bucket: rows with ts >= L are exactly the
      //       rows of buckets >= L;
      //   (c) ts referenced only through TimeBucket(ts, us) — routable
      //       whenever the chosen grain divides us (the bucket function
      //       factors through the rollup's bucket_ts).
      // Anything else (unaligned bounds, strict > / <=, value-column
      // predicates) blocks routing — fail-safe.
      val conjuncts = filterOpt.toSeq.flatMap(splitConjunctivePredicates)
      val isKeyRef = (r: Attribute) => keyAttrs.exists(_.exprId == r.exprId)
      var keyConjs = List.empty[Expression]
      var tsRangeConjs = List.empty[(Expression, Long)] // conjunct + bound micros
      var bucketConjs = List.empty[Expression]
      var bucketUsInFilter = List.empty[Long]
      conjuncts.foreach { c =>
        // subquery predicates can hide correlated references to base
        // columns (invisible in c.references); non-deterministic
        // predicates don't commute with pre-aggregation. Both bail.
        if (c.exists(_.isInstanceOf[SubqueryExpression]) || !c.deterministic) return None
        val refs = c.references.toSeq
        if (refs.forall(isKeyRef)) keyConjs ::= c
        else {
          val refsOk = refs.forall(r => isKeyRef(r) || r.exprId == ts.exprId)
          if (!refsOk) return None
          c match {
            // InferFiltersFromConstraints adds isnotnull(ts); a bucket
            // is null iff its ts is null, so substitute directly (no
            // alignment constraint: bound 0 divides every grain)
            case IsNotNull(a: AttributeReference) if a.exprId == ts.exprId =>
              tsRangeConjs ::= (c, 0L)
            case GreaterThanOrEqual(a: AttributeReference, FoldableTs(us)) if a.exprId == ts.exprId =>
              tsRangeConjs ::= (c, us)
            case LessThan(a: AttributeReference, FoldableTs(us)) if a.exprId == ts.exprId =>
              tsRangeConjs ::= (c, us)
            case LessThanOrEqual(FoldableTs(us), a: AttributeReference) if a.exprId == ts.exprId =>
              tsRangeConjs ::= (c, us)
            case GreaterThan(FoldableTs(us), a: AttributeReference) if a.exprId == ts.exprId =>
              tsRangeConjs ::= (c, us)
            case _ =>
              val buckets = c.collect {
                case FixedBucket(a, us) if a.exprId == ts.exprId => us
              }
              val rawTsRefs = c.collect {
                case a: AttributeReference if a.exprId == ts.exprId => a
              }
              // every raw ts occurrence must sit inside a fixed bucket
              if (rawTsRefs.size != buckets.size || buckets.isEmpty) return None
              bucketConjs ::= c
              bucketUsInFilter = buckets.toList ::: bucketUsInFilter
          }
        }
      }

      // coarsest registered grain that divides the query bucket AND
      // every filter alignment (range bounds and bucket widths)
      val grainSec = route.grains.keys.filter { g =>
        val gus = g * 1000000L
        querySec % g == 0 &&
          tsRangeConjs.forall(_._2 % gus == 0) &&
          bucketUsInFilter.forall(_ % gus == 0)
      }.reduceOption(_ max _).getOrElse(return None)
      val rollupPath = route.grains(grainSec)

      // non-bucket grouping exprs may reference keys only
      val allowedIds = (keyAttrs.map(_.exprId) :+ ts.exprId).toSet ++
        pulledOpt.map(_.aliasId)
      val groupRefsOk = grouping.forall(_.references.forall(r => allowedIds.contains(r.exprId)))
      if (!groupRefsOk) return None

      // resolve the rollup relation (fresh attribute ids)
      val rollupPlan = spark.read.parquet(rollupPath).queryExecution.analyzed
      val rOut = rollupPlan.output.map(a => a.name -> a).toMap
      val needed = Seq("bucket_ts", "open", "open_ts", "high", "low", "close",
        "close_ts", "vol_cents", "trades") ++ route.keyCols
      if (!needed.forall(rOut.contains)) {
        // pre-round-9 store: decimal volume_dec instead of long
        // vol_cents — silently unroutable without this breadcrumb
        // (once per path; see graft.functions.Cents migration note)
        if (!rOut.contains("vol_cents") && rOut.contains("volume_dec") &&
            warnedLegacyVolume.putIfAbsent(rollupPath, ()).isEmpty)
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"RollupRouter: registered rollup at $rollupPath carries the " +
              "pre-cents 'volume_dec' column and no 'vol_cents' — it will " +
              "never route. Rebuild it from the base table " +
              "(RollupStore.buildWithCarriers); renaming the column would " +
              "freeze the old DECIMAL(18,2) rounding at half-cent boundaries.")
        return None
      }

      val keyMap: Map[ExprId, Attribute] =
        route.keyCols.map(k => attrByName(k).exprId -> rOut(k)).toMap

      var rewriteFailed = false

      def rewriteExpr(e: Expression): Expression = e.transformUp {
        // TimeBucket and epoch-aligned date_trunc alike become
        // TimeBucket over the rollup's bucket_ts (value-equal by the
        // FixedBucket contract; re-bucketing a finer bucket start at a
        // coarser aligned grain is exact)
        case fb @ FixedBucket(a, us) if a.exprId == ts.exprId =>
          TimeBucket(rOut("bucket_ts"), us)
        case ae @ AggregateExpression(fn, mode, isDistinct, filter, _) =>
          if (isDistinct || filter.nonEmpty) { rewriteFailed = true; ae }
          else {
            val newFn: Option[AggregateFunction] = fn match {
              case MinBy(a: AttributeReference, o: AttributeReference)
                  if a.exprId == v.exprId && o.exprId == ts.exprId =>
                Some(MinBy(rOut("open"), rOut("open_ts")))
              case MaxBy(a: AttributeReference, o: AttributeReference)
                  if a.exprId == v.exprId && o.exprId == ts.exprId =>
                Some(MaxBy(rOut("close"), rOut("close_ts")))
              case Min(a: AttributeReference) if a.exprId == v.exprId =>
                Some(Min(rOut("low")))
              case Max(a: AttributeReference) if a.exprId == v.exprId =>
                Some(Max(rOut("high")))
              // carrier timestamps: min(ts) over a bucket IS the open
              // carrier (min of per-bucket mins) and max(ts) the close
              // carrier, so the CARRIER-producing rollup shape
              // (ohlcvRollup withCarriers — what cascade/sma/rank
              // consume) routes too, not just the finished form
              case Min(a: AttributeReference) if a.exprId == ts.exprId =>
                Some(Min(rOut("open_ts")))
              case Max(a: AttributeReference) if a.exprId == ts.exprId =>
                Some(Max(rOut("close_ts")))
              case Sum(centsExpr, _) if isCentsOf(centsExpr, v.exprId) =>
                Some(Sum(rOut("vol_cents")))
              case Count(Seq(Literal(_, _))) =>
                Some(Sum(rOut("trades")))
              case _ => None
            }
            newFn match {
              case Some(f) =>
                val rewrapped = ae.copy(aggregateFunction = f)
                // preserve the original result type and nullability
                val adjusted: Expression =
                  if (f.dataType == fn.dataType) rewrapped
                  else Cast(rewrapped, fn.dataType)
                if (ae.dataType == adjusted.dataType && !fn.nullable && adjusted.nullable)
                  KnownNotNull(adjusted)
                else adjusted
              case None => rewriteFailed = true; ae
            }
          }
        case a: AttributeReference if keyMap.contains(a.exprId) => keyMap(a.exprId)
      }

      val newGrouping = grouping.map(rewriteExpr)
      val newResult = resultExprs.map { ne =>
        rewriteExpr(ne) match {
          // substituted pass-through key: keep the original output id
          case a: AttributeReference if a.exprId != ne.exprId =>
            Alias(a, ne.name)(exprId = ne.exprId)
          case n: NamedExpression if n.exprId == ne.exprId => n
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      val newFilter = {
        val rewrittenKey = keyConjs.map(rewriteExpr)
        val rewrittenBuckets = bucketConjs.map(rewriteExpr)
        // aligned range bounds: substitute ts -> bucket_ts directly
        val rewrittenRanges = tsRangeConjs.map { case (c, _) =>
          c.transformUp {
            case a: AttributeReference if a.exprId == ts.exprId => rOut("bucket_ts")
          }
        }
        (rewrittenKey ++ rewrittenBuckets ++ rewrittenRanges).reduceOption(And)
      }

      // any base attr leaking through means an unsupported shape (the
      // pulled bucket alias is produced below, so it is not a leak)
      val leaked = (newGrouping ++ newResult ++ newFilter.toSeq).exists(_.references.exists(r =>
        rel.outputSet.contains(r)))
      if (rewriteFailed || leaked) return None

      val filtered: LogicalPlan = newFilter match {
        case Some(cond) => Filter(cond, rollupPlan)
        case None => rollupPlan
      }
      // pulled-out shape: reproduce the bucket-alias Project (same
      // exprId) over the rollup, keeping the normalized Aggregate form
      val source: LogicalPlan = pulledOpt match {
        case Some(pb) =>
          Project(
            rollupPlan.output :+
              Alias(TimeBucket(rOut("bucket_ts"), pb.bucketUs), pb.name)(exprId = pb.aliasId),
            filtered)
        case None => filtered
      }
      Some(Aggregate(newGrouping, newResult, source))
    }
  }
}
