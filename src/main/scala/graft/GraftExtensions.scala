package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{DotProduct, SimHash64, TimeBucket, WordShingles}

/** SQL surface for graft's custom Catalyst expressions, installable via
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`:
  *
  *   - `simhash64(tokens)`           — 64-bit SimHash fingerprint
  *   - `dot_product(a, b)`           — array dot product (codegen'd)
  *   - `word_shingles(tokens, n)`    — distinct word n-grams
  *   - `time_bucket_fixed(ts, spec)` — epoch-aligned floor; spec is an
  *     interval phrase ('15 minutes') or the reference's timeframe
  *     grammar ('15m')
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.registrations.foreach { case (name, (info, builder)) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // materialized-rollup routing (no-op until routes are registered)
    ext.injectOptimizerRule(session =>
      new org.apache.spark.sql.graft.RollupRouter.RouteRule(session))
  }
}

object GraftExtensions {

  private def literalString(e: Expression, fn: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects a string literal argument, got: $other")
  }

  private def literalInt(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, _) => i
    case other =>
      throw new IllegalArgumentException(
        s"$fn expects an integer literal argument, got: $other")
  }

  /** Accepts '15 minutes' (interval phrase) or '15m' (the reference's
    * timeframe grammar, app/load_history.py:238-260).
    */
  private def specMicros(spec: String): Long =
    if (spec.trim.matches("""^\d+[smhdw]$"""))
      graft.model.Timeframe.parse(spec).seconds * 1000000L
    else TimeBucket.intervalMicros(spec)

  val registrations: Map[String, (ExpressionInfo, Seq[Expression] => Expression)] = Map(
    "simhash64" -> ((
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head))),
    "dot_product" -> ((
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1)))),
    "word_shingles" -> ((
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args(0), literalInt(args(1), "word_shingles")))),
    "time_bucket_fixed" -> ((
      new ExpressionInfo(classOf[TimeBucket].getName, "time_bucket_fixed"),
      (args: Seq[Expression]) =>
        TimeBucket(args(0), specMicros(literalString(args(1), "time_bucket_fixed"))))),
    "minhash_sig" -> ((
      new ExpressionInfo(classOf[graft.functions.MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => {
        val (a, b) = graft.functions.MinHashSig.params(literalInt(args(1), "minhash_sig"))
        graft.functions.MinHashSig(args(0), a, b)
      })),
    "winnow" -> ((
      new ExpressionInfo(classOf[graft.functions.WinnowingFingerprints].getName, "winnow"),
      (args: Seq[Expression]) =>
        graft.functions.WinnowingFingerprints(args(0),
          literalInt(args(1), "winnow"), literalInt(args(2), "winnow")))),
    "topk_items" -> ((
      new ExpressionInfo(classOf[graft.functions.TopKItems].getName, "topk_items"),
      (args: Seq[Expression]) =>
        graft.functions.TopKItems(args(0),
          literalInt(args(1), "topk_items"),
          literalInt(args(2), "topk_items")).toAggregateExpression())),
    "compress_ratio" -> ((
      new ExpressionInfo(classOf[graft.functions.CompressRatio].getName, "compress_ratio"),
      (args: Seq[Expression]) => graft.functions.CompressRatio(args.head))),
    "dd_encode" -> ((
      new ExpressionInfo(classOf[graft.functions.DdEncode].getName, "dd_encode"),
      (args: Seq[Expression]) => graft.functions.DdEncode(args.head))),
    "dd_decode" -> ((
      new ExpressionInfo(classOf[graft.functions.DdDecode].getName, "dd_decode"),
      (args: Seq[Expression]) => graft.functions.DdDecode(args.head))),
    "gorilla_encode" -> ((
      new ExpressionInfo(classOf[graft.functions.GorillaEncode].getName, "gorilla_encode"),
      (args: Seq[Expression]) => graft.functions.GorillaEncode(args.head))),
    "gorilla_decode" -> ((
      new ExpressionInfo(classOf[graft.functions.GorillaDecode].getName, "gorilla_decode"),
      (args: Seq[Expression]) => graft.functions.GorillaDecode(args.head))),
    "hyperplane_bucket" -> ((
      new ExpressionInfo(classOf[graft.functions.HyperplaneBucket].getName, "hyperplane_bucket"),
      (args: Seq[Expression]) => {
        // hyperplane_bucket(vec, dim, nPlanes[, seed]) — planes are
        // regenerated deterministically from the seed, exactly like the
        // Scala API (VectorOps.hyperplaneBucket)
        val dim = literalInt(args(1), "hyperplane_bucket")
        val nPlanes = literalInt(args(2), "hyperplane_bucket")
        val seed = if (args.length > 3) literalInt(args(3), "hyperplane_bucket").toLong else 42L
        val rng = new scala.util.Random(seed)
        val planes = Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
        graft.functions.HyperplaneBucket(args(0), planes)
      }))
  )

  /** Runtime registration on an existing session (no extensions conf
    * needed — e.g. in tests or a shared session).
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    registrations.foreach { case (name, (info, builder)) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
