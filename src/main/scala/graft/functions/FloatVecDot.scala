package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd dot product over two float-vector columns in double
  * precision — the inner loop of every similarity operator.
  *
  * Composing built-ins (`aggregate(zip_with(a, b, (x,y) -> x*y), ...)`)
  * allocates an intermediate 64-element array per row pair and drives a
  * HOF interpreter loop; at n·m candidate pairs that allocation IS the
  * workload. This expression generates a tight allocation-free loop inside
  * whole-stage codegen. Accumulation order is strictly left-to-right, so
  * results are bit-identical to the HOF formulation (and to the DuckDB
  * oracle's sequential list_reduce).
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double ${ev.value}_acc = 0.0;
         |for (int ${ev.value}_i = 0; ${ev.value}_i < ${ev.value}_n; ${ev.value}_i++) {
         |  ${ev.value}_acc += ((double) $a.getFloat(${ev.value}_i))
         |                   * ((double) $b.getFloat(${ev.value}_i));
         |}
         |${ev.value} = ${ev.value}_acc;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Registration for graft's native expressions. Operators call `register`
  * idempotently on their session; deployments that prefer config wiring
  * can set spark.sql.extensions=graft.functions.GraftExtensions. */
object GraftFunctions {
  val builder: Seq[Expression] => Expression = exprs => FloatVecDot(exprs.head, exprs(1))
  val intersectBuilder: Seq[Expression] => Expression =
    exprs => SortedIntersectCount(exprs.head, exprs(1))

  val mortonBuilder: Seq[Expression] => Expression =
    exprs => Morton2(exprs.head, exprs(1))

  // capacity/k must be literal ints (sketch shape is a plan-time property)
  val topkFreqBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"topk_freq expects 3 arguments (value, capacity, k), got ${exprs.length}")
    def litInt(e: Expression, what: String): Int = {
      if (!e.foldable)
        throw new IllegalArgumentException(
          s"topk_freq $what must be a literal int, got non-literal ${e.sql}")
      e.eval(null) match {
        case n: Number => n.intValue
        case other => throw new IllegalArgumentException(
          s"topk_freq $what must be a literal int, got $other")
      }
    }
    TopKFreq(exprs.head, litInt(exprs(1), "capacity"), litInt(exprs(2), "k"))
  }

  // k must be a literal int (sketch shape is a plan-time property)
  val kmvBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"kmv_sketch expects 2 arguments (value, k), got ${exprs.length}")
    val kExpr = exprs(1)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(
        s"kmv_sketch k must be a literal int, got non-literal ${kExpr.sql}")
    val k = kExpr.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"kmv_sketch k must be a literal int, got $other")
    }
    KmvSketch(exprs.head, k)
  }

  val kmvMergeBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"kmv_merge_agg expects 2 arguments (sketch, k), got ${exprs.length}")
    val kExpr = exprs(1)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(
        s"kmv_merge_agg k must be a literal int, got non-literal ${kExpr.sql}")
    val k = kExpr.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"kmv_merge_agg k must be a literal int, got $other")
    }
    KmvMergeAgg(exprs.head, k)
  }

  // depth/width must be literal ints (sketch shape is a plan-time property)
  private def cmsShapeBuilder(name: String,
      make: (Expression, Int, Int) => Expression): Seq[Expression] => Expression =
    exprs => {
      if (exprs.length != 3)
        throw new IllegalArgumentException(
          s"$name expects 3 arguments (value, depth, width), got ${exprs.length}")
      def litInt(e: Expression, what: String): Int = {
        if (!e.foldable)
          throw new IllegalArgumentException(
            s"$name $what must be a literal int, got non-literal ${e.sql}")
        e.eval(null) match {
          case n: Number => n.intValue
          case other => throw new IllegalArgumentException(
            s"$name $what must be a literal int, got $other")
        }
      }
      make(exprs.head, litInt(exprs(1), "depth"), litInt(exprs(2), "width"))
    }

  val cmsBuilder: Seq[Expression] => Expression =
    cmsShapeBuilder("cms_sketch", CmsSketch(_, _, _))
  val cmsMergeBuilder: Seq[Expression] => Expression =
    cmsShapeBuilder("cms_merge_agg", CmsMergeAgg(_, _, _))

  // k must be a literal int (the sample size is a plan-time property);
  // priority/payload are cast so any string-able priority and integral
  // payload work
  val bottomkBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"bottomk_sample expects 3 arguments (priority, payload, k), got ${exprs.length}")
    val kExpr = exprs(2)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(
        s"bottomk_sample k must be a literal int, got non-literal ${kExpr.sql}")
    val k = kExpr.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"bottomk_sample k must be a literal int, got $other")
    }
    BottomKSample(
      Cast(exprs.head, org.apache.spark.sql.types.StringType),
      Cast(exprs(1), org.apache.spark.sql.types.LongType), k)
  }

  // k must be a literal int (the sketch size is a plan-time property);
  // pri/key cast to long and v to double so integral/decimal inputs work
  val bottomkQskBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 4)
      throw new IllegalArgumentException(
        s"bottomk_qsk expects 4 arguments (pri, key, v, k), got ${exprs.length}")
    val kExpr = exprs(3)
    if (!kExpr.foldable)
      throw new IllegalArgumentException(
        s"bottomk_qsk k must be a literal int, got non-literal ${kExpr.sql}")
    val k = kExpr.eval(null) match {
      case n: Number => n.intValue
      case other => throw new IllegalArgumentException(
        s"bottomk_qsk k must be a literal int, got $other")
    }
    BottomKQsk(
      Cast(exprs(0), org.apache.spark.sql.types.LongType),
      Cast(exprs(1), org.apache.spark.sql.types.LongType),
      Cast(exprs(2), org.apache.spark.sql.types.DoubleType), k)
  }

  val bandedLevBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"levenshtein_leq expects 3 arguments (a, b, k), got ${exprs.length}")
    BandedLevenshtein(exprs(0), exprs(1), exprs(2))
  }

  val jaroWinklerBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"jaro_winkler expects 2 arguments (a, b), got ${exprs.length}")
    JaroWinkler(exprs(0), exprs(1))
  }

  val deflateLenBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"deflate_len expects 1 argument (str), got ${exprs.length}")
    DeflateLen(exprs.head)
  }

  val nfcBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 1)
      throw new IllegalArgumentException(
        s"nfc_normalize expects 1 argument (str), got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  val multiMatchBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"multi_match expects 2 arguments (text, patterns), got ${exprs.length}")
    MultiMatch(exprs.head, exprs(1))
  }

  val multiRedactBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 3)
      throw new IllegalArgumentException(
        s"multi_redact expects 3 arguments (text, patterns, mask), got ${exprs.length}")
    MultiRedact(exprs(0), exprs(1), exprs(2))
  }

  val multiMatchCountBuilder: Seq[Expression] => Expression = exprs => {
    if (exprs.length != 2)
      throw new IllegalArgumentException(
        s"multi_match_count expects 2 arguments (text, patterns), got ${exprs.length}")
    MultiMatchCount(exprs.head, exprs(1))
  }

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", builder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", nfcBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "levenshtein_leq", bandedLevBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "jaro_winkler", jaroWinklerBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count", intersectBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "morton2", mortonBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_freq", topkFreqBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_sample", bottomkBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bottomk_qsk", bottomkQskBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", kmvBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_merge_agg", kmvMergeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_sketch", cmsBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cms_merge_agg", cmsMergeBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "deflate_len", deflateLenBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match", multiMatchBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_redact", multiRedactBuilder, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "multi_match_count", multiMatchCountBuilder, "built-in")
  }

  /** Runtime installation of graft's optimizer rules (for sessions not
    * configured with spark.sql.extensions). Idempotent. */
  def installOptimizations(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(graft.plans.FuseVecDot)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.FuseVecDot
    }
}

/** SparkSessionExtensions entry point (spark.sql.extensions): the
  * vec_dot function, the FuseVecDot optimizer rule, and the as-of join
  * planner strategy. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[FloatVecDot].getName, "vec_dot"),
      GraftFunctions.builder))
    ext.injectFunction((
      FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      GraftFunctions.intersectBuilder))
    ext.injectFunction((
      FunctionIdentifier("levenshtein_leq"),
      new ExpressionInfo(classOf[BandedLevenshtein].getName, "levenshtein_leq"),
      GraftFunctions.bandedLevBuilder))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
      GraftFunctions.jaroWinklerBuilder))
    ext.injectFunction((
      FunctionIdentifier("deflate_len"),
      new ExpressionInfo(classOf[DeflateLen].getName, "deflate_len"),
      GraftFunctions.deflateLenBuilder))
    ext.injectFunction((
      FunctionIdentifier("morton2"),
      new ExpressionInfo(classOf[Morton2].getName, "morton2"),
      GraftFunctions.mortonBuilder))
    ext.injectFunction((
      FunctionIdentifier("topk_freq"),
      new ExpressionInfo(classOf[TopKFreq].getName, "topk_freq"),
      GraftFunctions.topkFreqBuilder))
    ext.injectFunction((
      FunctionIdentifier("bottomk_sample"),
      new ExpressionInfo(classOf[BottomKSample].getName, "bottomk_sample"),
      GraftFunctions.bottomkBuilder))
    ext.injectFunction((
      FunctionIdentifier("bottomk_qsk"),
      new ExpressionInfo(classOf[BottomKQsk].getName, "bottomk_qsk"),
      GraftFunctions.bottomkQskBuilder))
    ext.injectFunction((
      FunctionIdentifier("kmv_sketch"),
      new ExpressionInfo(classOf[KmvSketch].getName, "kmv_sketch"),
      GraftFunctions.kmvBuilder))
    ext.injectFunction((
      FunctionIdentifier("kmv_merge_agg"),
      new ExpressionInfo(classOf[KmvMergeAgg].getName, "kmv_merge_agg"),
      GraftFunctions.kmvMergeBuilder))
    ext.injectFunction((
      FunctionIdentifier("cms_sketch"),
      new ExpressionInfo(classOf[CmsSketch].getName, "cms_sketch"),
      GraftFunctions.cmsBuilder))
    ext.injectFunction((
      FunctionIdentifier("cms_merge_agg"),
      new ExpressionInfo(classOf[CmsMergeAgg].getName, "cms_merge_agg"),
      GraftFunctions.cmsMergeBuilder))
    ext.injectFunction((
      FunctionIdentifier("multi_match"),
      new ExpressionInfo(classOf[MultiMatch].getName, "multi_match"),
      GraftFunctions.multiMatchBuilder))
    ext.injectFunction((
      FunctionIdentifier("multi_redact"),
      new ExpressionInfo(classOf[MultiRedact].getName, "multi_redact"),
      GraftFunctions.multiRedactBuilder))
    ext.injectFunction((
      FunctionIdentifier("multi_match_count"),
      new ExpressionInfo(classOf[MultiMatchCount].getName, "multi_match_count"),
      GraftFunctions.multiMatchCountBuilder))
    ext.injectOptimizerRule(_ => graft.plans.FuseVecDot)
    ext.injectOptimizerRule(_ => graft.plans.MvRewrite)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // ASOF JOIN SQL syntax (Snowflake shape) -> AsOfJoinNode; ordinary SQL
    // passes through to Spark's parser untouched
    ext.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
  }
}
