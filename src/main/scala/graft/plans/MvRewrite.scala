package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max => smax, min => smin, sum => ssum}

/** Transparent materialized-view rewrite (the Calcite/warehouse
  * "aggregate rewrite" shape): an `Aggregate` over a registered base
  * relation is rewritten by the optimizer to re-aggregate the stored MV's
  * partial states instead of scanning the base table — the user keeps
  * writing queries against the base table and silently reads group-grain
  * data. Composes with [[graft.gold.DeltaView]]: DeltaView maintains the
  * MV incrementally; this rule makes consumers USE it without knowing it
  * exists.
  *
  * Soundness model (each checked structurally before rewriting):
  *  - the query's grouping keys are plain attributes and a SUBSET of the
  *    MV's key columns (coarser grains re-aggregate the states: SUM of
  *    sums, SUM of counts, MIN of mins, MAX of maxes);
  *  - every aggregate is a non-DISTINCT, un-FILTERed sum/count/min/max
  *    whose input column has a registered state column;
  *  - between the Aggregate and the base scan only attribute-preserving
  *    Projects and Filters over MV KEY columns appear (key predicates
  *    commute with the group-grain rollup; a filter on a non-key column
  *    would need row grain and blocks the rewrite);
  *  - aggregate output is cast back to the original expression's type
  *    (re-aggregating a decimal sum widens precision) and re-aliased
  *    under the ORIGINAL exprIds, so parent operators never notice.
  *
  * Freshness is the registry contract: registering states that the MV
  * maintenance job does not keep in sync with the base is the same bug as
  * a stale mart. `spark.graft.mv.rewrite.enabled=false` disables the rule
  * without unregistering.
  *
  * 100 TB shape: the rewrite turns a full base-table scan + row-grain
  * shuffle into a scan of the group-grain MV (orders of magnitude
  * smaller) + a group-grain re-agg. The rule itself does no I/O beyond
  * reusing the MV's analyzed scan template ([[MvRegistry.register]] reads
  * the footer once; each rewrite stamps fresh exprIds via newInstance).
  *
  * Ref: the reference serves dashboard aggregates from pre-built marts by
  * NAME (grafana queries hit gold tables directly); this is the engine
  * form — same marts, resolved by the optimizer instead of by
  * convention.
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** One registered MV: key columns, state columns keyed by
    * (function, base column) with "*" for count(*), and the analyzed MV
    * scan to instantiate per rewrite. */
  final case class MvDef(mvPath: String, keys: Seq[String],
                         states: Map[(String, String), String],
                         template: LogicalRelation)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  private def normalize(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.toUri.getPath match { case null | "" => p.toString case u => u }
  }

  /** Register `mvPath` (parquet, written by [[materialize]]) as the MV of
    * `basePath` with the given keys/states. Reads the MV footer once to
    * capture the scan template. */
  def register(spark: SparkSession, basePath: String, mvPath: String,
               keys: Seq[String], states: Map[(String, String), String]): Unit = {
    val template = spark.read.parquet(mvPath).queryExecution.analyzed
      .collectFirst { case lr: LogicalRelation => lr }
      .getOrElse(throw new IllegalArgumentException(
        s"$mvPath did not analyze to a file relation"))
    val missing = (keys ++ states.values).filterNot(template.output.map(_.name).contains)
    require(missing.isEmpty, s"MV at $mvPath lacks columns $missing")
    registry.put(normalize(basePath), MvDef(mvPath, keys, states, template))
  }

  def unregister(basePath: String): Unit = registry.remove(normalize(basePath))
  def clear(): Unit = registry.clear()

  /** Group-grain partial states for a base frame: one state column per
    * spec — ("sum", c) → sum_c, ("min", c) → min_c, ("max", c) → max_c —
    * plus the cnt row count. The mergeable representation both the batch
    * build and the streaming sink ([[graft.streaming.StreamOps.mvSink]])
    * produce. */
  def partialStates(base: DataFrame, keys: Seq[String],
                    specs: Seq[(String, String)]): DataFrame = {
    val stateCols = specs.map {
      case ("sum", c) => ssum(col(c)).as(s"sum_$c")
      case ("min", c) => smin(col(c)).as(s"min_$c")
      case ("max", c) => smax(col(c)).as(s"max_$c")
      case ("count", c) => count(col(c)).as(s"count_$c") // non-null count
      case (f, c) => throw new IllegalArgumentException(s"unsupported state ($f, $c)")
    } :+ count(lit(1)).as("cnt")
    base.groupBy(keys.map(col): _*)
      .agg(stateCols.head, stateCols.tail: _*)
  }

  /** Merge two partial-state frames (associative: sums/cnts add,
    * mins/maxes keep the extremum). Output schema is pinned to `fresh`'s
    * (a merged decimal sum would otherwise widen precision every round
    * and drift the stored MV schema version-over-version). */
  def mergeStates(prev: DataFrame, fresh: DataFrame, keys: Seq[String],
                  specs: Seq[(String, String)]): DataFrame = {
    val types = fresh.schema.map(f => f.name -> f.dataType).toMap
    val mergeCols = specs.map {
      case ("sum", c) => ssum(col(s"sum_$c")).cast(types(s"sum_$c")).as(s"sum_$c")
      case ("min", c) => smin(col(s"min_$c")).as(s"min_$c")
      case ("max", c) => smax(col(s"max_$c")).as(s"max_$c")
      case ("count", c) => ssum(col(s"count_$c")).cast(types(s"count_$c")).as(s"count_$c")
      case (f, c) => throw new IllegalArgumentException(s"unsupported state ($f, $c)")
    } :+ ssum(col("cnt")).cast(types("cnt")).as("cnt")
    prev.unionByName(fresh)
      .groupBy(keys.map(col): _*)
      .agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** The states map [[partialStates]]' column naming implies — pass to
    * [[register]]. */
  def statesFor(specs: Seq[(String, String)]): Map[(String, String), String] =
    specs.map { case (f, c) => (f, c) -> s"${f}_$c" }.toMap +
      (("count", "*") -> "cnt")

  /** Build + write the partial-state MV for a base frame; returns the
    * states map to pass to [[register]]. */
  def materialize(base: DataFrame, keys: Seq[String],
                  specs: Seq[(String, String)], mvPath: String): Map[(String, String), String] = {
    partialStates(base, keys, specs).write.mode("overwrite").parquet(mvPath)
    statesFor(specs)
  }

  private def enabled: Boolean =
    SparkSession.getActiveSession.forall(
      _.conf.get("spark.graft.mv.rewrite.enabled", "true") == "true")

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty || !enabled) plan
    else plan.transformUp {
      case agg: Aggregate => rewrite(agg).getOrElse(agg)
    }

  /** Peel attribute-preserving Projects and key-only Filters down to the
    * base scan; collect the filter conditions (expressed over base
    * attribute NAMES). */
  private def peel(plan: LogicalPlan): Option[(LogicalRelation, Seq[Expression])] =
    plan match {
      case lr: LogicalRelation => Some((lr, Nil))
      case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        peel(child)
      case Filter(cond, child) =>
        peel(child).map { case (lr, conds) => (lr, cond +: conds) }
      case _ => None
    }

  private def basePaths(lr: LogicalRelation): Seq[String] = lr.relation match {
    case fs: HadoopFsRelation => fs.location.rootPaths.map(p => normalize(p.toString))
    case _ => Nil
  }

  /** The MV serving this scan — only when the relation reads exactly ONE
    * root path. A multi-path scan (`spark.read.parquet(a, b)`) unions
    * bases; rewriting to the MV of one path alone would silently drop the
    * other paths' rows from the aggregate. */
  private def registeredFor(lr: LogicalRelation): Option[MvDef] =
    basePaths(lr) match {
      case Seq(single) => Option(registry.get(single))
      case _ => None
    }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val Aggregate(groupExprs, aggExprs, child, _) = agg
    for {
      (lr, conds) <- peel(child)
      mv <- registeredFor(lr)
      result <- rewriteWith(agg, groupExprs, aggExprs, conds, mv)
    } yield result
  }

  private def rewriteWith(agg: Aggregate, groupExprs: Seq[Expression],
                          aggExprs: Seq[NamedExpression], conds: Seq[Expression],
                          mv: MvDef): Option[LogicalPlan] = {
    // grouping keys: plain attributes, all registered MV keys
    val groupAttrs = groupExprs.map {
      case a: AttributeReference if mv.keys.contains(a.name) => a
      case _ => return None
    }
    // filters may touch only MV key columns
    if (conds.exists(_.references.exists(a => !mv.keys.contains(a.name))))
      return None
    // a non-deterministic predicate (e.g. rand() < p sampling) has NO
    // attribute references, so the key-only check alone would admit it —
    // but it must see ROW grain: commuted to the MV it would sample
    // groups instead of data rows
    if (conds.exists(!_.deterministic)) return None

    val scan = mv.template.newInstance()
    val byName = scan.output.map(a => a.name -> a).toMap

    def remapCond(e: Expression): Expression = e.transform {
      case a: AttributeReference => byName(a.name)
    }

    // each output: a grouping key (re-aliased MV key — possibly renamed
    // by a collapsed Project, e.g. withColumnRenamed folded into the
    // Aggregate) or a derivable agg
    val newAggExprs: Seq[NamedExpression] = aggExprs.map {
      case a: AttributeReference if mv.keys.contains(a.name) =>
        Alias(byName(a.name), a.name)(exprId = a.exprId)
      case al @ Alias(a: AttributeReference, name) if mv.keys.contains(a.name) =>
        Alias(byName(a.name), name)(exprId = al.exprId)
      case al @ Alias(ae: AggregateExpression, name) =>
        derive(ae, mv, byName).map(d =>
          Alias(Cast(d, al.dataType), name)(exprId = al.exprId))
          .getOrElse(return None)
      case _ => return None
    }
    val newChild = conds.foldLeft(scan: LogicalPlan)((p, c) => Filter(remapCond(c), p))
    Some(Aggregate(groupAttrs.map(a => byName(a.name)), newAggExprs, newChild))
  }

  /** sum(x)→sum(sum_x), count(*)→sum(cnt), count(x)→sum(count_x) if
    * registered, min(x)→min(min_x), max(x)→max(max_x),
    * avg(x)→sum(sum_x)/sum(count_x) (double inputs only — decimal avg
    * has its own precision semantics and is not derived).
    *
    * Count derivations are wrapped in coalesce(·, 0): a GLOBAL count over
    * an empty (or fully-filtered) base is 0, but Sum over the then-empty
    * MV returns NULL. For grouped aggregates the coalesce is a no-op
    * (every MV group row carries a non-null state). count(NULL) is 0 in
    * SQL, not the row count, so the literal match requires non-null. */
  private def derive(ae: AggregateExpression, mv: MvDef,
                     byName: Map[String, Attribute]): Option[Expression] = {
    if (ae.filter.nonEmpty) return None
    if (ae.isDistinct) return deriveDistinct(ae, mv, byName)
    def state(fn: String, c: String): Option[Attribute] =
      mv.states.get((fn, c)).flatMap(byName.get)
    def sumOrZero(s: Attribute): Expression =
      Coalesce(Seq(Sum(s).toAggregateExpression(), Literal(0L)))
    ae.aggregateFunction match {
      case Sum(a: AttributeReference, _) =>
        state("sum", a.name).map(s => Sum(s).toAggregateExpression())
      case Count(Seq(Literal(v, _))) if v != null =>
        state("count", "*").map(sumOrZero)
      case Count(Nil) =>
        state("count", "*").map(sumOrZero)
      case Count(Seq(a: AttributeReference)) =>
        state("count", a.name).map(sumOrZero)
      case Min(a: AttributeReference) =>
        state("min", a.name).map(s => Min(s).toAggregateExpression())
      case Max(a: AttributeReference) =>
        state("max", a.name).map(s => Max(s).toAggregateExpression())
      case Average(a: AttributeReference, _)
          if ae.dataType == org.apache.spark.sql.types.DoubleType =>
        for {
          s <- state("sum", a.name)
          c <- state("count", a.name)
        } yield Divide(
          Cast(Sum(s).toAggregateExpression(), org.apache.spark.sql.types.DoubleType),
          Cast(Sum(c).toAggregateExpression(), org.apache.spark.sql.types.DoubleType))
      case _ => None
    }
  }

  /** DISTINCT aggregates over MV KEY columns only: the MV holds exactly
    * one row per present key combination (it IS a groupBy over the keys),
    * so the distinct set of any key subset per coarser group is identical
    * on the MV and the base — count(distinct k)/sum(distinct k) rewrite
    * to the same DISTINCT aggregate over the MV's key columns. NULL keys
    * agree too: a NULL-keyed base row yields a NULL-keyed MV group row,
    * and DISTINCT aggregates ignore NULLs on both sides. State columns
    * (sum_x etc.) are NOT derivable this way — a distinct over a non-key
    * column needs row grain and falls through to None (no rewrite). */
  private def deriveDistinct(ae: AggregateExpression, mv: MvDef,
                             byName: Map[String, Attribute]): Option[Expression] = {
    def keyAttrs(children: Seq[Expression]): Option[Seq[Attribute]] = {
      val mapped = children.map {
        case a: AttributeReference if mv.keys.contains(a.name) => byName.get(a.name)
        case _ => None
      }
      if (mapped.nonEmpty && mapped.forall(_.isDefined)) Some(mapped.flatten)
      else None
    }
    ae.aggregateFunction match {
      case Count(children) if children.nonEmpty =>
        keyAttrs(children).map(as =>
          Count(as).toAggregateExpression(isDistinct = true))
      case Sum(a: AttributeReference, _) =>
        keyAttrs(Seq(a)).map(as =>
          Sum(as.head).toAggregateExpression(isDistinct = true))
      case _ => None
    }
  }
}
