package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.types.{DataType, StructType}

/** SQL surface for the native as-of join — the reference's consumers are
  * SQL-first (dbt models, Grafana raw SQL, warehouse/init.sql), so the
  * flagship custom operator must be reachable from `spark.sql(...)`, not
  * only the DataFrame API. Injected via GraftExtensions
  * (`spark.sql.extensions=graft.functions.GraftExtensions`).
  *
  * Supported grammar (the Snowflake ASOF JOIN shape):
  *
  * {{{
  * SELECT <proj> FROM <left> [AS] <la> ASOF JOIN <right> [AS] <ra>
  *   MATCH_CONDITION ( <la>.<time> >= <ra>.<time> )   -- backward (most recent at-or-before)
  *   -- or: <la>.<time> <= <ra>.<time>                -- forward (earliest at-or-after)
  *   ON <la>.<key> = <ra>.<key>
  * [WHERE / GROUP BY / ORDER BY / LIMIT ...]
  * }}}
  *
  * Contract (mirrors AsOfJoinNode): key and time columns carry the SAME
  * name on both sides; the right relation projects exactly (key, time,
  * payload) — the one remaining column is the carried `asof_value`. The
  * time column is epoch-µs LONG. Output = left.* + asof_value +
  * asof_ts_us, aliased by the LEFT relation's name. Everything that is
  * not an ASOF JOIN statement passes through to Spark's parser verbatim.
  */
class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    AsOfSql.rewrite(session, delegate, sqlText)
      .getOrElse(delegate.parsePlan(sqlText))

  override def parseQuery(sqlText: String): LogicalPlan =
    AsOfSql.rewrite(session, delegate, sqlText)
      .getOrElse(delegate.parseQuery(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
}

object AsOfSql {

  // relation := table | (subquery), optionally aliased; conditions are
  // alias.column comparisons. Lazy groups keep subquery parens intact.
  private val Stmt = (
    """(?is)^\s*SELECT\s+(.*?)\s+FROM\s+(.*?)\s+ASOF\s+JOIN\s+(.*?)\s+""" +
    """MATCH_CONDITION\s*\(\s*(\w+)\s*\.\s*(\w+)\s*(>=|<=)\s*(\w+)\s*\.\s*(\w+)\s*\)\s+""" +
    """ON\s+(\w+)\s*\.\s*(\w+)\s*=\s*(\w+)\s*\.\s*(\w+)\s*(.*?)\s*;?\s*$""").r

  private val HasAsOf = """(?is).*\bASOF\s+JOIN\b.*""".r

  /** Some(plan) when `sql` is an ASOF JOIN statement; None when it is
    * ordinary SQL. A statement that merely CONTAINS the text "ASOF JOIN"
    * (string literal, comment, identifier) but doesn't fit the grammar is
    * handed to the delegate — it only gets our grammar error when the
    * delegate can't parse it either (i.e. it really was an attempted
    * ASOF JOIN, for which the delegate's own syntax error would mislead). */
  def rewrite(session: SparkSession, delegate: ParserInterface,
              sql: String): Option[LogicalPlan] = {
    if (!HasAsOf.matches(sql)) return None
    sql match {
      case Stmt(proj, leftRel, rightRel, mla, ltime, op, mra, rtime,
                ola, lkey, ora, rkey, rest) =>
        Some(build(session, delegate, proj, leftRel, rightRel,
          mla, ltime, op, mra, rtime, ola, lkey, ora, rkey, rest))
      case _ =>
        try Some(delegate.parsePlan(sql))
        catch {
          case scala.util.control.NonFatal(_) =>
            throw new IllegalArgumentException(
              "ASOF JOIN statement does not match the supported grammar: " +
                "SELECT <proj> FROM <left> <la> ASOF JOIN <right> <ra> " +
                "MATCH_CONDITION(<la>.<t> >= <ra>.<t>) ON <la>.<k> = <ra>.<k> [...]")
        }
    }
  }

  /** Trailing identifier of a relation clause = its alias (or the bare
    * table name when unaliased). */
  private def aliasOf(rel: String): String = {
    val m = """(?is).*?(\w+)\s*$""".r
    rel.trim match {
      case m(a) => a
      case _ => throw new IllegalArgumentException(
        s"ASOF JOIN relation '$rel' needs a trailing alias " +
          "(subqueries must be aliased: (SELECT ...) alias)")
    }
  }

  private def analyzed(session: SparkSession, delegate: ParserInterface,
                       rel: String): LogicalPlan =
    org.apache.spark.sql.GraftSqlShim
      .ofRows(session, delegate.parsePlan(s"SELECT * FROM $rel"))
      .queryExecution.analyzed

  private def build(session: SparkSession, delegate: ParserInterface,
                    proj: String, leftRel: String, rightRel: String,
                    mla: String, ltime: String, op: String, mra: String,
                    rtime: String, ola: String, lkey: String, ora: String,
                    rkey: String, rest: String): LogicalPlan = {
    val la = aliasOf(leftRel)
    val ra = aliasOf(rightRel)
    def fail(what: String): Nothing = throw new IllegalArgumentException(
      s"ASOF JOIN $what must reference both relation aliases '$la' and '$ra'")

    // orient MATCH_CONDITION to left-op-right (flip the comparison when
    // written right-side-first) — ">=" on left.time means backward
    val (timeL, timeR, effOp) =
      if (mla.equalsIgnoreCase(la) && mra.equalsIgnoreCase(ra)) (ltime, rtime, op)
      else if (mla.equalsIgnoreCase(ra) && mra.equalsIgnoreCase(la))
        (rtime, ltime, if (op == ">=") "<=" else ">=")
      else fail("MATCH_CONDITION")
    val (keyL, keyR) =
      if (ola.equalsIgnoreCase(la) && ora.equalsIgnoreCase(ra)) (lkey, rkey)
      else if (ola.equalsIgnoreCase(ra) && ora.equalsIgnoreCase(la)) (rkey, lkey)
      else fail("ON condition")
    // AsOfJoinNode resolves key/time by ONE name on each side; compare
    // case-insensitively, matching Spark's default identifier resolution
    require(timeL.equalsIgnoreCase(timeR),
      s"ASOF JOIN time column must carry the same name on both sides, got $timeL vs $timeR")
    require(keyL.equalsIgnoreCase(keyR),
      s"ASOF JOIN key column must carry the same name on both sides, got $keyL vs $keyR")

    val leftPlan = analyzed(session, delegate, leftRel)
    val rightPlan = analyzed(session, delegate, rightRel)
    // resolve the user's spelling to the schema's spelling (the node
    // matches attributes by exact name downstream)
    def resolved(plan: LogicalPlan, col: String, side: String): String =
      plan.output.map(_.name).find(_.equalsIgnoreCase(col)).getOrElse(
        throw new IllegalArgumentException(
          s"ASOF JOIN $side side has no column '$col'"))
    val keyName = resolved(leftPlan, keyL, "left")
    require(resolved(rightPlan, keyR, "right") == keyName,
      s"ASOF JOIN key column name differs between sides: $keyName")
    val timeName = resolved(leftPlan, timeL, "left")
    require(resolved(rightPlan, timeR, "right") == timeName,
      s"ASOF JOIN time column name differs between sides: $timeName")
    val payload = rightPlan.output.map(_.name)
      .filterNot(n => n.equalsIgnoreCase(keyName) || n.equalsIgnoreCase(timeName))
    require(payload.size == 1,
      s"ASOF JOIN right side must project exactly (key, time, payload); " +
        s"extra columns: ${payload.mkString(", ")} — project the one value to carry")
    val valueType = rightPlan.output.find(_.name == payload.head).get.dataType

    // spark.sql path must plan through AsOfJoinExec even on sessions that
    // picked up the parser but not the strategy (idempotent, same as
    // NativeAsOf.asOf)
    if (!session.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      session.experimental.extraStrategies =
        session.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val node = AsOfJoinNode(leftPlan, rightPlan, keyName, timeName, payload.head,
      forward = effOp == "<=", toleranceUs = -1L,
      asofValue = AttributeReference("asof_value", valueType)())

    // the surrounding SELECT parses as ordinary SQL over a placeholder
    // relation, then the placeholder becomes the as-of node aliased by the
    // LEFT relation (its columns are the ones that survive the join)
    val outer = delegate.parsePlan(s"SELECT $proj FROM __graft_asof__ $rest")
    outer.transformUp {
      case u: UnresolvedRelation if u.multipartIdentifier == Seq("__graft_asof__") =>
        SubqueryAlias(la, node)
    }
  }
}
