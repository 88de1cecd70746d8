package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) code over two dimension keys — the multi-dimensional
  * layout primitive behind the reference's Delta Z-ORDER BY (country,
  * event_date): sorting a fact table by the interleaved code co-locates
  * rows that are close in BOTH dimensions, so min/max row-group pruning
  * works for predicates on either one.
  *
  * Interleaves the low 31 bits of each input (62-bit code) with the
  * classic magic-mask spread — 5 shift/mask steps per operand, no loop,
  * fully inside whole-stage codegen. The same mask pipeline is emitted as
  * oracle SQL by [[MortonSql]] so both engines compute identical codes.
  */
case class Morton2(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "morton2"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Morton2.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |${ev.value} = graft.functions.Morton2.interleave($a, $b);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Morton2 {
  /** Spread the low 31 bits of x to even bit positions. */
  def spread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** a's bits at even positions, b's at odd. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)
}

/** Oracle-side Morton code: the SAME mask pipeline as SQL, generated from
  * one place so the engines cannot drift. */
object MortonSql {
  private def spreadSql(x: String): String = {
    // the exact mask chain from Morton2.spread, in decimal
    val s0 = s"(($x) & 2147483647)"
    val s1 = s"((($s0) | (($s0) << 16)) & 281470681808895)"
    val s2 = s"((($s1) | (($s1) << 8)) & 71777214294589695)"
    val s3 = s"((($s2) | (($s2) << 4)) & 1085102592571150095)"
    val s4 = s"((($s3) | (($s3) << 2)) & 3689348814741910323)"
    s"((($s4) | (($s4) << 1)) & 6148914691236517205)"
  }

  def morton2Sql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"
}
