package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native codegen'd set-intersection count over two SORTED string arrays —
  * the exact-verification inner loop of every text near-dup operator.
  *
  * The composed form (`size(filter(a, t -> array_contains(b, t)))`) is an
  * O(|a|·|b|) interpreted HOF scan per candidate pair; this expression is
  * an O(|a|+|b|) two-pointer merge inside whole-stage codegen. Inputs must
  * be distinct-and-sorted (Spark's `array_sort` on strings uses the same
  * binary UTF8 ordering the merge compares with); build them once per
  * document with `array_sort(array_distinct(...))`, not per pair.
  * Elements must be non-null (split() output always is).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var cnt = 0L
    while (i < n && j < m) {
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |int ${ev.value}_n = $a.numElements();
         |int ${ev.value}_m = $b.numElements();
         |int ${ev.value}_i = 0; int ${ev.value}_j = 0;
         |long ${ev.value}_cnt = 0L;
         |while (${ev.value}_i < ${ev.value}_n && ${ev.value}_j < ${ev.value}_m) {
         |  int ${ev.value}_c = $a.getUTF8String(${ev.value}_i)
         |      .compareTo($b.getUTF8String(${ev.value}_j));
         |  if (${ev.value}_c == 0) { ${ev.value}_cnt++; ${ev.value}_i++; ${ev.value}_j++; }
         |  else if (${ev.value}_c < 0) ${ev.value}_i++;
         |  else ${ev.value}_j++;
         |}
         |${ev.value} = ${ev.value}_cnt;
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
