package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_len(str)` — the deflate-compressed byte length of a string's
  * UTF-8 bytes, inside whole-stage codegen. The compression-ratio quality
  * screen ([[graft.text.CompressRatio]]) is then a pure columnar
  * projection instead of a `mapPartitions` round-trip through the row
  * encoder: the plan keeps its codegen span, column pruning, and any
  * pushed filters around the scoring stage.
  *
  * Resource shape: codegen holds ONE Deflater + one scratch buffer per
  * operator instance (mutable state, reset per row — allocation is the
  * expensive part of java.util.zip); the interpreted path uses a
  * thread-local pair. Level is fixed (6) so lengths are stable for a
  * given zlib, which is all the rows-only contract needs.
  */
case class DeflateLen(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compressedLength(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val deflater = ctx.addMutableState("java.util.zip.Deflater", "graftDeflater",
      v => s"$v = new java.util.zip.Deflater(${DeflateLen.Level});")
    val buf = ctx.addMutableState("byte[]", "graftDeflateBuf",
      v => s"$v = new byte[${DeflateLen.BufBytes}];")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |byte[] ${ev.value}_in = $c.getBytes();
         |$deflater.reset();
         |$deflater.setInput(${ev.value}_in);
         |$deflater.finish();
         |long ${ev.value}_n = 0L;
         |while (!$deflater.finished()) {
         |  ${ev.value}_n += $deflater.deflate($buf);
         |}
         |${ev.value} = ${ev.value}_n;
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DeflateLen {
  val Level = 6
  val BufBytes = 64 * 1024

  private val local =
    ThreadLocal.withInitial[(java.util.zip.Deflater, Array[Byte])](() =>
      (new java.util.zip.Deflater(Level), new Array[Byte](BufBytes)))

  /** Interpreted-path twin of the generated loop. */
  def compressedLength(s: UTF8String): Long = {
    val (deflater, buf) = local.get()
    val bytes = s.getBytes
    deflater.reset()
    deflater.setInput(bytes)
    deflater.finish()
    var n = 0L
    while (!deflater.finished()) n += deflater.deflate(buf)
    n
  }
}
