package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(str)` — Unicode NFC canonical normalization inside
  * whole-stage codegen: the first transform of every text-cleaning
  * pipeline (é as one codepoint vs e + combining acute are the SAME text
  * to dedup/tokenize/hash stages, so they must byte-agree before any
  * hash-grain operator sees them). Spark ships no normalization builtin;
  * a Scala UDF would break the codegen span around the scan — this stays
  * columnar.
  *
  * Fast paths, in order: pure-ASCII input returns the ORIGINAL UTF8String
  * (no decode, no allocation — the overwhelmingly common case scans bytes
  * once); already-normalized non-ASCII returns the original after the
  * quick-check (Normalizer.isNormalized, no rewrite); only truly
  * denormalized strings pay the normalize + re-encode. NFC is the
  * Unicode-normative algorithm, so the result matches any conformant
  * engine (the DuckDB oracle's nfc_normalize) byte for byte.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Shared by the interpreted and generated paths (a static call keeps
    * the generated code a one-liner; the JIT inlines it). */
  def normalize(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) < 0) {
        // non-ASCII: decode once, quick-check, rewrite only if needed
        val str = s.toString
        return if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
        else UTF8String.fromString(
          java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
      }
      i += 1
    }
    s // pure ASCII is NFC by construction
  }
}
