package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, DataTypes}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native codegen'd expression — the text
  * canonicalization stage of corpus cleaning (decomposed accents, width
  * variants and legacy encodings make byte-identical dedup and tokenizer
  * vocabularies miss equal strings; crawls mix composed and decomposed
  * forms freely). Spark has no normalization builtin; a Scala UDF would
  * break whole-stage codegen, so this follows the TextHashExpressions
  * pattern: one static helper invoked from both `eval` and generated code.
  */
object TextNormalize {
  /** NFC-normalize. Fast path: `Normalizer.isNormalized` is a cheap scan
    * (quick-check properties) and virtually all real text — all of ASCII
    * — is already NFC, so the common case returns the input UTF8String
    * without allocating a java.lang.String round-trip. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(str)` — Unicode canonical composition (NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DataTypes.StringType
  override protected def withNewChildInternal(c: Expression): NfcNormalize = copy(child = c)
  override def nullSafeEval(s: Any): Any =
    TextNormalize.nfc(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextNormalize.nfc($s);")
}

object NormalizeExpressions {
  def nfc_normalize(str: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(str)))
}
