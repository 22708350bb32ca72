package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the first text-cleaning step of every
  * multilingual training pipeline (combining sequences like
  * `e + U+0301` fold to the composed `é`, so dedup/fingerprint hashes
  * agree across producers that emit different-but-canonically-equal
  * byte sequences). Spark has no built-in; this wraps the JVM's
  * `java.text.Normalizer` as a native Catalyst expression so the SQL
  * path (`nfc_normalize(...)` via GraftExtensions) and the Column API
  * share one implementation. DuckDB's `nfc_normalize` is the oracle
  * twin — both implement UAX #15, so outputs are byte-identical.
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    // fast path: already-NFC strings (the overwhelming majority in a
    // real corpus) skip the rebuild entirely
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) input
    else UTF8String.fromString(Normalizer.normalize(s, Normalizer.Form.NFC))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcFunctions {
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
