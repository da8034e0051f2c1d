package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Unicode NFC normalization kernel — the canonical-composition step of text
 * normalization (TiFlink's string surface delegates to Flink's UTF-8 string
 * type; an LLM-data pipeline additionally needs canonical equivalence so
 * "é" composed and "e"+combining-acute dedupe/fingerprint identically).
 *
 * Scale posture: a 100 TB corpus is overwhelmingly ASCII or already-NFC, so
 * the kernel is allocation-free on the fast paths — ASCII is detected with
 * one byte scan (ASCII is closed under NFC), and already-normalized non-ASCII
 * returns the input UTF8String untouched (`Normalizer.isNormalized` is a
 * quick-check that rarely materializes). Only strings that actually need
 * recomposition pay the String round-trip.
 */
object Normalize {

  /** NFC-normalize a UTF8String; returns the input object unchanged when the
    * text is ASCII or already in NFC. Static-callable from codegen. */
  def nfc(s: UTF8String): UTF8String = {
    val base = s.getBaseObject; val off = s.getBaseOffset; val nb = s.numBytes
    var i = 0
    var ascii = true
    while (ascii && i < nb) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

/** `nfc_normalize(string)` — codegen'd Catalyst expression (one static call,
  * stays inside whole-stage codegen; same pattern as [[TextHashExpression]]). */
case class NfcNormalize(child: Expression) extends TextHashExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"
  override protected def evalKernel(s: UTF8String): Any = Normalize.nfc(s)
  override protected def staticCall(c: String): String =
    s"graft.functions.Normalize.nfc($c)"
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

/** Column API. */
object NormalizeFunctions {
  import GraftColumnBridge.{column => col2, expression => expr2}
  def nfcNormalize(c: Column): Column = col2(NfcNormalize(expr2(c)))
}
