package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Digest helpers shared by interpreted eval and generated code. */
object HashUtil {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 15 hex chars of md5 as a long — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` (and the DuckDB
    * `CAST(concat('0x', substr(md5(e), 1, 15)) AS BIGINT)` mirror) but
    * without materializing the hex string: bytes 0..6 contribute 8 hex
    * digits... byte i contributes bits, and the 15th hex char is the high
    * nibble of byte 7. */
  def md5Hash60(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    (acc << 4) | ((digest(7) & 0xf0L) >> 4)
  }

  /** Hex chars 16..30 of md5 as a long (the back half, mirroring
    * `substr(md5(e), 16, 15)`): the low nibble of byte 7 followed by bytes
    * 8..14 in full (byte i covers hex chars 2i+1 and 2i+2). */
  def md5Hash60b(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val digest = d.digest(s.getBytes)
    var acc = digest(7) & 0x0fL
    var i = 8
    while (i < 15) { acc = (acc << 8) | (digest(i) & 0xffL); i += 1 }
    acc
  }
}

/** Native 60-bit md5 prefix hash: value-identical to
  * `conv(substring(md5(s), 1, 15), 16, 10).cast(long)` (`front = true`) or
  * the 16..30 hex window (`front = false`), skipping the hex-string
  * materialization and base-16 reparse — the digest goes straight to a
  * long inside whole-stage codegen. This is the hash on every shingle/word
  * row of the dedup signature pipelines, so constant-factor cost here is
  * the pipelines' floor. */
case class Md5Hash60(child: Expression, front: Boolean)
    extends UnaryExpression {

  // SQL-exposed via GraftExtensions: reject non-string inputs at analysis
  // time instead of a raw ClassCastException at execution
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String =
    if (front) "md5_hash60" else "md5_hash60b"

  override def nullSafeEval(input: Any): Any =
    if (front) HashUtil.md5Hash60(input.asInstanceOf[UTF8String])
    else HashUtil.md5Hash60b(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val fn = if (front) "md5Hash60" else "md5Hash60b"
    defineCodeGen(ctx, ev, c => s"graft.functions.HashUtil.$fn($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object Md5Hash60 {
  def front(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c), front = true))
  def back(c: Column): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c), front = false))
}
