package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval helper (interpreted and generated code call the same one). */
object PhashUtil {

  /** 16-bit block-mean perceptual hash over the payload bytes: the value
    * is split into 16 equal byte ranges (`lo_j = (j·L) >> 4`), bit j is
    * set iff block j's byte-sum mean exceeds the whole-payload mean
    * (integer cross-multiplication, no division). Value-identical to the
    * declarative `ascii(substr(text, i, 1))` block-fold spec and its
    * DuckDB mirror on ASCII payloads (documents are ASCII — the q31/q32
    * char==byte precedent). */
  def phash16(s: UTF8String): Long = {
    val b = s.getBytes
    val L = b.length.toLong
    if (L == 0L) return 0L
    val bs = new Array[Long](16)
    var j = 0
    var tot = 0L
    while (j < 16) {
      val lo = ((j * L) >> 4).toInt
      val hi = (((j + 1) * L) >> 4).toInt
      var i = lo
      var sum = 0L
      while (i < hi) { sum += (b(i) & 0xff); i += 1 }
      bs(j) = sum
      tot += sum
      j += 1
    }
    var sig = 0L
    j = 0
    while (j < 16) {
      val blen = ((j + 1) * L >> 4) - (j * L >> 4)
      if (bs(j) * L > tot * blen) sig |= 1L << j
      j += 1
    }
    sig
  }
}

/** Native 16-bit block-mean perceptual hash. The declarative form (a
  * 16-element array of per-block `aggregate` folds, each probing chars via
  * `substr`) evaluates an interpreted lambda + a UTF8String slice per BYTE
  * — measured 1.9 s at sf0.1 where this one-pass byte scan is the scan
  * cost itself. A NARROW MAP: no explode, no shuffle, embarrassingly
  * parallel at 100 TB. */
case class Phash16(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "phash16"

  override def nullSafeEval(input: Any): Any =
    PhashUtil.phash16(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PhashUtil.phash16($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object Phash16 {
  def apply(text: Column): Column =
    Bridge.column(Phash16(Bridge.expression(text)))
}
