package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval helper (interpreted and generated code call the same one). */
object SimHashUtil {
  /** 60-bit frequency-weighted SimHash over whitespace words: per word,
    * the md5-derived 60-bit hash votes ±1 on each bit; a signature bit is
    * set where the vote total is positive. Split semantics are exactly
    * `split(text, " ")` (limit -1, empties kept) and the word hash is
    * [[HashUtil.md5Hash60]] — value-identical to the exploded
    * vote-aggregation spec and its DuckDB mirror (integer votes are
    * order-independent, so collapsing the aggregation loses nothing). */
  def simhash60(s: UTF8String): Long = {
    val words = s.toString.split(" ", -1)
    val votes = new Array[Int](60)
    var i = 0
    while (i < words.length) {
      val h = HashUtil.md5Hash60(UTF8String.fromString(words(i)))
      var bit = 0
      while (bit < 60) {
        votes(bit) += (if (((h >> bit) & 1L) == 1L) 1 else -1)
        bit += 1
      }
      i += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 60) {
      if (votes(bit) > 0) sig |= 1L << bit
      bit += 1
    }
    sig
  }
}

/** Native 60-bit SimHash signature. The declarative form (explode words →
  * hash → 60 vote columns → sign reduction) costs an explode, a broadcast
  * dictionary join, and a 60-aggregate groupBy — one full shuffle of the
  * word rows. As a scalar expression the signature is a NARROW MAP: no
  * explode, no shuffle, embarrassingly parallel at 100 TB, with the rest
  * of the q21 pigeonhole pipeline unchanged. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash60"

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.simhash60(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashUtil.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SimHash60 {
  def apply(text: Column): Column =
    Bridge.column(SimHash60(Bridge.expression(text)))
}
