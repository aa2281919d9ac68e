package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared eval helper (interpreted and generated code call the same one). */
object ShingleUtil {
  /** All 3-word shingles in order, duplicates kept; docs shorter than 3
    * words shingle to the whole text. Split semantics are exactly
    * `split(text, " ")` (Java regex split, limit -1: trailing empty strings
    * kept), matching both the declarative spec and DuckDB string_split. */
  def shingles3(s: UTF8String): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length >= 3) {
      val out = new Array[AnyRef](words.length - 2)
      var i = 0
      while (i < words.length - 2) {
        val sb = new java.lang.StringBuilder(
          words(i).length + words(i + 1).length + words(i + 2).length + 2)
        sb.append(words(i)).append(' ').append(words(i + 1)).append(' ')
          .append(words(i + 2))
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array[AnyRef](s))
  }
}

/** Native 3-word shingle generator — value-identical to the declarative
  * spec `transform(sequence(1, n-2), i -> concat_ws(" ", w[i], w[i+1],
  * w[i+2]))` over `split(text, " ")` ([[graft.operators.Mirror
  * .shingleGenSpec]]), which evaluates an interpreted lambda plus three
  * `element_at` probes per shingle. This is the first operation of BOTH
  * signature dedup pipelines (q19 minhash, q37 inverted index), so the
  * per-shingle constant factor is their floor: one pass, one split, one
  * StringBuilder per shingle.
  *
  * Null text yields null (the spec yields [null]; the pipelines explode
  * immediately after, where both vanish — documents.text is non-null). */
case class ShingleGen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "shingles3_gen"

  override def nullSafeEval(input: Any): Any =
    ShingleUtil.shingles3(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleUtil.shingles3($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object ShingleGen {
  def apply(text: Column): Column =
    Bridge.column(ShingleGen(Bridge.expression(text)))
}
