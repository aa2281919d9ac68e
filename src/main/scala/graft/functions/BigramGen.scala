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
object BigramUtil {
  /** All word bigrams `"w[i] w[i+1]"` in order, duplicates kept; texts with
    * fewer than 2 words yield an empty array (the LM pipeline explodes
    * right after, so such docs simply contribute no transitions). Split
    * semantics are exactly `split(text, " ")` (Java regex split, limit -1:
    * trailing empty strings kept), matching DuckDB string_split. Because a
    * split token can never itself contain the separator, the bigram's
    * PREFIX word is recoverable downstream as
    * `substring_index(bigram, ' ', 1)` — no second pass over the text. */
  def bigrams(s: UTF8String): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length >= 2) {
      val out = new Array[AnyRef](words.length - 1)
      var i = 0
      while (i < words.length - 1) {
        val sb = new java.lang.StringBuilder(
          words(i).length + words(i + 1).length + 1)
        sb.append(words(i)).append(' ').append(words(i + 1))
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array.empty[AnyRef])
  }
}

/** Native word-bigram generator — value-identical to the declarative spec
  * `transform(sequence(1, n-1), i -> concat_ws(" ", w[i], w[i+1]))` over
  * `split(text, " ")`, which evaluates an interpreted lambda plus two
  * `element_at` probes per bigram. Same rationale as [[ShingleGen]]: the
  * generator is the first operation of the bigram-LM pipeline (q69), so
  * its per-element constant factor is the pipeline's floor.
  *
  * Null text yields null (the pipeline explodes immediately after, where
  * it vanishes — documents.text is non-null). */
case class BigramGen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "bigrams_gen"

  override def nullSafeEval(input: Any): Any =
    BigramUtil.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BigramUtil.bigrams($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BigramGen {
  def apply(text: Column): Column =
    Bridge.column(BigramGen(Bridge.expression(text)))
}
