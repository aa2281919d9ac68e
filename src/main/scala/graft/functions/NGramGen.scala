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
object NGramUtil {
  /** All n-word grams in order, duplicates kept; docs shorter than n words
    * yield an EMPTY array (unlike [[ShingleUtil.shingles3]]'s whole-text
    * fallback: a span-level operator must not conjure a pseudo-span out of
    * a short doc — [[BigramGen]] follows the same convention). Split
    * semantics are exactly `split(text, " ")` (limit -1, trailing empties
    * kept), matching DuckDB string_split. */
  def ngrams(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    if (words.length >= n) {
      val out = new Array[AnyRef](words.length - n + 1)
      var i = 0
      while (i < words.length - n + 1) {
        var len = n - 1
        var j = 0
        while (j < n) { len += words(i + j).length; j += 1 }
        val sb = new java.lang.StringBuilder(len)
        sb.append(words(i))
        j = 1
        while (j < n) { sb.append(' ').append(words(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    } else new GenericArrayData(Array.empty[AnyRef])
  }
}

/** Native n-word gram generator — the width-parameterized sibling of
  * [[ShingleGen]] (n=3, whole-text fallback) and [[BigramGen]] (n=2), for
  * span-level operators that need wide windows (q82 uses n=8: one pass,
  * one split, one StringBuilder per gram, instead of an interpreted
  * `transform(sequence(...))` lambda with n `element_at` probes per gram).
  *
  * Null text yields null; the caller explodes immediately after, where it
  * vanishes (documents.text is non-null). */
case class NGramGen(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = s"ngrams${n}_gen"

  override def nullSafeEval(input: Any): Any =
    NGramUtil.ngrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramUtil.ngrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object NGramGen {
  def apply(text: Column, n: Int): Column =
    Bridge.column(NGramGen(Bridge.expression(text), n))
}
