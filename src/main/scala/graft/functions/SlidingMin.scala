package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sliding-window minimum over a long array — the selection step of
  * winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003): out[i] =
  * min(a[i..i+w-1]) for every full window, in ONE monotonic-deque pass.
  *
  * Replaces the HOF form `transform(sequence(1, n-w+1), i ->
  * array_min(slice(a, i, w)))`, which allocates a w-element array per
  * position and rescans it — O(n·w) with per-window garbage. The deque
  * pass is O(n) amortized with a single output allocation, and the
  * emitted values are bit-identical (the minimum of the same longs), so
  * the DuckDB oracle replay is untouched.
  *
  * Contract: requires 1 ≤ w and n ≥ w (callers guard the short-array
  * case before selection, exactly as the oracle's CASE does); elements
  * must be non-null (they are hash60 outputs by construction). */
final class SlidingMinPass(w: Int) extends Serializable {
  require(w >= 1, "sliding_min: window must be >= 1")

  def mins(a: ArrayData): ArrayData = {
    val n = a.numElements()
    val m = n - w + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](m)
    // deque of indices with increasing values; head = current window min
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      // getLong on a null slot silently reads 0 and would fake a minimum;
      // fail loudly instead (array_min, which this replaces, IGNORES
      // nulls — neither silent behavior is acceptable here).
      if (a.isNullAt(i)) throw new IllegalArgumentException(
        s"sliding_min: null element at position $i (elements must be " +
          "non-null; winnowing feeds hash60 outputs)")
      val v = a.getLong(i)
      while (tail > head && a.getLong(dq(tail - 1)) >= v) tail -= 1
      dq(tail) = i
      tail += 1
      if (dq(head) <= i - w) head += 1
      if (i >= w - 1) out(i - w + 1) = a.getLong(dq(head))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** `sliding_min(arr)` → `array<long>` of the fixed-width window minima.
  * Null input yields null. */
case class SlidingMin(child: Expression, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sliding_min"

  @transient private lazy val pass = new SlidingMinPass(w)

  override def nullSafeEval(input: Any): Any =
    pass.mins(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("pass", pass,
      classOf[SlidingMinPass].getName)
    defineCodeGen(ctx, ev, c => s"$pRef.mins($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object SlidingMin {
  def mins(arr: Column, w: Int): Column =
    Bridge.column(SlidingMin(Bridge.expression(arr), w))
}
