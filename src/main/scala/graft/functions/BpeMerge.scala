package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One greedy left-to-right merge pass of the adjacent pair (a, b) over a
  * symbol array — the re-segmentation step of every BPE-family trainer
  * round (BPE q95/q135, WordPiece q162/q163; Sennrich et al. 2016,
  * Schuster & Nakajima 2012).
  *
  * Semantics contract (pinned by InvariantSpec's sequential reference):
  * scan positions left to right; where syms[i] == a and syms[i+1] == b,
  * emit the concatenation and advance 2, else emit syms[i] and advance 1.
  * For a == b this consumes even offsets within each maximal run — the
  * textbook greedy rule the previous relational form recovered with a
  * run-grouping prefix sum + min-pos-per-run + lag-skip window stack.
  *
  * Scale shape: the pair is MODEL state (two strings), shipped inside the
  * serialized expression; the merge is one O(len) in-row pass in
  * whole-stage codegen. The relational form it replaces posexploded the
  * vocabulary to per-position rows and ran THREE window functions
  * partitioned by word (prefix sum, run-min, lag) — a corpus-vocabulary
  * shuffle of position rows every training round. In-row evaluation
  * keeps each round's re-segmentation narrow: nothing shuffles until the
  * next round's pair-count aggregation, whose map side combines. */
final class BpeMerger private (a: UTF8String, b: UTF8String,
    ab: UTF8String) extends Serializable {

  def merge(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    val out = new scala.collection.mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      // Null elements never participate in a merge (a/b are non-null by
      // construction) and pass through unchanged — the trainer's arrays
      // are null-free, but an input typed containsNull = true must not
      // NPE in an executor.
      if (i + 1 < n && !syms.isNullAt(i) && !syms.isNullAt(i + 1) &&
          a.equals(syms.getUTF8String(i)) &&
          b.equals(syms.getUTF8String(i + 1))) {
        out += ab
        i += 2
      } else {
        out += (if (syms.isNullAt(i)) null
          else syms.getUTF8String(i).clone())
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object BpeMerger {
  def build(a: String, b: String): BpeMerger = {
    require(a.nonEmpty && b.nonEmpty, "bpe_merge_step: empty symbol")
    val ua = UTF8String.fromString(a)
    val ub = UTF8String.fromString(b)
    new BpeMerger(ua, ub, UTF8String.concat(ua, ub))
  }
}

/** `bpe_merge_step(syms)` → `array<string>` after one greedy merge of the
  * fixed pair (a, b). Null input yields null; elements are non-null by
  * construction (the trainer's vocabulary arrays). */
case class BpeMergeStep(child: Expression, a: String, b: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${t.catalogString}")
    }

  override def dataType: DataType = child.dataType match {
    // Null elements pass through the merge, so output nullability
    // mirrors the input's (false for the trainer's null-free arrays).
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = false)
  }

  override def prettyName: String = "bpe_merge_step"

  @transient private lazy val merger = BpeMerger.build(a, b)

  override def nullSafeEval(input: Any): Any =
    merger.merge(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("merger", merger,
      classOf[BpeMerger].getName)
    defineCodeGen(ctx, ev, c => s"$mRef.merge($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object BpeMergeStep {
  def merged(syms: Column, a: String, b: String): Column =
    Bridge.column(BpeMergeStep(Bridge.expression(syms), a, b))
}
