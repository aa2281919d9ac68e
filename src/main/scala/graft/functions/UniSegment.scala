package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Greedy leftmost-longest-match segmenter over a fixed piece inventory —
  * the tokenizer-application primitive of the unigram-LM trainer
  * (SentencePiece's MaxMatch specialization of Viterbi; Kudo 2018).
  *
  * Matching contract (must stay value-identical to the recursive-CTE
  * oracle in TextAnalysis.sqlUniSeg): at each position try the LONGEST
  * inventory piece that prefixes the remainder, emit it, advance past
  * it; if NO piece matches (impossible on the training vocabulary, whose
  * every character is an inventory piece), segmentation of that word
  * STOPS — exactly the oracle's NULL-piece recursion exit.
  *
  * Scale shape: the inventory is MODEL state (≤ seed-K + alphabet
  * entries, each ≤ UniMaxPieceLen chars), compiled ONCE per plan into
  * per-length hash sets and shipped inside the serialized expression —
  * the broadcast-model shape. One O(len) pass per word with at most
  * maxLen probes per position; no joins, no shuffle, no per-step
  * remainder tables. Replaces the round-16 step-loop (one scheduled job
  * per consumed-piece step × three segmentation passes) with a single
  * narrow pass per segmentation. */
final class UniSegmenter private (
    maxLen: Int, byLen: Array[java.util.HashSet[String]])
    extends Serializable {

  /** Pieces of `word` in emission order; stops early on no-match. */
  def segment(text: UTF8String): ArrayData = {
    val s = text.toString
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Any](
      math.max(4, n / 2))
    var i = 0
    var dead = false
    while (i < n && !dead) {
      var k = math.min(maxLen, n - i)
      var matched: String = null
      while (k >= 1 && matched == null) {
        val cand = s.substring(i, i + k)
        if (byLen(k).contains(cand)) matched = cand
        k -= 1
      }
      if (matched == null) dead = true // oracle's NULL-piece exit
      else {
        out += UTF8String.fromString(matched)
        i += matched.length
      }
    }
    new GenericArrayData(out.toArray)
  }
}

object UniSegmenter {
  def build(pieces: Seq[String]): UniSegmenter = {
    require(pieces.nonEmpty, "uni_segment: empty piece inventory")
    require(pieces.forall(_.nonEmpty), "uni_segment: empty piece")
    val maxLen = pieces.map(_.length).max
    val byLen = Array.fill(maxLen + 1)(new java.util.HashSet[String]())
    pieces.foreach(p => { byLen(p.length).add(p); () })
    new UniSegmenter(maxLen, byLen)
  }
}

/** `uni_segment(word)` → `array<string>` of greedy leftmost-longest
  * pieces under the fixed inventory. Null input yields null. */
case class UniSegment(child: Expression, pieces: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  override def prettyName: String = "uni_segment"

  @transient private lazy val seg = UniSegmenter.build(pieces)

  override def nullSafeEval(input: Any): Any =
    seg.segment(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val segRef = ctx.addReferenceObj("seg", seg,
      classOf[UniSegmenter].getName)
    defineCodeGen(ctx, ev, c => s"$segRef.segment($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object UniSegment {
  def pieces(word: Column, inventory: Seq[String]): Column =
    Bridge.column(UniSegment(Bridge.expression(word), inventory))
}
