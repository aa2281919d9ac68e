package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled Aho–Corasick automaton over a fixed pattern set: one pass per
  * document counts the LEFTMOST NON-OVERLAPPING occurrences of EVERY
  * pattern at once — O(chars + matches) regardless of how many patterns
  * the blocklist holds, vs O(chars × patterns) for per-pattern scanning.
  *
  * Count semantics per pattern are exactly the `replace` count —
  * `(length(text) - length(replace(text, p, ''))) / length(p)` — i.e. a
  * greedy left-to-right scan that skips the matched span before looking
  * for the next occurrence of the SAME pattern. Distinct patterns count
  * independently on the ORIGINAL text (a char may contribute to matches
  * of several patterns). That keeps the semantics SQL-expressible so the
  * DuckDB oracle can grade it without position enumeration.
  *
  * Goto/fail construction is the textbook BFS; the goto function is
  * completed during the BFS (a "next" table), so the scan never walks
  * fail chains for transitions. Characters that appear in no pattern
  * reset to the root via a shared alphabet lookup. Output lists are
  * merged into each node at build time (out(n) = own(n) ++ out(fail(n))),
  * so emitting matches is a plain array walk.
  *
  * The automaton is built ONCE per plan from the literal pattern set and
  * shipped inside the serialized expression — at 100 TB this is the
  * broadcast-model shape: O(total pattern chars) state against a single
  * narrow pass over the corpus, no shuffle, no join.
  *
  * Matching operates on UTF-16 units (the JVM string model), which
  * equals codepoint semantics for BMP text — all driver corpora and any
  * practical blocklist. Patterns containing supplementary-plane
  * characters still match correctly (pattern and text decompose into
  * the same surrogate sequences); only the `replace`-count SPEC's
  * `length(p)` divisor would disagree there, so keep oracle-graded
  * blocklists in the BMP.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    charIdx: Array[Int], // 65536-entry char → alphabet index, -1 = reset
    next: Array[Array[Int]], // complete goto: next(node)(alphaIdx)
    outs: Array[Array[Int]], // pattern ids ending at node (fail-merged)
    patLen: Array[Int]) extends Serializable {

  /** Per-pattern leftmost non-overlapping occurrence counts, aligned with
    * `patterns`. One pass over the text. */
  def counts(text: UTF8String): ArrayData = {
    val s = text.toString
    val nPat = patterns.length
    val cnt = new Array[Long](nPat)
    val lastEnd = new Array[Int](nPat)
    java.util.Arrays.fill(lastEnd, -1)
    var state = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      val a = charIdx(c)
      state = if (a < 0) 0 else next(state)(a)
      val out = outs(state)
      var k = 0
      while (k < out.length) {
        val pid = out(k)
        val start = i - patLen(pid) + 1
        if (start > lastEnd(pid)) { cnt(pid) += 1; lastEnd(pid) = i }
        k += 1
      }
      i += 1
    }
    new GenericArrayData(cnt)
  }
}

object AhoCorasick {
  private val EmptyOut = Array.empty[Int]

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty, "multi_match: empty pattern set")
    require(patterns.forall(_.nonEmpty), "multi_match: empty pattern")
    require(patterns.distinct.length == patterns.length,
      "multi_match: duplicate pattern")
    val pats = patterns.toArray
    // compact alphabet over the chars the patterns actually use
    val charIdx = Array.fill(Char.MaxValue + 1)(-1)
    var nAlpha = 0
    pats.foreach(_.foreach { c =>
      if (charIdx(c) < 0) { charIdx(c) = nAlpha; nAlpha += 1 }
    })
    // trie
    val children = scala.collection.mutable.ArrayBuffer(
      Array.fill(nAlpha)(-1))
    val own = scala.collection.mutable.ArrayBuffer(List.empty[Int])
    pats.zipWithIndex.foreach { case (p, pid) =>
      var node = 0
      p.foreach { c =>
        val a = charIdx(c)
        if (children(node)(a) < 0) {
          children(node)(a) = children.length
          children += Array.fill(nAlpha)(-1)
          own += Nil
        }
        node = children(node)(a)
      }
      own(node) = pid :: own(node)
    }
    val nNodes = children.length
    val fail = new Array[Int](nNodes)
    val outs = new Array[Array[Int]](nNodes)
    // BFS: complete the goto table in place and merge fail outputs
    val queue = new java.util.ArrayDeque[Integer]()
    var a = 0
    while (a < nAlpha) {
      val c = children(0)(a)
      if (c < 0) children(0)(a) = 0
      else { fail(c) = 0; queue.add(c) }
      a += 1
    }
    outs(0) = if (own(0).isEmpty) EmptyOut else own(0).toArray
    while (!queue.isEmpty) {
      val u = queue.poll().intValue()
      val merged = own(u).reverse ++ outs(fail(u)).toList
      outs(u) = if (merged.isEmpty) EmptyOut else merged.toArray
      var b = 0
      while (b < nAlpha) {
        val v = children(u)(b)
        if (v < 0) children(u)(b) = children(fail(u))(b)
        else { fail(v) = children(fail(u))(b); queue.add(v) }
        b += 1
      }
    }
    new AhoCorasick(pats, charIdx, children.toArray, outs,
      pats.map(_.length))
  }
}

/** Native multi-pattern blocklist counter: `multi_match(text)` over a
  * fixed pattern set → `array<long>` of per-pattern counts aligned with
  * the pattern order. Value-identical to the per-pattern `replace`-count
  * spec ([[graft.operators.Mirror.multiMatchSpec]]) but a single
  * automaton pass instead of one full `replace` scan per pattern.
  *
  * Null text yields null (documents.text is non-null in the pipelines).
  */
case class MultiMatch(child: Expression, patterns: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string argument, got ${t.catalogString}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "multi_match"

  @transient private lazy val ac = AhoCorasick.build(patterns)

  override def nullSafeEval(input: Any): Any =
    ac.counts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("ac", ac,
      classOf[AhoCorasick].getName)
    defineCodeGen(ctx, ev, c => s"$acRef.counts($c)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object MultiMatch {
  def counts(text: Column, patterns: Seq[String]): Column =
    Bridge.column(MultiMatch(Bridge.expression(text), patterns))
}
