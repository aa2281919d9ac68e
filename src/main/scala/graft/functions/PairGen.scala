package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StructField, StructType}

/** Shared eval helper (interpreted and generated code call the same one). */
object PairUtil {
  /** All index-ordered pairs (i < j) of an array as (a, b) structs —
    * order-preserving, duplicates kept, n·(n−1)/2 rows. */
  def pairs(arr: ArrayData, elemType: DataType): ArrayData = {
    val n = arr.numElements()
    // Long arithmetic: n >= 46341 overflows Int (n·(n−1)/2 > 2^31), and
    // pairs_gen is a generic SQL function — nothing upstream bounds n.
    val count = n.toLong * (n - 1) / 2
    if (count > Int.MaxValue) throw new IllegalArgumentException(
      s"pairs_gen: array of $n elements expands to $count pairs, " +
        "exceeding the maximum JVM array size; cap or pre-slice the input")
    val out = new Array[AnyRef](count.toInt)
    var k = 0
    var i = 0
    while (i < n) {
      val a = arr.get(i, elemType)
      var j = i + 1
      while (j < n) {
        out(k) = new GenericInternalRow(Array[Any](a, arr.get(j, elemType)))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Native unordered-pair generator — value-identical to the declarative
  * form `flatten(transform(ids, (x, i) -> transform(slice(ids, i + 2,
  * size(ids)), y -> struct(x AS a, y AS b))))` ([[graft.operators.Mirror
  * .pairsSpec]]), which evaluates two nested interpreted lambdas plus a
  * `slice` copy per element. The pair expansion is the hot inner step of
  * q79's co-occurrence mining (up to n²/2 structs per document) and of
  * the capped LSH bucket enumeration behind the PairCache artifact
  * ([[graft.operators.Buckets]]), so its per-pair constant factor is
  * their floor: one flat pass, one 2-slot row per pair, no slicing.
  *
  * Generic over the element type (words: string, bucket members: bigint);
  * null array yields null. */
case class PairGen(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: ArrayType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array argument, got ${t.catalogString}")
    }

  private lazy val elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  private lazy val elemNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("a", elemType, elemNullable),
      StructField("b", elemType, elemNullable))),
    containsNull = false)

  override def prettyName: String = "pairs_gen"

  override def nullSafeEval(input: Any): Any =
    PairUtil.pairs(input.asInstanceOf[ArrayData], elemType)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val et = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    defineCodeGen(ctx, ev, c => s"graft.functions.PairUtil.pairs($c, $et)")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

object PairGen {
  def apply(ids: Column): Column =
    Bridge.column(PairGen(Bridge.expression(ids)))
}
