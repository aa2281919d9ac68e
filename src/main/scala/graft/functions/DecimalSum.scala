package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` UDAF (the §2.10 user-defined-aggregate surface, empty
  * in the reference): order-independent double summation through exact
  * decimals.
  *
  * Why it exists as a UDAF and not just `Exact.dsum`: it demonstrates the
  * full custom-aggregation contract — typed zero/reduce/merge/finish with
  * an intermediate buffer type different from input and output — which is
  * what a user extends for aggregations Spark lacks (weighted quantiles,
  * custom sketches). The buffer is a java BigDecimal carried as
  * DECIMAL(38,18); merge order cannot change the result (decimal addition
  * is associative and exact), so the UDAF is deterministic under AQE
  * re-planning and speculative tasks — the property every custom
  * aggregation at 100 TB must have, here made structural.
  *
  * `finish` rounds the exact decimal to double once (half-even), matching
  * `CAST(DECIMAL AS DOUBLE)` in both Spark and DuckDB — so the oracle
  * mirror is `CAST(SUM(CAST(x AS DECIMAL(30,2))) AS DOUBLE)`.
  *
  * Input column must be NON-NULL: the primitive Double encoder surfaces a
  * null as 0.0 (counted into the sum), whereas built-in `sum` skips nulls.
  * For nullable data, pre-filter or coalesce explicitly — silent 0.0
  * would be a correctness trap, so make the choice visible in the query.
  */
object DecimalSum extends Aggregator[Double, JBigDecimal, Double] {

  override def zero: JBigDecimal = JBigDecimal.ZERO

  override def reduce(b: JBigDecimal, a: Double): JBigDecimal =
    // valueOf uses the shortest decimal representation — exact for data
    // that is decimal to begin with (prices, 2-dp rates); setScale is then
    // a no-op and the sum is exact
    b.add(JBigDecimal.valueOf(a).setScale(2, RoundingMode.HALF_UP))

  override def merge(b1: JBigDecimal, b2: JBigDecimal): JBigDecimal =
    b1.add(b2)

  override def finish(reduction: JBigDecimal): Double =
    reduction.doubleValue

  override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
