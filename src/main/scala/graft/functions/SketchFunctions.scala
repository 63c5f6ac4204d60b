package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge.{toColumn, toExpression}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.xxhash64

/** Column wrappers for Spark's Bloom-filter sketch expressions.
  *
  * `BloomFilterAggregate` / `BloomFilterMightContain` are the engine's
  * own runtime-filter machinery (injected by the `InjectRuntimeFilter`
  * rule for row-group pruning) but are NOT registered in the public
  * function registry, so `expr("bloom_filter_agg(...)")` fails to
  * resolve. These wrappers expose them through the Column API — the
  * same [[org.apache.spark.sql.GraftBridge]] path as `cosine_sim`.
  *
  * Scale semantics: the aggregate is order-independent (bit OR), the
  * probe has NO false negatives, and the sketch size is fixed at
  * build time — a corpus-fingerprint sketch stays broadcastable no
  * matter the corpus size, which is what makes the Bloom-prefiltered
  * incremental dedup (x29) viable at 100 TB.
  */
object SketchFunctions {

  /** Order-independent Bloom sketch over `xxhash64(c)` — aggregate
    * column (binary). */
  def bloomFilterAgg(c: Column, expectedItems: Long, numBits: Long): Column =
    toColumn(new BloomFilterAggregate(
      toExpression(xxhash64(c)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe against a [[bloomFilterAgg]] sketch: false ⇒
    * definitely absent; true ⇒ candidate (verify exactly). */
  def mightContain(bloom: Column, c: Column): Column =
    toColumn(BloomFilterMightContain(
      toExpression(bloom), toExpression(xxhash64(c))))
}
