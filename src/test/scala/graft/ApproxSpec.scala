package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.{col, lit, percentile_approx, approx_count_distinct}

/** Sketch twins (the 100 TB path) are bound-checked against their
  * exact counterparts, not hash-matched: sketch internals are
  * engine-specific, so the DuckDB oracle can't replay them — the
  * CONTRACT is the published error bound, and that is what these
  * tests pin.
  */
class ApproxSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("a20b approx percentiles land within the sketch's rank-error bound") {
    val exact = graft.queries.Aggregations.a20Percentiles(spark, sf)
      .collect().map(r => r.getString(0) -> Seq(1, 2, 3).map(r.getDouble)).toMap
    // raw sketch outputs (the a20b carrier now folds them into its
    // within_bound boolean — this pins the sketch itself, independently)
    val approx = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(
        percentile_approx(col("o_totalprice"), lit(0.25), lit(10000)).as("p25"),
        percentile_approx(col("o_totalprice"), lit(0.5), lit(10000)).as("p50"),
        percentile_approx(col("o_totalprice"), lit(0.75), lit(10000)).as("p75"))
      .orderBy(col("o_orderstatus"))
      .collect()
    assert(approx.nonEmpty)
    // accuracy=10000 ⇒ the sketch returns a value whose RANK is within
    // n/10000 of the target rank. Convert to a value bound per group by
    // allowing the quantile to wander ±1 percentile point of rank —
    // far looser than 1/10000, so a real sketch regression still trips it.
    approx.foreach { r =>
      val status = r.getString(0)
      val groupVals = graft.core.Tables.orders(spark, sf)
        .filter(col("o_orderstatus") === status)
        .select(col("o_totalprice").cast("double"))
        .collect().map(_.getDouble(0)).sorted
      val n = groupVals.length
      Seq((1, 0.25), (2, 0.5), (3, 0.75)).foreach { case (i, q) =>
        val got = r.getDouble(i)
        val lo = groupVals(math.max(0, math.ceil((q - 0.01) * n).toInt - 1))
        val hi = groupVals(math.min(n - 1, math.ceil((q + 0.01) * n).toInt - 1))
        assert(got >= lo && got <= hi,
          s"$status p$q=$got outside rank band [$lo, $hi]")
      }
      // exact twin agrees on the group keys
      assert(exact.contains(status))
    }
  }

  test("a20b HLL distinct-count is within the published 5% standard error") {
    val exact = graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("o_custkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    graft.core.Tables.orders(spark, sf)
      .groupBy(col("o_orderstatus"))
      .agg(approx_count_distinct(col("o_custkey")).as("clientes_aprox"))
      .collect().foreach { r =>
        val (status, approx) = (r.getString(0), r.getLong(1))
        val ex = exact(status).toDouble
        // default rsd = 0.05; allow 4 standard errors
        assert(math.abs(approx - ex) <= math.max(4 * 0.05 * ex, 2.0),
          s"$status: approx $approx vs exact $ex")
      }
  }

  test("a20b carrier reports within_bound = true for every group") {
    val rows = graft.queries.Aggregations.a20bPercentilesApprox(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getBoolean(5),
      s"${r.getString(0)}: sketch outside its published bound"))
  }

  test("Profiler approx mode stays within HLL error of the exact profile") {
    val df = graft.core.Tables.orders(spark, sf)
    val exact = graft.profiling.Profiler.profile(df, exact = true)
      .map(p => p.name -> p.distinct).toMap
    graft.profiling.Profiler.profile(df, exact = false).foreach { p =>
      val ex = exact(p.name).toDouble
      assert(math.abs(p.distinct - ex) <= math.max(4 * 0.05 * ex, 2.0),
        s"${p.name}: approx ${p.distinct} vs exact $ex")
    }
  }
}
