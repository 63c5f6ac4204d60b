package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{Partitioning, Tables}

/** Plan-shape tests for the scale strategies: bucketed joins must not
  * shuffle; salted join/agg must be result-identical to the plain
  * forms. */
class PartitioningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  test("bucketed tables join without Exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    Partitioning.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice"),
      "b_orders", "o_orderkey", 8)
    Partitioning.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 8)
    // force the shuffle-join path (at test size the planner would
    // broadcast, which bypasses bucketing entirely)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sf).count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("bucketed fingerprint store makes incremental dedup shuffle-free") {
    // substantiates the x22/x29 scale claim: with the corpus
    // fingerprint table bucketed by fp, the per-batch LEFT ANTI probe
    // needs no Exchange on the corpus side (the incoming batch hashes
    // into the corpus's existing bucketing)
    spark.sql("DROP TABLE IF EXISTS b_fps")
    spark.sql("DROP TABLE IF EXISTS b_batch")
    val docs = Tables.documents(spark, sf)
      .select(graft.text.TextFunctions.fingerprint(col("text")).as("fp"))
      .distinct()
    Partitioning.writeBucketed(docs, "b_fps", "fp", 8)
    Partitioning.writeBucketed(
      Tables.documents(spark, sf).select(col("doc_id"),
        graft.text.TextFunctions.fingerprint(col("text")).as("fp")),
      "b_batch", "fp", 8)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val anti = spark.table("b_batch")
        .join(spark.table("b_fps"), Seq("fp"), "left_anti")
      val plan = anti.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed anti-join should not shuffle:\n$plan")
      // every batch fp exists in the corpus store here → empty result
      assert(anti.count() == 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedJoin equals plain join") {
    val li = Tables.lineitem(spark, sf)
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .select("o_orderkey", "l_quantity")
    val o = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
    val plain = li.join(o, Seq("o_orderkey")).groupBy("o_orderpriority").count()
    val salted = Partitioning.saltedJoin(li, o, "o_orderkey", 4)
      .groupBy("o_orderpriority").count()
    val diff = plain.as("a").join(salted.as("b"), Seq("o_orderpriority"))
      .filter(col("a.count") =!= col("b.count")).count()
    assert(diff == 0)
    assert(plain.count() == salted.count())
  }

  test("saltedSumCount equals plain aggregation") {
    val li = Tables.lineitem(spark, sf)
    val plain = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"), count(lit(1)).as("c"))
    val salted = Partitioning.saltedSumCount(
      li.withColumn("l_quantity", col("l_quantity").cast("decimal(18,2)")),
      "l_returnflag", "l_quantity", 4)
    val joined = plain.as("a").join(salted.as("b"), Seq("l_returnflag"))
    assert(joined.filter(col("a.s") =!= col("b.sum_l_quantity")).count() == 0)
    assert(joined.filter(col("a.c") =!= col("b.cnt")).count() == 0)
  }
}
