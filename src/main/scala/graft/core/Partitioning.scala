package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partitioning strategies for the 100 TB path (SURVEY §4 physical
  * strategy): bucketed co-located joins and salting for skewed keys.
  * Local tests assert the plan shape (no Exchange under bucketing;
  * salted join ≡ plain join) — the same mechanics Spark uses on a
  * 1000-executor cluster.
  */
object Partitioning {

  /** Persist a table bucketed+sorted by its join key. Two tables
    * bucketed the same way join WITHOUT a shuffle (both sides already
    * hash-distributed); at 100 TB this turns every fact-fact join on
    * the bucket key into a local zipper. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Salted equi-join for skewed keys: the big side gets a
    * deterministic salt in [0, salts); the small side is replicated
    * `salts` times — hot keys spread over `salts` tasks instead of one
    * straggler. AQE's skew-join handles moderate skew automatically;
    * explicit salting is for the pathological keys AQE can't split
    * (single-key hot spots in the build side). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame = {
    val saltCol: Column = pmod(
      xxhash64(big.columns.map(col).toSeq: _*), lit(salts)).cast("int")
    val bigSalted = big.withColumn("__salt", saltCol)
    val smallReplicated = small
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    bigSalted.join(smallReplicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Two-stage aggregation for skewed group keys: partial aggregate on
    * (key, salt), then final aggregate on key — the map-side-combine
    * pattern made explicit for sum/count. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
