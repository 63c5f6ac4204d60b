package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (test scope, not part of the library): builds a ~5× scale
  * fixture from the read-only sf0.1 testdata by unioning key-shifted
  * copies of the FACT tables (dims stay single-copy, like TPC-H's
  * fixed-small dims relative to facts at higher SF). Used for the
  * sf-scaling smoke: run Bench against the output dir and check no
  * headline query degrades superlinearly vs sf0.1 — catches
  * driver-side bottlenecks a 600k-row bench can't.
  *
  * Key offsets keep ids unique per copy; `doc_id` shifts by
  * 10,000,000 — a multiple of the dedup-corpus selector's modulus
  * (`doc_id % 1000000 < 200` still picks 200 docs per copy) that
  * cannot collide with corpusWithDupes' synthetic +1M/+2M duplicate
  * ids (a 1M shift would alias copy k's base docs with copy k-1's
  * synthetic near-dups, corrupting the scaled dedup corpus).
  *
  *   sbt "Test/runMain graft.ScaleFixture [outDir] [copies]"
  */
object ScaleFixture {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("target/sfscale")
    val copies = if (args.length > 1) args(1).toInt else 5
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-scale-fixture")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    // dims: single copy
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => write(read(t), t))

    // facts: key-shifted copies, original column types preserved
    def scaled(name: String, keyOffsets: Map[String, Long]): DataFrame = {
      val df = read(name)
      (0 until copies).map { i =>
        keyOffsets.foldLeft(df) { case (acc, (c, off)) =>
          acc.withColumn(c,
            (col(c) + lit(off * i)).cast(df.schema(c).dataType))
        }
      }.reduce(_.unionByName(_))
    }
    write(scaled("orders", Map("o_orderkey" -> 100000000L)), "orders")
    write(scaled("lineitem", Map("l_orderkey" -> 100000000L)), "lineitem")
    write(scaled("documents", Map("doc_id" -> 10000000L)), "documents")
    write(scaled("embeddings", Map("vec_id" -> 1000000L)), "embeddings")
    write(scaled("events", Map("event_id" -> 100000000L)), "events")
    println(s"scale fixture written to $out (${copies}x facts)")
    spark.stop()
  }
}
