package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al. 2011, "Product Quantization for
  * Nearest Neighbor Search"): split each d-dim vector into `m`
  * subvectors, train an independent k-centroid quantizer per
  * subspace, and encode every vector as m small codes. Asymmetric
  * distance (ADC) then scores a query against a CODE, not a vector:
  * dist²(q, x) ≈ Σ_m ‖q_m − c_{m,code_m(x)}‖² — at serving time a
  * per-query m×k lookup table makes each candidate cost m table
  * reads instead of d multiplies, and the corpus itself is stored in
  * m bytes per vector instead of 4d. This is the memory-side
  * complement of [[IvfIndex]] (IVF prunes WHICH vectors to score;
  * PQ compresses HOW each one is scored) — composed, they are the
  * standard IVF-PQ layout for billion-vector serving.
  *
  * Determinism contract (the IvfIndex conventions, L2 edition):
  * subspace assignment compares ROUND(‖·‖²·1e6) BIGINT distances
  * with cid tie-break (a min_by aggregate here ≡ the oracle's
  * ROW_NUMBER ASC); recentering is the exact integer 2^24-scale mean;
  * every trained centroid table is 8×16 rows and pinned driver-local
  * between iterations (the k-means shape: centroids on the driver,
  * vectors distributed).
  */
object PqIndex {

  /** Exact squared L2 over two float arrays as an ordered left fold
    * (both engines fold in index order — the cosSql contract). */
  private[graft] def l2sq(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val dd = x.cast("double") - y.cast("double"); dd * dd
      }),
      lit(0.0), (acc, v) => acc + v)

  /** Quantized BIGINT distance — the ranking/assignment currency. */
  private[graft] def l2q(a: Column, b: Column): Column =
    round(l2sq(a, b) * 1e6, 0).cast("long")

  /** (vec_id, m, sub): the m `dsub`-wide subvectors of each vector. */
  private[graft] def subvectors(emb: DataFrame, m: Int, dsub: Int): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
        explode(sequence(lit(0), lit(m - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("embedding"), col("m") * dsub + 1, lit(dsub)).as("sub"))

  /** Nearest-centroid assignment per (vector, subspace) — map-side
    * combinable min_by, no window sort (the IvfIndex.assign shape). */
  private[graft] def assign(sub: DataFrame, cents: DataFrame): DataFrame =
    sub.join(broadcast(cents), Seq("m"))
      .withColumn("dq", l2q(col("sub"), col("ce")))
      .groupBy(col("vec_id"), col("m"))
      .agg(min_by(
        struct(col("cid").as("cell"), col("sub").as("sv")),
        struct(col("dq"), col("cid"))).as("best"))
      .select(col("vec_id"), col("m"),
        col("best.cell").as("cell"), col("best.sv").as("sub"))

  /** Per-(subspace, cell) exact integer-mean recentering. */
  private[graft] def recenter(assigned: DataFrame): DataFrame =
    assigned
      .select(col("m"), col("cell"), posexplode(col("sub")).as(Seq("pos", "v")))
      .groupBy(col("m"), col("cell"), col("pos"))
      .agg(sum(floor(col("v").cast("double") * (1 << 24))).as("sv"),
        count(lit(1)).as("n"))
      .withColumn("comp",
        (col("sv").cast("double") / (col("n").cast("double") * (1 << 24)))
          .cast("float"))
      .groupBy(col("m"), col("cell"))
      .agg(collect_list(struct(col("pos"), col("comp"))).as("lst"))
      .select(col("m"), col("cell").as("cid"),
        transform(array_sort(col("lst")), x => x.getField("comp")).as("ce"))

  private def pin(df: DataFrame): DataFrame = {
    import scala.jdk.CollectionConverters._
    df.sparkSession.createDataFrame(df.collect().toSeq.asJava, df.schema)
  }

  /** Train the codebook: per subspace, seed from the k lowest-id
    * vectors' subvectors and run `iters` Lloyd steps. Returns the
    * pinned (m, cid, ce) table — m·k rows, corpus-size-free. */
  def trainCodebook(emb: DataFrame, m: Int = 8, dsub: Int = 8,
      k: Int = 16, iters: Int = 2): DataFrame = {
    val sub = subvectors(emb, m, dsub)
    val seed = pin(sub.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").cast("int").as("cid"),
        col("sub").as("ce")))
    (0 until iters).foldLeft(seed)((c, _) => pin(recenter(assign(sub, c))))
  }

  /** Encode the corpus: (vec_id, m, code) — m small integers per
    * vector, the compressed representation ADC scores against. */
  def encode(emb: DataFrame, cents: DataFrame, m: Int = 8,
      dsub: Int = 8): DataFrame =
    assign(subvectors(emb, m, dsub), cents)
      .select(col("vec_id"), col("m"), col("cell").as("code"))
}
