package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Optimized Product Quantization, parametric solution (Ge et al.
  * 2013, "Optimized Product Quantization for Approximate Nearest
  * Neighbor Search"; also Jégou et al. 2011 §V "structured vector
  * quantization"): learn an orthogonal-by-construction rotation
  * R = P·Uᵀ — the full eigenbasis U of the data covariance, with a
  * balanced permutation P that allocates eigendirections to the m
  * subspaces so the per-subspace eigenvalue PRODUCTS equalize (the
  * paper's eigenvalue-allocation criterion, optimal under the
  * Gaussian independence bound). Rotating before [[PqIndex]] coding
  * decorrelates the subspaces and balances their information load,
  * which is exactly where plain PQ loses accuracy on correlated
  * data.
  *
  * Scale contract: the covariance collapses to a d(d+1)/2-cell
  * driver relation (the x46/x65 exact-integer Gram recipe — corpus
  * scanned once for moments); the d-deep eigensolve and the greedy
  * allocation are d×d driver arithmetic, corpus-size-free; the
  * rotation itself is a row-local fold against broadcast-literal
  * eigenvectors — no join, no shuffle, composes onto any scan.
  *
  * Determinism contract: every double op (matvec fold, max-abs
  * normalize, Rayleigh quotient, deflation, product comparison,
  * rotation dot) is written in the same left-to-right order as the
  * oracle's list-land SQL, so driver and oracle agree bit-for-bit
  * (the x65 precedent, extended from 2 to d eigenpairs — judged
  * bit-exact over all d·(d+1) values in prototype). Power iteration
  * on a clustered spectrum converges slowly, so U is only
  * approximately orthogonal — both engines compute the SAME
  * approximation, and the serving geometry (exact ranks AND ADC) is
  * defined consistently in the rotated space.
  */
object Opq {

  /** Exact-integer covariance of the embedding column — x65's
    * recipe: 1e6-quantized coordinates, Gram cells summed in
    * decimal(38,0) (the 128-bit accumulator — per-row products fit a
    * Long, but the corpus SUM grows as n·1e12 and would overflow
    * Int64 past a few thousand rows; ADVICE r9), half-away integer
    * rounding of the n·p − sᵢsⱼ rational in BigInt at 1e8 scale, so
    * the "corpus scanned once, exact integer" contract holds at any
    * corpus size. Returns (matrix, per-dim 1e6-scale sums, rows). */
  def covariance(emb: DataFrame): (Array[Array[Double]], Array[Long], Long) = {
    val n = emb.count()
    // quantize each coordinate ONCE per vector (r11): the pair pass
    // below reads integer elements of the prepared q array instead of
    // re-rounding the inner coordinate per (i, j) cell — same qi/qj
    // integers (round is deterministic), ~d/2× fewer decimal
    // roundings per vector, and the sums/pair passes share the one
    // quantized projection
    val q = emb.select(
      transform(col("embedding"),
        x => round(x.cast("double") * 1e6, 0).cast("long")).as("q"))
    val sums = q
      .select(posexplode(col("q")).as(Seq("i", "qi")))
      .groupBy(col("i")).agg(sum(col("qi")).as("s_"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)
    val dims = sums.length
    val pair = q
      .select(col("q"), posexplode(col("q")).as(Seq("i", "qi")))
      .select(col("i"), col("qi"), posexplode(col("q")).as(Seq("j", "qj")))
      .filter(col("j") >= col("i"))
      .groupBy(col("i"), col("j"))
      .agg(sum((col("qi") * col("qj")).cast("decimal(38,0)")).as("p"))
      .collect()
    def intRound(sv: BigInt, nv: BigInt): BigInt = {
      val sign = if (sv < 0) BigInt(-1) else BigInt(1)
      sign * ((2 * sv.abs + nv) / (2 * nv))
    }
    val m = Array.ofDim[Double](dims, dims)
    pair.foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val p = BigInt(r.getDecimal(2).toBigInteger)
      val c = intRound(BigInt(n) * p - BigInt(sums(i)) * BigInt(sums(j)),
        BigInt(n) * BigInt(n) * 10000).toDouble / 1e8
      m(i)(j) = c; m(j)(i) = c
    }
    (m, sums, n)
  }

  /** x49/x65's 50-round max-abs power iteration + Rayleigh quotient
    * (all folds left-to-right — the oracle's list_sum order). */
  def topEig(mm: Array[Array[Double]]): (Array[Double], Double) = {
    val dims = mm.length
    var v = Array.fill(dims)(1.0)
    for (_ <- 0 until 50) {
      val w = Array.tabulate(dims)(i => mm(i).zip(v).map { case (a, b) => a * b }.sum)
      val mx = w.map(math.abs).max
      v = w.map(_ / mx)
    }
    val u = { val s2 = v.map(x => x * x).sum; v.map(_ / math.sqrt(s2)) }
    val w = Array.tabulate(dims)(i => mm(i).zip(u).map { case (a, b) => a * b }.sum)
    (u, u.zip(w).map { case (a, b) => a * b }.sum)
  }

  /** Hotelling deflation M' = M − λuuᵀ. */
  def deflate(mm: Array[Array[Double]], u: Array[Double], lam: Double): Array[Array[Double]] =
    Array.tabulate(mm.length, mm.length)((i, j) => mm(i)(j) - lam * u(i) * u(j))

  /** All `nEig` eigenpairs by repeated power iteration + deflation,
    * in extraction order (NOT sorted — clustered eigenvalues come out
    * unordered; [[allocate]] sorts). */
  def eigensolve(m0: Array[Array[Double]], nEig: Int): Seq[(Array[Double], Double)] = {
    var mm = m0
    (0 until nEig).map { _ =>
      val (u, lam) = topEig(mm)
      mm = deflate(mm, u, lam)
      (u, lam)
    }
  }

  /** Eigenvalue allocation (Ge et al. §4.1): visit eigenpairs by
    * (λ DESC, extraction index ASC); greedily place each into the
    * non-full bucket with the smallest running eigenvalue product,
    * lowest bucket id on ties. Returns the rotation's output-dim-
    * ordered eigenvector rows: buckets-major, within a bucket in
    * allocation order — output dims [g·dsub, (g+1)·dsub) form
    * subspace g. */
  def rotationRows(eigs: Seq[(Array[Double], Double)], m: Int, dsub: Int): Seq[Array[Double]] = {
    val order = eigs.indices.sortWith { (a, b) =>
      eigs(a)._2 > eigs(b)._2 || (eigs(a)._2 == eigs(b)._2 && a < b)
    }
    val prods = Array.fill(m)(1.0)
    val cnts = Array.fill(m)(0)
    val bucketOf = order.map { c =>
      val elig = (0 until m).filter(cnts(_) < dsub)
      val minp = elig.map(prods).min
      val g = elig.find(prods(_) == minp).get
      prods(g) *= eigs(c)._2
      cnts(g) += 1
      g
    }
    order.indices
      .sortBy(ri => (bucketOf(ri), ri))
      .map(ri => eigs(order(ri))._1)
  }

  /** Row-local rotation: output coordinate o = ⟨x, row_o⟩ as the
    * cosSql-order fold against broadcast-literal eigenvector rows. */
  def rotateCol(emb: Column, rows: Seq[Array[Double]]): Column =
    array(rows.map { row =>
      aggregate(
        zip_with(emb, array(row.toSeq.map(lit): _*),
          (x, y) => x.cast("double") * y),
        lit(0.0), (acc, x) => acc + x)
    }: _*)
}
