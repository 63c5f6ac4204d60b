package graft.ml

/** Exact-integer OLS over QUANTIZED log-log points — the shared
  * machinery for power-law fits (x154 Heaps vocabulary growth, x155
  * Zipf rank-frequency): each coordinate is ln(·) rounded to 1e-6
  * integer units (the x39 transcendental recipe — quantize AFTER
  * evaluation, where a ≤1-ulp libm-vs-JVM difference cannot flip a
  * quantum), and every downstream quantity (slope, intercept,
  * prediction, R²) is a half-away-rounded rational of BigInt sums —
  * the DuckDB twin replays the identical integer arithmetic in
  * HUGEINT, so both engines agree bit-for-bit past the one quantized
  * log.
  *
  * Scale contract: the fit input is always a DIMENSION-BOUNDED
  * relation (a 10-row growth curve, a top-30 rank table) — the
  * m1-knotScan pattern: the corpus-sized work is the aggregation
  * that produced the points; the regression itself is driver-side. */
object LogFit {

  final case class Fit(n: Long, slopeQ: Long, interceptQ: Long)

  /** ln(x)·1e6 rounded — callers must pass x ≥ 1 (all fit inputs are
    * counts/ranks), where half-up ≡ half-away and both ≡ DuckDB's
    * ROUND. */
  def lq(x: Double): Long = {
    require(x >= 1.0, s"quantized log domain is x >= 1, got $x")
    math.round(math.log(x) * 1e6)
  }

  /** ln(x)·1e6 for ANY positive x (x155's Z_r values sit below 1 in
    * sparse tails, where ln is negative): BigDecimal HALF_UP — away
    * from zero on ties — is DuckDB's ROUND semantics on both signs,
    * unlike Math.round's toward-+∞ half-up. */
  def lqSigned(x: Double): Long = {
    require(x > 0.0, s"log domain is x > 0, got $x")
    qScaled(math.log(x), 1e6)
  }

  /** ROUND(v·scale, 0) exactly as both engines compute it: the DOUBLE
    * multiplication first (shared representation), then decimal
    * HALF_UP (≡ DuckDB half-away on the double's exact value). */
  def qScaled(v: Double, scale: Double): Long =
    BigDecimal(v * scale).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong

  private[graft] def halfAway(s: BigInt, d: BigInt): BigInt = {
    require(d > 0)
    val sign = if (s < 0) BigInt(-1) else BigInt(1)
    sign * ((2 * s.abs + d) / (2 * d))
  }

  /** OLS over (lxq, lyq) integer points; requires ≥ 2 distinct x. */
  def fit(pts: Seq[(Long, Long)]): Fit = {
    val n = BigInt(pts.size)
    val sx = pts.map(p => BigInt(p._1)).sum
    val sy = pts.map(p => BigInt(p._2)).sum
    val sxy = pts.map(p => BigInt(p._1) * p._2).sum
    val sxx = pts.map(p => BigInt(p._1) * p._1).sum
    val den = n * sxx - sx * sx
    require(den > 0, "fit needs >= 2 distinct x values")
    val slopeQ = halfAway((n * sxy - sx * sy) * 1000000, den)
    val interceptQ = halfAway(sy * 1000000 - slopeQ * sx, n * 1000000)
    Fit(pts.size.toLong, slopeQ.toLong, interceptQ.toLong)
  }

  /** Fitted ŷ (1e-6 units) at lxq: interceptQ + slopeQ·lxq/1e6,
    * half-away — the per-point integer prediction both engines
    * share. */
  def predictQ(f: Fit, lxq: Long): Long =
    (BigInt(f.interceptQ) +
      halfAway(BigInt(f.slopeQ) * lxq, BigInt(1000000))).toLong

  /** R² in 1e-6 units over the SAME quantized predictions (None when
    * all y equal — SStot = 0 leaves R² undefined). */
  def r2Q(pts: Seq[(Long, Long)], f: Fit): Option[Long] = {
    val n = BigInt(pts.size)
    val sy = pts.map(p => BigInt(p._2)).sum
    val ybar = halfAway(sy, n)
    val ssTot = pts.map(p => (BigInt(p._2) - ybar).pow(2)).sum
    if (ssTot == 0) None
    else {
      val ssRes = pts.map { case (x, y) =>
        (BigInt(y) - predictQ(f, x)).pow(2)
      }.sum
      Some(halfAway((ssTot - ssRes) * 1000000, ssTot).toLong)
    }
  }
}
