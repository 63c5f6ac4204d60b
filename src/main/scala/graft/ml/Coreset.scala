package graft.ml

/** Greedy k-center coreset selection (Gonzalez 1985's farthest-point
  * 2-approximation; Sener & Savarese 2018 use exactly this rule for
  * active-learning coverage). Runs on a DIMENSION-BOUNDED candidate
  * set — at 100 TB the candidates are quantizer-cell representatives
  * (IVF centroids, label centroids), never raw corpus vectors: the
  * corpus-sized assignment already lives in the inverted file, and
  * selecting which cells maximize coverage is a driver-side loop over
  * K rows (the m1-knotScan pattern).
  *
  * Determinism contract: distances are supplied PRE-QUANTIZED (the
  * caller rounds 1−cos to 6dp, the engine-agreement quantum used by
  * every cosine carrier), the first pick is the smallest id
  * (Gonzalez's "arbitrary start" made deterministic), and every
  * argmax tie-break is the smallest id — so the driver loop, and the
  * oracle's unrolled per-step SQL replay, provably agree. */
object Coreset {

  /** One selection step: at `step`, candidate `cid` was the farthest
    * (max-min quantized distance) from the already-picked set;
    * `radius` is the covering radius AFTER the pick — the max over
    * all candidates of their min distance to the picked set. The
    * Gonzalez guarantee: radius is non-increasing in step and ≤ 2x
    * the optimal k-center radius. */
  final case class Pick(step: Int, cid: Long, radius: Double)

  /** Greedy selection of `k` centers from `ids` under the quantized
    * distance `dist` (must be symmetric with dist(i,i) = 0). */
  def kcenterGreedy(ids: Seq[Long], dist: (Long, Long) => Double,
      k: Int): Seq[Pick] = {
    require(ids.nonEmpty)
    val sorted = ids.sorted
    var picked = Vector(sorted.head)
    def minDist(c: Long): Double = picked.map(p => dist(c, p)).min
    def radius: Double = sorted.map(minDist).max
    val out = Seq.newBuilder[Pick]
    out += Pick(1, picked.head, radius)
    var step = 2
    while (step <= math.min(k, sorted.size)) {
      val cand = sorted.filterNot(picked.contains)
      val next = cand.maxBy(c => (minDist(c), -c))
      picked = picked :+ next
      out += Pick(step, next, radius)
      step += 1
    }
    out.result()
  }

  /** The shared cross-engine cosine: dot and norms summed in INDEX
    * order over double-widened floats, exactly the op order of the
    * oracle's `list_sum(list_transform(...))` chain — identical IEEE
    * results, so the 6dp quantization both sides apply cannot
    * diverge. */
  def cosDouble(a: IndexedSeq[Float], b: IndexedSeq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** ROUND(x, 6) as both engines apply it to a non-negative double
    * (Spark `round` = BigDecimal HALF_UP; DuckDB ROUND = half-away —
    * identical for x ≥ 0). */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
}
