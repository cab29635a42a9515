package graft.operators

/** LSH PARAMETER PLANNING — the tuning arithmetic behind every banded
  * MinHash/SimHash deployment (the classic MMDS recipe): with `b`
  * bands of `r` rows, a pair at Jaccard similarity s collides in at
  * least one band with probability 1 − (1 − s^r)^b — an S-curve whose
  * knee sits near (1/b)^(1/r). Choosing (b, r) IS the dedup recall/
  * cost trade: more rows per band sharpens the curve (fewer false
  * candidates shuffled into the verify stage), more bands shift the
  * knee left (higher recall, more candidates). At 100 TB the verify
  * stage's input volume is b × corpus, so this choice is a first-order
  * cluster-cost knob, decided up front from pure arithmetic — no data
  * pass at all.
  *
  * Everything here is driver-side closed-form math over a handful of
  * integers; the output feeds the banded operators
  * ([[DedupExtras]]' minhash bands, [[SimilarityExtras]]' embedding
  * bands) as their (bands, rows) configuration.
  */
object LshPlanner {

  /** P(≥1 band collision) for a pair at similarity `s` under b×r. */
  def collisionProb(s: Double, b: Int, r: Int): Double =
    1.0 - math.pow(1.0 - math.pow(s, r), b)

  /** The classic knee approximation: the similarity where the curve
    * rises steepest, (1/b)^(1/r).
    */
  def thresholdOf(b: Int, r: Int): Double =
    math.pow(1.0 / b, 1.0 / r)

  /** Expected cost of a (b, r) scheme against a target `threshold`:
    * false-positive mass ∫₀ᵗ P(s) ds (pairs below the threshold that
    * still reach the verify stage — pure wasted shuffle/compare) plus
    * `fnWeight` × false-negative mass ∫ᵗ¹ (1 − P(s)) ds (true
    * duplicates the bands never surface — quality loss, weighted
    * heavier because a missed duplicate is unrecoverable downstream
    * while a false candidate merely costs compute). Trapezoidal over a
    * fixed grid: deterministic, resolution-independent enough for an
    * integer argmin.
    */
  def cost(b: Int, r: Int, threshold: Double,
      fnWeight: Double = 10.0): Double = {
    val n = 1000
    var fp = 0.0
    var fn = 0.0
    var i = 0
    while (i <= n) {
      val s = i.toDouble / n
      val p = collisionProb(s, b, r)
      val w = if (i == 0 || i == n) 0.5 else 1.0
      if (s < threshold) fp += w * p else fn += w * (1.0 - p)
      i += 1
    }
    (fp + fnWeight * fn) / n
  }

  /** Choose (bands, rows) for a signature budget of `nPerm`
    * components and a target Jaccard `threshold`: the exact-cover
    * factorizations b × r = nPerm (a partial last band buys nothing),
    * minimized by [[cost]]. Ties break toward fewer bands (cheaper
    * verify stage). `fnWeight` > 1 biases toward recall — the right
    * default for dedup, where a missed near-duplicate poisons
    * training and a false candidate only costs a compare.
    */
  def choose(nPerm: Int, threshold: Double,
      fnWeight: Double = 10.0): (Int, Int) = {
    require(nPerm >= 1, s"nPerm=$nPerm")
    require(threshold > 0.0 && threshold < 1.0, s"threshold=$threshold")
    val candidates = (1 to nPerm)
      .filter(nPerm % _ == 0)
      .map(r => (nPerm / r, r))
    candidates.minBy { case (b, r) =>
      (cost(b, r, threshold, fnWeight), b)
    }
  }
}
