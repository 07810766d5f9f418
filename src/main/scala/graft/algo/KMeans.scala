package graft.algo

/** Deterministic spherical k-means for the IVF coarse quantizer
  * (SimOps.sim_topk_ivf_kmeans).
  *
  * Production ANN shape at 100 TB: the quantizer is TRAINED on a bounded
  * sample (driver-side, a few thousand vectors — Lloyd's on that is
  * microseconds) and APPLIED distributed (centroids broadcast, assignment
  * is a narrow map). Training on the driver is not a scale smell — the
  * sample is O(k × oversample), independent of corpus size; only the
  * assignment touches all N vectors.
  *
  * Determinism: initial centroids are the first k sample vectors in input
  * order (callers pass an id-ordered, hash-sampled set), iteration count
  * is fixed, and all arithmetic is double — same seed ⇒ same quantizer on
  * every run and cluster size.
  */
object KMeans {

  /** L2-normalize a vector (zero vectors pass through unchanged). */
  def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v else v.map(_ / n)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Index of the centroid with max cosine (dot on unit vectors);
    * first-wins on exact ties for determinism. */
  def nearest(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val d = dot(centroids(c), v)
      if (d > bestDot) { bestDot = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic farthest-first seeding (greedy k-means++ without the
    * randomness): start from the first sample vector, then repeatedly add
    * the vector least similar to its closest already-chosen seed. */
  private def seed(sample: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head.clone())
    val maxSim = Array.fill(sample.length)(Double.NegativeInfinity)
    while (chosen.length < math.min(k, sample.length)) {
      var i = 0
      while (i < sample.length) {
        val d = dot(chosen.last, sample(i))
        if (d > maxSim(i)) maxSim(i) = d
        i += 1
      }
      var far = 0
      var farSim = Double.PositiveInfinity
      i = 0
      while (i < sample.length) {
        if (maxSim(i) < farSim) { farSim = maxSim(i); far = i }
        i += 1
      }
      chosen += sample(far).clone()
    }
    var j = 0
    val out = Array.tabulate(k) { i =>
      if (i < chosen.length) chosen(i) else { j += 1; sample(j % sample.length).clone() }
    }
    out
  }

  private def sqDist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** Index of the centroid with min squared L2 distance; first-wins on
    * exact ties for determinism. The Euclidean counterpart of [[nearest]],
    * used by the product-quantizer codebooks (raw subvectors carry
    * magnitude, so the spherical objective is wrong there). */
  def nearestL2(centroids: Array[Array[Double]], v: Array[Double]): Int = {
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < centroids.length) {
      val d = sqDist(centroids(c), v)
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** Deterministic farthest-first seeding under L2 (greedy k-means++
    * without the randomness), mirroring [[seed]]. */
  private def seedL2(sample: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val chosen = scala.collection.mutable.ArrayBuffer(sample.head.clone())
    val minD = Array.fill(sample.length)(Double.PositiveInfinity)
    while (chosen.length < math.min(k, sample.length)) {
      var i = 0
      while (i < sample.length) {
        val d = sqDist(chosen.last, sample(i))
        if (d < minD(i)) minD(i) = d
        i += 1
      }
      var far = 0
      var farD = Double.NegativeInfinity
      i = 0
      while (i < sample.length) {
        if (minD(i) > farD) { farD = minD(i); far = i }
        i += 1
      }
      chosen += sample(far).clone()
    }
    var j = 0
    Array.tabulate(k) { i =>
      if (i < chosen.length) chosen(i) else { j += 1; sample(j % sample.length).clone() }
    }
  }

  /** Standard (Euclidean) Lloyd's: train k centroids minimizing squared L2
    * reconstruction error on RAW sample vectors — the product-quantization
    * codebook objective (Jégou et al., "Product Quantization for Nearest
    * Neighbor Search", TPAMI 2011). Deterministic like [[fit]]: farthest-
    * first seeding, fixed iterations, double arithmetic; empty clusters
    * keep their previous centroid. */
  def fitL2(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    val dim = sample.head.length
    var centroids = seedL2(sample, k)
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearestL2(centroids, v)
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    centroids
  }

  /** Train k spherical centroids on (already normalized) sample vectors.
    * Empty clusters keep their previous centroid. */
  def fit(sample: Array[Array[Double]], k: Int, iters: Int): Array[Array[Double]] = {
    require(sample.nonEmpty, "k-means needs a non-empty sample")
    val dim = sample.head.length
    var centroids = seed(sample, k)
    var it = 0
    while (it < iters) {
      val sums   = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        val c = nearest(centroids, v)
        val s = sums(c)
        var i = 0
        while (i < dim) { s(i) += v(i); i += 1 }
        counts(c) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) else normalize(sums(c))
      }
      it += 1
    }
    centroids
  }
}
