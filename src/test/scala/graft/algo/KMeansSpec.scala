package graft.algo

import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {

  private def v(xs: Double*): Array[Double] = KMeans.normalize(xs.toArray)

  test("fit separates two obvious clusters and is deterministic") {
    val cluster1 = Seq(v(1, 0.1, 0), v(1, -0.1, 0), v(0.9, 0, 0.1))
    val cluster2 = Seq(v(-1, 0, 0.1), v(-1, 0.1, 0), v(-0.9, -0.1, 0))
    val sample = (cluster1 ++ cluster2).toArray
    val c1 = KMeans.fit(sample, 2, 5)
    val c2 = KMeans.fit(sample, 2, 5)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    // members of each cluster agree on their nearest centroid
    assert(cluster1.map(KMeans.nearest(c1, _)).distinct.size == 1)
    assert(cluster2.map(KMeans.nearest(c1, _)).distinct.size == 1)
    assert(KMeans.nearest(c1, cluster1.head) != KMeans.nearest(c1, cluster2.head))
    // centroids are unit-norm
    c1.foreach(c => assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
  }

  test("fit tolerates k larger than the sample and empty clusters") {
    val sample = Array(v(1, 0, 0), v(0, 1, 0))
    val cs = KMeans.fit(sample, 4, 3)
    assert(cs.length == 4)
    cs.foreach(c => assert(c.length == 3))
  }
}
