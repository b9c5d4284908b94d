package graft.ops

import scala.util.Random

import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** threshold=0 forces the iterative label-propagation path;
    * the default takes single-task union-find on graphs this small. */
  private def cc(pairs: Seq[(Long, Long)],
                 threshold: Long = 1L << 20): Map[Long, Long] =
    Dedup.connectedComponents(pairs.toDF("doc_a", "doc_b"), "doc_a", "doc_b",
      localEdgeThreshold = threshold)
      .as[(Long, Long)].collect().toMap

  /** Driver-side union-find ground truth. */
  private def ccBrute(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (x, y) =>
      val (rx, ry) = (find(x), find(y))
      if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("chain propagates the min label across the full diameter (both paths)") {
    val chain = Seq((2L, 1L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L))
    val want = (1L to 6L).map(_ -> 1L).toMap
    assert(cc(chain) == want)
    assert(cc(chain, threshold = 0) == want)
  }

  test("separate components keep separate representatives") {
    val got = cc(Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("local union-find and iterative propagation agree with brute force") {
    val rnd = new Random(42)
    val pairs = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter { case (x, y) => x != y }
    val want = ccBrute(pairs)
    assert(cc(pairs) == want)                 // local union-find path
    assert(cc(pairs, threshold = 0) == want)  // iterative path
  }

  test("pointer jumping: a 512-node chain converges in O(log diameter) rounds") {
    // A chain is the worst case for plain min-label propagation
    // (rounds = diameter, here 511). With the per-round doubling step,
    // covered distance ~doubles per round, so maxIter = 12 suffices —
    // propagation alone would throw the not-converged error here.
    val chain = (1L until 512L).map(i => (i, i + 1))
    val got = Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"),
      "doc_a", "doc_b", maxIter = 12, localEdgeThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == (1L to 512L).map(_ -> 1L).toMap)
  }

  test("iterative path throws instead of returning partial labels when not converged") {
    val chain = (1L until 8L).map(i => (i, i + 1))
    intercept[IllegalStateException] {
      Dedup.connectedComponents(chain.toDF("doc_a", "doc_b"), "doc_a", "doc_b",
        maxIter = 2, localEdgeThreshold = 0)
    }
  }
}
