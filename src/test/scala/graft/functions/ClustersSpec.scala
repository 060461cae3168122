package graft.functions

import graft.SparkSpec
import graft.SparkSpec.spark.implicits._

/** Connected components: label propagation must match a model union-find
  * on arbitrary graphs, converge on long chains (many rounds), and
  * handle empty input.
  */
class ClustersSpec extends SparkSpec {

  private def components(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponents(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def model(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = collection.mutable.Map.empty[Long, Long]
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

  test("matches union-find on a random pair graph") {
    val rnd = new scala.util.Random(7)
    val pairs = (1 to 120).map(_ =>
      (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    assert(components(pairs) == model(pairs))
  }

  test("long chain converges to one component (exercises many rounds)") {
    // a path graph: the min label travels one hop per round, so this
    // needs 7 propagation rounds — the multi-iteration path
    val chain = (0L until 8L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = components(chain)
    assert(got.values.toSet == Set(0L), s"single component rooted at 0: $got")
    assert(got.size == 8)
  }

  test("disjoint groups and empty input") {
    val got = components(Seq((10L, 11L), (20L, 21L), (21L, 22L)))
    assert(got == Map(10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L))
    assert(components(Seq.empty).isEmpty)
  }

  private def altStar(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Clusters.connectedComponentsAltStar(pairs.toDF("a_id", "b_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("alt-star matches union-find on random pair graphs") {
    val rnd = new scala.util.Random(13)
    for (_ <- 1 to 3) {
      val pairs = (1 to 150).map(_ =>
        (rnd.nextInt(80).toLong, rnd.nextInt(80).toLong))
        .filter(p => p._1 != p._2)
      assert(altStar(pairs) == model(pairs))
    }
  }

  test("alt-star folds a long chain in O(log n) rounds") {
    // a 64-node path: label propagation needs 63 rounds, alt-star ~log
    val chain = (0L until 64L).sliding(2).map(s => (s(1), s(0))).toSeq
    val got = altStar(chain)
    assert(got.values.toSet == Set(0L) && got.size == 64)
    assert(got == model(chain))
  }

  test("label propagation refuses to return unconverged labels") {
    // the same 64-node path exceeds maxIter=50 — a silent partial
    // answer would be indistinguishable from a correct one, so it must
    // throw; converges fine with maxIter raised past the diameter
    val chain = (0L until 64L).sliding(2).map(s => (s(1), s(0))).toSeq
    intercept[IllegalStateException] {
      Clusters.connectedComponents(chain.toDF("a_id", "b_id")).collect()
    }
    val ok = Clusters.connectedComponents(chain.toDF("a_id", "b_id"), maxIter = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ok == model(chain))
  }

  test("alt-star: disjoint groups and empty input") {
    assert(altStar(Seq((10L, 11L), (20L, 21L), (21L, 22L))) ==
      Map(10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
    assert(altStar(Seq.empty).isEmpty)
  }
}
