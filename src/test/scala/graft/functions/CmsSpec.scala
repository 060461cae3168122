package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Count-Min sketch laws: grid arithmetic, merge associativity, the
  * no-false-negative guarantee, and the two-pass heavy-hitter contract.
  */
class CmsSpec extends SparkSpec {

  private val d = 4
  private val w = 64

  private def sketchOf(tokens: Seq[String]): Array[Long] = {
    val s = spark
    import s.implicits._
    Cms.buildGrid(tokens.toDF("token"), "token", d, w)
  }

  test("every grid row sums to the total occurrence count") {
    val grid = sketchOf(Seq("a", "b", "a", "c", "a", "b"))
    for (j <- 0 until d)
      assert(grid.slice(j * w, (j + 1) * w).sum == 6, s"row $j")
  }

  test("grid is partitioning-invariant (merge = single pass)") {
    val s = spark
    import s.implicits._
    val tokens = (1 to 500).map(i => s"t${i % 37}")
    val one = Cms.buildGrid(tokens.toDF("token").coalesce(1), "token", d, w)
    val many = Cms.buildGrid(tokens.toDF("token").repartition(11), "token", d, w)
    assert(one.toSeq == many.toSeq)
  }

  test("estimate never underestimates, and is exact without collisions") {
    val s = spark
    import s.implicits._
    val tokens = Seq.fill(10)("hot") ++ Seq("c1", "c2", "c3")
    val grid = sketchOf(tokens)
    val est = tokens.distinct.toDF("token")
      .select(col("token"), Cms.estimate(col("token"), grid, d, w).as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("hot") >= 10)
    assert(est("c1") >= 1 && est("c2") >= 1 && est("c3") >= 1)
    // with 4 distinct tokens in a 4x64 grid a same-bucket collision in
    // ALL 4 rows is essentially impossible; the min is exact
    assert(est("hot") == 10)
  }

  test("heavyHitters finds exactly the true heavy tokens, flags exact counts") {
    val s = spark
    import s.implicits._
    // 200 occurrences of 'hh', tail of singletons: threshold total/100
    val tokens = Seq.fill(200)("hh") ++ (1 to 200).map(i => s"tail$i")
    val got = Cms.heavyHitters(tokens.toDF("token"), "token",
        denom = 100L, d = d, w = 1024)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    val heavy = got.filter(_._4)
    assert(heavy.map(_._1).toSeq == Seq("hh"))
    assert(heavy.head._3 == 200) // exact recount, not the estimate
    // false positives (if any collision pushed a tail token over) carry
    // their exact count and are flagged false
    assert(got.filterNot(_._4).forall(_._3 < 4))
  }

  test("no false negatives at any threshold") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(3)
    val tokens = (1 to 2000).map(_ => s"z${rnd.nextInt(50)}")
    val exact = tokens.groupBy(identity).view.mapValues(_.size).toMap
    val threshold = tokens.size / 40
    val got = Cms.heavyHitters(tokens.toDF("token"), "token",
        denom = 40L, d = d, w = w)
      .collect().map(r => r.getString(0) -> r.getBoolean(3)).toMap
    val trueHeavy = exact.filter(_._2 >= threshold).keySet
    // CMS overestimates only → every true heavy hitter must surface
    assert(trueHeavy.subsetOf(got.keySet),
      s"missing: ${trueHeavy -- got.keySet}")
    assert(trueHeavy.forall(got(_)), "true heavy hitters must flag true")
  }
}
