package graft.functions

import graft.SparkSpec

class PcaSpec extends SparkSpec {

  private def vecs(rows: (Long, Array[Float])*) = {
    val s = spark; import s.implicits._
    rows.toDF("vec_id", "embedding")
  }

  test("gramQ matches a driver-side exact integer computation") {
    val data = Seq(
      1L -> Array(1.0f, 2.0f, -1.5f),
      2L -> Array(0.5f, -1.0f, 3.0f),
      3L -> Array(2.0f, 0.25f, 0.125f))
    val got = Pca.gramQ(vecs(data: _*), "embedding").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exp = (for (i <- 0 until 3; j <- i until 3) yield {
      val s = data.map { case (_, v) =>
        val qi = math.floor(v(i).toDouble * Pca.QScale + 0.5).toLong
        val qj = math.floor(v(j).toDouble * Pca.QScale + 0.5).toLong
        qi * qj
      }.sum
      (i + 1L, j + 1L) -> s
    }).toMap
    assert(got === exp)
    assert(got.size === 6) // upper triangle of 3x3
  }

  test("gram is invariant under repartitioning (exact integer sums)") {
    val data = (1 to 200).map(i =>
      i.toLong -> Array.tabulate(8)(j => ((i * 31 + j * 17) % 100) / 50.0f - 1.0f))
    val a = Pca.gramQ(vecs(data: _*).repartition(1), "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSet
    val b = Pca.gramQ(vecs(data: _*).repartition(13), "embedding")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSet
    assert(a === b)
  }

  test("jacobiEigen recovers a known spectrum") {
    // A = Q diag(9, 4, 1) Q^T with Q a hand-built rotation
    val q = Array(
      Array(0.6, 0.8, 0.0),
      Array(-0.8, 0.6, 0.0),
      Array(0.0, 0.0, 1.0))
    val d = Array(9.0, 4.0, 1.0)
    val a = Array.tabulate(3, 3)((i, j) =>
      (0 until 3).map(k => q(i)(k) * d(k) * q(j)(k)).sum)
    val (values, vectors) = Pca.jacobiEigen(a)
    assert(values.zip(Seq(9.0, 4.0, 1.0)).forall { case (x, y) =>
      math.abs(x - y) < 1e-9 })
    // eigenvectors orthonormal, and A v = λ v
    for (c <- 0 until 3) {
      val v = vectors(c)
      val av = Array.tabulate(3)(i => (0 until 3).map(j => a(i)(j) * v(j)).sum)
      assert(av.zip(v).forall { case (x, y) =>
        math.abs(x - values(c) * y) < 1e-8 })
      assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-9)
    }
    assert(math.abs(vectors(0).zip(vectors(1)).map { case (x, y) => x * y }.sum)
      < 1e-9)
  }

  test("fit + project: variance concentrates on pc1 for a 1-D corpus") {
    // points along direction (3,4)/5 with tiny noise on the orthogonal
    val dir = Array(0.6, 0.8)
    val data = (1 to 100).map { i =>
      val t = (i - 50).toDouble / 10.0
      val n = ((i * 7919) % 11 - 5).toDouble / 10000.0
      i.toLong -> Array((t * dir(0) - n * dir(1)).toFloat,
        (t * dir(1) + n * dir(0)).toFloat)
    }
    val df = vecs(data: _*)
    val basis = Pca.fit(df, "embedding", 2)
    assert(basis.values(0) > 100 * basis.values(1),
      s"spectrum ${basis.values.toSeq}")
    // pc1 aligns with the generating direction (up to sign normalization)
    assert(math.abs(math.abs(basis.vectors(0)(0)) - 0.6) < 1e-3)
    assert(math.abs(math.abs(basis.vectors(0)(1)) - 0.8) < 1e-3)
    val proj = Pca.project(df, "vec_id", "embedding", basis).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // projections onto pc1 recover t (within float + quantization noise);
    // pc2 components stay at noise scale
    val t50 = proj(60L)._1 - proj(40L)._1
    assert(math.abs(math.abs(t50) - 2.0) < 1e-3, s"got $t50")
    assert(proj.values.forall(p => math.abs(p._2) < 0.01))
  }

  test("fit is deterministic across partitionings") {
    val data = (1 to 150).map(i =>
      i.toLong -> Array.tabulate(6)(j => (((i + 3) * (j + 7)) % 83) / 41.5f - 1.0f))
    val b1 = Pca.fit(vecs(data: _*).repartition(2), "embedding", 3)
    val b2 = Pca.fit(vecs(data: _*).repartition(11), "embedding", 3)
    assert(b1.values.toSeq === b2.values.toSeq)
    assert(b1.vectors.map(_.toSeq).toSeq === b2.vectors.map(_.toSeq).toSeq)
  }
}
