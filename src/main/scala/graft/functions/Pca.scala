package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PCA over an embedding column — the dimensionality analysis
  * a training-data pipeline runs on its vector corpus (whitening before
  * clustering/ANN, intrinsic-dimension checks, compression planning).
  *
  * Split the way a 100 TB run must be split:
  *   - the GRAM MATRIX (uncentered second moment, the only corpus-sized
  *     computation) is ONE distributed scan: each row explodes into its
  *     d(d+1)/2 upper-triangle products which partial-aggregate map-side,
  *     so the shuffle carries at most `partitions × d(d+1)/2` rows no
  *     matter the corpus size;
  *   - the EIGENDECOMPOSITION runs on the driver over that d×d result
  *     (cyclic Jacobi — d is 64 here, the matrix is tiny; this is the
  *     correct driver-side surface, like KMeans centroid updates);
  *   - the PROJECTION is a map-only scan against the broadcast basis.
  *
  * Determinism: per-row products are quantized to integer micro-units
  * BEFORE the sum (float×float is exact in double; the quantized sum is
  * exact integer arithmetic), so the gram matrix — and therefore the
  * fitted basis — is bit-identical at any partitioning. That is what
  * makes [[gramMicros]] a hash-checkable oracle query AND makes two
  * cluster runs of [[fit]] agree exactly.
  */
object Pca {

  /** Upper-triangle Gram matrix in micro-units: (i, j, micros) with
    * 1-based i ≤ j and micros = Σ_rows floor(v[i]·v[j]·1e6 + 0.5) — exact
    * integer output, engine-replayable. `floor(x+0.5)`, not `round(x)`:
    * both engines define double `floor` identically, while `round` at an
    * exact .5 product is HALF_UP in Spark but banker's-adjacent in DuckDB
    * (the round-7 driver hash-fail on q_embed_gram).
    */
  def gramMicros(df: DataFrame, vecCol: String): DataFrame =
    df.select(col(vecCol).as("__v"))
      .select(explode(expr(
        """flatten(transform(sequence(1, size(__v)), i ->
          |  transform(sequence(i, size(__v)), j ->
          |    struct(i AS i, j AS j,
          |      CAST(floor(CAST(element_at(__v, i) AS DOUBLE)
          |                 * CAST(element_at(__v, j) AS DOUBLE)
          |                 * 1000000.0 + 0.5) AS BIGINT) AS m))))""".stripMargin))
        .as("__c"))
      .select(col("__c.i").cast("long").as("i"),
        col("__c.j").cast("long").as("j"), col("__c.m").as("m"))
      .groupBy(col("i"), col("j"))
      .agg(sum(col("m")).as("micros"))

  /** DuckDB replay of [[gramMicros]]. */
  def gramOracleSql(table: String = "embeddings",
      vecCol: String = "embedding"): String =
    s"""WITH e AS (SELECT $vecCol AS v FROM $table)
       |SELECT i, j,
       |       sum(CAST(floor(CAST(v[i] AS DOUBLE) * CAST(v[j] AS DOUBLE)
       |                      * 1000000.0 + 0.5) AS BIGINT)) AS micros
       |FROM e,
       |     unnest(generate_series(1, len(v))) u(i),
       |     unnest(generate_series(1, len(v))) w(j)
       |WHERE j >= i
       |GROUP BY 1, 2""".stripMargin

  /** Fitted basis: eigenvalues (descending) and row-major eigenvectors of
    * the mean Gram matrix.
    */
  final case class Basis(values: Array[Double], vectors: Array[Array[Double]]) {
    def dim: Int = vectors.headOption.map(_.length).getOrElse(0)
  }

  /** Fit the top-k PCA basis: one distributed gram pass ([[gramMicros]]),
    * then cyclic Jacobi on the driver-side d×d matrix. `k ≤ d`.
    */
  def fit(df: DataFrame, vecCol: String, k: Int): Basis = {
    val cells = gramMicros(df, vecCol).collect()
    val n = df.count().toDouble
    require(cells.nonEmpty, "PCA needs a non-empty corpus")
    val d = cells.map(_.getLong(1)).max.toInt
    require(k >= 1 && k <= d, s"k=$k out of range 1..$d")
    val a = Array.ofDim[Double](d, d)
    cells.foreach { r =>
      val i = r.getLong(0).toInt - 1; val j = r.getLong(1).toInt - 1
      val v = r.getLong(2).toDouble / 1e6 / n
      a(i)(j) = v; a(j)(i) = v
    }
    val (values, vectors) = jacobiEigen(a)
    Basis(values.take(k), vectors.take(k))
  }

  /** Project onto a basis: map-only scan, one dot product per component
    * via a codegen-friendly `aggregate` over the zipped arrays; each
    * component rounded to 6 decimals. Output: (idCol, pc1..pck).
    */
  def project(df: DataFrame, idCol: String, vecCol: String,
      basis: Basis): DataFrame = {
    val comps: Seq[Column] = basis.vectors.toSeq.zipWithIndex.map {
      case (vec, c) =>
        val arr = vec.map(x => s"CAST($x AS DOUBLE)").mkString("array(", ", ", ")")
        round(expr(
          s"""aggregate(zip_with(`$vecCol`, $arr, (x, w) ->
             |  CAST(x AS DOUBLE) * w), CAST(0.0 AS DOUBLE),
             |  (acc, p) -> acc + p)""".stripMargin), 6).as(s"pc${c + 1}")
    }
    df.select(col(idCol) +: comps: _*)
  }

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues desc, matching eigenvectors as rows), each eigenvector
    * sign-normalized so its largest-magnitude entry is positive — a
    * deterministic orientation (Jacobi's signs are otherwise arbitrary).
    */
  def jacobiEigen(m: Array[Array[Double]],
      sweeps: Int = 64, eps: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offDiag(a)
    while (sweep < sweeps && off > eps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > eps / (d * d)) rotate(a, v, p, q)
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    val order = (0 until d).sortBy(i => -a(i)(i))
    val values = order.map(i => a(i)(i)).toArray
    val vectors = order.map { c =>
      val vec = Array.tabulate(d)(r => v(r)(c))
      val lead = vec.indices.maxBy(i => (math.abs(vec(i)), -i))
      if (vec(lead) < 0) vec.map(x => -x) else vec
    }.toArray
    (values, vectors)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    for (i <- a.indices; j <- i + 1 until a.length) s += a(i)(j) * a(i)(j)
    s
  }

  private def rotate(a: Array[Array[Double]], v: Array[Array[Double]],
      p: Int, q: Int): Unit = {
    val d = a.length
    val apq = a(p)(q)
    val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
    val t = {
      val s = if (theta >= 0) 1.0 else -1.0
      s / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
    }
    val c = 1.0 / math.sqrt(t * t + 1.0)
    val s = t * c
    for (i <- 0 until d) {
      val aip = a(i)(p); val aiq = a(i)(q)
      a(i)(p) = c * aip - s * aiq
      a(i)(q) = s * aip + c * aiq
    }
    for (j <- 0 until d) {
      val apj = a(p)(j); val aqj = a(q)(j)
      a(p)(j) = c * apj - s * aqj
      a(q)(j) = s * apj + c * aqj
    }
    for (i <- 0 until d) {
      val vip = v(i)(p); val viq = v(i)(q)
      v(i)(p) = c * vip - s * viq
      v(i)(q) = s * vip + c * viq
    }
  }
}
