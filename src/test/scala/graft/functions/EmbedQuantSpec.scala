package graft.functions

import graft.SparkSpec

/** int8 quantization: hand values, the zero-vector guard, round-half-up
  * on negatives, and the map-only plan.
  */
class EmbedQuantSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private def emb = Seq(
    (0L, Seq(1.0f, -0.5f, 0.25f)),
    (1L, Seq(0.0f, 0.0f, 0.0f)),     // zero vector
    (2L, Seq(-2.0f, 1.0f, 0.5f))
  ).toDF("vec_id", "embedding")

  test("hand-computed components and scales") {
    val out = EmbedQuant.quantizeRows(emb, "vec_id", "embedding", maxId = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // vec 0: max=1.0, scale 1e6; 1.0→127, -0.5→floor(-63.5+0.5)=-63,
    // 0.25→floor(31.75+0.5)=32
    assert(out((0L, 1L)) == (127L, 1000000L))
    assert(out((0L, 2L)) == (-63L, 1000000L))
    assert(out((0L, 3L)) == (32L, 1000000L))
    // zero vector: all components 0, scale 0 — no division by zero
    assert(out((1L, 1L)) == (0L, 0L))
    assert(out((1L, 2L)) == (0L, 0L))
    // vec 2: max=2.0, scale 2e6; -2.0→-127, 1.0→floor(63.5+0.5)=64
    assert(out((2L, 1L)) == (-127L, 2000000L))
    assert(out((2L, 2L)) == (64L, 2000000L))
    assert(out((2L, 3L)) == (32L, 2000000L))
  }

  test("maxId bounds the dump") {
    val ids = EmbedQuant.quantizeRows(emb, "vec_id", "embedding", maxId = 2)
      .select("vec_id").distinct().as[Long].collect().toSet
    assert(ids == Set(0L, 1L))
  }

  test("quantize is map-only: no exchange in the plan") {
    val plan = EmbedQuant.quantize(emb, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(800))
  }
}
