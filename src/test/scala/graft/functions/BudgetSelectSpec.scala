package graft.functions

import graft.SparkSpec

class BudgetSelectSpec extends SparkSpec {

  private def docs(rows: (Long, Double, Long)*) = {
    val s = spark; import s.implicits._
    rows.toDF("doc_id", "score", "n_tokens")
  }

  private def run(d: org.apache.spark.sql.DataFrame, pct: Int): Set[Long] =
    BudgetSelect.select(d, "doc_id", "score", "n_tokens", pct)
      .collect().map(_.getLong(0)).toSet

  /** Reference greedy: (score desc, id asc), take while running total
    * stays within budget — prefix semantics, no skip-and-continue.
    */
  private def greedy(rows: Seq[(Long, Double, Long)], pct: Int): Set[Long] = {
    val budget = rows.map(_._3).sum * pct / 100
    var cum = 0L
    rows.sortBy(r => (-r._2, r._1)).takeWhile { r =>
      cum += r._3; cum <= budget
    }.map(_._1).toSet
  }

  test("selection equals the reference greedy on distinct scores") {
    val rows = (1L to 20L).map(i => (i, i.toDouble / 100, 10L + i))
    assert(run(docs(rows: _*), 50) === greedy(rows, 50))
  }

  test("boundary-score docs are taken in id order until budget exhausts") {
    // three docs share the boundary score; budget fits exactly two of them
    val rows = Seq(
      (1L, 0.9, 10L), (2L, 0.9, 10L),          // fully selected tier
      (3L, 0.5, 10L), (4L, 0.5, 10L), (5L, 0.5, 10L), // boundary tier
      (6L, 0.1, 10L))
    // budget = 66% of 60 = 39 → tier 0.9 spends 20, remaining 19 → one
    // boundary doc fits (id 3; id 4 would hit 40 > 39)
    assert(run(docs(rows: _*), 66) === Set(1L, 2L, 3L))
    assert(greedy(rows, 66) === Set(1L, 2L, 3L))
  }

  test("agrees with reference greedy across tie-heavy random profiles") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 10) {
      val rows = (1L to 60L).map(i =>
        (i, (rnd.nextInt(5) + 1) / 10.0, (rnd.nextInt(20) + 1).toLong))
      for (pct <- Seq(0, 10, 40, 75, 100)) {
        assert(run(docs(rows: _*), pct) === greedy(rows, pct),
          s"trial=$trial pct=$pct")
      }
    }
  }

  test("pct=100 keeps everything; pct=0 keeps nothing") {
    val rows = (1L to 9L).map(i => (i, (i % 3).toDouble, 5L))
    assert(run(docs(rows: _*), 100) === rows.map(_._1).toSet)
    assert(run(docs(rows: _*), 0) === Set.empty[Long])
  }

  test("null scores and weights refuse IN-PLAN: an unscored doc would " +
      "inflate the budget while being unselectable, and an all-null " +
      "corpus would silently select nothing") {
    val s = spark; import s.implicits._
    def chain(t: Throwable): String = {
      val sb = new StringBuilder
      var e = t; while (e != null) { sb.append(e.getMessage).append('|'); e = e.getCause }
      sb.toString
    }
    val nullScore = Seq((1L, Some(0.5), 5L), (2L, None, 5L))
      .toDF("doc_id", "score", "n_tokens")
    val e1 = intercept[Throwable] {
      BudgetSelect.select(nullScore, "doc_id", "score", "n_tokens", 50)
        .collect()
    }
    assert(chain(e1).contains("null score"), chain(e1).take(300))
    val nullW = Seq((1L, 0.5, Some(5L)), (2L, 0.5, None))
      .toDF("doc_id", "score", "n_tokens")
    val e2 = intercept[Throwable] {
      BudgetSelect.select(nullW, "doc_id", "score", "n_tokens", 50).collect()
    }
    assert(chain(e2).contains("null n_tokens"), chain(e2).take(300))
  }
}
