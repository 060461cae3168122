package graft.functions

import graft.SparkSpec

/** BPE merge learning vs a hand-rolled reference implementation of the
  * classic algorithm (Sennrich et al.): count adjacent symbol pairs
  * weighted by word frequency, merge the argmax (count desc, pair asc),
  * repeat.
  */
class BpeTrainSpec extends SparkSpec {

  /** Reference BPE on a word-frequency map, symbols as vectors. */
  private def referenceBpe(words: Map[String, Long],
      rounds: Int): Seq[(String, String, Long)] = {
    var tbl: Map[Vector[String], Long] =
      words.map { case (w, f) => w.toVector.map(_.toString) -> f }
    val out = Vector.newBuilder[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      tbl.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ =>
        }
      }
      if (counts.nonEmpty) {
        val ((l, r), f) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a + " " + b) }.head
        out += ((l, r, f))
        tbl = tbl.groupMapReduce { case (syms, _) =>
          // left-to-right non-overlapping application
          val merged = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
              merged += (l + r); i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.result()
        }(_._2)(_ + _)
      }
    }
    out.result()
  }

  test("learned merges match the classic algorithm on a small corpus") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "low lower lowest low low"),
      (2L, "newer newest new new lower"),
      (3L, "wider wide widest new lower lowest")).toDF("doc_id", "text")
    val words = docs.rdd.flatMap(r => r.getString(1).split("\\s+"))
      .map(w => w -> 1L).reduceByKey(_ + _).collect().toMap
    val expected = referenceBpe(words, rounds = 6)
    val got = BpeTrain.train(s, BpeTrain.wordTable(docs, "text"), rounds = 6)
      .map(m => (m.l_sym, m.r_sym, m.f_weight))
    assert(got == expected, s"\nexpected $expected\ngot      $got")
  }

  test("merged symbols participate in later rounds (multi-char merges)") {
    val s = spark
    import s.implicits._
    // 'aaaa' freq 3: round 1 merges (a,a) — 'a a a a' has 3 adjacent
    // pairs x freq 3 = 9 — and applies left-to-right non-overlapping
    // ('aa aa'); round 2 must merge the MERGED symbol pair (aa,aa) at
    // 1 pair x freq 3 = 3
    val docs = Seq((1L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val got = BpeTrain.train(s, BpeTrain.wordTable(docs, "text"), rounds = 2)
    assert(got.map(m => (m.l_sym, m.r_sym, m.f_weight)) ==
      Seq(("a", "a", 9L), ("aa", "aa", 3L)), got.toString)
  }

  test("fewer learnable merges than rounds ends training early") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val got = BpeTrain.train(s, BpeTrain.wordTable(docs, "text"), rounds = 10)
    // round 1: (a,b) f=2; round 2: (c,d) f=1; then every word is one
    // symbol — no pairs remain, training stops
    assert(got.map(m => (m.l_sym, m.r_sym, m.f_weight)) ==
      Seq(("a", "b", 2L), ("c", "d", 1L)), got.toString)
  }
}
