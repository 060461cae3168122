package graft.api

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.SparkSpec

/** Property laws for the r11 timed keyed-state variants (the timestamp
  * propagation that lets stateful ops chain, GroovyEnvTest:749):
  *
  *  1. projection: dropping the stamp from the Timed output reproduces the
  *     untimed operator's output exactly (same lowering, same order);
  *  2. stamp fidelity: each output row carries ITS input element's stamp —
  *     the per-key multiset of (stamp → emitted value) matches a reference
  *     in-memory fold in stamp order;
  *  3. chaining: integratePerKeyTimed over reduceValueStateByKeyTimed equals
  *     the reference two-stage fold computed in memory.
  *
  * Stamps are generated UNIQUE per key so the sequential order is total —
  * tie order across equal stamps is engine-unspecified (documented in
  * ParityMatrixSpec).
  */
object TimedStateLaws extends Properties("TimedState") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  import SparkSpec.spark.implicits._

  // per-key unique stamps: shuffled (key, stamp, value) rows
  private val elemGen: Gen[List[(String, Long, Int)]] = for {
    keys <- Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c"))
    rows <- Gen.sequence[List[(String, Long, Int)], (String, Long, Int)](
      keys.zipWithIndex.map { case (k, i) =>
        Gen.choose(0, 99).map(v => (k, i.toLong * 7 + k.hashCode % 7, v))
      })
  } yield rows.groupBy(r => (r._1, r._2)).values.map(_.head).toList

  private def stream(xs: List[(String, Long, Int)]) =
    GStream.fromSeq(SparkSpec.spark, xs).assignEventTime(_._2)

  /** In-memory reference: per key in stamp order, emit output(st, v) then
    * st = update(st, v).
    */
  private def refFold(xs: List[(String, Long, Int)]): Map[String, List[(Long, Int)]] =
    xs.groupBy(_._1).map { case (k, rows) =>
      var st = 0
      k -> rows.sortBy(_._2).map { case (_, t, v) =>
        val o = v - st; st = v; (t, o)
      }
    }

  property("timed reduceValueState projects to the untimed output") =
    Prop.forAll(elemGen) { xs =>
      val timed = stream(xs)
        .reduceValueStateByKeyTimed[String, Int, Int, Int](
          _._1, _._3, 0, (s, v) => v - s, (_, v) => v)
        .collect().map(t => (t._1, t._2)).sorted.toList
      val untimed = stream(xs)
        .reduceValueStateByKey[String, Int, Int, Int](
          _._1, _._3, 0, (s, v) => v - s, (_, v) => v)
        .collect().sorted.toList
      Prop(timed == untimed) :| s"timed=$timed untimed=$untimed"
    }

  property("timed reduceValueState carries each element's own stamp") =
    Prop.forAll(elemGen) { xs =>
      val got = stream(xs)
        .reduceValueStateByKeyTimed[String, Int, Int, Int](
          _._1, _._3, 0, (s, v) => v - s, (_, v) => v)
        .collect().groupBy(_._1)
        .map { case (k, rows) => k -> rows.map(t => (t._3, t._2)).sortBy(_._1).toList }
      val want = refFold(xs)
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("chained timed ops equal the in-memory two-stage fold") =
    Prop.forAll(elemGen) { xs =>
      // stage 1: per-key diff; stage 2: GLOBAL running sum in stamp order.
      // Global stamps must be unique for a total order: keep one row per
      // stamp across keys.
      val uniq = xs.groupBy(_._2).values.map(_.head).toList
      val reduced = stream(uniq)
        .reduceValueStateByKeyTimed[String, Int, Int, Int](
          _._1, _._3, 0, (s, v) => v - s, (_, v) => v)
      val got = reduced
        .integratePerKeyTimed[String, Int](_ => "", _._2, 0, _ + _)
        .collect().sortBy(_._3).map(_._2).toList
      val diffs = refFold(uniq).values.flatten.toList.sortBy(_._1)
      val want = diffs.scanLeft(0)((acc, tv) => acc + tv._2).drop(1)
      Prop(got == want) :| s"got=$got want=$want"
    }

  property("timed integratePerKey preserves stamps and running order") =
    Prop.forAll(elemGen) { xs =>
      val got = stream(xs)
        .integratePerKeyTimed[String, Int](_._1, _._3, 0, _ + _)
        .collect().groupBy(_._1)
        .map { case (k, rows) => k -> rows.sortBy(_._3).map(_._2).toList }
      val want = xs.groupBy(_._1).map { case (k, rows) =>
        k -> rows.sortBy(_._2).map(_._3).scanLeft(0)(_ + _).drop(1)
      }
      Prop(got == want) :| s"got=$got want=$want"
    }
}
