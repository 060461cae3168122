package graft.api

import graft.SparkSpec

/** Operator-semantics spec — the Spark analog of the reference's abstract
  * GroovyEnvTest suite (reference: tools/.../GroovyEnvTest.java:41; same
  * inputs/assertions where practical: join :457, leftJoin :506,
  * integratePerKey :598, reduceValueStateByKey :645, sliding sum+distinct
  * :1048, calendar windows :1114).
  */
class GStreamSpec extends SparkSpec {
  import SparkSpec.spark.implicits._
  private implicit def sp = spark

  private def stream[T: org.apache.spark.sql.Encoder](xs: T*): GStream[T] =
    GStream.fromSeq(spark, xs)

  test("map / filter / flatMap / union") {
    val s = stream(1, 2, 3, 4)
    assert(s.map(_ * 2).collect().sorted == Seq(2, 4, 6, 8))
    assert(s.filter(_ % 2 == 0).collect().sorted == Seq(2, 4))
    assert(s.flatMap(x => Seq(x, x)).collect().sorted ==
      Seq(1, 1, 2, 2, 3, 3, 4, 4))
    assert(s.union(stream(9)).collect().sorted == Seq(1, 2, 3, 4, 9))
  }

  test("windowAll countByKey (GroovyEnvTest-style global count)") {
    val s = stream("a" -> 1, "b" -> 2, "a" -> 3)
    val r = s.windowAll().countByKey(_._1).collect()
    assert(r.map(x => x._2 -> x._3).toMap == Map("a" -> 2L, "b" -> 1L))
  }

  test("timeWindow sum per key") {
    // two 10ms windows: [0,10) and [10,20)
    val s = stream((0L, "k", 1.0), (5L, "k", 2.0), (12L, "k", 4.0))
      .assignEventTime(_._1)
    val r = s.timeWindow(10).sumByKey(_._2, _._3).collect()
    assert(r.map(x => x._1.start -> x._3).toMap == Map(0L -> 3.0, 10L -> 4.0))
  }

  test("sliding window sum + distinct (testSumDistinctSlidingWindow:1048)") {
    // size 20 slide 10: stamps 5,15 -> windows starting -10,0,10
    val s = stream((5L, 1.0), (15L, 2.0)).assignEventTime(_._1)
    val sums = s.timeSlidingWindow(20, 10).sum(_._2).collect()
      .map(x => x._1.start -> x._2).toMap
    assert(sums == Map(-10L -> 1.0, 0L -> 3.0, 10L -> 2.0))
    val d = s.timeSlidingWindow(20, 10).distinct(_._2).collect()
    assert(d.count(_._1.start == 0L) == 2)
  }

  test("session window merges within gap, splits at gap") {
    val s = stream((0L, "u"), (5L, "u"), (30L, "u"), (7L, "v"))
      .assignEventTime(_._1)
    val r = s.sessionWindow(10).countByKey(_._2).collect()
    val byKey = r.groupBy(_._2)
    assert(byKey("u").map(x => (x._1.start, x._3)).toSet ==
      Set((0L, 2L), (30L, 1L)))
    assert(byKey("v").map(x => (x._1.start, x._3)).toSet == Set((7L, 1L)))
  }

  test("calendar window months (testCalendarWindow:1114)") {
    // 2024-01-15 and 2024-02-02 UTC fall in different monthly windows
    val jan = 1705276800000L // 2024-01-15
    val feb = 1706832000000L // 2024-02-02
    val s = stream((jan, 1.0), (feb, 2.0)).assignEventTime(_._1)
    val r = s.calendarWindow("months", 1, "UTC").sum(_._2).collect()
    assert(r.size == 2)
    val starts = r.map(_._1.start).sorted
    assert(starts == Seq(1704067200000L, 1706745600000L)) // Jan 1, Feb 1 2024
  }

  test("calendar window days respects timezone") {
    // 2024-01-15T23:30Z is Jan 15 in UTC but Jan 16 in UTC+1
    val t = 1705361400000L
    val utc = stream(Tuple1(t)).assignEventTime(_._1)
      .calendarWindow("days", 1, "UTC").count().collect()
    val prague = stream(Tuple1(t)).assignEventTime(_._1)
      .calendarWindow("days", 1, "Europe/Prague").count().collect()
    assert(utc.head._1.start == 1705276800000L)    // Jan 15 00:00 UTC
    assert(prague.head._1.start == 1705359600000L) // Jan 16 00:00 CET = 23:00Z Jan 15
  }

  test("windowed inner join (testJoin:457)") {
    val left = stream("a" -> 1, "b" -> 2, "c" -> 3)
    val right = stream("a" -> 10, "b" -> 20, "d" -> 40)
    val r = left.windowAll()
      .join(right, (l: (String, Int)) => l._1, (r: (String, Int)) => r._1)
      .collect()
    assert(r.map(x => (x._1, x._2._2, x._3._2)).toSet ==
      Set(("a", 1, 10), ("b", 2, 20)))
  }

  test("windowed left join (testLeftOuterJoin:506)") {
    val left = stream("a" -> 1, "c" -> 3)
    val right = stream("a" -> 10)
    val r = left.windowAll()
      .leftJoin(right, (l: (String, Int)) => l._1, (r: (String, Int)) => r._1)
      .collect()
    assert(r.map(x => (x._1, x._3.map(_._2))).toSet ==
      Set(("a", Some(10)), ("c", None)))
  }

  test("join only matches within the same window") {
    val left = stream((0L, "k", 1), (15L, "k", 2)).assignEventTime(_._1)
    val right = stream((3L, "k", 10)).assignEventTime(_._1)
    val r = left.timeWindow(10)
      .join(right, (l: (Long, String, Int)) => l._2, (r: (Long, String, Int)) => r._2)
      .collect()
    assert(r.map(x => (x._2._3, x._3._3)).toSet == Set((1, 10)))
  }

  test("session join merges sessions ACROSS inputs (Beam Sessions at CoGBK)") {
    // left t=0, right t=100, gap 1000: same merged session — per-side
    // assignment would put them in (0,1000) vs (100,1100) and never match
    val left = stream((0L, "k", 1), (5000L, "k", 2)).assignEventTime(_._1)
    val right = stream((100L, "k", 10)).assignEventTime(_._1)
    val j = left.sessionWindow(1000)
      .join(right, (l: (Long, String, Int)) => l._2, (r: (Long, String, Int)) => r._2)
      .collect()
    assert(j.map(x => (x._2._3, x._3._3)).toSet == Set((1, 10)))
    // leftJoin: the t=5000 session has no right element -> None
    val lj = left.sessionWindow(1000)
      .leftJoin(right, (l: (Long, String, Int)) => l._2, (r: (Long, String, Int)) => r._2)
      .collect()
    assert(lj.map(x => (x._2._3, x._3.map(_._3))).toSet ==
      Set((1, Some(10)), (2, None)))
    // a RIGHT element can bridge two left elements into one session:
    // left at 0 and 1500 with gap 1000 are separate alone, but a right
    // at 800 extends the session to 1800 and merges them
    val lbridge = stream((0L, "k", 1), (1500L, "k", 2)).assignEventTime(_._1)
    val rbridge = stream((800L, "k", 10)).assignEventTime(_._1)
    val bj = lbridge.sessionWindow(1000)
      .join(rbridge, (l: (Long, String, Int)) => l._2, (r: (Long, String, Int)) => r._2)
      .collect()
    assert(bj.map(x => (x._2._3, x._3._3)).toSet == Set((1, 10), (2, 10)))
  }

  test("union with differing event-time assignments throws") {
    val a = stream((1L, 1)).assignEventTime(_._1)
    val b = stream((2L, 2)).assignEventTime(_._2.toLong)
    intercept[IllegalArgumentException](a.union(b))
    intercept[IllegalArgumentException](a.union(stream((3L, 3))))
    // agreeing sides survive: same extractor instance
    val f = (x: (Long, Int)) => x._1
    assert(stream((1L, 1)).assignEventTime(f)
      .union(stream((2L, 2)).assignEventTime(f))
      .timeWindow(10).count().collect().head._2 == 2L)
  }

  test("integratePerKey with Array[Byte] keys uses value equality") {
    // fresh array per deserialized row: reference == would reset the
    // accumulator every element
    implicit val ke = org.apache.spark.sql.Encoders.BINARY
    implicit val te = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.BINARY,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaDouble)
    implicit val oe = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.BINARY,
      org.apache.spark.sql.Encoders.scalaDouble)
    val s = stream((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 4.0))
      .assignEventTime(_._1)
    val r = s.integratePerKey[Array[Byte], Double](
      _._2.getBytes("UTF-8"), _._3, 0.0, _ + _)(ke, te, oe)
      .collect().map(_._2).sorted.toSeq
    assert(r == Seq(1.0, 3.0, 7.0), r.toString)
  }

  test("integratePerKey running sums in event-time order (testIntegratePerKey:598)") {
    val s = stream((1L, "a", 1.0), (3L, "a", 2.0), (2L, "a", 10.0), (1L, "b", 5.0))
      .assignEventTime(_._1)
    val r = s.integratePerKey[String, Double](_._2, _._3, 0.0, _ + _).collect()
    assert(r.filter(_._1 == "a").map(_._2).sorted == Seq(1.0, 11.0, 13.0))
    assert(r.filter(_._1 == "b").map(_._2) == Seq(5.0))
  }

  test("reduceValueStateByKey emits output(state, v) then updates state (:645)") {
    // state = previous value, output = previous value; init -1
    val s = stream((1L, "k", 10), (2L, "k", 20), (3L, "k", 30))
      .assignEventTime(_._1)
    val r = s.reduceValueStateByKey[String, Int, Int, Int](
      _._2, _._3, -1, (st, _) => st, (_, v) => v).collect()
    assert(r.map(_._2).sorted == Seq(-1, 10, 20))
  }

  test("reduceValueStateByKeyUnsorted folds per key without event time") {
    // unsorted form: no assignEventTime required; order within a key is
    // arbitrary, so fold with an order-insensitive state (running sum,
    // output = state BEFORE the element) and check the output multiset
    val s = stream((0L, "a", 1), (0L, "a", 2), (0L, "b", 5))
    val r = s.reduceValueStateByKeyUnsorted[String, Int, Int, Int](
      _._2, _._3, 0, (st, _) => st, (st, v) => st + v).collect()
    assert(r.filter(_._1 == "a").map(_._2).sorted == Seq(0, 1).sorted ||
      r.filter(_._1 == "a").map(_._2).sorted == Seq(0, 2).sorted,
      s"per-key fold must thread state through both elements: $r")
    assert(r.filter(_._1 == "b").map(_._2) == Seq(0))
  }

  test("reduce allows non-commutative fold; groupReduce sees whole group") {
    val s = stream((1L, "k", "x"), (2L, "k", "y")).assignEventTime(_._1)
    val folded = s.windowAll()
      .reduce[String, String](_._2, "", (acc, t) => acc + t._3)
      .collect()
    assert(folded.head._3.toSeq.sorted.mkString == "xy")
    val gr = s.windowAll()
      .groupReduce[String, Int](_._2, (_, _, xs) => Seq(xs.size))
      .collect()
    assert(gr == Seq(2))
  }

  test("sorted per window") {
    val s = stream((1L, 3), (2L, 1), (3L, 2)).assignEventTime(_._1)
    val r = s.windowAll().sorted(Ordering.by((x: (Long, Int)) => x._2)).collect()
    assert(r.head._2.map(_._2) == Seq(1, 2, 3))
  }

  test("withWindow pairs elements with their assigned windows") {
    val s = stream((1000L, 1), (2500L, 2), (5500L, 3)).assignEventTime(_._1)
    // tumbling 2s: [0,2000) [2000,4000) [4000,6000)
    val fixed = s.timeWindow(2000).withWindow.collect()
    assert(fixed.map { case (w, t) => (w.start, t._2) }.sorted ==
      Seq((0L, 1), (2000L, 2), (4000L, 3)))
    // sliding 4s every 2s: each element belongs to exactly two windows
    val sliding = s.timeSlidingWindow(4000, 2000).withWindow.collect()
    assert(sliding.count(_._2._2 == 1) == 2)
    assert(sliding.filter(_._2._2 == 2).map(_._1.start).sorted ==
      Seq(0L, 2000L))
  }

  test("sortedPrefix keeps the n smallest with bounded memory") {
    val data = (1 to 50).map(i => (i.toLong, (i * 37) % 50))
    val s = stream(data: _*).assignEventTime(_._1)
    val ord = Ordering.by((x: (Long, Int)) => x._2)
    val r = s.windowAll().sortedPrefix(5, ord).collect()
    assert(r.head._2.map(_._2) == data.map(_._2).sorted.take(5))
    // agrees with full sorted's prefix
    val full = s.windowAll().sorted(ord).collect().head._2.take(5)
    assert(r.head._2 == full)
  }
}
