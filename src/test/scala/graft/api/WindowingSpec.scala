package graft.api

import org.scalatest.funsuite.AnyFunSuite

class WindowingSpec extends AnyFunSuite {

  test("fixed windows align to epoch") {
    assert(FixedWindows(10).assign(0) == Seq(TimeWindow(0, 10)))
    assert(FixedWindows(10).assign(9) == Seq(TimeWindow(0, 10)))
    assert(FixedWindows(10).assign(10) == Seq(TimeWindow(10, 20)))
    assert(FixedWindows(10).assign(-1) == Seq(TimeWindow(-10, 0)))
  }

  test("sliding windows cover stamp exactly size/slide times") {
    val w = SlidingWindows(30, 10)
    assert(w.assign(25).toSet ==
      Set(TimeWindow(0, 30), TimeWindow(10, 40), TimeWindow(20, 50)))
    assert(w.assign(0).size == 3)
  }

  test("calendar months/years variable length") {
    val m = CalendarWindows("months", 1, "UTC")
    // 2024-02-10 -> [Feb 1, Mar 1) 2024 (leap February, 29 days)
    val feb10 = 1707523200000L
    val Seq(w) = m.assign(feb10)
    assert(w.start == 1706745600000L) // 2024-02-01
    assert(w.end == 1709251200000L)   // 2024-03-01
    val y = CalendarWindows("years", 1, "UTC")
    val Seq(wy) = y.assign(feb10)
    assert(wy.start == 1704067200000L) // 2024-01-01
    assert(wy.end == 1735689600000L)   // 2025-01-01
  }

  test("calendar weeks start Monday") {
    val w = CalendarWindows("weeks", 1, "UTC")
    // 2024-01-10 is a Wednesday -> week [Mon Jan 8, Mon Jan 15)
    val Seq(win) = w.assign(1704844800000L)
    assert(win.start == 1704672000000L) // 2024-01-08
    assert(win.end == 1705276800000L)   // 2024-01-15
  }

  test("multi-unit calendar windows bucket from epoch") {
    val d3 = CalendarWindows("days", 3, "UTC")
    val Seq(w1) = d3.assign(0)
    assert(w1 == TimeWindow(0, 3L * 86400000))
    val Seq(w2) = d3.assign(3L * 86400000)
    assert(w2.start == 3L * 86400000)
  }

  test("calendar windows declare their stamp unit; micros in = micros out") {
    val feb10ms = 1707523200000L
    // a micros stamp fed to a millis-declared calendar window throws
    // loudly instead of bucketing into year ~56,000
    val ms = CalendarWindows("months", 1, "UTC")
    val ex = intercept[IllegalArgumentException](ms.assign(feb10ms * 1000))
    assert(ex.getMessage.contains("micros"), ex.getMessage)
    // stampUnit = micros: same calendar bucket, bounds in micros
    val us = CalendarWindows("months", 1, "UTC", stampUnit = "micros")
    val Seq(w) = us.assign(feb10ms * 1000)
    assert(w.start == 1706745600000000L) // 2024-02-01 in micros
    assert(w.end == 1709251200000000L)   // 2024-03-01 in micros
    intercept[IllegalArgumentException](CalendarWindows("months", 1, "UTC", "nanos"))
  }

  test("global window spans everything") {
    assert(GlobalWindowing.assign(123).head.start == Long.MinValue)
  }
}
