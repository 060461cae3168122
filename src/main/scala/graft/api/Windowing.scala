package graft.api

import java.time.{Instant, LocalDate, ZoneId, ZonedDateTime}
import java.time.temporal.ChronoUnit

/** Event-time window bounds, end exclusive, in the STREAM's event-time
  * unit: fixed/sliding/session windowing is proportional (floor-divide
  * arithmetic), so millis event times yield millis bounds and micros yield
  * micros — pass durations in the same unit as the event time. Only
  * [[CalendarWindows]] is unit-bound (see its stampUnit).
  */
final case class TimeWindow(start: Long, end: Long) {
  def maxTimestamp: Long = end - 1
}

/** Windowing strategies of the reference's WindowedStream
  * (reference: tools/.../Stream.java:291 timeWindow, :300 timeSlidingWindow,
  * :310 sessionWindow, :322 calendarWindow, :329 windowAll; Beam impls
  * BeamStream.java:831-883, calendar windows
  * beam/core/.../transforms/CalendarWindows.java).
  *
  * `assign` maps an element stamp to the windows containing it — a pure
  * function usable inside any Spark lowering (a flatMap for the typed path;
  * the column path uses `window()`/`session_window()` instead). Session
  * windows are gap-merged per key and have no per-element assignment.
  */
sealed trait Windowing extends Serializable {
  def assign(stamp: Long): Seq[TimeWindow]
}

case object GlobalWindowing extends Windowing {
  private val all = Seq(TimeWindow(Long.MinValue, Long.MaxValue))
  def assign(stamp: Long): Seq[TimeWindow] = all
}

final case class FixedWindows(sizeMs: Long) extends Windowing {
  def assign(stamp: Long): Seq[TimeWindow] = {
    val start = Math.floorDiv(stamp, sizeMs) * sizeMs
    Seq(TimeWindow(start, start + sizeMs))
  }
}

final case class SlidingWindows(sizeMs: Long, slideMs: Long) extends Windowing {
  def assign(stamp: Long): Seq[TimeWindow] = {
    // windows with start in (stamp - size, stamp] aligned to slide
    val lastStart = Math.floorDiv(stamp, slideMs) * slideMs
    Iterator.iterate(lastStart)(_ - slideMs)
      .takeWhile(s => s > stamp - sizeMs)
      .map(s => TimeWindow(s, s + sizeMs))
      .toSeq
  }
}

/** Gap-based session windows; merging happens in the grouping operator
  * (per key), not in `assign`.
  */
final case class SessionWindows(gapMs: Long) extends Windowing {
  def assign(stamp: Long): Seq[TimeWindow] = Seq(TimeWindow(stamp, stamp + gapMs))
}

/** Calendar-aligned windows: days/weeks/months/years × count, in a timezone.
  * Month/year windows are variable-length — computed with java.time, same
  * rules as the reference's CalendarWindows WindowFn.
  *
  * Unlike the proportional windowings (fixed/sliding/session, which work in
  * whatever unit the stream's event time uses), calendar arithmetic must
  * know the epoch unit: `stampUnit` is "millis" (default) or "micros".
  * Window bounds are always returned in the INPUT unit. A stamp whose
  * magnitude contradicts the declared unit throws instead of silently
  * bucketing into year ~56,000 (the engine's StreamElement stamps are
  * micros — pass stampUnit = "micros" when windowing those directly).
  */
final case class CalendarWindows(unit: String, count: Int, tz: String,
    stampUnit: String = "millis") extends Windowing {
  require(stampUnit == "millis" || stampUnit == "micros",
    s"stampUnit must be 'millis' or 'micros', got $stampUnit")
  private def zone = ZoneId.of(tz)

  // year ~4000 in the unit: anything beyond is a unit mistake, not data
  private def magnitudeCap: Long =
    if (stampUnit == "millis") 64000000000000L else 64000000000000000L

  def assign(stamp: Long): Seq[TimeWindow] = {
    require(math.abs(stamp) < magnitudeCap,
      s"calendar window stamp $stamp is implausible for unit '$stampUnit' " +
        "(looks like a finer unit — declare stampUnit = \"micros\" or convert)")
    val stampMs =
      if (stampUnit == "millis") stamp else Math.floorDiv(stamp, 1000L)
    val zdt = ZonedDateTime.ofInstant(Instant.ofEpochMilli(stampMs), zone)
    val (start, end) = unit match {
      case "days" =>
        val d0 = zdt.truncatedTo(ChronoUnit.DAYS)
        val epochDay = d0.toLocalDate.toEpochDay
        val bucketStartDay = Math.floorDiv(epochDay, count.toLong) * count
        val s = LocalDate.ofEpochDay(bucketStartDay).atStartOfDay(zone)
        (s, s.plusDays(count.toLong))
      case "weeks" =>
        val d0 = zdt.truncatedTo(ChronoUnit.DAYS)
          .minusDays(zdt.getDayOfWeek.getValue - 1L) // ISO week start Monday
        val epochWeek = Math.floorDiv(d0.toLocalDate.toEpochDay - 4, 7L) // 1970-01-05 is a Monday
        val bucket = Math.floorDiv(epochWeek, count.toLong) * count
        val s = LocalDate.ofEpochDay(bucket * 7 + 4).atStartOfDay(zone)
        (s, s.plusWeeks(count.toLong))
      case "months" =>
        val monthsSinceEpoch = (zdt.getYear - 1970) * 12 + (zdt.getMonthValue - 1)
        val bucket = Math.floorDiv(monthsSinceEpoch.toLong, count.toLong) * count
        val y = 1970 + Math.floorDiv(bucket, 12L).toInt
        val m = Math.floorMod(bucket, 12L).toInt + 1
        val s = ZonedDateTime.of(y, m, 1, 0, 0, 0, 0, zone)
        (s, s.plusMonths(count.toLong))
      case "years" =>
        val bucket = Math.floorDiv((zdt.getYear - 1970).toLong, count.toLong) * count
        val s = ZonedDateTime.of(1970 + bucket.toInt, 1, 1, 0, 0, 0, 0, zone)
        (s, s.plusYears(count.toLong))
      case other =>
        throw new IllegalArgumentException(s"Unknown calendar unit: $other")
    }
    val (s, e) = (start.toInstant.toEpochMilli, end.toInstant.toEpochMilli)
    if (stampUnit == "millis") Seq(TimeWindow(s, e))
    else Seq(TimeWindow(Math.multiplyExact(s, 1000L), Math.multiplyExact(e, 1000L)))
  }
}
