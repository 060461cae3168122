package graft.operators

import graft.core.GraftOperator
import graft.streaming.{BlobLogFamily, CommitLogFamily}

/** Config-declared storage maintenance: families carry their policies in
  * the repository config (the reference's cfg-map pattern on attribute
  * families) and one scheduled [[run]] applies them —
  *
  * {{{
  * attributeFamilies {
  *   event-log {
  *     entity: user, storage: "file:///data/log", access: commit-log
  *     retention: 10d            # drop elements older than now − 10d
  *     compact-target-mb: 128    # rewrite into ~128 MB files
  *   }
  * }
  * }}}
  *
  * Retention lowers to the binding's cheapest mechanism:
  * [[FileCompaction.compactRetaining]] for flat parquet logs
  * (element-precise, fused with the small-files rewrite),
  * [[BlobLogFamily.expirePeriods]] for roll-period blob layouts
  * (whole-prefix deletion, zero bytes read). `nowUs` is caller-provided
  * — maintenance must be replayable/deterministic under test, and a
  * scheduler owns the clock, not the engine.
  */
object Maintenance {

  final case class Action(family: String, kind: String, detail: String)

  /** "30s" / "45m" / "36h" / "10d" → micros. */
  def durationUs(s: String): Long = {
    val t = s.trim
    require(t.nonEmpty, "empty duration")
    val (num, unit) = t.span(c => c.isDigit)
    require(num.nonEmpty, s"bad duration '$s'")
    val base = num.toLong
    unit match {
      case "s" => base * 1000000L
      case "m" => base * 60000000L
      case "h" => base * 3600000000L
      case "d" => base * 86400000000L
      case u   => throw new IllegalArgumentException(
        s"bad duration unit '$u' in '$s' (use s/m/h/d)")
    }
  }

  /** Apply every family's declared policies; returns what happened. */
  def run(op: GraftOperator, nowUs: Long): Seq[Action] =
    op.repo.families.values.toSeq.sortBy(_.name).flatMap { f =>
      val retention = f.options.get("retention").map(durationUs)
      val targetMb = f.options.get("compact-target-mb").map(_.toLong)
      if (retention.isEmpty && targetMb.isEmpty) Seq.empty
      else op.family(f.name) match {
        case b: BlobLogFamily =>
          val expired = retention.toSeq.flatMap { r =>
            val dropped = b.expirePeriods(nowUs - r)
            Seq(Action(f.name, "expire-periods",
              s"dropped ${dropped.size} period dirs"))
          }
          val ignored = targetMb.toSeq.map(_ => Action(f.name, "skip",
            "compact-target-mb not applicable to roll-period layout"))
          expired ++ ignored
        case c: CommitLogFamily =>
          val horizon = retention.map(nowUs - _).getOrElse(Long.MinValue)
          val target = targetMb.map(_ << 20).getOrElse(128L << 20)
          val st = FileCompaction.compactRetaining(c, horizon, target)
          Seq(Action(f.name, "compact",
            s"files ${st.filesBefore}->${st.filesAfter}, rows ${st.rows}"))
        case _ =>
          Seq(Action(f.name, "skip",
            "declared maintenance unsupported for this binding"))
      }
    }
}
