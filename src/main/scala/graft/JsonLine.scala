package graft

/** Shared JSON-line primitives for the driver-contract artifacts (Bench,
  * EnduranceBench, Verify): ONE escape implementation and ONE locale-pinned
  * number format. All three outputs feed the same external json.load, so a
  * fix applied to one copy must be impossible to miss in another.
  */
private[graft] object JsonLine {

  /** JSON string escape: backslash, quote, and ALL control chars (<0x20) —
    * a tab or CR in builder-authored SQL or an exception message would
    * otherwise make the driver's parse fail and zero the round.
    */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Locale-pinned decimal: the `f` interpolator formats through the JVM
    * default locale, which renders 1.5 as "1,500" under e.g. de_DE —
    * invalid JSON in the middle of the driver-contract line.
    */
  def num(v: Double, decimals: Int = 3): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
}
