package graft.util

/** Locale-fixed numeric formatting for JSON artifact writers. Scala's
  * f"%.4f" interpolator formats through the JVM DEFAULT locale, which
  * renders a comma decimal separator on e.g. de_DE — invalid JSON (the
  * r14 CalibrateChild failure mode, reintroduced in r15's serving block
  * per the r15 advice). Every machine-parsed artifact writer (Bench,
  * Steady, SkewSweep) formats floats through here; human-facing stderr
  * lines may keep the interpolator.
  */
object Jnum {
  def f(d: Double, digits: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${digits}f", Double.box(d))
  def f1(d: Double): String = f(d, 1)
  def f3(d: Double): String = f(d, 3)
  def f4(d: Double): String = f(d, 4)
}
