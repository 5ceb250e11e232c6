package graft

/** Host-noise telemetry from /proc (Linux; every sampler degrades to
  * None/zero elsewhere, so specs and non-Linux dev hosts still run).
  *
  * The bench VM takes bursty co-tenant contention windows — sys+steal
  * storms measured at up to 90% of a 5 s /proc/stat sample — plus
  * fresh-page faults serialized on mmap_lock (see build.sbt's heap
  * pinning note). Both are ADDITIVE noise on top of a query's steady
  * plan cost, but until r13 only the builder-side repeat tooling could
  * see them. These samplers make the noise mechanically adjudicable in
  * the DRIVER's single run: [[Bench]] brackets every timed sample with
  * a cpu+fault snapshot and commits the sys+steal fraction and fault
  * deltas next to the seconds, so a slow sample carries its own
  * storm-or-not verdict instead of requiring stderr archaeology. */
object HostStat {

  /** One /proc/stat aggregate-cpu sample (cumulative jiffies). */
  final case class Cpu(total: Long, sysSteal: Long)

  /** (minorFaults, majorFaults) of this process, cumulative. */
  final case class Faults(minor: Long, major: Long)

  /** Aggregate-cpu jiffies: total plus the system+irq+softirq+steal
    * subset that the documented storms show up in. */
  def cpu(): Option[Cpu] =
    try {
      val src = scala.io.Source.fromFile("/proc/stat")
      try src.getLines().find(_.startsWith("cpu ")).map { line =>
        // cpu  user nice system idle iowait irq softirq steal ...
        val f = line.trim.split("\\s+").drop(1).map(_.toLong)
        def at(i: Int): Long = if (f.length > i) f(i) else 0L
        Cpu(f.sum, at(2) + at(5) + at(6) + at(7))
      } finally src.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Fraction of the interval's host CPU time spent in
    * system+irq+softirq+steal; 0.0 when /proc is unreadable or the
    * interval is empty (sub-jiffy windows on an idle host). */
  def stormFrac(before: Option[Cpu], after: Option[Cpu]): Double =
    (before, after) match {
      case (Some(a), Some(b)) if b.total > a.total =>
        (b.sysSteal - a.sysSteal).toDouble / (b.total - a.total)
      case _ => 0.0
    }

  /** Cumulative process fault counters from /proc/self/stat. */
  def faults(): Faults =
    try {
      val rest = selfStatTail()
      Faults(rest(7).toLong, rest(9).toLong)
    } catch { case scala.util.control.NonFatal(_) => Faults(0L, 0L) }

  /** Cumulative CPU seconds (utime+stime) of THIS process. The
    * discriminator sys+steal alone lacks: a co-tenant burning USER
    * cpu (or scheduler throttling) inflates wall time with no
    * sys/steal signature — but it shows up as a LOW cpu/wall ratio
    * for our own process, while a genuine compute/GC/JIT cost shows
    * cpu ≈ parallelism × wall. Bench records the per-sample ratio. */
  def procCpuSec(): Double =
    try {
      val rest = selfStatTail()
      // 1-based fields 14 (utime) + 15 (stime), in clock ticks
      (rest(11).toLong + rest(12).toLong).toDouble / Ticks
    } catch { case scala.util.control.NonFatal(_) => 0.0 }

  private val Ticks: Double = 100.0 // Linux USER_HZ; fixed since 2.6

  // proc(5): fields after the parenthesized comm (split on the LAST
  // ')' — comm may itself contain one); 1-based field 10 = minflt,
  // 12 = majflt, 14/15 = utime/stime, and rest(0) is field 3 (state).
  private def selfStatTail(): Array[String] = {
    val s = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat")),
      java.nio.charset.StandardCharsets.US_ASCII)
    s.substring(s.lastIndexOf(')') + 2).split(" ")
  }
}
