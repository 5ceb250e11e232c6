package graft

import java.io.File

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Loader for the committed steady-state bench artifact
  * (BENCH_steady_rN.json, built by dev/build_steady_artifact.py as the
  * min over every committed repeat per query). [[Bench]] uses it as the
  * per-query expectation that storm-retry decisions compare against: a
  * single-run sample far above its committed steady value is either a
  * plan regression (which the shuffle-byte pins catch) or a host storm
  * (which a retry disambiguates).
  *
  * Resolution: SPARK_GRAFT_STEADY_REF=path overrides; otherwise the
  * highest-round BENCH_steady_r<N>.json in the working directory (sbt
  * forks and dev/run_main.sh both run with cwd = repo root). Absent or
  * unparsable → None, and Bench falls back to absolute thresholds. */
object SteadyRef {

  private val NamePat = """BENCH_steady_r(\d+)\.json""".r

  /** A parsed steady artifact: source file name (for the bench line's
    * self-describing protocol string), the sfDir it was measured at
    * (thresholds only apply when the bench runs the same SF), and the
    * per-query steady seconds. */
  final case class Loaded(file: String, sf: String, secs: Map[String, Double])

  def load(): Option[Loaded] =
    locate().flatMap(f => parse(f).map { case (sf, qs) =>
      Loaded(f.getName, sf, qs)
    })

  private[graft] def locate(): Option[File] =
    sys.env.get("SPARK_GRAFT_STEADY_REF").map(new File(_)).filter(_.isFile)
      .orElse {
        val cands = Option(new File(".").listFiles()).getOrElse(Array.empty)
          .flatMap { f =>
            f.getName match {
              case NamePat(n) => Some((n.toInt, f))
              case _ => None
            }
          }
        cands.sortBy(-_._1).headOption.map(_._2)
      }

  private[graft] def parse(f: File): Option[(String, Map[String, Double])] =
    try {
      val j = JsonMethods.parse(f)
      val sf = j \ "sf" match { case JString(s) => s; case _ => "" }
      val qs = j \ "queries_all" match {
        case JObject(fields) =>
          fields.flatMap { case (name, v) =>
            v \ "sec" match {
              case JDouble(d) => Some(name -> d)
              case JInt(i) => Some(name -> i.toDouble)
              case JDecimal(d) => Some(name -> d.toDouble)
              case JLong(l) => Some(name -> l.toDouble)
              case _ => None
            }
          }.toMap
        case _ => Map.empty[String, Double]
      }
      if (qs.isEmpty) None else Some((sf, qs))
    } catch { case scala.util.control.NonFatal(_) => None }
}
