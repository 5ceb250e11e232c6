package graft

/** Scratch-space root for benchmark/verify artifacts (TSV round-trips,
  * bucketed tables, stream feed drops, republish targets, provenance
  * sidecars) and Spark shuffle spill. Prefers the RAM-backed tmpfs:
  * the bench host's /tmp sits on a virtio disk whose write stalls were
  * the largest remaining run-to-run variance (s1_tsv_roundtrip measured
  * 0.9 s to 34 s across identical runs). Scratch artifacts are
  * ephemeral by definition; a cluster deployment writes real sinks to
  * HDFS/S3 and spills to local SSD. Override with SPARK_GRAFT_SCRATCH. */
object ScratchDirs {
  lazy val root: String = {
    val pref = sys.env.getOrElse("SPARK_GRAFT_SCRATCH", {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_scratch" else "/tmp/graft_scratch"
    })
    new java.io.File(pref).mkdirs()
    pref
  }
  def dir(parts: String*): String = (root +: parts).mkString("/")
}
