ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "auroramitoetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The round driver parses the LAST stdout line of `sbt runMain graft.Bench`
// as the benchmark JSON; sbt's "[success] Total time..." footer otherwise
// lands after it and breaks the parse (BENCH_r01.json: "parsed": null).
Global / showSuccess := false
// Inherit stdout/stderr in forked runs: the bench JSON line then prints
// raw instead of wrapped as "[info] {...}", so a bare json.loads of the
// last line works.
run / outputStrategy := Some(StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Forked-JVM temp space (streaming checkpoints/WAL, spill temp files)
// on the RAM-backed tmpfs when available: /tmp is a virtio disk whose
// write stalls skew benchmark runs (see graft.ScratchDirs).
val forkTmpDir: String = {
  val shm = new java.io.File("/dev/shm")
  val d = if (shm.isDirectory && shm.canWrite) "/dev/shm/graft_tmp" else "/tmp"
  new java.io.File(d).mkdirs(); d
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Djava.io.tmpdir=$forkTmpDir",
  // local[32] on the 128 GiB bench host: 8g heap makes the 77-query
  // bench session GC-bound by the time the later queries run (driver
  // round 1 measured d1_classify_aggregate 25 s aged vs 4 s fresh).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Pin the heap and madvise it huge: this VM faults fresh 4 KiB pages
  // at only ~120 MB/s, serialized on mmap_lock across the 32 task
  // threads (kernel stacks: do_user_addr_fault -> lock_mm_and_find_vma;
  // 60-180 s sys-time stalls hitting RANDOM bench repeats). An unpinned
  // G1 heap re-triggers the storm every time it uncommits after the
  // periodic System.gc() and regrows; -Xms=-Xmx makes each page fault
  // at most once per JVM, and THP madvise cuts the fault count 512x.
  // Measured on dedup_ngram_jaccard at the 10x bench corpus:
  // 67/90/14 s (unpinned) -> 7/3/2 s repeats with these flags.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseTransparentHugePages",
)
