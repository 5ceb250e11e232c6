package graft

import java.nio.file.{Files, Paths}
import graft.ops.Provenance
import graft.queries.MultimodalQueries
import org.apache.spark.sql.functions._

class ProvenanceMultimodalSpec extends SparkSpecBase {

  test("every multimodal/provenance query runs non-empty on the smoke SF") {
    MultimodalQueries.queries.foreach { case (name, fn) =>
      val n = fn(spark, sfDir).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("P1 provenance sidecar records rows, schema, and a stable digest") {
    val out = Files.createTempDirectory("prov").toString + "/ds"
    val df = Tables.orders(spark, sfDir).limit(100)
    Provenance.writeWithProvenance(df, out, "unit-test", Map("sf" -> "0.001"))
    val json = Files.readString(Paths.get(out, "_provenance.json"))
    assert(json.contains("\"rows\": 100"), json)
    assert(json.contains("unit-test"))
    assert(json.contains("o_orderkey"))
    val sha1 = Provenance.sha256OfDir(out)
    assert(sha1.matches("[0-9a-f]{64}"))
  }

  test("P3 assertConstraints passes on clean data, throws on violations") {
    val orders = Tables.orders(spark, sfDir)
    Provenance.assertConstraints(orders, Seq(
      "orderkey_not_null" -> col("o_orderkey").isNotNull))
    val e = intercept[IllegalStateException] {
      Provenance.assertConstraints(orders, Seq(
        "impossible" -> (col("o_totalprice") < 0)))
    }
    assert(e.getMessage.contains("impossible"))
  }

  test("P4 column profile: one row per column, typed extrema lanes are exclusive") {
    val rows = graft.queries.MultimodalQueries.p4ProfileColumns(spark, sfDir).collect()
    assert(rows.length == 4)
    val n = Tables.lineitem(spark, sfDir).count()
    rows.foreach { r =>
      assert(r.getLong(1) == n, "n_rows must be the table count")
      assert(r.getLong(2) == 0, "corpus has no nulls in the profiled columns")
      assert(r.getLong(3) > 0)
      val numeric = !r.isNullAt(4)
      if (numeric) {
        assert(r.getDouble(4) <= r.getDouble(5) && r.isNullAt(6) && r.isNullAt(7))
      } else {
        assert(r.isNullAt(4) && r.isNullAt(5) && r.getString(6) <= r.getString(7))
      }
    }
  }

  test("frame sample reassembles to the original payload length") {
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"))
    val frames = graft.ops.Multimodal.frameSample(media, "doc_id", "payload", 100)
      .groupBy("doc_id").agg(sum(length(col("frame"))).as("total"))
    val orig = Tables.documents(spark, sfDir)
      .select(col("doc_id"), length(col("text")).cast("long").as("expected"))
    val bad = frames.join(orig, "doc_id")
      .filter(col("total") =!= col("expected")).count()
    assert(bad == 0)
  }

  test("P5 skew profile: all columns covered, shares consistent, agrees with a window recompute") {
    import graft.queries.MultimodalQueries
    val rows = MultimodalQueries.p5SkewProfile(spark, sfDir).collect()
    assert(rows.length == 5, s"expected 5 profiled columns, got ${rows.length}")
    rows.foreach { r =>
      val (nRows, nKeys) = (r.getAs[Long]("n_rows"), r.getAs[Long]("n_keys"))
      val (t1, t10) = (r.getAs[Double]("top1_share"), r.getAs[Double]("top10_share"))
      assert(t1 >= 1.0 / nKeys - 1e-9 && t1 <= 1.0, s"top1 out of range: $r")
      assert(t10 >= t1 - 1e-9 && t10 <= 1.0, s"top10 < top1: $r")
      assert(nRows > 0 && nKeys > 0)
    }
    // brute-force recompute of one column via a window
    import org.apache.spark.sql.expressions.Window
    val c = Tables.events(spark, sfDir).groupBy(col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val total = c.agg(sum("cnt")).collect().head.getLong(0)
    val top10 = c.withColumn("rn",
        row_number().over(Window.orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rn") <= 10).agg(sum("cnt")).collect().head.getLong(0)
    val got = rows.find(_.getString(0) == "events.event_type").get
    assert(got.getAs[Double]("top10_share") ==
      BigDecimal(top10.toDouble / total).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble ||
      math.abs(got.getAs[Double]("top10_share") - top10.toDouble / total) < 1e-6)
  }

  test("perceptual-hash near-dup: bucketed candidates find exactly the all-pairs result") {
    import graft.expr.hashfunctions.block_hash60
    import graft.queries.MultimodalQueries
    val bucketed = MultimodalQueries.mmPhashNeardup(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val sig = Tables.documents(spark, sfDir)
      .filter(length(col("text")) >= 60)
      .select(col("doc_id"), block_hash60(col("text").cast("binary")).as("h"))
    val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id"),
        bit_count(col("a.h").bitwiseXOR(col("b.h"))).cast("long").as("d"))
      .filter(col("d") <= MultimodalQueries.MmPhashMaxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(bucketed == brute, s"bucketed ${bucketed.size} vs brute ${brute.size}")
    assert(brute.nonEmpty, "no near-dup payloads at this SF — threshold tuned wrong")
    // kernel sanity on a hand-checkable payload: first half zeros,
    // second half high bytes -> low blocks 0, high blocks 1
    val bytes = (Array.fill(60)(0.toByte) ++ Array.fill(60)(100.toByte))
    val got = graft.expr.TextHash.blockHash60(bytes)
    assert(got == (0x3FFFFFFFL << 30), f"kernel bits wrong: $got%x")
  }

  test("mm_audio_vad: frame accounting and run algebra hold; synthetic segments pin") {
    import graft.queries.MultimodalQueries
    val out = MultimodalQueries.mmAudioVad(spark, sfDir).collect()
    val chars = graft.Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text").length).toMap
    out.foreach { r =>
      val (doc, nf, nv, ns, lr) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nf == math.max(math.ceil(chars(doc) / 50.0).toLong, 1L), s"frame count: $r")
      assert(nv <= nf && ns <= nv && lr <= nv, s"run algebra violated: $r")
      assert((ns == 0) == (nv == 0), s"segments iff voiced frames: $r")
    }
    // synthetic pin: 50-byte frames of all-vowels (voiced) and
    // all-consonants (unvoiced) in a known pattern V V U V → 2 segments,
    // longest run 2, 3 voiced of 4 frames
    import spark.implicits._
    val v = "a" * 50; val u = "z" * 50
    val dir = graft.ScratchDirs.dir("spec", "vad")
    Seq((0L, v + v + u + v)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val pin = MultimodalQueries.mmAudioVad(spark, dir).collect().head
    assert((pin.getLong(1), pin.getLong(2), pin.getLong(3), pin.getLong(4)) ==
      ((4L, 3L, 2L, 2L)), s"synthetic VAD pin failed: $pin")
  }

  test("topk_mean aggregate matches the sort-based form") {
    val a = graft.queries.WindowQueries.a5TopkMean(spark, sfDir)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    val b = graft.queries.WindowQueries.topkMeanAgg(spark, sfDir)
      .orderBy("user_id").collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(a.length == b.length)
    a.zip(b).foreach { case ((u1, m1), (u2, m2)) =>
      assert(u1 == u2 && math.abs(m1 - m2) < 1e-9, s"user $u1: $m1 vs $m2")
    }
  }
}
