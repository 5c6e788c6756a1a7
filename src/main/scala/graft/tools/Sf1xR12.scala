// Scratch measurement entry: 10x scale curves for the r11/r12
// newcomers BASELINE.md does not yet cover — q121 BI_RGB frame decode,
// q122 audio windows, q123 Space-Saving heavy hitters (exact regime),
// q124 MJPG frame decode — plus the q123 EVICTION regime measured for
// both throughput and top-k recovery precision on a 10x Zipf token
// stream (capacity << distinct keys, the production story).
// Media corpora are written to parquet and read back so the timed op
// sees the production shape (a binary-column scan), not a driver-local
// Seq. Run: sbt -batch "runMain graft.Sf1xR12"
package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Sf1xR12 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    import spark.implicits._

    val root = "/tmp/sf1x_media"

    // ---- media corpora: 1x = 200 files, 10x = 2000 files, written as
    // parquet binary columns (deterministic per-media content)
    def color(i: Long, j: Int): (Int, Int, Int) =
      (((i * 31 + j * 7) % 256).toInt, ((i * 17 + j * 13) % 256).toInt,
        ((i * 5 + j * 11) % 256).toInt)
    def genMedia(kind: String, n: Int, path: String): Unit = {
      if (new java.io.File(path).exists()) return
      val rows = (1 to n).map { i =>
        val id = i.toLong
        val bytes = kind match {
          case "avi" => graft.llm.Multimodal.syntheticAviRgb(32, 24, 10,
            (0 until 12).map(color(id, _)))
          case "mjpg" => graft.llm.Multimodal.syntheticAviMjpg(16, 8, 10,
            (0 until 6).map(color(id, _)))
          case "wav" =>
            val samples = (0 until 5).flatMap { w =>
              val a = (((id * 13 + w * 29) % 100) + 1).toInt * 100
              (0 until 400).map(k => (if (k % 2 == 0) a else -a).toShort)
            }.toArray
            graft.llm.Multimodal.syntheticWavPcm16(8000, samples)
        }
        graft.llm.Multimodal.MediaRow(id, s"media/$kind", bytes)
      }
      spark.createDataset(rows).repartition(8)
        .write.mode("overwrite").parquet(path)
      println(s"SF1XR12 generated $path ($n files)")
    }
    for ((scale, n) <- Seq("1x" -> 200, "10x" -> 2000)) {
      genMedia("avi", n, s"$root/avi_$scale")
      genMedia("mjpg", n, s"$root/mjpg_$scale")
      genMedia("wav", n, s"$root/wav_$scale")
    }

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SF1XR12 $tag best=${ts.min}%.2f runs=${ts.map(t => f"$t%.2f").mkString(",")}")
      ts.min
    }
    def media(path: String) =
      spark.read.parquet(path).as[graft.llm.Multimodal.MediaRow]

    for (scale <- Seq("1x", "10x")) {
      best3(s"q121_frames_$scale")(
        graft.llm.Multimodal.frameSampleStats(media(s"$root/avi_$scale"), 2))
      best3(s"q124_mjpg_$scale")(
        graft.llm.Multimodal.frameSampleStats(media(s"$root/mjpg_$scale"), 1))
      best3(s"q122_audio_$scale")(
        graft.llm.Multimodal.audioWindows(media(s"$root/wav_$scale"), 400, 400))
    }

    // ---- q123 exact regime: the bench query's shape on documents 1x
    // vs 10x (the Sf1xR11 word-shuffled corpus — same vocabulary, 10x
    // the stream; capacity >= vocab so zero evictions)
    val sf1xDocs = "/tmp/sf1x/documents.parquet"
    if (new java.io.File(sf1xDocs).exists()) {
      for ((tag, path) <- Seq("1x" -> "/root/testdata/sf0.1/documents.parquet",
          "10x" -> sf1xDocs)) {
        val docs = spark.read.parquet(path)
        best3(s"q123_exact_$tag")(docs
          .select(explode(graft.llm.TextFns.tokens(col("text"))).as("t"))
          .agg(expr("graft_freq_items(t, 262144)").as("fi"))
          .select(posexplode(slice(col("fi"), 1, 20))))
      }
    } else println("SF1XR12 skip q123_exact: run Sf1xR11 first for /tmp/sf1x")

    // ---- curation flagship at 10x: needs a DUP-RATE-PRESERVING
    // fixture (the Sf1xR11 word-shuffled corpus destroys the planted
    // near-dup structure that drives curate's pair generation — it
    // measured 2.7x FASTER at 10x, i.e. the wrong workload). Here each
    // replica suffixes every token with its replica id: within a
    // replica the dup/near-dup structure is EXACTLY the original's,
    // across replicas nothing collides — 10 independent copies of the
    // 1x workload. doc_id = orig + rep*1e9 keeps each replica's
    // doc_id%20 eval slice intact (1e9 is divisible by 20).
    val docs1xNorm = s"$root/docs_1x_norm"
    if (!new java.io.File(docs1xNorm).exists())
      spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
        .repartition(8).write.mode("overwrite").parquet(docs1xNorm)
    val docs10xDup = s"$root/docs_10x_dup"
    if (!new java.io.File(docs10xDup).exists()) {
      val d1 = spark.read.parquet(docs1xNorm)
      (0 until 10).map { rep =>
        d1.select(
          (col("doc_id") + lit(rep.toLong * 1000000000L)).as("doc_id"),
          concat_ws(" ", transform(split(col("text"), " "),
            x => concat(x, lit(s"_$rep")))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(8).write.mode("overwrite").parquet(docs10xDup)
      println(s"SF1XR12 generated $docs10xDup")
    }
    for ((tag, path) <- Seq("1x" -> docs1xNorm, "10x" -> docs10xDup)) {
      val d = spark.read.parquet(path)
      best3(s"q72_curate_$tag")(graft.llm.Curation.curate(
        d.filter(col("doc_id") % 20 =!= 0),
        d.filter(col("doc_id") % 20 === 0),
        sampleFraction = 0.9, sampleSeed = "curate",
        blockSize = 512, groupWidth = 64))
      graft.operators.Checkpoints.releaseLeaked(spark)
    }

    // ---- q123 eviction regime: Zipf(a~1.1) stream over ~50k distinct
    // keys, capacity 256 (<< distinct) — throughput curve AND top-k
    // recovery vs the exact answer. Deterministic: rank from a crc32
    // uniformizer, no rand().
    def zipfStream(rows: Long): DataFrame = {
      // u = crc32-uniformized id in (0,1]; rank = floor(u^-0.9), a
      // heavy Zipf-ish tail (~50k distinct over 2M rows, >half the
      // mass on rank 1); deterministic — no rand()
      val u = greatest(
        crc32(col("id").cast("string")).cast("double") / 4294967296.0,
        lit(1e-9))
      val rank = pow(u, lit(-0.9)).cast("long") % 50000
      spark.range(rows).select(concat(lit("k"), rank).as("tok"))
    }
    for ((tag, rows) <- Seq("1x" -> 2000000L, "10x" -> 20000000L)) {
      best3(s"q123_evict_$tag")(zipfStream(rows)
        .agg(expr("graft_freq_items(tok, 256)").as("fi"))
        .select(posexplode(slice(col("fi"), 1, 20))))
    }
    // recovery precision@20 on the 10x stream
    val stream10 = zipfStream(20000000L)
    val sketchTop = stream10
      .agg(expr("graft_freq_items(tok, 256)").as("fi"))
      .select(explode(slice(col("fi"), 1, 20)).as("e"))
      .select(col("e.item").as("tok"), col("e.est"), col("e.err"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val exactTop = stream10.groupBy(col("tok")).count()
      .orderBy(col("count").desc, col("tok")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val exactSet = exactTop.map(_._1).toSet
    val hit = sketchTop.count(t => exactSet.contains(t._1))
    val exactMap = stream10.groupBy(col("tok")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val boundOk = sketchTop.forall { case (k, est, err) =>
      val t = exactMap.getOrElse(k, 0L); t <= est && est - err <= t
    }
    println(s"SF1XR12 q123_recovery precision@20=$hit/20 boundsHold=$boundOk " +
      s"maxErr=${sketchTop.map(_._3).max} n=20000000 cap=256")
    spark.stop()
  }
}
