// Scratch diagnostic (r15): per-stage attribution of q130's cost at
// bench config — gram front end vs distinct vs bloom build vs the
// paired aggregation — to decide whether the 7x paired residual is
// plan waste or the tokenize/hash floor.
// Run: sbt -batch "runMain graft.llm.Q130Decomp"
package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

object Q130Decomp {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(graft.ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val corpus = d.filter(col("doc_id") % 20 =!= 0)
    val ev = d.filter(col("doc_id") % 20 === 0)

    def best3(tag: String)(df: => DataFrame): Double = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"Q130DECOMP $tag best=${ts.min}%.3f " +
        s"runs=${ts.map(t => f"$t%.3f").mkString(",")}")
      ts.min
    }

    // stage 1: the corpus gram front end alone (tokenize+md5+window)
    val grams = TextDedup.gramHashes(corpus, 3)
    best3("corpus_grams")(grams)
    // stage 2: + distinct
    best3("corpus_grams_distinct")(grams.distinct())
    // stage 3: eval grams + bloom agg build (collect forced via agg)
    best3("eval_bloom_build")(
      TextDedup.gramHashes(ev, 3)
        .agg(call_function(graft.functions.GraftFunctions.BloomAggName,
          col("gh"), lit(1L << 24), lit(5)).as("f"))
        .select(length(col("f")).as("n")))
    // stage 4: exact audit alone
    best3("exact_audit")(
      Decontaminate.decontaminateAudit(corpus, ev, 3))
    // stage 4b: the lazy bloom audit alone (broadcast filter delivery)
    best3("bloom_audit")(
      Decontaminate.bloomDecontaminateAudit(corpus, ev, 3,
        numBits = 1L << 24, numHashes = 5))
    // stage 4c: the REJECTED column delivery, kept as the measured
    // contrast — the filter as a one-row broadcast crossJoin column
    // pays UnsafeRow.getBinary's full-filter copy per probed row
    // (~16 s here vs 0.9 s for the broadcast-handle paired audit).
    best3("calib_nockpt")({
      val evalG = TextDedup.gramHashes(ev, 3)
      val filterRow = evalG
        .agg(call_function(graft.functions.GraftFunctions.BloomAggName,
          col("gh"), lit(1L << 24), lit(5)).as("__bloom_f"))
      val evalDistinct = evalG.select(col("gh")).distinct()
        .withColumn("ex", lit(1))
      val hit = call_function(
        graft.functions.GraftFunctions.BloomContainsName,
        col("__bloom_f"), col("gh"))
      TextDedup.gramHashes(corpus, 3).distinct()
        .join(evalDistinct, Seq("gh"), "left")
        .crossJoin(broadcast(filterRow))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("ex").isNotNull, 1L).otherwise(0L)).as("n_hit"),
          sum(when(hit, 1L).otherwise(0L)).as("bloom_hit"))
    })
    // stage 4d: same but WITHOUT the bloom probe column (left join only)
    best3("calib_nobloom")({
      val evalG = TextDedup.gramHashes(ev, 3)
      val evalDistinct = evalG.select(col("gh")).distinct()
        .withColumn("ex", lit(1))
      TextDedup.gramHashes(corpus, 3).distinct()
        .join(evalDistinct, Seq("gh"), "left")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("ex").isNotNull, 1L).otherwise(0L)).as("n_hit"))
    })
    // stage 5: the full paired audit (checkpoint released per run,
    // after the write that reads it)
    val pts = (0 to 3).map { _ =>
      val t0 = System.nanoTime()
      val p = Decontaminate.bloomCalibrationAudit(
        corpus, ev, 3, numBits = 1L << 24, numHashes = 5)
      p.write.format("noop").mode("overwrite").save()
      graft.operators.Checkpoints.release(p)
      (System.nanoTime() - t0) / 1e9
    }.drop(1) // first run is the warm-up
    println(f"Q130DECOMP paired_audit best=${pts.min}%.3f " +
      s"runs=${pts.map(t => f"$t%.3f").mkString(",")}")
    // stage 6: tokenize only (posexplode floor, no hash/window)
    best3("tokenize_only")(
      corpus.select(col("doc_id"),
        posexplode(TextFns.tokens(col("text")))))
    spark.stop()
  }
}
