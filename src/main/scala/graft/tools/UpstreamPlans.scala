// Scratch diagnostic (r22, VERDICT r21 #6): checkpoint fences make
// several operators' rewrites invisible to the FINAL query plan (the
// judge sees only `Scan ExistingRDD`), so this tool dumps the UPSTREAM
// lineage plans — the frames as built just BEFORE their
// localCheckpoint fence — for the fenced rewrites this round touched.
// Lives in package graft.llm to reach the private[llm] front ends it
// snapshots. Run:
//   sbt "runMain graft.llm.UpstreamPlans <sfDir> <outDir>"
package graft.llm

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object UpstreamPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r22")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTS", "4"))
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.ensureRegistered(spark)
    new java.io.File(outDir).mkdirs()
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(s"$outDir/$name.txt"),
        plan.getBytes(StandardCharsets.UTF_8))
      println(s"[plans] $outDir/$name.txt")
    }
    val d = spark.read.parquet(s"$sfDir/documents.parquet")

    // q146 upstream: the ONE tagged gram pipeline whose checkpoint
    // every incrementGate consumer filters (r22 mechanism #2) — the
    // r21 shape ran two minhashIndexImpl builds plus an eval gram pass
    val history = d.filter(col("doc_id") % 20 =!= 0 && col("doc_id") % 10 =!= 7)
    val increment = d.filter(col("doc_id") % 10 === 7)
    val evalDocs = d.filter(col("doc_id") % 20 === 0)
    val tagged = history.select(lit(0).as("__slice"), col("doc_id"), col("text"))
      .unionByName(increment.select(lit(1).as("__slice"), col("doc_id"), col("text")))
      .unionByName(evalDocs.select(lit(2).as("__slice"), col("doc_id"), col("text")))
    dump("q146_upstream_tagged_sets_after",
      TextDedup.shingleSetsTagged(tagged, 3, "__slice"))

    // gram front end upstream (r22 mechanism #6): the projected
    // (doc_id, hs) spread — tokenize+md5 below the exchange
    dump("gram_front_end_gramHashes_after", TextDedup.gramHashes(d, 3))

    // q116/q118 upstream: the scored frames as built before their
    // lazy fences (r22 mechanism #4) — reconstructed without the
    // fence by replicating the pre-fence pipeline via the public API
    // is not possible (the fence is internal), so dump the FENCED
    // operators' full first-consumer lineage instead: the RDD debug
    // string of the checkpoint shows the physical stages that will
    // materialize it.
    val q118 = Similarity.centroidOutliers(
      spark.read.parquet(s"$sfDir/embeddings.parquet"),
      groupCol = "label", outlierFraction = 0.05)
    val fencedRdds = q118.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
    }
    Files.write(Paths.get(s"$outDir/q118_upstream_scored_rdd_after.txt"),
      fencedRdds.map(_.toDebugString).mkString("\n\n")
        .getBytes(StandardCharsets.UTF_8))
    println(s"[plans] $outDir/q118_upstream_scored_rdd_after.txt")
    graft.operators.Checkpoints.releaseLeaked(spark)
    spark.stop()
  }
}
