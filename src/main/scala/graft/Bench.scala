package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line. Each query is forced
  * with a result-consuming noop write (so Catalyst cannot elide sorts /
  * projections the way it can under `count()`), and failures are
  * reported as negative durations + an `errors` map instead of being
  * swallowed.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensureRegistered(spark)

    // Warm-up (untimed): one representative query end-to-end so session
    // startup + first-job codegen/scheduler costs aren't billed to the
    // alphabetically-first timed query (BENCH_r02 charged ~10s of session
    // warm-up to q01).
    try SparkEntry.queries("q01_pricing_summary")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    // best-of-N per query (default 2): single-run numbers on a shared
    // 32-thread JVM swing 2-5x from GC/JIT/scheduler noise; the min is
    // the stable measure of what the plan costs
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt max 1
    // SPARK_GRAFT_ONLY=q33_x,q34_y: time a subset (hotspot iteration loop).
    // Unknown names warn loudly — a silent empty run reads as a
    // near-zero suite time — and an all-unknown filter is a hard error.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      unknown.foreach(n =>
        System.err.println(s"WARNING: SPARK_GRAFT_ONLY name '$n' matches no registered query"))
      if ((names -- unknown).isEmpty) {
        System.err.println("ERROR: SPARK_GRAFT_ONLY matched zero queries; nothing to benchmark")
        spark.stop()
        sys.exit(2)
      }
    }
    var errors = List.empty[(String, String)]
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            true
          } catch {
            case e: Throwable =>
              val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
              errors ::= (name -> msg.linesIterator.take(1).mkString.take(200))
              false
          }
        val secs = (System.nanoTime() - t0) / 1e9
        // OUTSIDE the timed region: drop blocks the query checkpointed
        // or cached. Each run rebuilds its plan from scratch, so
        // nothing legitimately survives a run — but localCheckpoint
        // blocks (q61 CC rounds, q72 stage keep-lists) otherwise stay
        // pinned for the REST OF THE SUITE, and the accumulated GC
        // pressure inflated the late-alphabet queries ~2x.
        graft.operators.Checkpoints.releaseLeaked(spark)
        if (ok) secs else -secs
      }
      val good = times.filter(_ > 0)
      name -> (if (good.nonEmpty) good.min else times.min)
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = results.map { case (k, v) => s"${jstr(k)}:$v" }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v > 0 => v }.sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"n_failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
