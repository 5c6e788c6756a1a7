package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.embl.{EnaPipeline, FlagshipFixture}

class EmblDataSourceSpec extends AnyFunSuite with SparkSpec {

  private lazy val root = FlagshipFixture.ensureFixture().toString

  test("format(\"embl\") matches EnaPipeline.readLoci") {
    val viaSource = spark.read.format("embl").load(root)
      .select("ena_id", "locus_idx", "start", "end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    val viaPipeline = EnaPipeline.readLoci(spark, Seq(root))
      .collect().map(l => (l.ena_id, l.locus_idx, l.start, l.end)).toSet
    assert(viaSource === viaPipeline)
    assert(viaSource.nonEmpty)
  }

  test("division prune happens at file listing (S3 as partition pruning)") {
    val pruned = spark.read.format("embl").load(root)
    val unpruned = spark.read.format("embl")
      .option("divisionPrune", "false").load(root)
    val prunedIds = pruned.select("ena_id").distinct()
      .collect().map(_.getString(0)).toSet
    val allIds = unpruned.select("ena_id").distinct()
      .collect().map(_.getString(0)).toSet
    assert(!prunedIds.contains("HUM01"))
    assert(allIds.contains("HUM01"))
    // one partition per gzip file: 2 pruned, 3 unpruned
    assert(pruned.rdd.getNumPartitions === 2)
    assert(unpruned.rdd.getNumPartitions === 3)
  }

  test("column pruning pushes into the reader") {
    val df = spark.read.format("embl").load(root).select("ena_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("columns=ena_id"), s"scan should list pruned columns:\n$plan")
    assert(df.count() > 0)
  }

  test("file_path filters prune whole files at listing time") {
    val df = spark.read.format("embl")
      .option("divisionPrune", "false").load(root)
      .filter(col("file_path").contains("wgs"))
    assert(df.rdd.getNumPartitions === 1) // 1 of 3 files survives listing
    val ids = df.select("ena_id").distinct().collect().map(_.getString(0)).toSet
    assert(ids === Set("WGS01"))
  }

  test("multi-path load decodes the JSON-encoded paths option") {
    // load(p1, p2) ships paths as a JSON array string; split(",") used
    // to mangle it into bracket-wrapped nonexistent paths -> empty scan
    val single = spark.read.format("embl").load(root).count()
    val doubled = spark.read.format("embl").load(root, root).count()
    assert(single > 0)
    assert(doubled === 2 * single) // same tree listed twice
    assert(EmblScanBuilder.parsePaths("""["/a/b","/c d"]""") === Seq("/a/b", "/c d"))
    assert(EmblScanBuilder.parsePaths("/a,/b") === Seq("/a", "/b"))
  }

  test("nonexistent root fails loudly instead of returning empty") {
    val e = intercept[Exception] {
      spark.read.format("embl").load("/nonexistent/embl/tree").count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("does not exist")), e.toString)
  }

  test("reader factory ships the session hadoop conf to executors") {
    // a blank Configuration on the reader side would drop session
    // spark.hadoop.* settings (S3 creds, custom FS impls)
    spark.sparkContext.hadoopConfiguration.set("graft.test.marker", "propagated")
    val scan = new EmblScan(Seq(root), divisionPrune = true, EmblDataSource.Schema)
    val factory = scan.createReaderFactory().asInstanceOf[EmblReaderFactory]
    assert(factory.conf.value.get("graft.test.marker") === "propagated")
  }

  test("usable from pure SQL via CREATE TABLE ... USING embl") {
    spark.sql("DROP TABLE IF EXISTS ena_sql")
    try {
      spark.sql(s"CREATE TABLE ena_sql USING embl OPTIONS (path '$root')")
      val n = spark.sql(
        "SELECT count(*) FROM ena_sql WHERE chr_struct = 0").head().getLong(0)
      assert(n === 2) // the two CIRC01 loci
    } finally spark.sql("DROP TABLE IF EXISTS ena_sql")
  }
}
