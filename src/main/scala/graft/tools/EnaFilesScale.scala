// Scratch measurement entry: the ENA flagship at 10x/100x FILE COUNT
// with total record volume held constant (VERDICT r12 #5). The
// reference's real corpus shape is "millions of small files"
// (reference README.md:48) — what matters at that shape is Spark's
// file-source packing (spark.sql.files.maxPartitionBytes /
// openCostInBytes bin-packs many small gzip files into each task, so
// task count tracks VOLUME, not file count) and the listing cost.
// Measures EnaMain's pipeline wall in both id-resolution regimes.
// Run: sbt -batch "runMain graft.EnaFilesScale"
package graft

import java.io.{BufferedWriter, OutputStreamWriter}
import java.nio.file.{Files, Paths}
import java.util.zip.GZIPOutputStream
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object EnaFilesScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(ToolSpark.master)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "false")
      // the production-shape knob under test: small files bin-pack
      // into tasks at ~64k apiece instead of one task each
      .config("spark.sql.files.openCostInBytes", "65536")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val root = "/tmp/ena_files_scale"
    val totalRecords = 128000

    // deterministic EMBL-ish corpus, same record shape as the
    // bench_flagship generator: ID/OC + 1-3 CDS blocks per record
    def gen(dir: String, nFiles: Int): Unit = {
      val base = Paths.get(s"$root/$dir/in/sequence/con")
      if (Files.exists(base)) return
      Files.createDirectories(base)
      val rnd = new scala.util.Random(42)
      val perFile = totalRecords / nFiles
      for (f <- 0 until nFiles) {
        val out = new BufferedWriter(new OutputStreamWriter(
          new GZIPOutputStream(Files.newOutputStream(
            base.resolve(f"part$f%05d_PRO_x.dat.gz")))))
        for (r <- 0 until perFile) {
          val rid = f"ENA$f%05dR$r%05d"
          val struct = if (r % 5 == 0) "circular" else "linear"
          out.write(s"ID   $rid; SV 1; $struct; genomic DNA; STD; PRO; 10000 BP.\n")
          out.write("OC   Bacteria; Proteobacteria.\n")
          for (l <- 0 until (1 + rnd.nextInt(3))) {
            val a = 1 + rnd.nextInt(9000); val b = a + 1 + rnd.nextInt(900)
            val pid = f"P$f%05d_$r%05d_$l"
            val loc = if (l % 2 == 1) s"complement(join($a..$b,$a..$b))"
                      else s"join($a..$b)"
            out.write(s"FT   CDS             $loc\n")
            out.write("FT                   /protein_id=\"" + pid + ".1\"\n")
            out.write("FT                   /db_xref=\"UniProtKB/TrEMBL:F" + pid + "\"\n")
          }
          out.write("//\n")
        }
        out.close()
      }
      println(s"ENAFILES generated $dir: $nFiles files x $perFile records")
    }
    gen("few", 64)     // 64 files  x 2000 records (the r8 bench shape)
    gen("many", 640)   // 10x files, same volume
    gen("many100", 6400) // 100x files, same volume

    // idmapping side: 70%-mapped pids (deterministic)
    val idmapPath = s"$root/idmapping.parquet"
    if (!new java.io.File(idmapPath).exists()) {
      import spark.implicits._
      val rnd = new scala.util.Random(7)
      val rows = for {
        f <- 0 until 64; r <- 0 until 2000; l <- 0 until 3
        if rnd.nextInt(10) < 7
        pid = f"P$f%05d_$r%05d_$l"
        u <- Seq(s"U${pid}a") ++ (if (rnd.nextBoolean()) Seq(s"U${pid}b") else Nil)
      } yield (s"$pid.1", u)
      rows.toDF("foreign_id", "uniprot_id")
        .repartition(8).write.mode("overwrite").parquet(idmapPath)
    }
    val idmapping = spark.read.parquet(idmapPath)

    def wall(tag: String, dir: String, broadcast: Boolean): Double = {
      def run(): Double = {
        val t0 = System.nanoTime()
        graft.embl.EnaPipeline
          .enaTab(spark, Seq(s"$root/$dir/in"), idmapping,
            broadcastIdMap = broadcast)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warm
      val best = math.min(run(), run())
      val parts = graft.embl.EnaPipeline
        .readLoci(spark, Seq(s"$root/$dir/in")).rdd.getNumPartitions
      println(f"ENAFILES $tag best=$best%.2f s scanPartitions=$parts")
      best
    }
    for (bc <- Seq(true, false)) {
      val reg = if (bc) "broadcast" else "shuffle"
      val few = wall(s"few_64f_$reg", "few", bc)
      val many = wall(s"many_640f_$reg", "many", bc)
      val many100 = wall(s"many100_6400f_$reg", "many100", bc)
      println(f"ENAFILES growth $reg: 10x_files=${many / few}%.2fx " +
        f"100x_files=${many100 / few}%.2fx (volume constant)")
    }
    spark.stop()
  }
}
