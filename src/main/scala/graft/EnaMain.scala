package graft

import org.apache.spark.sql.SparkSession
import graft.embl.EnaPipeline

/** CLI entry point for the ENA build pipeline — the engine's analog of
  * the reference's `ena_dask_tskmgr` console script
  * (reference pyproject.toml:23, dask_tskmgr.py:45-257).
  *
  * Usage:
  *   EnaMain <outDir> <idmappingParquet> <enaRoot> [<enaRoot> ...]
  *
  * Reads gzipped EMBL flat files under the given roots (recursive,
  * `*.dat.gz`, sequence-tree division prune applied), resolves protein
  * ids against the idmapping parquet snapshot, and writes the 7-column
  * headerless TSV partitioned by source-tree division.
  */
object EnaMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: EnaMain <outDir> <idmappingParquet> <enaRoot> [<enaRoot>...]")
    val outDir = args(0)
    val idmappingPath = args(1)
    val roots = args.drop(2).toSeq

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName("ena-build")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val idmapping = spark.read.parquet(idmappingPath)
    val enaTab = EnaPipeline.enaTab(spark, roots, idmapping)
    EnaPipeline.writeTsv(enaTab, outDir)
    spark.stop()
  }
}
