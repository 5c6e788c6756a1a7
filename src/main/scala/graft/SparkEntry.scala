package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full ENA pipeline (SURVEY.md §7.3 slice — scan,
    * segmentation, taxonomy/division prunes, coordinate normalization,
    * idmapping broadcast join, fallback coalesce, explode, 7-column
    * projection) over a self-contained gzipped EMBL fixture. The driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.embl.FlagshipFixture.enaTab(spark)

  /** One entry per implemented operator family from SURVEY.md §2 plus the
    * LLM-data-pipeline layer (dedup / similarity / text analysis). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryPack.queries

  /** DuckDB-equivalent ANSI SQL per query (same column names/aliases —
    * the driver sorts columns by name before hashing). */
  def oracleSql: Map[String, String] =
    graft.queries.QueryPack.oracleSql
}
