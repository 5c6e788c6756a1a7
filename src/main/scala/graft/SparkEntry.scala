package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship: the full ENA pipeline (SURVEY.md §7.3 slice — scan,
    * segmentation, taxonomy/division prunes, coordinate normalization,
    * idmapping broadcast join, fallback coalesce, explode, 7-column
    * projection) over a self-contained gzipped EMBL fixture. The driver
    * smoke-checks rows > 0; q29_ena_flagship hash-checks the same
    * relation against its 7 expected rows.
    */
  def entry(spark: SparkSession): DataFrame =
    graft.embl.FlagshipFixture.enaTab(spark)

  /** One entry per implemented operator family from SURVEY.md §2
    * (QueryPack q01-q26) plus the LLM-data-pipeline layer — exact /
    * MinHash-LSH / SimHash / fingerprint dedup, ANN similarity search,
    * text analysis, multimodal metadata — and the flagship oracle
    * (QueryPackExt q27-q43).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.QueryPack.queries ++ graft.queries.QueryPackExt.queries

  /** DuckDB-equivalent ANSI SQL per query (same column names/aliases —
    * the driver sorts columns by name before hashing). */
  def oracleSql: Map[String, String] =
    graft.queries.QueryPack.oracleSql ++ graft.queries.QueryPackExt.oracleSql
}
