package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings(vec_id, embedding ARRAY<FLOAT>,
  * label)`. Cosine arithmetic is built from array higher-order
  * functions (`zip_with` + `aggregate`) with every element cast to
  * double *before* multiplying, and left-to-right summation — the same
  * expression shape the SQL oracle uses, so both engines produce
  * bit-identical doubles.
  *
  * Scale design (100 TB of vectors):
  *  - brute-force top-k: the query set broadcasts; candidates stream
  *    through a BroadcastNestedLoopJoin — one pass over the corpus, no
  *    shuffle of the big side, O(|Q|) work per vector. The correct
  *    baseline (and the exact-answer path) at any scale.
  *  - sign-LSH top-k: a `bits`-dim random-hyperplane sketch (here: the
  *    signs of the leading dimensions — deterministic, so the oracle can
  *    mirror it) turns the nested loop into an equi-join on bucket id:
  *    candidates shrink ~2^bits-fold at the cost of recall. The
  *    bucket-join is shuffle-keyed, never all-pairs.
  *  - near-dup pairs: same sketch, self-joined bucket-keyed, then exact
  *    cosine rerank ≥ threshold.
  */
object Similarity {

  /** Σ aᵢ·bᵢ with per-element double casts, summed left-to-right —
    * compiled via the native [[graft.functions.FloatVecDot]] codegen
    * expression (numerically identical to the HOF composition
    * `aggregate(zip_with(a,b,(x,y) -> double(x)*double(y)), 0.0, +)`
    * it replaced, but a tight primitive loop: no per-pair intermediate
    * array). Callers must have run [[graft.functions.GraftFunctions
    * .ensureRegistered]] on the session first — every public entry
    * point here does.
    */
  def dot(a: Column, b: Column): Column =
    call_function(graft.functions.GraftFunctions.VecDotName, a, b)

  /** ‖v‖₂ (double). */
  def l2norm(v: Column): Column = sqrt(dot(v, v))

  /** Sign sketch of the leading `bits` dimensions:
    * Σ_{i<bits} (v[i] > 0) << i. A deterministic stand-in for a seeded
    * random-hyperplane LSH (planes = coordinate axes).
    */
  def signBucket(v: Column, bits: Int): Column =
    (0 until bits)
      .map(i => when(element_at(v, i + 1) > 0, lit(1 << i)).otherwise(lit(0)))
      .reduce(_ + _)

  /** Exact brute-force cosine top-k: vectors with vec_id < nQueries are
    * the query set (broadcast); every other vector is scored against
    * each query in one corpus pass. Emits (query_id, rank, vec_id, sim).
    */
  def bruteForceTopK(emb: DataFrame, nQueries: Int = 5, k: Int = 10): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        l2norm(col("embedding")).as("qn"))
    val cand = TextDedup.spread(emb, "vec_id")
      .select(col("vec_id"), col("embedding").as("cv"),
        l2norm(col("embedding")).as("cn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    cand
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("cv")) / (col("qn") * col("cn")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Bucketed (sign-LSH) cosine top-k — the scale path: queries only
    * meet candidates in their own sketch bucket via an equi-join, so
    * the per-query candidate set shrinks ~2^bits-fold. Approximate:
    * neighbors hashing to another bucket are missed (the LSH recall
    * trade) and thin buckets return < k rows.
    */
  def signLshTopK(
      emb: DataFrame, bits: Int = 4, nQueries: Int = 5, k: Int = 5): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val sketched = TextDedup.spread(emb, "vec_id").select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"),
      l2norm(col("embedding")).as("nrm"))
    val q = sketched
      .filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"),
        col("bucket").as("qbucket"), col("nrm").as("qn"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id"))
    sketched
      .join(broadcast(q),
        col("bucket") === col("qbucket") && col("vec_id") =!= col("query_id"))
      .withColumn("sim", dot(col("qv"), col("embedding")) / (col("qn") * col("nrm")))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("rnk"), col("vec_id"), col("sim"))
      .orderBy(col("query_id"), col("rnk"))
  }

  /** Embedding-cosine near-dup pairs: sign-sketch bucket self-join for
    * candidates (equi-keyed, never all-pairs), exact cosine ≥ threshold
    * to confirm. Emits (va, vb, sim).
    */
  def nearDupPairs(
      emb: DataFrame, bits: Int = 2, threshold: Double = 0.4): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(emb.sparkSession)
    val sketched = TextDedup.spread(emb, "vec_id").select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), bits).as("bucket"),
      l2norm(col("embedding")).as("nrm"))
    sketched.as("a")
      .join(sketched.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim",
        dot(col("a.embedding"), col("b.embedding")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.vec_id").as("va"), col("b.vec_id").as("vb"), col("sim"))
      .orderBy(col("va"), col("vb"))
  }
}
