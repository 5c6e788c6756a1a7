package graft.llm

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Graph-index ANN: HNSW, distributed the way production systems
  * actually ship it on Spark — NOT one global graph (whose build is a
  * sequential, pointer-chasing loop no shuffle can express) but one
  * small in-memory graph PER SHARD, serialized as a binary column:
  *
  *  - [[hnswIndex]]: `mapPartitions` builds a shard-local hierarchical
  *    graph over each partition's vectors and emits ONE row per shard
  *    `(shard, n_vectors, index_bytes)` — persistable as a plain table,
  *    shard count = upstream partitioning (repartition first to choose
  *    shard size; ~10⁵–10⁶ vectors/shard keeps build memory flat).
  *  - [[hnswProbe]]: broadcasts the (broadcast-small by contract) query
  *    set, searches every shard graph independently (k per shard), and
  *    merges with the bounded `graft_topk` aggregate — k rows per
  *    (query × shard) cross the exchange, never a scored-corpus sort.
  *
  * Query cost per shard is the classic HNSW `ef·log n` — against the
  * IVF path (L66) this is the HIGH-RECALL serving index: no cell
  * boundary to miss a neighbor across; every shard is searched, so
  * recall is the graph's recall, not the partitioner's.
  *
  * DETERMINISM (engine/rerun-portable like every graft operator):
  * insertion order is sorted `vec_id` within a shard, node levels come
  * from the 60-bit md5 of the vec_id (not an RNG), neighbor selection
  * tie-breaks on id — the same rows in any arrival order build
  * byte-identical graphs. Not SQL-expressible, so the oracle gate is
  * the rows-only harness check (q115) + the spec gate: exact-recall
  * floor vs [[Similarity.bruteForceTopK]], build determinism, and
  * round-trip through the serialized bytes.
  *
  * NULL embeddings are dropped at index time (a graph over nulls means
  * nothing); ragged dimensions are a build-time error per shard.
  */
object Hnsw {

  // ---------------------------------------------------------- shard graph

  /** One shard's materialized graph: parallel arrays + per-layer
    * adjacency (layer → node → neighbor node ordinals). Vector norms
    * are computed once at build time and serialized with the graph —
    * the probe path must never rescan all vectors per query (that
    * would be brute-force cost and defeat the ef·log n search).
    */
  final class ShardGraph(
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val levels: Array[Int],
      val links: Array[Array[Array[Int]]], // links(layer)(node) = neighbors
      val entry: Int,
      val norms: Array[Double])

  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def cosine(a: Array[Float], na: Double, b: Array[Float], nb: Double): Double =
    if (na == 0.0 || nb == 0.0) -1.0 else dot(a, b) / (na * nb)

  private def norm(a: Array[Float]): Double = math.sqrt(dot(a, a))

  /** Deterministic level: geometric with p = 1/2 over the id's md5
    * bits (mL = 1/ln 2 in HNSW terms) — level = count of leading set
    * bits consumed, capped so a pathological hash can't build a
    * 60-layer tower.
    */
  private[llm] def levelOf(id: Long, cap: Int = 16): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.ByteBuffer.allocate(8).putLong(id).array())
    var lvl = 0
    var i = 0
    while (lvl < cap && i < digest.length && (digest(i) & (1 << (7 - (lvl % 8)))) != 0) {
      lvl += 1
      if (lvl % 8 == 0) i += 1
    }
    lvl
  }

  /** Deterministic synthetic vector for the q115 generator-twin oracle
    * fixture (the q114 VALUES-fixture technique applied to ANN): each
    * component is md5-derived from (id, dimension index) and quantized
    * to 1/1000 steps in [-1, 1] — exactly-representable values, so any
    * JVM reproduces bit-identical vectors. Combined with the
    * deterministic build (levels from id md5, insertion by sorted id)
    * and a key-hash repartition, index build and probe are fully
    * reproducible and the oracle can pin the probe's exact top-k.
    */
  def fixtureVector(id: Long, dim: Int): Array[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { d =>
      val h = java.nio.ByteBuffer.wrap(
        md.digest(s"hnsw-fixture:$id:$d".getBytes("UTF-8"))).getLong
      (((h % 2001L) + 2001L) % 2001L - 1000L) / 1000.0f
    }
  }

  /** Build a shard graph over (id, vector) pairs. `m` = max neighbors
    * per node per layer (2m at layer 0, HNSW convention), `efC` =
    * construction beam width.
    */
  def buildShard(rows: Seq[(Long, Array[Float])], m: Int, efC: Int): ShardGraph = {
    val sorted = rows.sortBy(_._1).toArray // insertion order: by id
    val n = sorted.length
    val ids = sorted.map(_._1)
    val vecs = sorted.map(_._2)
    val norms = vecs.map(norm)
    val levels = ids.map(levelOf(_))
    val maxLevel = if (n == 0) 0 else levels.max
    // links(layer)(node): grown as mutable buffers, frozen at the end
    val links = Array.tabulate(maxLevel + 1)(_ =>
      Array.fill(n)(mutable.ArrayBuffer.empty[Int]))
    var entry = -1

    def searchLayer(q: Array[Float], nq: Double, ep: Int, layer: Int, ef: Int): mutable.PriorityQueue[(Double, Int)] = {
      // best-first beam: `cand` pops closest first, `found` keeps the
      // ef best (min-heap by sim so the worst is on top)
      val visited = mutable.BitSet(ep)
      val cand = mutable.PriorityQueue((cosine(q, nq, vecs(ep), norms(ep)), ep))(
        Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (s, -i) })
      val found = mutable.PriorityQueue((cosine(q, nq, vecs(ep), norms(ep)), ep))(
        Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (-s, i) })
      while (cand.nonEmpty) {
        val (cs, c) = cand.dequeue()
        val worst = found.head._1
        if (cs < worst && found.size >= ef) cand.clear()
        else {
          links(layer)(c).foreach { nb =>
            if (!visited(nb)) {
              visited += nb
              val s = cosine(q, nq, vecs(nb), norms(nb))
              if (found.size < ef || s > found.head._1 ||
                  (s == found.head._1 && nb < found.head._2)) {
                cand.enqueue((s, nb))
                found.enqueue((s, nb))
                if (found.size > ef) found.dequeue()
              }
            }
          }
        }
      }
      found
    }

    def selectNeighbors(candidates: Seq[(Double, Int)], max: Int): Seq[Int] =
      candidates.sortBy { case (s, i) => (-s, i) }.take(max).map(_._2)

    var i = 0
    while (i < n) {
      if (entry < 0) entry = i
      else {
        val q = vecs(i); val nq = norms(i)
        var ep = entry
        var l = levels(entry)
        // greedy descent through layers above the node's level. The
        // current entry point's similarity is CACHED across neighbor
        // comparisons (r22): the old form recomputed cosine(q, ep) for
        // every neighbor probe — identical comparison sequence, half
        // the dot products on the descent path.
        var epSim = cosine(q, nq, vecs(ep), norms(ep))
        while (l > levels(i)) {
          if (l <= maxLevel) {
            var improved = true
            while (improved) {
              improved = false
              links(l)(ep).foreach { nb =>
                val s = cosine(q, nq, vecs(nb), norms(nb))
                if (s > epSim) { ep = nb; epSim = s; improved = true }
              }
            }
          }
          l -= 1
        }
        // beam-connect at each layer from the node's level down
        var layer = math.min(levels(i), levels(entry))
        while (layer >= 0) {
          val found = searchLayer(q, nq, ep, layer, efC)
          val cands = found.toSeq
          val maxM = if (layer == 0) 2 * m else m
          val chosen = selectNeighbors(cands, maxM)
          chosen.foreach { nb =>
            links(layer)(i) += nb
            links(layer)(nb) += i
            // prune the neighbor back to its budget, keeping the best
            if (links(layer)(nb).length > maxM) {
              val pruned = selectNeighbors(
                links(layer)(nb).toSeq.distinct.map(x =>
                  (cosine(vecs(nb), norms(nb), vecs(x), norms(x)), x)), maxM)
              links(layer)(nb).clear()
              links(layer)(nb) ++= pruned
            }
          }
          ep = if (cands.nonEmpty) cands.maxBy { case (s, x) => (s, -x) }._2 else ep
          layer -= 1
        }
        if (levels(i) > levels(entry)) entry = i
      }
      i += 1
    }
    new ShardGraph(ids, vecs, levels,
      links.map(_.map(_.toArray.distinct)), math.max(entry, 0), norms)
  }

  /** Search one shard graph: top-k (id, sim) for the query, beam `ef`. */
  def searchShard(g: ShardGraph, q: Array[Float], k: Int, ef: Int): Seq[(Long, Double)] = {
    if (g.ids.isEmpty) return Nil
    val nq = norm(q)
    val norms = g.norms
    var ep = g.entry
    var l = g.levels(g.entry)
    // entry-point similarity cached across neighbor probes (r22) —
    // same comparison sequence as recomputing it per neighbor
    var epSim = cosine(q, nq, g.vecs(ep), norms(ep))
    while (l > 0) {
      var improved = true
      while (improved) {
        improved = false
        g.links(l)(ep).foreach { nb =>
          val s = cosine(q, nq, g.vecs(nb), norms(nb))
          if (s > epSim) { ep = nb; epSim = s; improved = true }
        }
      }
      l -= 1
    }
    // layer-0 beam (same shape as the build-side searchLayer)
    val visited = mutable.BitSet(ep)
    val cand = mutable.PriorityQueue((cosine(q, nq, g.vecs(ep), norms(ep)), ep))(
      Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (s, -i) })
    val found = mutable.PriorityQueue((cosine(q, nq, g.vecs(ep), norms(ep)), ep))(
      Ordering.by[(Double, Int), (Double, Int)] { case (s, i) => (-s, i) })
    val beam = math.max(ef, k)
    while (cand.nonEmpty) {
      val (cs, c) = cand.dequeue()
      if (cs < found.head._1 && found.size >= beam) cand.clear()
      else g.links(0)(c).foreach { nb =>
        if (!visited(nb)) {
          visited += nb
          val s = cosine(q, nq, g.vecs(nb), norms(nb))
          if (found.size < beam || s > found.head._1 ||
              (s == found.head._1 && nb < found.head._2)) {
            cand.enqueue((s, nb))
            found.enqueue((s, nb))
            if (found.size > beam) found.dequeue()
          }
        }
      }
    }
    found.toSeq.sortBy { case (s, i) => (-s, i) }.take(k)
      .map { case (s, i) => (g.ids(i), s) }
  }

  // ------------------------------------------------------- serialization

  /** Shard byte layout is versioned: the r8 addition of per-node norms
    * changed the format in place, so stale persisted bytes read as
    * garbage vectors instead of failing. A magic word + format version
    * up front makes any layout change (or foreign bytes) an immediate,
    * actionable error rather than silent corruption.
    */
  private[llm] val FormatMagic = 0x48574e53 // "HWNS"
  private[llm] val FormatVersion = 2 // v2 = per-node norms after vecs

  def toBytes(g: ShardGraph): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val o = new DataOutputStream(bos)
    o.writeInt(FormatMagic)
    o.writeInt(FormatVersion)
    o.writeInt(g.ids.length)
    o.writeInt(if (g.vecs.isEmpty) 0 else g.vecs(0).length)
    o.writeInt(g.entry)
    g.ids.foreach(o.writeLong)
    g.levels.foreach(o.writeInt)
    g.vecs.foreach(v => v.foreach(o.writeFloat))
    g.norms.foreach(o.writeDouble)
    o.writeInt(g.links.length)
    g.links.foreach { layer =>
      layer.foreach { nbs => o.writeInt(nbs.length); nbs.foreach(o.writeInt) }
    }
    o.flush()
    bos.toByteArray
  }

  def fromBytes(b: Array[Byte]): ShardGraph = {
    val in = new DataInputStream(new ByteArrayInputStream(b))
    val magic = in.readInt()
    require(magic == FormatMagic,
      f"not an HNSW shard: leading word 0x$magic%08x != 0x$FormatMagic%08x " +
        "(bytes predate the versioned format or are not an index at all); " +
        "rebuild the index with hnswIndex/writeHnswIndex")
    val version = in.readInt()
    require(version == FormatVersion,
      s"HNSW shard format version $version, this build reads $FormatVersion; " +
        "rebuild the index with hnswIndex/writeHnswIndex")
    val n = in.readInt(); val dim = in.readInt(); val entry = in.readInt()
    val ids = Array.fill(n)(in.readLong())
    val levels = Array.fill(n)(in.readInt())
    val vecs = Array.fill(n)(Array.fill(dim)(in.readFloat()))
    val norms = Array.fill(n)(in.readDouble())
    val nLayers = in.readInt()
    val links = Array.fill(nLayers)(Array.fill(n) {
      val k = in.readInt(); Array.fill(k)(in.readInt())
    })
    new ShardGraph(ids, vecs, levels, links, entry, norms)
  }

  // -------------------------------------------------------- Spark surface

  private val indexSchema = StructType(Seq(
    StructField("shard", IntegerType, nullable = false),
    StructField("n_vectors", LongType, nullable = false),
    StructField("index_bytes", BinaryType, nullable = false)))

  /** Build the sharded index: one graph per partition of `emb`
    * (`vec_id`, `embedding`). Repartition upstream to set shard size.
    */
  def hnswIndex(emb: DataFrame, m: Int = 8, efConstruction: Int = 64): DataFrame = {
    val pruned = emb.select(col("vec_id").cast("long"), col("embedding"))
      .filter(col("embedding").isNotNull)
    val enc = org.apache.spark.sql.Encoders.row(indexSchema)
    pruned.mapPartitions { it: Iterator[Row] =>
      val rows = it.map(r =>
        (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
      if (rows.isEmpty) Iterator.empty
      else {
        val dims = rows.map(_._2.length).distinct
        require(dims.size == 1, s"ragged embedding dims in shard: $dims")
        val g = buildShard(rows, m, efConstruction)
        val shardId = org.apache.spark.TaskContext.getPartitionId()
        Iterator(Row(shardId, rows.length.toLong, toBytes(g)))
      }
    }(enc)
  }

  /** Persist / reload the sharded index as a plain parquet table (the
    * binary column needs no special handling) — the build-once,
    * probe-per-batch lifecycle of the L52/L66 persisted indexes. Probe
    * equality through the round trip is spec-asserted.
    */
  def writeHnswIndex(index: DataFrame, path: String): Unit =
    index.write.mode("overwrite").parquet(path)

  def readHnswIndex(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Probe: search every shard for every query (queries broadcast-small
    * by contract, like [[Similarity.bruteForceTopK]]'s explicit query
    * frame), merge per-query with the bounded top-k aggregate. Emits
    * (query_id, rank, vec_id, sim).
    */
  def hnswProbe(
      index: DataFrame, queries: DataFrame, k: Int = 10, ef: Int = 64): DataFrame = {
    val spark = index.sparkSession
    graft.functions.GraftFunctions.ensureRegistered(spark)
    // The query set is broadcast-small by contract. Shipping it inside
    // the task closure (rather than an explicit sc.broadcast) still
    // reaches executors exactly once per stage — Spark broadcasts the
    // serialized task binary — and is reclaimed with the stage, so the
    // per-micro-batch probe path (ST9) cannot accumulate broadcast
    // blocks across batches.
    val qs = queries.select(col("query_id").cast("long"), col("qv"))
      .filter(col("qv").isNotNull)
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val outSchema = StructType(Seq(
      StructField("query_id", LongType, nullable = false),
      StructField("vec_id", LongType, nullable = false),
      StructField("sim", DoubleType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    val perShard = index.select(col("index_bytes")).mapPartitions { it: Iterator[Row] =>
      it.flatMap { r =>
        val g = fromBytes(r.getAs[Array[Byte]](0))
        qs.iterator.flatMap { case (qid, qv) =>
          searchShard(g, qv, k, ef).map { case (id, s) => Row(qid, id, s) }
        }
      }
    }(enc)
    // k rows per (query, shard) -> bounded global merge, ranked; same
    // call convention + output shape as Similarity.topK
    perShard.groupBy(col("query_id"))
      .agg(call_function(graft.functions.GraftFunctions.TopKName,
        col("sim"), col("vec_id"), lit(k)).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("vec_id"), col("col.score").as("sim"))
  }
}
