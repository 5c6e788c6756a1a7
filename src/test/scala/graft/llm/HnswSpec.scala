package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Gate for the sharded HNSW index (not SQL-expressible, so the spec
  * carries the correctness weight): recall floor vs exact brute force,
  * build determinism, serialization round trip, multi-shard merge.
  */
class HnswSpec extends AnyFunSuite with SparkSpec {

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("shard graph round-trips through bytes and searches identically") {
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val g = Hnsw.buildShard(rows, m = 8, efC = 64)
    val g2 = Hnsw.fromBytes(Hnsw.toBytes(g))
    val q = rows.head._2
    assert(Hnsw.searchShard(g, q, 10, 64) === Hnsw.searchShard(g2, q, 10, 64))
    assert(g2.ids.toSeq === g.ids.toSeq && g2.entry === g.entry)
  }

  test("fromBytes rejects unversioned/stale/foreign bytes with an actionable error") {
    // pre-v2 bytes had no header: their first word is a (small) node
    // count, which can never equal the magic word — reading them must
    // fail fast, not deserialize garbage vectors
    val stale = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(2); o.writeInt(3); o.writeInt(0) // n, dim, entry (v1 shape)
      (1 to 2).foreach(i => o.writeLong(i.toLong))
      bos.toByteArray
    }
    val e1 = intercept[IllegalArgumentException](Hnsw.fromBytes(stale))
    assert(e1.getMessage.contains("rebuild the index"))
    // a versioned header with the wrong version names both versions
    val wrongVer = {
      val bos = new java.io.ByteArrayOutputStream()
      val o = new java.io.DataOutputStream(bos)
      o.writeInt(Hnsw.FormatMagic); o.writeInt(Hnsw.FormatVersion + 1)
      bos.toByteArray
    }
    val e2 = intercept[IllegalArgumentException](Hnsw.fromBytes(wrongVer))
    assert(e2.getMessage.contains(s"version ${Hnsw.FormatVersion + 1}"))
  }

  test("build is deterministic under input row order") {
    val rows = emb.select(col("vec_id").cast("long"), col("embedding"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
    val a = Hnsw.toBytes(Hnsw.buildShard(rows, 8, 64))
    val b = Hnsw.toBytes(Hnsw.buildShard(scala.util.Random.shuffle(rows), 8, 64))
    assert(java.util.Arrays.equals(a, b))
  }

  test("recall@10 vs brute force >= 0.9 on the test corpus (multi-shard)") {
    val s = spark
    import s.implicits._
    val queries = emb.orderBy(col("vec_id")).limit(8)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = Similarity.bruteForceTopK(emb, queries, k = 10)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val index = Hnsw.hnswIndex(emb.repartition(4), m = 8, efConstruction = 64)
    assert(index.count() === 4) // one graph row per shard
    val approx = Hnsw.hnswProbe(index, queries, k = 10, ef = 96)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rs) => q -> rs.map(_.getLong(2)).toSet }
    val recalls = exact.map { case (q, truth) =>
      approx.get(q).map(found => (found & truth).size.toDouble / truth.size)
        .getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"mean recall@10 = $mean")
    // every query answered with exactly k ranked hits
    assert(approx.values.forall(_.size === 10))
  }

  test("persisted index probes identically after the parquet round trip") {
    val queries = emb.orderBy(col("vec_id")).limit(4)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val index = Hnsw.hnswIndex(emb.repartition(3), m = 8, efConstruction = 64)
    val dir = java.nio.file.Files.createTempDirectory("hnsw_idx").toString
    Hnsw.writeHnswIndex(index, dir)
    val live = Hnsw.hnswProbe(index, queries, k = 5, ef = 64)
      .collect().map(_.toSeq)
    val reloaded = Hnsw.hnswProbe(
      Hnsw.readHnswIndex(spark, dir), queries, k = 5, ef = 64)
      .collect().map(_.toSeq)
    assert(live.toSeq === reloaded.toSeq)
  }

  test("levelOf: geometric level distribution, cap respected") {
    val levels = (0L until 4096L).map(Hnsw.levelOf(_))
    // p = 1/2 geometric: about half the ids sit at level 0; the tower
    // height stays bounded by the cap
    val l0 = levels.count(_ == 0).toDouble / levels.size
    assert(l0 > 0.4 && l0 < 0.6, s"level-0 fraction $l0")
    assert(levels.max <= 16)
    // deterministic: same id, same level, every call
    assert((0L until 64L).forall(i => Hnsw.levelOf(i) === Hnsw.levelOf(i)))
  }

  test("q115 oracle fixture: deterministic vectors, pinned rows are a real top-k") {
    // the pinned VALUES oracle (Q115Oracle) is only meaningful if the
    // fixture is (a) bit-stable and (b) the probe finds the true
    // neighbors — gate both here, driver-side on the exact fixture
    val dim = 16
    assert(Hnsw.fixtureVector(7L, dim).toSeq ===
      Hnsw.fixtureVector(7L, dim).toSeq)
    // components are 1/1000-quantized in [-1, 1] (exactly representable)
    assert(Hnsw.fixtureVector(7L, dim).forall(v =>
      v >= -1f && v <= 1f && (v * 1000f) === math.round(v * 1000f).toFloat))
    val corpus = (0L until 2000L).map(i => i -> Hnsw.fixtureVector(i, dim))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    // parse the pinned VALUES rows back into (query_id -> vec_id set)
    val rowRe =
      """\(CAST\((\d+) AS BIGINT\), CAST\((\d+) AS BIGINT\), CAST\((\d+) AS BIGINT\)\)""".r
    val pinned = rowRe.findAllMatchIn(graft.queries.Q115Oracle.sql)
      .map(m => (m.group(1).toLong, m.group(3).toLong)).toSeq
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }
    assert(pinned.keySet === (0L until 5L).toSet &&
      pinned.values.forall(_.size === 10))
    val recalls = (0L until 5L).map { qid =>
      val qv = Hnsw.fixtureVector(100000L + qid, dim)
      val truth = corpus.map { case (i, v) => (cos(qv, v), i) }
        .sortBy { case (s, i) => (-s, i) }.take(10).map(_._2).toSet
      (truth & pinned(qid)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.9, s"fixture recall@10 vs pinned oracle = $mean")
  }

  test("null embeddings drop at index time; empty shards vanish") {
    val s = spark
    import s.implicits._
    val withNull = Seq(
      (1L, Option(Seq(1f, 0f))), (2L, Option(Seq(0f, 1f))),
      (3L, Option.empty[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val idx = Hnsw.hnswIndex(withNull.repartition(8), m = 4, efConstruction = 16)
    assert(idx.agg(sum(col("n_vectors"))).head().getLong(0) === 2L)
    val q = Seq((9L, Seq(1f, 0f))).toDF("query_id", "qv")
    val hits = Hnsw.hnswProbe(idx, q, k = 1, ef = 8).collect()
    assert(hits.length === 1 && hits.head.getLong(2) === 1L)
  }
}
