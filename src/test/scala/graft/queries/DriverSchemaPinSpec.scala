package graft.queries

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Pins the DRIVER-GENERATED testdata schemas (r12): the driver
  * regenerates /root/testdata between rounds, and the one schema flip
  * it has already made (events `ts`: nanos-as-long → timestamp NTZ,
  * r9→r10) cost a 39-query bench gate before it cost a test. This
  * spec turns the next flip into ONE red test naming the table and
  * column. Columns known to vary across generator versions are pinned
  * by NAME only with the accepted type set listed; everything else
  * pins name AND type. If the driver legitimately changes a schema,
  * update the pin AND the loader dispatch (QueryPack.events is the
  * pattern), then re-run the full oracle gate.
  */
class DriverSchemaPinSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // (table -> expected (column, simpleTypeName) in order). Types as
  // Spark reads them (timestamp[us] ntz parquet -> timestamp_ntz).
  private val pins: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq("c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      // dates have flipped representation before; loaders cast
      "o_orderdate" -> Set("timestamp", "timestamp_ntz", "date", "bigint"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz", "date", "bigint")),
    "events" -> Seq("event_id" -> Set("bigint"),
      // BOTH observed layouts accepted — QueryPack.events dispatches
      "ts" -> Set("timestamp", "timestamp_ntz", "bigint"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq("vec_id" -> Set("bigint"),
      "embedding" -> Set("array<float>"), "label" -> Set("int")))

  test("driver testdata schemas match the pinned shapes (all 10 tables)") {
    // nanosAsLong so a nanos-era events file READS instead of throwing
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val problems = pins.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val schema = spark.read.parquet(s"$dir/$table.parquet").schema
      val actual = schema.fields.map(f =>
        f.name -> f.dataType.simpleString.toLowerCase)
      val nameMismatch =
        if (actual.map(_._1).toSeq != cols.map(_._1))
          Seq(s"$table: columns ${actual.map(_._1).mkString(",")} != " +
            s"pinned ${cols.map(_._1).mkString(",")}")
        else Nil
      val typeMismatches = actual.zip(cols).collect {
        case ((an, at), (pn, pts)) if an == pn && !pts.contains(at) =>
          s"$table.$an: type $at not in accepted ${pts.mkString("/")}"
      }
      nameMismatch ++ typeMismatches
    }
    assert(problems.isEmpty,
      "DRIVER TESTDATA SCHEMA CHANGED — update the loader dispatch and " +
        "this pin, then re-run the oracle gate:\n" + problems.mkString("\n"))
  }
}
