package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Round-start tripwire for driver testdata regeneration (the r6 lesson:
  * `events.ts` silently changed physical type between rounds and DNF'd 13
  * gates). Pins the POST-READ schema of every driver table at sf0.001 —
  * name set and dtype per column, with the known-legal `ts` variants
  * allowed — so any future regeneration that moves a schema fails HERE,
  * in one suite with one obvious name, instead of scattering analysis
  * errors across the gate tier. */
class SchemaDriftSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def schemaOf(table: String): Map[String, DataType] =
    spark.read.parquet(s"$dir/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap

  private def pin(table: String, want: (String, DataType)*): Unit =
    test(s"$table: column names + dtypes unchanged") {
      val got = schemaOf(table)
      assert(got.keySet == want.map(_._1).toSet,
        s"$table columns drifted: got ${got.keySet}")
      want.foreach { case (c, t) =>
        assert(got(c) == t, s"$table.$c: got ${got(c)}, pinned $t")
      }
    }

  pin("region", "r_regionkey" -> IntegerType, "r_name" -> StringType)
  pin("nation", "n_nationkey" -> IntegerType, "n_name" -> StringType,
    "n_regionkey" -> IntegerType)
  pin("customer", "c_custkey" -> LongType, "c_name" -> StringType,
    "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
    "c_mktsegment" -> StringType)
  pin("supplier", "s_suppkey" -> LongType, "s_name" -> StringType,
    "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
  pin("part", "p_partkey" -> LongType, "p_name" -> StringType,
    "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
    "p_retailprice" -> DoubleType)
  pin("documents", "doc_id" -> LongType, "text" -> StringType,
    "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType)
  pin("embeddings", "vec_id" -> LongType,
    "embedding" -> ArrayType(FloatType, containsNull = true),
    "label" -> IntegerType)

  test("orders/lineitem: key + date columns present with pinned types") {
    val o = schemaOf("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_orderstatus") == StringType && o("o_totalprice") == DoubleType &&
      o("o_orderpriority") == StringType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType)
      .contains(o("o_orderdate")), s"o_orderdate: ${o("o_orderdate")}")
    val l = schemaOf("lineitem")
    assert(l("l_orderkey") == LongType && l("l_partkey") == LongType &&
      l("l_suppkey") == LongType && l("l_linenumber") == IntegerType &&
      l("l_quantity") == DoubleType && l("l_extendedprice") == DoubleType &&
      l("l_discount") == DoubleType && l("l_tax") == DoubleType &&
      l("l_returnflag") == StringType && l("l_linestatus") == StringType)
    assert(Set[DataType](DateType, TimestampType, TimestampNTZType)
      .contains(l("l_shipdate")), s"l_shipdate: ${l("l_shipdate")}")
  }

  test("events: ts is one of the three physical variants the reader dispatches on") {
    // read WITHOUT the production reader: this is the raw-footer tripwire
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val got = schemaOf("events")
    assert(got("event_id") == LongType && got("user_id") == LongType &&
      got("event_type") == StringType && got("value") == DoubleType &&
      got("props") == StringType)
    assert(Set[DataType](LongType, TimestampType, TimestampNTZType).contains(got("ts")),
      s"events.ts drifted to ${got("ts")} — extend Tables.events' dispatch AND this pin")
  }
}
