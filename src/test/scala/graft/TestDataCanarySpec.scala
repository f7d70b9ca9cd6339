package graft

import org.apache.spark.sql.types._

/** Drift canary for the driver-generated parquet tables.
  *
  * The test data is regenerated between rounds and its PHYSICAL types
  * have drifted before (events.ts went from int64-nanos to a native
  * parquet timestamp mid-round-8, silently breaking every event-time
  * query at load). This spec fails in `sbt test` — before any driver
  * gate runs — if a table loses a column, gains a surprise rename, or
  * changes to a type family the query layer doesn't handle.
  *
  * Types are pinned to FAMILIES, not exact types, so benign physical
  * changes (int32→int64, timestamp precision, NTZ vs LTZ) don't cry
  * wolf: every query reads these columns through Spark expressions
  * that are family-generic.
  */
class TestDataCanarySpec extends SparkSpec {

  private sealed trait Family { def ok(t: DataType): Boolean }
  private case object Integral extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: ByteType | _: ShortType | _: IntegerType | _: LongType => true
      case _ => false
    }
  }
  private case object Fractional extends Family {
    def ok(t: DataType): Boolean = t match {
      case _: FloatType | _: DoubleType | _: DecimalType => true
      case _ => false
    }
  }
  private case object Text extends Family {
    def ok(t: DataType): Boolean = t == StringType
  }
  private case object Temporal extends Family {
    def ok(t: DataType): Boolean = t match {
      case TimestampType | TimestampNTZType | DateType => true
      case _ => false
    }
  }
  private case object FloatVec extends Family {
    // pinned to array<float> exactly: the fused vector kernels
    // (graft_cosine, graft_cell_dists, graft_nearest_cell) read
    // elements with ArrayData.getFloat, so an array<double> drop
    // would silently produce garbage similarities — the canary must
    // fail on it, not bless it
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
  }

  private val expected: Map[String, Seq[(String, Family)]] = Map(
    "region" -> Seq("r_regionkey" -> Integral, "r_name" -> Text),
    "nation" -> Seq("n_nationkey" -> Integral, "n_name" -> Text,
      "n_regionkey" -> Integral),
    "customer" -> Seq("c_custkey" -> Integral, "c_name" -> Text,
      "c_nationkey" -> Integral, "c_acctbal" -> Fractional,
      "c_mktsegment" -> Text),
    "supplier" -> Seq("s_suppkey" -> Integral, "s_name" -> Text,
      "s_nationkey" -> Integral, "s_acctbal" -> Fractional),
    "part" -> Seq("p_partkey" -> Integral, "p_name" -> Text,
      "p_brand" -> Text, "p_type" -> Text, "p_size" -> Integral,
      "p_retailprice" -> Fractional),
    "orders" -> Seq("o_orderkey" -> Integral, "o_custkey" -> Integral,
      "o_orderstatus" -> Text, "o_totalprice" -> Fractional,
      "o_orderdate" -> Temporal, "o_orderpriority" -> Text),
    "lineitem" -> Seq("l_orderkey" -> Integral, "l_partkey" -> Integral,
      "l_suppkey" -> Integral, "l_linenumber" -> Integral,
      "l_quantity" -> Fractional, "l_extendedprice" -> Fractional,
      "l_discount" -> Fractional, "l_tax" -> Fractional,
      "l_returnflag" -> Text, "l_linestatus" -> Text,
      "l_shipdate" -> Temporal),
    "events" -> Seq("event_id" -> Integral, "ts" -> Temporal,
      "user_id" -> Integral, "event_type" -> Text, "value" -> Fractional,
      "props" -> Text),
    "documents" -> Seq("doc_id" -> Integral, "text" -> Text,
      "lang" -> Text, "source" -> Text, "n_chars" -> Integral),
    "embeddings" -> Seq("vec_id" -> Integral, "embedding" -> FloatVec,
      "label" -> Integral))

  test("every driver table loads with the expected columns and type families") {
    Tables.all.foreach { name =>
      val df = Tables(spark, sf001, name)
      val want = expected(name)
      assert(df.schema.fieldNames.toSeq == want.map(_._1),
        s"$name columns drifted: ${df.schema.fieldNames.toSeq} vs expected ${want.map(_._1)}")
      want.foreach { case (c, fam) =>
        val t = df.schema(c).dataType
        assert(fam.ok(t), s"$name.$c drifted to unhandled type $t (family $fam)")
      }
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("the normalized events table exposes a plain TimestampType ts") {
    // stricter than the family check: every event-time operator
    // (windows, as-of joins, watermarks) builds on TimestampType
    assert(Tables(spark, sf001, "events").schema("ts").dataType == TimestampType)
  }
}
