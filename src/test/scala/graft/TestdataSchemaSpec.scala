package graft

import org.apache.spark.sql.types._

import graft.helium.SparkSuite

/** Testdata schema sentinel.
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * drifted once (events.ts: TIMESTAMP(NANOS) → TIMESTAMP_MICROS NTZ), which
  * silently broke nine queries at runtime. This spec pins every table's
  * (column, dtype) contract so the next drift fails ONE labeled assertion
  * naming the table and column, instead of scattering analysis errors
  * across the query surface.
  *
  * Columns with known benign encodings (the NTZ-vs-TZ timestamp flavor,
  * and the long-nanos events vintage [[Tables.epochUs]] adapts to) accept
  * the full set of dtypes the query surface handles.
  */
class TestdataSchemaSpec extends SparkSuite {

  private val sf = "/root/testdata/sf0.001"

  /** Dtypes the loaders + queries are known to handle for a column. */
  private val tsLike: Set[DataType] = Set(TimestampType, TimestampNTZType)
  private val eventsTs: Set[DataType] = tsLike + LongType // nanos vintage

  private def exact(dt: DataType): Set[DataType] = Set(dt)

  private val expected: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> exact(IntegerType),
      "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> exact(IntegerType),
      "n_name" -> exact(StringType),
      "n_regionkey" -> exact(IntegerType)),
    "customer" -> Seq(
      "c_custkey" -> exact(LongType),
      "c_name" -> exact(StringType),
      "c_nationkey" -> exact(IntegerType),
      "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> exact(LongType),
      "s_name" -> exact(StringType),
      "s_nationkey" -> exact(IntegerType),
      "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> exact(LongType),
      "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType),
      "p_type" -> exact(StringType),
      "p_size" -> exact(IntegerType),
      "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> exact(LongType),
      "o_custkey" -> exact(LongType),
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> tsLike,
      "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> exact(LongType),
      "l_partkey" -> exact(LongType),
      "l_suppkey" -> exact(LongType),
      "l_linenumber" -> exact(IntegerType),
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType),
      "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType),
      "l_shipdate" -> tsLike),
    "events" -> Seq(
      "event_id" -> exact(LongType),
      "ts" -> eventsTs,
      "user_id" -> exact(LongType),
      "event_type" -> exact(StringType),
      "value" -> exact(DoubleType),
      "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> exact(LongType),
      "text" -> exact(StringType),
      "lang" -> exact(StringType),
      "source" -> exact(StringType),
      "n_chars" -> exact(LongType)),
    "embeddings" -> Seq(
      "vec_id" -> exact(LongType),
      "embedding" -> exact(ArrayType(FloatType)),
      "label" -> exact(IntegerType)),
  )

  test("every testdata table matches its pinned (column, dtype) contract") {
    val drift = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      // events must load through its adaptive loader, like the queries do
      val df =
        if (table == "events") Tables.events(spark, sf)
        else Tables.t(spark, sf, table)
      val actual = df.schema.map(f => f.name -> f.dataType).toMap
      val missing = cols.collect {
        case (name, _) if !actual.contains(name) =>
          s"$table.$name: MISSING (have: ${actual.keys.toSeq.sorted.mkString(", ")})"
      }
      val wrong = cols.collect {
        case (name, ok) if actual.contains(name) && !ok(actual(name)) =>
          s"$table.$name: drifted to ${actual(name).simpleString} " +
            s"(accepted: ${ok.map(_.simpleString).toSeq.sorted.mkString("/")})"
      }
      missing ++ wrong
    }
    assert(drift.isEmpty,
      s"\nTESTDATA SCHEMA DRIFT — fix the adaptive loaders/queries for:\n  " +
        drift.mkString("\n  "))
  }

  test("epochUs handles every ts vintage: long nanos, timestamp, NTZ") {
    import spark.implicits._
    // long-nanos vintage (the r1–r7 testdata encoding): ts arrives as a
    // plain int64 column and epochUs must integer-divide, not cast
    val dir = java.nio.file.Files.createTempDirectory("ts_vintage").toString
    Seq((1L, 1700000000123456789L)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val nanos = Tables.events(spark, dir)
    assert(nanos.schema("ts").dataType == LongType)
    assert(nanos.select(Tables.epochUs(nanos).as("us")).as[Long].head()
      == 1700000000123456L)
    // timestamp vintage: epochUs == unix_micros of the wall-clock value
    // under the pinned UTC session
    val tsDir = java.nio.file.Files.createTempDirectory("ts_vintage2").toString
    Seq((1L, java.sql.Timestamp.valueOf("2024-01-02 03:04:05.678901")))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$tsDir/events.parquet")
    val tsv = Tables.events(spark, tsDir)
    val expected = java.time.LocalDateTime
      .of(2024, 1, 2, 3, 4, 5, 678901000)
      .toInstant(java.time.ZoneOffset.UTC)
    assert(tsv.select(Tables.epochUs(tsv).as("us")).as[Long].head()
      == expected.getEpochSecond * 1000000L + expected.getNano / 1000L)
    // the live testdata vintage goes through the same helper and lands
    // in a sane range (year 2000+ in µs)
    val live = Tables.events(spark, sf)
    assert(live.select(Tables.epochUs(live).as("us")).as[Long].head()
      > 946684800000000L)
  }

  test("ignoring array element nullability, embeddings round-trips through the ANN entry schema") {
    // embeddings.embedding element nullability varies by writer; the ANN
    // surface treats elements as non-null floats — pin that read succeeds.
    val v = Tables.embeddings(spark, sf).selectExpr("size(embedding) AS d")
      .limit(1).collect()
    assert(v.nonEmpty && v.head.getInt(0) > 0, "embedding column unreadable or empty")
  }
}
