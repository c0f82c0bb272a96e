package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink breadth beyond the pipeline's parquet+CSV: JSON
  * round-trip with declared schema, partitioned parquet writes with
  * partition pruning, and schema-on-read enforcement. */
class SourcesSinksSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  private val sf = "/root/testdata/sf0.001"

  test("JSON sink/source round-trip preserves rows under a declared schema") {
    val dir = Files.createTempDirectory("events_json").toString
    val e = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "props")
    e.write.mode("overwrite").json(dir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("event_type", StringType), StructField("value", DoubleType),
      StructField("props", StringType)))
    val back = spark.read.schema(schema).json(dir)
    assert(back.count() == e.count())
    val a = e.agg(sum("event_id"), countDistinct("event_type")).collect().head
    val b = back.agg(sum("event_id"), countDistinct("event_type")).collect().head
    assert(a == b)
  }

  test("ORC sink/source round-trip preserves schema, values, and pushes filters") {
    val dir = Files.createTempDirectory("lineitem_orc").toString
    val l = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_quantity", "l_returnflag")
    l.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == l.schema) // ORC stores types — no re-declare
    val a = l.agg(sum("l_orderkey"), sum("l_quantity")).collect().head
    val b = back.agg(sum("l_orderkey"), sum("l_quantity")).collect().head
    assert(a == b)
    // ORC scans take pushed filters like parquet
    val plan = back.filter(col("l_returnflag") === "R")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"), plan)
  }

  test("CSV sink/source round-trip under the declared schema (header mode)") {
    val dir = Files.createTempDirectory("nation_csv").toString
    val n = Tables.nation(spark, sf)
    n.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.option("header", "true").schema(n.schema).csv(dir)
    assert(back.schema == n.schema)
    assert(back.orderBy("n_nationkey").collect().toSeq ==
      n.orderBy("n_nationkey").collect().toSeq)
  }

  test("partitioned parquet write prunes partitions on read") {
    val dir = Files.createTempDirectory("events_part").toString
    Tables.events(spark, sf)
      .select("event_id", "event_type", "value")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val one = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"), plan)
    val expected = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(one.count() == expected)
  }

  test("schema-on-read coerces malformed values to null (permissive mode)") {
    val dir = Files.createTempDirectory("bad_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/d.csv"),
      "id,amount,when\n1,10.5,2024-01-01\n2,notanumber,2024-02-30\n3,7.25,2024-03-03\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("amount", DoubleType),
      StructField("when", DateType)))
    val df = spark.read.option("header", "true").schema(schema).csv(dir)
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(1).isNullAt(1), "unparseable double → null (pd.to_numeric coerce analog)")
    assert(rows(1).isNullAt(2), "invalid date → null (to_datetime coerce analog, S6/X4)")
  }

  test("events.ts normalizes to TimestampType under BOTH parquet physical shapes") {
    // The generated events.parquet has shipped as TIMESTAMP(NANOS) and as
    // TIMESTAMP(MICROS, isAdjustedToUTC=false); every unix_micros(ts)
    // gate (q22/q43/q100/q112/q113/q117/q118/q122/q124) needs plain
    // TimestampType either way. Round-7 regression: the NTZ shape fell
    // through `case _ => raw` and all nine gates died with
    // DATATYPE_MISMATCH at sf0.1.
    val e = Tables.events(spark, sf)
    assert(e.schema("ts").dataType == TimestampType, e.schema("ts").dataType)
    val expected = e.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
      sum(unix_micros(col("ts")))).collect().head

    // Path 3: a THIRD surprise physical type must fail inside
    // Tables.events with the actual type named, not nine queries later
    // as DATATYPE_MISMATCH (the round-7 failure mode).
    val dir = Files.createTempDirectory("events_badts").toString
    Tables.events(spark, sf).limit(5)
      .withColumn("ts", col("ts").cast("string"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val err = intercept[IllegalArgumentException] { Tables.events(spark, dir) }
    assert(err.getMessage.contains("StringType"), err.getMessage)

    // Path 2: a session that DIDN'T disable inferTimestampNTZ sees the
    // micros file as TIMESTAMP_NTZ; Tables.events must cast it back, and
    // under the UTC session timezone the cast must preserve every micro.
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      val raw = spark.read.parquet(s"$sf/events.parquet")
      if (raw.schema("ts").dataType == TimestampNTZType) { // micros shape on disk
        val ntz = Tables.events(spark, sf)
        assert(ntz.schema("ts").dataType == TimestampType, ntz.schema("ts").dataType)
        val got = ntz.agg(min(unix_micros(col("ts"))), max(unix_micros(col("ts"))),
          sum(unix_micros(col("ts")))).collect().head
        assert(got == expected, s"NTZ cast drifted: $got vs $expected")
      }
    } finally spark.conf.set(key, prev)
  }
}
