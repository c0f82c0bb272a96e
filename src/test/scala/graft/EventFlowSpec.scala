package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Funnel, Resample, Sampling, Skew, SnapshotDiff}

/** Unit semantics for the batch of event-flow / scale operators behind
  * q82–q88: ordered funnel, gap-filled series, salted join, the
  * changeSet/applyChanges MERGE pair, and weighted hash sampling.
  */
class EventFlowSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  test("funnel counts in-order reach only; equal timestamps count (at-or-after)") {
    val e = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (2L, 5L, "click"), (2L, 10L, "view"), // click BEFORE first view: no stage 2
      (3L, 10L, "view"), (3L, 10L, "click"), // same-ts click: stage 2 reached
      (4L, 1L, "purchase") // purchase without view: nothing
    ).toDF("user_id", "ts", "event_type")
    val got = Funnel.stageCounts(e, "user_id", col("ts"), col("event_type"),
      Seq("view", "click", "purchase")).collect()
    assert(got.map(r => (r.getAs[Int]("stage_ord"), r.getAs[String]("stage"),
      r.getAs[Long]("n_entities"))).toSeq ==
      Seq((1, "view", 3L), (2, "click", 2L), (3, "purchase", 1L)))
    assert(got(1).getAs[Double]("pct_of_first") == 2.0 / 3.0)
  }

  test("funnel: stage k must be at-or-after stage k-1's reach, not just any order") {
    // purchase(15) sits between view(10) and the only click(20): the
    // purchase precedes the click reach, so stage 3 is NOT reached.
    val e = Seq((1L, 10L, "view"), (1L, 15L, "purchase"), (1L, 20L, "click"))
      .toDF("user_id", "ts", "event_type")
    val got = Funnel.stageCounts(e, "user_id", col("ts"), col("event_type"),
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_entities")).toMap
    assert(got == Map("view" -> 1L, "click" -> 1L, "purchase" -> 0L))
  }

  test("gap fill: explicit zeros for absent days and for cells failing the predicate") {
    val e = Seq(
      ("2024-01-01 10:00:00", "a", 5.0),  // fails predicate → zero cell
      ("2024-01-01 11:00:00", "b", 50.0),
      ("2024-01-03 10:00:00", "a", 50.0), // day 2 has no rows at all
      ("2024-01-03 11:00:00", "b", 1.0)
    ).toDF("ts", "typ", "v").withColumn("ts", to_timestamp(col("ts")))
    val got = Resample.gapFillDailyCounts(e, col("ts"), Seq("typ"), col("v") > 10)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[String]("typ"), r.getAs[Long]("n_events")))
    assert(got.toSeq == Seq(
      ("2024-01-01", "a", 0L), ("2024-01-01", "b", 1L),
      ("2024-01-02", "a", 0L), ("2024-01-02", "b", 0L),
      ("2024-01-03", "a", 1L), ("2024-01-03", "b", 0L)))
  }

  test("saltedJoin is result-identical to the plain join on a skewed fact") {
    val fact = (1 to 500).map(i => (if (i % 10 == 0) 2L else 1L, i.toLong))
      .toDF("k", "row_id") // key 1 owns 90% of the rows
    val dim = Seq((1L, "one"), (2L, "two"), (3L, "never-matched"))
      .toDF("dk", "label")
    val got = Skew.saltedJoin(fact, "k", dim, "dk", Seq(col("row_id")), buckets = 4)
      .select("k", "row_id", "dk", "label")
    val want = fact.join(dim, fact("k") === dim("dk"))
      .select("k", "row_id", "dk", "label")
    assert(got.count() == want.count())
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("changeSet is change-proportional; applyChanges reconstructs the next snapshot") {
    val prev = Seq(
      (1L, Option("A"), 10.0), (2L, Option("B"), 20.0), (3L, None: Option[String], 30.0),
      (4L, Option("D"), 40.0), (5L, None: Option[String], 50.0)
    ).toDF("k", "status", "amount")
    val next = Seq(
      (1L, Option("A"), 10.0), (2L, Option("B"), 21.0), (3L, Option("C"), 30.0),
      (5L, None: Option[String], 50.0), (6L, Option("F"), 60.0)
    ).toDF("k", "status", "amount")
    val cs = SnapshotDiff.changeSet(prev, next, Seq("k"), Seq("status", "amount"))
    val byKey = cs.collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    // keys 1 and 5 are unchanged: NOT in the feed
    assert(byKey == Map(2L -> "changed", 3L -> "changed", 4L -> "removed", 6L -> "added"))

    val rebuilt = SnapshotDiff.applyChanges(prev, cs, Seq("k"), Seq("status", "amount"))
    assert(rebuilt.except(next).isEmpty && next.except(rebuilt).isEmpty)
    assert(rebuilt.count() == next.count())
  }

  test("sigmaOutlierCounts flags exactly the k-sigma violators, per group") {
    // group "a": 99 × 100 plus one 1000 → mean 109, σ_pop ≈ 89.5;
    // 3σ ≈ 268.6: the 1000 (dev 891) is out, the 100s (dev 9) are in.
    // group "b": alternating 1/2 → nothing is 3σ out.
    val rows = (1 to 99).map(_ => ("a", 100L)) :+ (("a", 1000L))
    val rowsB = (1 to 50).map(i => ("b", (i % 2 + 1).toLong))
    val df = (rows ++ rowsB).toDF("g", "v")
    val got = graft.operators.DataQuality
      .sigmaOutlierCounts(df, Seq("g"), col("v"), sigmas = 3)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_outliers"))).toMap
    assert(got == Map("a" -> (100L, 1L), "b" -> (50L, 0L)))
  }

  test("weightedHashSample: max-weight rows always kept; selection is a pure function of content") {
    val df = (1 to 300).map(i => (i.toLong, (i % 10) + 1)).toDF("id", "w")
    val got = Sampling.weightedHashSample(df, col("id").cast("string"), col("w"))
    assert(got.filter(col("w") === 10).count() == df.filter(col("w") === 10).count())
    val ids = got.select("id").as[Long].collect().sorted
    val again = Sampling.weightedHashSample(df, col("id").cast("string"), col("w"))
      .select("id").as[Long].collect().sorted
    assert(ids.sameElements(again))
    // and it is exactly the documented integer predicate
    import graft.operators.TextFunctions.hash60
    val direct = df.filter(
      pmod(hash60(col("id").cast("string")), lit(1000000L)) * lit(10L)
        < col("w").cast("long") * lit(1000000L))
      .select("id").as[Long].collect().sorted
    assert(ids.sameElements(direct))
    // a real sample: strictly between trivial bounds
    assert(ids.length > 30 && ids.length < 300)
  }
}
