package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sketches, SnapshotDiff}

/** Unit semantics for the CDC snapshot diff and the GK approximate-
  * median envelope.
  */
class SnapshotDiffSpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  test("diff classifies added/removed/changed/unchanged with null-safe compares") {
    val prev = Seq(
      (1L, Option("A"), 10.0), // unchanged
      (2L, Option("B"), 20.0), // changed (value)
      (3L, None, 30.0),        // changed (null → value)
      (4L, Option("D"), 40.0), // removed
      (5L, None, 50.0)         // unchanged (null <=> null)
    ).toDF("k", "status", "amount")
    val next = Seq(
      (1L, Option("A"), 10.0),
      (2L, Option("B"), 21.0),
      (3L, Option("C"), 30.0),
      (5L, None, 50.0),
      (6L, Option("F"), 60.0)  // added
    ).toDF("k", "status", "amount")
    val got = SnapshotDiff.diff(prev, next, Seq("k"), Seq("status", "amount"))
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(got == Map(1L -> "unchanged", 2L -> "changed", 3L -> "changed",
      4L -> "removed", 5L -> "unchanged", 6L -> "added"))
  }

  test("diff with no tracked columns classifies by key presence only") {
    val prev = Seq((1L, "x"), (2L, "y")).toDF("k", "v")
    val next = Seq((2L, "z"), (3L, "w")).toDF("k", "v")
    val got = SnapshotDiff.diff(prev, next, Seq("k"), Seq.empty)
      .collect().map(r => r.getAs[Long]("k") -> r.getAs[String]("change_type")).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "added"))
  }

  test("diff supports composite keys") {
    val prev = Seq((1L, "a", 1.0), (1L, "b", 2.0)).toDF("k1", "k2", "v")
    val next = Seq((1L, "a", 9.0), (2L, "b", 2.0)).toDF("k1", "k2", "v")
    val got = SnapshotDiff.diff(prev, next, Seq("k1", "k2"), Seq("v"))
      .collect()
      .map(r => (r.getAs[Long]("k1"), r.getAs[String]("k2")) -> r.getAs[String]("change_type"))
      .toMap
    assert(got == Map((1L, "a") -> "changed", (1L, "b") -> "removed",
      (2L, "b") -> "added"))
  }

  test("approxMedianChecked: envelope holds and is honestly computed") {
    val df = (1 to 1000).map(i => ("g", i.toDouble)).toDF("grp", "value")
    val got = Sketches.approxMedianChecked(df, "grp", "value", accuracy = 100)
      .collect().head
    assert(got.getAs[Long]("n_rows") == 1000L)
    assert(got.getAs[Boolean]("within_rank_bound"))
  }

  test("approxMedianChecked envelope holds on the events table") {
    val got = Sketches.approxMedianChecked(
      Tables.events(spark, "/root/testdata/sf0.001"), "event_type", "value", 1000)
      .collect()
    assert(got.nonEmpty && got.forall(_.getAs[Boolean]("within_rank_bound")))
  }
}
