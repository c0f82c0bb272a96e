package graft

import java.sql.Timestamp

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Incremental, Resample, Sampling}

/** Seeded randomized invariants for the round-4 analytics operators —
  * each checked against an independent brute-force recompute in plain
  * Scala (same style as ScdPropertySpec: deterministic seeds, no
  * scalatestplus bridge).
  */
class Round4PropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2024-${1 + (day - 1) / 28}%02d-${1 + (day - 1) % 28}%02d $hour%02d:00:00")

  test("trailingDaily equals a brute-force trailing recompute on random series") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = Seq.fill(300)((
        s"k${rnd.nextInt(3)}", ts(1 + rnd.nextInt(56), rnd.nextInt(24)),
        rnd.nextInt(1000).toLong))
      val df = rows.toDF("k", "t", "v")
      val windowDays = 1 + rnd.nextInt(10)
      val got = Resample.trailingDaily(df, col("t"), Seq("k"), col("v"), windowDays)
        .select("k", "day", "n_events", "day_total", "trailing_total", "trailing_days")
        .as[(String, java.sql.Date, Long, Long, Long, Long)]
        .collect().toSet

      // brute-force day in UTC (the pinned Spark session timezone) —
      // toLocalDateTime would use the JVM default TZ and diverge on
      // non-UTC machines for late-evening timestamps
      val daily = rows.groupBy(r => (r._1,
        r._2.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate))
        .map { case ((k, d), rs) => (k, d, rs.size.toLong, rs.map(_._3).sum) }
      val expected = daily.map { case (k, d, n, tot) =>
        val inWin = daily.filter(o => o._1 == k &&
          !o._2.isAfter(d) && o._2.isAfter(d.minusDays(windowDays)))
        (k, java.sql.Date.valueOf(d), n, tot,
          inWin.map(_._4).sum, inWin.size.toLong)
      }.toSet
      assert(got == expected, s"seed=$seed windowDays=$windowDays")
    }
  }

  test("quantileBins: monotone in the value, counts partition the input") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val vals = Seq.fill(500)(rnd.nextDouble() * 1000)
      val qs = Seq(0.2, 0.5, 0.8)
      val got = Sampling.quantileBins(vals.toDF("v"), col("v"), qs)
        .select("v", "bin").as[(Double, Long)].collect()
      assert(got.length == vals.length)
      assert(got.forall { case (_, b) => b >= 0 && b <= qs.size })
      // monotone: sort by value → bins never decrease
      val byV = got.sortBy(_._1).map(_._2)
      assert(byV.zip(byV.tail).forall { case (a, b) => a <= b }, s"seed=$seed")
    }
  }

  test("Incremental: any split of the day range merges to the direct rollup") {
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val rows = Seq.fill(200)((
        s"s${rnd.nextInt(3)}", ts(1 + rnd.nextInt(56), 12), rnd.nextInt(100000).toLong))
      val df = rows.toDF("g", "t", "v").withColumn("day", to_date(col("t")))
      val split = java.sql.Date.valueOf(
        ts(1 + rnd.nextInt(56), 0).toLocalDateTime.toLocalDate)
      val p1 = Incremental.dailyPartials(
        df.filter(col("day") < split), Seq("g"), col("day"), col("v"))
      val p2 = Incremental.dailyPartials(
        df.filter(col("day") >= split), Seq("g"), col("day"), col("v"))
      val merged = Incremental.mergeToPeriod(
        p1.unionByName(p2), Seq("g"), d => trunc(d, "month"))
        .orderBy("g", "period").collect().toSeq
      val direct = Incremental.mergeToPeriod(
        Incremental.dailyPartials(df, Seq("g"), col("day"), col("v")),
        Seq("g"), d => trunc(d, "month"))
        .orderBy("g", "period").collect().toSeq
      assert(merged == direct, s"seed=$seed split=$split")
    }
  }

  test("SignatureMin: aggregate of signatures == elementwise min, any grouping") {
    import graft.operators.Dedup
    for (seed <- 1 to 5) {
      val rnd = new Random(seed)
      val k = 1 + rnd.nextInt(8)
      val sigs = Seq.fill(40)(Seq.fill(k)(rnd.nextLong().abs))
      val expected = (0 until k).map(j => sigs.map(_(j)).min)
      val agg = udaf(new Dedup.SignatureMin(k))
      val got = sigs.map(("g", _)).toDF("g", "sig")
        .repartition(1 + rnd.nextInt(7))
        .groupBy("g").agg(agg(col("sig")).as("m"))
        .select("m").as[Seq[Long]].collect().head
      assert(got == expected, s"seed=$seed k=$k")
    }
  }
}
