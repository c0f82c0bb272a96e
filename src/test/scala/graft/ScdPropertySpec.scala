package graft

import java.time.LocalDate

import scala.util.Random

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ScdType2

/** SCD2 invariants under generated snapshot sequences (SURVEY.md §5):
  *  - exactly one current row per business id;
  *  - versions dense from 1 per id;
  *  - expired rows chain: expiry_date = next version's effective - 1;
  *  - re-running an identical snapshot is a no-op modulo sk values;
  *  - surrogate keys dense 0..N-1.
  * Generation is seeded (deterministic across runs); scalacheck-style
  * without the scalatestplus bridge (not in the offline cache).
  */
class ScdPropertySpec extends AnyFunSuite {
  lazy val spark = Sessions.local(4)
  import spark.implicits._

  private val attrs = Seq("name", "address")
  private val tracked = Seq("address")

  private def genSnapshot(rnd: Random): Seq[(String, String, String)] = {
    val ids = rnd.shuffle(('a' to 'p').map(_.toString).toList).take(1 + rnd.nextInt(12))
    ids.map { id =>
      val name = Seq("Ann", "Bob", "Cam")(rnd.nextInt(3))
      val addr = Seq("1 Main", "2 Oak", "3 Elm", null)(rnd.nextInt(4))
      (id, name, addr)
    }
  }

  private def dim(rows: Seq[(String, String, String)]): DataFrame =
    rows.toDF("id", "name", "address")

  private def checkInvariants(out: Array[org.apache.spark.sql.Row]): Unit = {
    out.groupBy(_.getAs[String]("id")).foreach { case (id, rows) =>
      assert(rows.count(_.getAs[Boolean]("is_current")) == 1,
        s"$id must have exactly one current row")
      val versions = rows.map(_.getAs[Long]("version")).sorted
      assert(versions.toSeq == (1L to versions.length).toSeq,
        s"$id versions must be dense from 1, got ${versions.toSeq}")
      val chain = rows.sortBy(_.getAs[Long]("version"))
      chain.sliding(2).foreach {
        case Array(prev, next) =>
          val expiry = prev.getAs[java.sql.Date]("expiry_date")
          val nextEff = next.getAs[java.sql.Date]("effective_date")
          assert(expiry != null && nextEff != null &&
            expiry.toLocalDate == nextEff.toLocalDate.minusDays(1),
            s"$id: expiry $expiry must be next effective $nextEff - 1")
        case _ => ()
      }
      assert(chain.last.getAs[java.sql.Date]("expiry_date") == null,
        s"$id: current row must have null expiry")
    }
    val sks = out.map(_.getAs[Long]("sk")).sorted
    assert(sks.toSeq == (0L until out.length).toSeq, "sks dense 0..N-1")
  }

  test("invariants hold across three generated snapshot applications (12 seeds)") {
    (0 until 12).foreach { seed =>
      val rnd = new Random(seed)
      val (s1, s2, s3) = (genSnapshot(rnd), genSnapshot(rnd), genSnapshot(rnd))
      val d1 = ScdType2(dim(s1), None, "id", attrs, tracked, "sk",
        LocalDate.parse("2024-01-01"))
      val d2 = ScdType2(dim(s2), Some(d1), "id", attrs, tracked, "sk",
        LocalDate.parse("2024-02-01"))
      val d3 = ScdType2(dim(s3), Some(d2), "id", attrs, tracked, "sk",
        LocalDate.parse("2024-03-01"))
      withClue(s"seed=$seed s1=$s1 s2=$s2 s3=$s3: ") {
        checkInvariants(d3.collect())
      }
    }
  }

  test("identical re-run is a no-op modulo surrogate keys (8 seeds)") {
    (100 until 108).foreach { seed =>
      val s1 = genSnapshot(new Random(seed))
      val d1 = ScdType2(dim(s1), None, "id", attrs, tracked, "sk",
        LocalDate.parse("2024-01-01"))
      val d2 = ScdType2(dim(s1), Some(d1), "id", attrs, tracked, "sk",
        LocalDate.parse("2024-02-01"))
      val norm = (df: DataFrame) => df.drop("sk").collect().map(_.toSeq).toSet
      withClue(s"seed=$seed: ") { assert(norm(d2) == norm(d1)) }
    }
  }
}
