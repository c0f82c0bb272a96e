package graft

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Checkpoints, ScdType2}

/** Reproducible experiment driver behind SCALE.md's "SCD2 changedOnly
  * is batch-proportional" entry: builds a synthetic 200k-row dimension,
  * then measures shuffle-write bytes of an incremental SCD2 run at
  * batch sizes from 0.1% to 100% of the dimension, with and without
  * the `changedOnly` prune.
  *
  * `runMain graft.ScdScaleProbe` — prints one line per (batch, mode).
  */
object ScdScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    def rows(base: DataFrame) = base.select(
      concat(lit("id"), col("id")).as("bid"),
      concat(lit("name-of-"), col("id"), lit("-"), lit("x" * 64)).as("name"),
      concat(lit("addr-"), col("id") % 977, lit("-"), lit("y" * 64)).as("address"))
    val base = spark.range(200000L).toDF()
    val first = ScdType2(rows(base), None, "bid", Seq("name", "address"),
      Seq("address"), "sk", LocalDate.parse("2024-06-01")).localCheckpoint(true)

    Seq(1000L, 100L, 10L, 1L).foreach { mod =>
      val batch = rows(base.filter(col("id") % mod === 0))
        .withColumn("address", concat(col("address"), lit("-moved")))
        .localCheckpoint(true)
      val n = batch.count()
      def shuffled(pruned: Boolean): Long = {
        val (_, m) = Metrics.capture(spark) {
          ScdType2(batch, Some(first), "bid", Seq("name", "address"),
            Seq("address"), "sk", LocalDate.parse("2024-07-01"),
            changedOnly = pruned)
            .write.format("noop").mode("overwrite").save()
        }
        m.shuffleWriteBytes
      }
      println(f"BATCH $n%7d rows  changedOnly=${shuffled(true)}%10d B  " +
        f"full=${shuffled(false)}%10d B")
      Checkpoints.releasePinned(batch)
    }
    spark.stop()
  }
}
