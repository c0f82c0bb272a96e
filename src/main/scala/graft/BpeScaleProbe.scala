package graft

import org.apache.spark.sql.functions._

/** SCALE.md driver for the batched BPE claim (rounds ≪ merges): times
  * [[graft.operators.Tokenizer.bpeTrainBatched]] at each batch width
  * and reports the number of ROUNDS actually used — the driver-loop
  * count that bounds a production 30k-merge vocabulary's wall-clock,
  * since every round is a fixed set of vocab-sized Spark jobs.
  *
  * `runMain graft.BpeScaleProbe <dir> <nMerges> <b1,b2,...>` prints
  * one `BPESCALE <dir> batch=<b> merges=<m> rounds=<r> <median>s`
  * line per width, with the [[Bench.isolate]] start-line discipline.
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: BpeScaleProbe <dir> <nMerges> <b1,b2,...>")
    val (dir, nMerges) = (args(0), args(1).toInt)
    val batches = args(2).split(",").toSeq.map(_.toInt)
    val spark = Sessions.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    batches.foreach { b =>
      var rounds = 0L
      var nm = 0L
      def run(): Double = {
        Bench.isolate(spark)
        val t0 = System.nanoTime()
        val m = graft.operators.Tokenizer.bpeTrainBatched(
          Tables.documents(spark, dir), "text", nMerges, b)
        val r = m.agg(max(col("round")), count(lit(1))).head()
        rounds = r.getInt(0).toLong; nm = r.getLong(1)
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup
      val ts = (1 to 3).map(_ => run()).sorted
      println(f"BPESCALE $dir batch=$b merges=$nm rounds=$rounds " +
        f"${ts(1)}%.3f s  " + ts.map(t => f"$t%.3f").mkString("[", ",", "]"))
    }
    spark.stop()
  }
}
