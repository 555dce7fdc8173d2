package graft
import org.apache.spark.sql.SparkSession

/** Median-of-N re-measure for individual declared queries — the tool for
  * adjudicating whether a per-query bench number moved because the PLAN
  * moved or because the run was noisy (single-shot timings at small SF
  * carry multi-hundred-ms scheduler jitter).
  *
  * Usage: runMain graft.BenchFew <reps> <query> [query...]
  * (SPARK_GRAFT_SF_DIR selects the SF dir, as in [[Bench]].)
  * Prints per-query all reps + the median, one JSON line at the end.
  */
object BenchFew {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: BenchFew <reps> <query> [query...]")
    val reps = args.head.toInt
    require(reps >= 1, s"reps must be >= 1, got $reps")
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // progress to STDERR as it happens (long sf runs are otherwise
    // silent until the final JSON; the stdout line stays clean)
    def progress(msg: String): Unit = {
      System.err.println(f"[benchfew +${System.nanoTime() / 1e9}%.0f] $msg")
      System.err.flush()
    }
    // same warm-up discipline as Bench: one untimed pass per query
    names.foreach { n =>
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir).count()
      progress(f"warmup $n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.catalog.clearCache()
    }
    val out = names.map { n =>
      val ts = (1 to reps).map { r =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        progress(f"$n rep $r: $t%.2f s")
        spark.catalog.clearCache()
        t
      }
      // lower-middle for even reps: the conservative pick for a noise
      // adjudicator (upper-middle would report the max of 2 reps)
      val med = ts.sorted.apply((reps - 1) / 2)
      // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
      def f3(d: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))
      s""""$n":{"median":${f3(med)},"reps":[${ts.map(f3).mkString(",")}]}"""
    }
    spark.stop()
    println(out.mkString("{", ",", "}"))
  }
}
