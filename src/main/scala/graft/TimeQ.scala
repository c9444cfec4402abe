package graft

import org.apache.spark.sql.SparkSession

/** One-off single-query timer for local iteration:
  * `sbt "runMain graft.TimeQ <sfDir> <query> [reps]"` — warmup rep then
  * min of `reps` (default 3), same session config as Bench. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Local file:// IO without client-side CRC sidecars: every tiny
      // checkpoint/state/commit-log file otherwise writes twice (data
      // + .crc) and re-verifies on read — measured ~30-50% of the
      // streaming parity rows' wall clock (OPTIMIZATION_r20.md). The
      // FileContext route (checkpoint manager) goes raw here; the
      // FileSystem route keeps LocalFileSystem (RocksDB's
      // copyFromLocalFile casts to it) with checksums turned off via
      // LocalFsTuning below. At cluster scale checkpoints live on
      // HDFS/S3 where this knob is moot; recoverability rides rename
      // atomicity, not client CRC.
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        "org.apache.hadoop.fs.local.RawLocalFs")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    LocalFsTuning.disableLocalCrc(spark)
    names.foreach { name =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val best = (1 to reps).map(_ => once()).min
      println(f"[timeq] $name%-28s min of $reps: $best%8.3f s")
    }
    spark.stop()
  }
}
