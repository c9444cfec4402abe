package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Data-layout operators: the maintenance jobs a 100 TB lakehouse store
  * runs to keep itself scannable — small-file compaction planning (the
  * reference's SQLite store never fragments; a Parquet/Delta chunk store
  * does after every incremental MERGE, §2.6) and multi-dimension
  * Z-order clustering for file-skipping.
  */
object Layout {

  /** Target compacted file size (bytes) for [[compactionPlan]]. */
  val CompactionTarget = 4000L

  /** Small-file compaction PLAN over the store's file listing — which
    * files coalesce into which output bin. The listing is derived
    * deterministically from documents (one file per doc, bytes =
    * n_chars, partition = source), standing in for the Delta-log
    * file inventory an OPTIMIZE job reads.
    *
    * Packing rule: within a partition, files ordered by (bytes desc,
    * doc_id) pack next-fit by running size — bin = floor(preceding
    * cumulative bytes / target). Size-descending next-fit is within one
    * file of first-fit-decreasing quality and, unlike FFD's
    * bin-backtracking, is a pure window function: one hash partition by
    * table-partition, one in-partition sort, zero driver logic.
    *
    * Scale: the listing is metadata (1 row per FILE, not per data row) —
    * millions of rows at 100 TB, trivially shuffled; each table
    * partition packs independently in parallel, exactly how the job
    * would fan out per Delta partition. */
  def compactionPlan(s: SparkSession, dir: String): DataFrame = {
    val files = Tables.documents(s, dir)
      .select(col("source").as("part"), col("doc_id").as("file_id"),
        col("n_chars").as("bytes"))
    val order = Window.partitionBy(col("part"))
      .orderBy(col("bytes").desc, col("file_id"))
    val cumBefore = coalesce(
      sum(col("bytes")).over(order.rowsBetween(Window.unboundedPreceding, -1)),
      lit(0L))
    files
      .withColumn("cum_before", cumBefore)
      .withColumn("bin", expr(s"cum_before div $CompactionTarget"))
      .groupBy("part", "bin")
      .agg(count(lit(1)).as("n_files"),
        sum(col("bytes")).as("total_bytes"),
        max(col("bytes")).as("max_file_bytes"),
        min(col("file_id")).as("first_file"))
      .orderBy("part", "bin")
  }

  /** Bits per dimension for [[zorderStats]]. */
  val ZBits = 10

  /** Z-order (Morton) clustering of events on (user_id, event-time):
    * interleave the low [[ZBits]] bits of the two normalized dimensions,
    * split the z-range into 64 fixed-width files, report per-file
    * min/max of BOTH dimensions — the min/max column stats a scan uses
    * to skip files. A linear (time-only) layout gives each file the full
    * user range; the Z-layout bounds both ranges at 1/8 of their
    * domains, which is the whole point of the exercise.
    *
    * Scale: file assignment is `zkey >> 14` — fixed-width z-range
    * partitioning, NOT a global row_number sort: no single-partition
    * window, no global ordering; the per-file stats are one hash
    * aggregate by file id. (A production OPTIMIZE ZORDER range-
    * partitions on sampled z-quantiles for even file sizes; fixed-width
    * keeps the oracle exact and the plan shape identical.)
    *
    * Determinism: the time dimension normalizes by integer arithmetic
    * against the corpus min/max epoch-micros; everything below is bit
    * ops on BIGINT, identical in DuckDB. */
  def zorderStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      min(col("us")).as("min_us"), max(col("us")).as("max_us"))

    // Both dimensions normalize into the full ZBits domain against their
    // own corpus bounds — integer arithmetic, so any scale factor fills
    // all interleave bits (a raw modulo would leave high x-bits empty on
    // small id domains and silently degrade the demo to 1-D).
    val dims = ev.crossJoin(broadcast(bounds))
      .withColumn("x",
        expr(s"((user_id - min_u) * ${1L << ZBits}) div (max_u - min_u + 1)"))
      .withColumn("y",
        expr(s"((us - min_us) * ${1L << ZBits}) div (max_us - min_us + 1)"))

    // Morton interleave: x occupies odd bits, y even bits.
    val zkey = (0 until ZBits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(col("x"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(col("y"), i).bitwiseAND(lit(1L)), 2 * i))
    }

    dims
      .withColumn("file_id", shiftright(zkey, 2 * ZBits - 6))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col("x")).as("x_min"), max(col("x")).as("x_max"),
        min(col("y")).as("y_min"), max(col("y")).as("y_max"))
      .orderBy("file_id")
  }

  /** The DuckDB-side Morton interleave, generated from the same bit
    * recipe [[zorderStats]] uses so the two can never drift. */
  def zInterleaveSql(x: String, y: String): String =
    (0 until ZBits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) << ${2 * i + 1})",
        s"((($y >> $i) & 1) << ${2 * i})")
    }.mkString(" + ")

  /** The x-slice predicate [[zorderPruneStats]] measures: the middle
    * eighth of the x domain. */
  val PruneXLo = 256L
  val PruneXHi = 383L

  /** WHY z-order: the file-skipping comparison. The same events are
    * laid out twice — Z-ordered (files = fixed-width z-ranges, as
    * [[zorderStats]]) and time-linear (files = fixed-width y-ranges,
    * what a naive append-by-arrival layout produces) — and a scan with
    * an x-only predicate ([[PruneXLo]]..[[PruneXHi]], ⅛ of the user
    * domain) prunes files on min/max column stats exactly as a
    * lakehouse reader does. One row per layout: file count, files a
    * stats-pruning scan must read, rows actually read vs rows matched.
    * The time-linear layout keeps EVERY file (each spans the full user
    * range); the Z-layout reads ~⅛ of them — that ratio is the whole
    * argument for OPTIMIZE ZORDER and it is oracle-checked here, not
    * asserted in prose.
    *
    * Scale: identical plan shape to [[zorderStats]] — one bounds
    * aggregate broadcast, one hash aggregate per layout, a ≤128-row
    * rollup; no global sort anywhere. */
  def zorderPruneStats(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      min(col("us")).as("min_us"), max(col("us")).as("max_us"))
    val dims = ev.crossJoin(broadcast(bounds))
      .withColumn("x",
        expr(s"((user_id - min_u) * ${1L << ZBits}) div (max_u - min_u + 1)"))
      .withColumn("y",
        expr(s"((us - min_us) * ${1L << ZBits}) div (max_us - min_us + 1)"))

    val zkey = (0 until ZBits).foldLeft(lit(0L): Column) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(col("x"), i).bitwiseAND(lit(1L)), 2 * i + 1))
        .bitwiseOR(shiftleft(shiftright(col("y"), i).bitwiseAND(lit(1L)), 2 * i))
    }

    def layoutStats(name: String, fileId: Column): DataFrame =
      dims.withColumn("file_id", fileId)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          sum(when(col("x").between(PruneXLo, PruneXHi), 1L)
            .otherwise(0L)).as("rows_matched"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(when(col("x_max") >= PruneXLo && col("x_min") <= PruneXHi,
            1L).otherwise(0L)).as("files_kept"),
          sum(when(col("x_max") >= PruneXLo && col("x_min") <= PruneXHi,
            col("n_rows")).otherwise(0L)).as("rows_read"),
          sum(col("rows_matched")).as("rows_matched"))
        .select(lit(name).as("layout"), col("n_files"),
          col("files_kept"), col("rows_read"), col("rows_matched"))

    layoutStats("linear_time", shiftright(col("y"), ZBits - 6))
      .unionByName(layoutStats("zorder", shiftright(zkey, 2 * ZBits - 6)))
      .orderBy("layout")
  }

  /** Hilbert distance of a [[ZBits]]-bit (x, y) cell — the canonical
    * xy2d walk (top bit down: quadrant index (3·rx) xor ry, then the
    * reflect-and-swap rotation). The complement uses the full 2^ZBits
    * domain width; bits at or above the round's `s` are never read
    * again, so this matches the per-quadrant form bit-for-bit — and
    * the generated SQL mirror ([[hilbertCteSql]]) encodes the
    * IDENTICAL recipe, so the two cannot drift. */
  private[graft] def hilbertD(x0: Long, y0: Long): Long = {
    val M = 1L << ZBits
    var x = x0; var y = y0; var d = 0L
    var s = M >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = M - 1 - x; y = M - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** 2D Morton interleave in plain Scala — the typed-kernel twin of
    * the zorder Column fold (same bit recipe). */
  private[graft] def mortonZ(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < ZBits) {
      z |= ((x >> i) & 1L) << (2 * i + 1)
      z |= ((y >> i) & 1L) << (2 * i)
      i += 1
    }
    z
  }

  /** The DuckDB-side Hilbert walk: one chained CTE per round carrying
    * (x0, x, y, d) — generated from the same recipe as [[hilbertD]]
    * (quadrant = 3·rx + ry − 2·rx·ry, the arithmetic form of
    * (3·rx) xor ry for bits). `from` is the CTE holding (x, y). */
  def hilbertCteSql(from: String): String = {
    val M = 1L << ZBits
    val init = s"h_in AS (SELECT x AS x0, x, y," +
      s" CAST(0 AS BIGINT) AS d FROM $from)"
    val rounds = ((ZBits - 1) to 0 by -1).zipWithIndex.map {
      case (k, i) =>
        val s = 1L << k
        val prev = if (i == 0) "h_in" else s"h$i"
        val rx = s"((x >> $k) & 1)"
        val ry = s"((y >> $k) & 1)"
        s"""h${i + 1} AS (SELECT x0,
           CASE WHEN $ry = 1 THEN x
                WHEN $rx = 1 THEN ${M - 1} - y ELSE y END AS x,
           CASE WHEN $ry = 1 THEN y
                WHEN $rx = 1 THEN ${M - 1} - x ELSE x END AS y,
           d + ${s * s} * (3 * $rx + $ry - 2 * $rx * $ry) AS d
         FROM $prev)"""
    }
    (init +: rounds).mkString(",\n         ")
  }

  /** Hilbert vs Z vs linear — the layout decision quantified on one
    * predicate: the same events laid out three ways (fixed-width
    * key-range files per curve; time-linear as the naive baseline),
    * pruned by min/max column stats under the x-only slice. Hilbert's
    * every-step-adjacent locality can only tighten per-file x-ranges
    * relative to Morton's quadrant jumps, so its files_kept is ≤
    * zorder's (spec-pinned); both beat linear by ~8×. The Spark side
    * computes BOTH curve keys in one zero-shuffle typed kernel; the
    * oracle re-derives the Morton interleave from the shared bit
    * recipe and walks the Hilbert rounds via the generated CTE chain.
    * Scale: identical shape to [[zorderPruneStats]] — bounds
    * broadcast, per-row key kernel, one hash aggregate per layout. */
  def hilbertPruneStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val bounds = ev.agg(
      min(col("user_id")).as("min_u"), max(col("user_id")).as("max_u"),
      min(col("us")).as("min_us"), max(col("us")).as("max_us"))
    val keyed = ev.crossJoin(broadcast(bounds))
      .withColumn("x",
        expr(s"((user_id - min_u) * ${1L << ZBits}) div (max_u - min_u + 1)"))
      .withColumn("y",
        expr(s"((us - min_us) * ${1L << ZBits}) div (max_us - min_us + 1)"))
      .select("x", "y").as[(Long, Long)]
      .map { case (x, y) => (x, y, mortonZ(x, y), hilbertD(x, y)) }
      .toDF("x", "y", "zkey", "hkey")

    def layoutStats(name: String, fileId: Column): DataFrame =
      keyed.withColumn("file_id", fileId)
        .groupBy("file_id")
        .agg(count(lit(1)).as("n_rows"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          sum(when(col("x").between(PruneXLo, PruneXHi), 1L)
            .otherwise(0L)).as("rows_matched"))
        .agg(
          count(lit(1)).as("n_files"),
          sum(when(col("x_max") >= PruneXLo && col("x_min") <= PruneXHi,
            1L).otherwise(0L)).as("files_kept"),
          sum(when(col("x_max") >= PruneXLo && col("x_min") <= PruneXHi,
            col("n_rows")).otherwise(0L)).as("rows_read"),
          sum(col("rows_matched")).as("rows_matched"))
        .select(lit(name).as("layout"), col("n_files"),
          col("files_kept"), col("rows_read"), col("rows_matched"))

    layoutStats("hilbert", shiftright(col("hkey"), 2 * ZBits - 6))
      .unionByName(
        layoutStats("linear_time", shiftright(col("y"), ZBits - 6)))
      .unionByName(layoutStats("zorder", shiftright(col("zkey"), 2 * ZBits - 6)))
      .orderBy("layout")
  }
}
