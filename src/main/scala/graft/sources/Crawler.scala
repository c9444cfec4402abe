package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Crawl-frontier fixpoint (SURVEY.md §2.1 "website crawler" Spark
  * shape): BFS over a link graph as iterative DataFrame rounds — each
  * round joins the frontier against the edge list, anti-joins the
  * visited set, and unions the remainder in at depth+1, until empty or
  * the depth cap.
  *
  * Scale: each round is one shuffle keyed on the join column; the
  * visited set is persisted so rounds don't recompute lineage (the
  * classic iterative-algorithm pitfall — unpersisted loops re-execute
  * all previous rounds each iteration).
  */
object Crawler {

  /** BFS from seeds over links(src,dst) → (url, depth) with min-depth
    * semantics (first arrival wins via the anti-join).
    *
    * Each round ends in an eager localCheckpoint: without lineage
    * truncation the union-of-unions plan grows superlinearly across
    * iterations and Catalyst re-analysis/codegen eventually exhausts the
    * driver heap — the canonical iterative-DataFrame failure mode. */
  def frontierFixpoint(links: DataFrame, seeds: DataFrame,
      maxDepth: Int = 25): DataFrame = {
    var visited = seeds.select(col("url"), lit(0L).as("depth"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0L
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val next = frontier.join(links, col("url") === col("src"))
        .select(col("dst").as("url")).distinct()
        .join(visited, Seq("url"), "left_anti")
        .withColumn("depth", lit(depth))
        .localCheckpoint(true)
      if (next.count() == 0) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next
      }
    }
    visited
  }
}
