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
    // materialize the edge list once — every hop joins against it, and
    // an unmaterialized links plan would re-run its scans per hop
    val edges = links.localCheckpoint(true)
    var visited = seeds.select(col("url"), lit(0L).as("depth"))
      .localCheckpoint(true)
    var frontier = visited
    var depth = 0L
    var done = false

    def hop(from: DataFrame, seen: DataFrame, d: Long): DataFrame =
      from.join(edges, col("url") === col("src"))
        .select(col("dst").as("url")).distinct()
        .join(seen, Seq("url"), "left_anti")
        .withColumn("depth", lit(d))
        .localCheckpoint(true)

    // two BFS levels per round: halves the number of Spark jobs paid as
    // fixed per-round overhead; min-depth semantics preserved because n2
    // anti-joins against visited ∪ n1 (a depth+1-reachable node can never
    // re-enter at depth+2)
    while (!done && depth < maxDepth) {
      val n1 = hop(frontier, visited, depth + 1)
      if (n1.isEmpty) done = true
      else {
        val v1 = visited.unionByName(n1).localCheckpoint(true)
        if (depth + 2 > maxDepth) { visited = v1; depth += 1; done = true }
        else {
          val n2 = hop(n1, v1, depth + 2)
          if (n2.isEmpty) { visited = v1; done = true }
          else {
            visited = v1.unionByName(n2).localCheckpoint(true)
            frontier = n2
            depth += 2
          }
        }
      }
    }
    visited
  }
}
