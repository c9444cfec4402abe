package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Crawl-frontier fixpoint (SURVEY.md §2.1 "website crawler" Spark
  * shape): BFS over a link graph as iterative DataFrame rounds.
  *
  * Scale design: the dominant cost of iterative BFS on Spark is not the
  * per-round shuffle but the fixed per-round job overhead (scheduling,
  * checkpoint, empty-check) × the graph diameter. This implementation
  * advances `stride` levels per round using a one-time edge expansion:
  * E¹ ∪ … ∪ E^stride tagged with their hop count (min hop per (src,dst)
  * pair). Each round is then ONE equi-join + min-depth aggregation +
  * anti-join + checkpoint, and the number of synchronization rounds
  * drops from `diameter` to `diameter / stride`.
  *
  * The tradeoff is explicit: the expanded edge table grows ~Σ d^i for
  * mean out-degree d, so stride-k is for low-degree graphs (site link
  * graphs, d small); on a high-degree web graph set stride = 1-2. Every
  * round still ends in an eager localCheckpoint — without lineage
  * truncation the union-of-unions plan grows superlinearly and Catalyst
  * re-analysis eventually exhausts the driver heap (the canonical
  * iterative-DataFrame failure mode).
  */
object Crawler {

  /** Tagged multi-hop edges: (src, dst, hop) for 1 ≤ hop ≤ stride with
    * the minimal hop kept per pair. Built once as ONE plan (the powers
    * union under a single min-hop aggregate) and checkpointed once —
    * checkpointing each power separately cost a materialization job per
    * power; letting the joins pipeline into one DAG is cheaper even
    * though the lower powers are re-derived inside it. Every round of
    * the fixpoint reuses the result. */
  private def expandEdges(edges: DataFrame, stride: Int): DataFrame = {
    val e1 = edges.select(col("src"), col("dst")).distinct()
    var cur = e1
    var all = e1.withColumn("hop", lit(1L))
    for (h <- 2 to stride) {
      // no per-power distinct: intermediate rows are PATHS (≤ d^h per
      // src), and for the low-degree graphs stride-k targets, carrying
      // ≤ d^stride path rows into the final min-hop aggregate is
      // cheaper than a dedup shuffle per power — the closing groupBy
      // collapses paths to pairs exactly once
      cur = cur.as("a")
        .join(edges.as("b"), col("a.dst") === col("b.src"))
        .select(col("a.src").as("src"), col("b.dst").as("dst"))
      all = all.unionByName(cur.withColumn("hop", lit(h.toLong)))
    }
    all.groupBy(col("src"), col("dst")).agg(min(col("hop")).as("hop"))
      .localCheckpoint(true)
  }

  /** BFS from seeds over links(src,dst) → (url, depth) with min-depth
    * semantics. The frontier rows carry their own depth, so a round's
    * new distance is min over (frontier depth + edge hop) — exact BFS
    * distance, because every shortest path to a new node passes through
    * a node discovered within the last `stride` levels. */
  def frontierFixpoint(links: DataFrame, seeds: DataFrame,
      maxDepth: Int = 25, stride: Int = 4): DataFrame = {
    val ek = expandEdges(links, math.max(1, stride))
    var visited = seeds.select(col("url"), lit(0L).as("depth"))
      .localCheckpoint(true)
    var frontier = visited
    var done = false
    while (!done) {
      val next = frontier.join(ek, col("url") === col("src"))
        .select(col("dst").as("url"),
          (col("depth") + col("hop")).as("depth"))
        .groupBy(col("url")).agg(min(col("depth")).as("depth"))
        .filter(col("depth") <= maxDepth)
        .join(visited, Seq("url"), "left_anti")
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        // plain union: every leaf under it is already checkpointed, so
        // lineage stays flat and the union needs no re-materialization —
        // re-checkpointing here would rescan the whole visited set every
        // round (O(V · rounds) wasted IO)
        visited = visited.unionByName(next)
        frontier = next
      }
    }
    visited
  }

  /** Per-domain min delay (ms) of [[politenessSchedule]]. */
  val PolitenessDelayMs = 500L

  /** Token-bucket burst of [[politenessSchedule]]: the first `Burst`
    * URLs of a domain fetch immediately; after that, one per delay. */
  val PolitenessBurst = 3L

  /** Politeness scheduling — the fetch-budget plan the crawl frontier
    * feeds a polite fetcher: per domain, a token bucket of
    * [[PolitenessBurst]] immediate slots refilling every
    * [[PolitenessDelayMs]], so URL k of a domain fetches at
    * `max(0, k − burst + 1) · delay` (k from the domain's
    * deterministic fetch order). Domains are independent — the global
    * makespan is the hottest domain's tail, which is the number a
    * crawl operator reads to size domain sharding.
    *
    * The engine computes the schedule the operational way (per-URL
    * rank walk: one hash exchange on domain + in-partition rank);
    * the DuckDB oracle derives the SAME aggregates in closed form
    * (triangle-number total wait) — two genuinely independent
    * derivations of one contract. */
  def politenessSchedule(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val urls = graft.Tables.documents(s, dir)
      .select(col("doc_id"), pmod(col("doc_id"), lit(20L)).as("domain"))
    val w = Window.partitionBy(col("domain")).orderBy(col("doc_id"))
    urls
      .withColumn("k", row_number().over(w).cast("long") - 1)
      .withColumn("fetch_at_ms", greatest(lit(0L),
        (col("k") - lit(PolitenessBurst) + 1) * PolitenessDelayMs))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_urls"),
        sum((col("fetch_at_ms") === 0L).cast("long")).as("n_immediate"),
        max(col("fetch_at_ms")).as("makespan_ms"),
        sum(col("fetch_at_ms")).as("total_wait_ms"))
      .orderBy("domain")
  }
}
