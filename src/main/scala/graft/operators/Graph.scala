package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Link-graph analytics over the crawl graph (SURVEY.md §2.1's crawler
  * domain): PageRank as crawl prioritization — the authority signal a
  * frontier scheduler orders fetches by.
  *
  * All arithmetic is INTEGER fixed-point (ranks scaled by 1e12,
  * damping as ·85 div 100): float PageRank sums are
  * accumulation-order-dependent and could never hash-match a SQL
  * oracle, while integer division and BIGINT sums are exact in both
  * engines — the same determinism trade every other oracle here makes.
  *
  * Scale: each iteration is one equi-join (rank ⋈ edges on src) + one
  * map-side-combining groupBy(dst) + a broadcast-joined node table for
  * the base term — shuffle ∝ edges, state ∝ nodes, with an eager
  * localCheckpoint per iteration for lineage truncation (the Crawler
  * fixpoint's rule). Iteration count is fixed (10), not convergence-
  * tested: deterministic output, bounded rounds.
  */
object Graph {

  /** Rank scale (1e12: big enough that `scale div n` keeps ~8
    * significant digits at n = 10k, small enough that the total mass
    * times 85 stays far below 2^63). */
  val Scale = 1000000000000L

  /** Damping: r' = base + 0.85 · Σ contrib, in permille-free integer
    * form (·85 div 100). */
  val DampNum = 85L

  /** The crawl_frontier link graph (doc://i → 7i+1, 13i+5 mod n) PLUS
    * a hub overlay — every third page also links "up" to doc://(i div
    * 2). The two affine maps alone are bijections (2-regular in AND
    * out ⇒ PageRank exactly uniform — true but demonstrates nothing);
    * the overlay concentrates in-links on low ids the way real site
    * navs concentrate on index pages, so ranks differentiate. */
  private[graft] def linkGraph(s: SparkSession, dir: String,
      n: Long): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    docs.select(
        concat(lit("doc://"), col("doc_id")).as("src"),
        concat(lit("doc://"), (col("doc_id") * 7 + 1) % n).as("dst"))
      .unionByName(docs.select(
        concat(lit("doc://"), col("doc_id")).as("src"),
        concat(lit("doc://"), (col("doc_id") * 13 + 5) % n).as("dst")))
      .unionByName(docs.filter(col("doc_id") % 3 === 0).select(
        concat(lit("doc://"), col("doc_id")).as("src"),
        concat(lit("doc://"), expr("doc_id div 2")).as("dst")))
      .distinct()
  }

  /** Integer PageRank, top 20 by rank (url tie-break): 10 fixed
    * iterations of r' = base + 85·Σ_in (r div deg) div 100. */
  def pageRank(s: SparkSession, dir: String, iters: Int = 10): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val nodes = docs
      .select(concat(lit("doc://"), col("doc_id")).as("url"))
      .localCheckpoint(true)
    val edges = linkGraph(s, dir, n).localCheckpoint(true)
    val deg = edges.groupBy(col("src"))
      .agg(count(lit(1)).as("deg"))
    // every node has out-edges in this graph (no dangling mass term)
    val base = (15L * Scale / 100) / n
    var r = nodes.withColumn("r", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = r.join(edges, r("url") === edges("src"))
        .join(deg, edges("src") === deg("src"))
        .select(col("dst").as("url"), expr("r div deg").as("c"))
        .groupBy(col("url"))
        .agg(sum(col("c")).as("contrib"))
      r = nodes.join(contrib, Seq("url"), "left")
        .select(col("url"),
          (lit(base) +
            expr(s"($DampNum * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
        .localCheckpoint(true)
    }
    r.orderBy(col("r").desc, col("url")).limit(20)
  }
}
