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

  /** Affine link maps of the synthetic crawl graph — doc://i links to
    * (LinkMulA·i + LinkAddA) mod n and (LinkMulB·i + LinkAddB) mod n —
    * plus an "up" hub link i → i div 2 for every HubEvery-th page.
    * Shared constants: the DuckDB oracles interpolate these same
    * values, so the implementation and the oracle can't drift apart
    * when a parameter changes (the SimhashMaxDist rule). */
  val LinkMulA = 7L
  val LinkAddA = 1L
  val LinkMulB = 13L
  val LinkAddB = 5L
  val HubEvery = 3L

  /** Every SinkEvery-th page loses its out-links in the sink-bearing
    * PageRank variant (graph_pagerank_sink) — the dangling-mass case a
    * real crawl graph always has. */
  val SinkEvery = 17L

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
        concat(lit("doc://"), (col("doc_id") * LinkMulA + LinkAddA) % n)
          .as("dst"))
      .unionByName(docs.select(
        concat(lit("doc://"), col("doc_id")).as("src"),
        concat(lit("doc://"), (col("doc_id") * LinkMulB + LinkAddB) % n)
          .as("dst")))
      .unionByName(docs.filter(col("doc_id") % HubEvery === 0).select(
        concat(lit("doc://"), col("doc_id")).as("src"),
        concat(lit("doc://"), expr("doc_id div 2")).as("dst")))
      .distinct()
  }

  /** Per-node degree profile of the crawl link graph — the first
    * report a crawl operator reads (dead ends, hubs, fetch-budget
    * skew). Scale: the edge list is scanned twice through two
    * map-side-combining groupBys (out by src, in by dst), then both
    * small per-node aggregates join back onto the node list; shuffle
    * ∝ nodes, never edges². */
  def degreeStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val nodes = docs
      .select(concat(lit("doc://"), col("doc_id")).as("url"))
    val edges = linkGraph(s, dir, n).localCheckpoint(true) // scanned 2×
    val outDeg = edges.groupBy(col("src").as("url"))
      .agg(count(lit(1)).as("o"))
    val inDeg = edges.groupBy(col("dst").as("url"))
      .agg(count(lit(1)).as("i"))
    nodes.join(outDeg, Seq("url"), "left").join(inDeg, Seq("url"), "left")
      .select(col("url"),
        coalesce(col("o"), lit(0L)).as("out_deg"),
        coalesce(col("i"), lit(0L)).as("in_deg"))
      .orderBy("url")
  }

  /** Connected components of the nav-hub overlay (the i → i div 2
    * "up" links for every third page — a forest, so the components
    * are the sub-sites a crawler should schedule as units). Reuses
    * [[Dedup.clusters]] wholesale: component labelling is the same
    * problem whether the edges are near-dup pairs or nav links, so
    * this inherits the size-routed union-find / distributed
    * min-label-propagation split and its driver-byte gate. */
  def components(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.documents(s, dir)
      .filter(col("doc_id") % HubEvery === 0 && col("doc_id") > 0)
      .select(expr("doc_id div 2").as("doc_a"), col("doc_id").as("doc_b"))
    Dedup.clusters(s, dir, pairs)
  }

  /** Incremental connected components — the delta form of
    * [[components]], completing the delta family (minhash, wide
    * SimHash, substring, IVF append, MV refresh) on the graph side.
    * Yesterday's labels are the materialized state (rebuilt here from
    * the pre-cut edges as fixture construction; production reads the
    * stored label table); today's delta edges (hub edges whose child
    * id is in the top fifth of the id range) are applied by
    *
    *   1. mapping each delta endpoint to its old label — two joins
    *      with the BROADCAST delta against the label table, so the
    *      corpus-sized state streams map-side and is never shuffled;
    *   2. component labelling on the QUOTIENT graph those label pairs
    *      form — delta-sized, not corpus-sized (merging components is
    *      label-level work: old labels are component minima, and min
    *      composes associatively, so quotient minima ARE final
    *      minima);
    *   3. one broadcast relabel join applying the quotient map back
    *      over the label table; untouched components pass through.
    *
    * Edge DELETIONS are out of scope by design (component splits are
    * not incrementally maintainable without per-edge spanning
    * structure; production handles them by periodic rebuild).
    * Shares graph_components' full-recompute DuckDB oracle: the
    * incremental path must land the identical labelling. */
  def componentsDelta(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val maxRow = docs.agg(max(col("doc_id"))).head()
    if (maxRow.isNullAt(0)) return components(s, dir)
    val cut = maxRow.getLong(0) * 4 / 5
    val pairs = Tables.documents(s, dir)
      .filter(col("doc_id") % HubEvery === 0 && col("doc_id") > 0)
      .select(expr("doc_id div 2").as("doc_a"), col("doc_id").as("doc_b"))
    val oldLabels = Dedup.clusters(s, dir, pairs.filter(col("doc_b") < cut))
      .select(col("doc_id"), col("cluster_id"))
      .localCheckpoint(true)
    val delta = pairs.filter(col("doc_b") >= cut)
    // both hops keep the DELTA side broadcast: the corpus-sized label
    // table streams map-side through each probe, never shuffled
    val withQa = oldLabels
      .withColumnRenamed("doc_id", "doc_a")
      .withColumnRenamed("cluster_id", "qa")
      .join(broadcast(delta), Seq("doc_a"))
    val qEdges = oldLabels
      .withColumnRenamed("doc_id", "doc_b")
      .withColumnRenamed("cluster_id", "qb")
      .join(broadcast(withQa), Seq("doc_b"))
      .filter(col("qa") =!= col("qb"))
      .select(col("qa").as("doc_a"), col("qb").as("doc_b"))
      .distinct()
      .localCheckpoint(true)
    val qVerts = qEdges.select(col("doc_a").as("doc_id"))
      .unionByName(qEdges.select(col("doc_b").as("doc_id"))).distinct()
    val relabel = Dedup.clustersOf(qVerts, qEdges)
      .select(col("doc_id").as("old_label"),
        col("cluster_id").as("new_label"))
    oldLabels
      .join(broadcast(relabel), col("cluster_id") === col("old_label"),
        "left")
      .select(col("doc_id"),
        coalesce(col("new_label"), col("cluster_id")).as("cluster_id"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("long"))
      .orderBy("doc_id")
  }

  /** Triangle census of the undirected link graph: global triangle /
    * wedge counts and the clustering coefficient (permille — integer,
    * like every ratio oracle here). Triangles signal boilerplate nav
    * blocks (pages that all link to each other), the crawl-side
    * analogue of near-dup content.
    *
    * Scale: edges are canonicalized to u < v once, so the count join
    * enumerates each triangle exactly once as u < v < w — the join
    * fan-out is bounded by per-node degree (3 here), not corpus size,
    * and both joins are hash equi-joins on the canonical endpoints. */
  def triangleStats(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val und = linkGraph(s, dir, n)
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .filter(col("u") < col("v")) // drops self-loops
      .distinct()
      .localCheckpoint(true) // scanned 4×: 3 join legs + degrees
    val tri = und.as("a")
      .join(und.as("b"), col("a.v") === col("b.u"))
      .join(und.as("c"),
        col("a.u") === col("c.u") && col("b.v") === col("c.v"))
      .agg(count(lit(1)).as("triangles"))
    val deg = und.select(col("u").as("x"))
      .unionByName(und.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("deg"))
    val wedges = deg.agg(
      sum(expr("deg * (deg - 1) div 2")).as("wedges"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    tri.crossJoin(nEdges).crossJoin(wedges)
      .select(lit(n).as("n_nodes"), col("n_edges"), col("triangles"),
        col("wedges"),
        expr("(3000 * triangles) div nullif(wedges, CAST(0 AS BIGINT))")
          .as("clustering_permille"))
  }

  /** Integer PageRank, top 20 by rank (url tie-break): 10 fixed
    * iterations of r' = base + 85·(Σ_in (r div deg) + dangling) div
    * 100, where dangling = (Σ rank of out-edge-less nodes) div n — the
    * standard dangling-mass redistribution a real crawl graph (dead
    * ends, binary pages, robots-blocked leaves) always needs.
    *
    * `sinkEvery > 0` drops the out-links of every sinkEvery-th page —
    * the sink-bearing variant behind graph_pagerank_sink. The dangling
    * set is loop-invariant, computed once; when it is empty (the full
    * synthetic graph — both affine maps are total) the per-iteration
    * plan carries no dangling aggregate at all, so the sinkless query
    * keeps its one-join-per-round shape. */
  def pageRank(s: SparkSession, dir: String, iters: Int = 10,
      sinkEvery: Long = 0L): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    // empty graph: no ranks, not a division by zero
    if (n == 0) {
      import s.implicits._
      return s.emptyDataset[(String, Long)].toDF("url", "r")
    }
    val nodes = docs
      .select(concat(lit("doc://"), col("doc_id")).as("url"))
      .localCheckpoint(true)
    // out-degree is loop-invariant: fold it into the edge table ONCE so
    // each iteration joins a single (src, dst, deg) relation instead of
    // re-joining rank ⋈ edges ⋈ deg — one equi-join per round, not two
    val edges = {
      val all = linkGraph(s, dir, n)
      val e =
        if (sinkEvery > 0)
          all.join(docs.filter(col("doc_id") % sinkEvery === 0)
              .select(concat(lit("doc://"), col("doc_id")).as("src")),
            Seq("src"), "left_anti")
        else all
      val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      e.join(deg, "src").localCheckpoint(true)
    }
    // dangling set: nodes with no surviving out-edge (loop-invariant)
    val dangling = nodes
      .join(edges.select(col("src").as("url")), Seq("url"), "left_anti")
      .localCheckpoint(true)
    val hasDangling = !dangling.isEmpty
    val base = (15L * Scale / 100) / n
    var r = nodes.withColumn("r", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = r.join(edges, r("url") === edges("src"))
        .select(col("dst").as("url"), expr("r div deg").as("c"))
        .groupBy(col("url"))
        .agg(sum(col("c")).as("contrib"))
      val next = nodes.join(contrib, Seq("url"), "left")
      r = (if (hasDangling) {
        val dm = r.join(dangling, Seq("url"), "left_semi")
          .agg(expr(s"coalesce(sum(r), CAST(0 AS BIGINT)) div $n").as("dm"))
        next.crossJoin(broadcast(dm))
          .select(col("url"),
            (lit(base) + expr(s"($DampNum * " +
              "(coalesce(contrib, CAST(0 AS BIGINT)) + dm)) div 100"))
              .as("r"))
      } else {
        next.select(col("url"),
          (lit(base) +
            expr(s"($DampNum * coalesce(contrib, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
      }).localCheckpoint(true)
    }
    r.orderBy(col("r").desc, col("url")).limit(20)
  }

  /** Relaxation rounds of [[sssp]] — distances are exact for every
    * path of ≤ SsspRounds hops (Bellman-Ford truncation; the crawl
    * radius a scheduler actually budgets). */
  val SsspRounds = 8

  /** Source node of [[sssp]] (the site root, `doc://0`). */
  val SsspSource = 0L

  /** Edge-weight rule of [[sssp]]: 1 + (3·src + dst) mod 9 — a
    * deterministic integer cost in [1, 9] standing in for fetch
    * latency, so the oracle re-derives every weight. */
  val SsspWeightMod = 9L

  /** Bounded-hop single-source shortest paths over the weighted crawl
    * graph — the cost-aware frontier metric (crawl_frontier's BFS is
    * its unit-weight special case): which pages are reachable from
    * the root within the hop budget, and at what cumulative cost. One
    * equi-join + min-groupBy per round (the PageRank shape), frontier
    * lineage truncated per round; distances are all-integer so the
    * 8-round unrolled DuckDB mirror hash-matches exactly.
    *
    * Scale: per-round work is |dist ⋈ edges| — edges are scanned once
    * per round through a map-side-combining min; nothing grows with
    * rounds but the (bounded) distance table. At a 100 TB crawl graph
    * the same loop runs with the distance table bucketed on node so
    * the per-round join co-locates. */
  def sssp(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select(col("doc_id"))
    val n = docs.count()
    val idEdges = docs.select(col("doc_id").as("src"),
        ((col("doc_id") * LinkMulA + LinkAddA) % n).as("dst"))
      .unionByName(docs.select(col("doc_id").as("src"),
        ((col("doc_id") * LinkMulB + LinkAddB) % n).as("dst")))
      .unionByName(docs.filter(col("doc_id") % HubEvery === 0)
        .select(col("doc_id").as("src"), expr("doc_id div 2").as("dst")))
      .distinct()
      .withColumn("w",
        lit(1L) + pmod(col("src") * 3 + col("dst"), lit(SsspWeightMod)))
      .localCheckpoint(true)
    var dist = docs.filter(col("doc_id") === SsspSource)
      .select(col("doc_id").as("node"), lit(0L).as("dist"))
    for (_ <- 1 to SsspRounds) {
      val relaxed = dist.join(idEdges, dist("node") === idEdges("src"))
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      dist = dist.unionByName(relaxed)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint(true)
    }
    dist.select(concat(lit("doc://"), col("node")).as("url"),
      col("dist").cast("long").as("dist")).orderBy("url")
  }
}
