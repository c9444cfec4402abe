package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deduplication operators for training-data pipelines (builder-prompt
  * requirement): exact, n-gram Jaccard, MinHash, SimHash, embedding-cosine.
  *
  * Scale design (100 TB):
  *   - exact dedup: one hash-partitioned groupBy on the content hash —
  *     the minimum possible shuffle (hash only, not content).
  *   - n-gram Jaccard: inverted-index join on shingles (linear in total
  *     postings), NOT an O(n²) pairwise loop. At extreme scale, cap
  *     ultra-frequent shingles (document-frequency cut) before the join —
  *     the MinHash path below is the principled approximation.
  *   - MinHash: per-doc signatures in one pass; candidate pairs from a
  *     bucket join on (permutation, min-hash) agreement — classic LSH
  *     banding shape, shuffle ∝ signature size not corpus size.
  *   - SimHash: 32-bit signatures; pairs by Hamming distance (≤6). At
  *     scale, band the signature bytes to avoid the quadratic pair scan
  *     (documented; the quadratic form here is the exact baseline).
  *   - embedding cosine: exact O(n²) zip_with dot product as the
  *     brute-force baseline; the LSH/IVF approximate path lives in
  *     Similarity.scala.
  *
  * All hashes derive from sha256 hex prefixes so the DuckDB oracle can
  * reproduce them exactly; all modular arithmetic stays below 2^62.
  */
object Dedup {

  /** MinHash permutation constants: a_j=(2654435761*(j+1)) mod p,
    * b_j=(1013904223*(j+1)) mod p, p=2^31-1 (Knuth/Numerical-Recipes
    * multipliers; precomputed so the SQL oracle can inline them). */
  val P: Long = 2147483647L
  val NumPerms = 16
  val perms: Seq[(Int, Long, Long)] = (0 until NumPerms).map { j =>
    (j, (2654435761L * (j + 1)) % P, (1013904223L * (j + 1)) % P)
  }

  /** documents → (doc_id, shingle) distinct word-3-gram pairs. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("shingle"))

  /** Exact deduplication over a simulated re-crawl (stored ∪ incoming):
    * group by content hash, keep the smallest doc_id. */
  def exactDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    docs.unionAll(docs)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("n_copies"))
      .orderBy("content_hash")
  }

  /** N-gram Jaccard near-dup pairs via inverted-index join; integer
    * arithmetic only (2*inter >= union ⇔ J >= 0.5). */
  def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a")
    val b = sh.as("b")
    val inter = a.join(b, col("a.shingle") === col("b.shingle") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .filter(col("inter") * 2 >= col("union_size"))
      .select("doc_a", "doc_b", "inter", "union_size")
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, j, h) minhash triples: h_j = min over shingles of
    * (a_j*x + b_j) mod p, x = 28-bit sha256-prefix of the shingle. */
  private def minhashTriples(s: SparkSession, dir: String): DataFrame = {
    val permDf = s.createDataFrame(perms).toDF("j", "a", "b")
    shingles(s, dir)
      .withColumn("x",
        conv(substring(sha2(col("shingle"), 256), 1, 7), 16, 10).cast("long"))
      .crossJoin(broadcast(permDf))
      .groupBy(col("doc_id"), col("j"))
      .agg(min((col("a") * col("x") + col("b")) % P).as("h"))
  }

  /** Per-document MinHash signature (16 permutations, comma-joined in
    * permutation order). */
  def minhashSignatures(s: SparkSession, dir: String): DataFrame =
    minhashTriples(s, dir)
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(array_sort(collect_list(struct(col("j"), col("h")))),
          x => x.getField("h").cast("string")), ",").as("sig"))
      .orderBy("doc_id")

  /** Candidate near-dup pairs from MinHash agreement: bucket join on
    * (permutation, value), pairs agreeing on ≥8/16 (Ĵ ≥ 0.5). */
  def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val t = minhashTriples(s, dir)
    t.as("a").join(t.as("b"),
        col("a.j") === col("b.j") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("agree"))
      .filter(col("agree") >= NumPerms / 2)
      .orderBy("doc_a", "doc_b")
  }

  /** (doc_id, simhash): 32-bit SimHash over distinct word-3-gram
    * shingles (hash bits weighted ±1, bit set where the sum is
    * positive). */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bits = s.createDataFrame((0 until 32).map(Tuple1(_))).toDF("b")
    shingles(s, dir)
      .withColumn("w32",
        conv(substring(sha2(col("shingle"), 256), 1, 8), 16, 10).cast("long"))
      .crossJoin(broadcast(bits))
      .groupBy(col("doc_id"), col("b"))
      .agg(sum(expr("2 * ((w32 >> b) & 1) - 1")).as("sgn"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("sgn") > 0,
        expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(0L))
        .as("simhash"))
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: Hamming distance ≤ 6 over all pairs (exact
    * baseline; band the signature at extreme scale). */
  def simhashPairs(s: SparkSession, dir: String): DataFrame = {
    val sig = simhashSignatures(s, dir)
    sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("hamming",
        expr("bit_count(a.simhash ^ b.simhash)").cast("long"))
      .filter(col("hamming") <= 6)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("hamming"))
      .orderBy("doc_a", "doc_b")
  }

  /** Embedding near-dup pairs: exact cosine > 0.4 over all pairs,
    * computed in double (zip_with fold — same accumulation order as the
    * oracle). Brute-force baseline; the approximate path is
    * Similarity.annTopK. */
  def embeddingPairs(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val dot = "aggregate(zip_with(a.embedding, b.embedding, " +
      "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v)"
    val norm = (side: String) =>
      s"sqrt(aggregate($side.embedding, 0D, (acc, v) -> acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cosine", expr(s"$dot / (${norm("a")} * ${norm("b")})"))
      .filter(col("cosine") > 0.4)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .orderBy("vec_a", "vec_b")
  }
}
