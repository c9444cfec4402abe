package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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

  /** SimHash near-dup Hamming-distance threshold — the single
    * definition [[simhashPairs]] and the curation-funnel oracle share
    * (the 7-band pigeonhole argument in [[simhashPairs]] holds for any
    * threshold ≤ 6; raising it requires re-deriving the banding). */
  val SimhashMaxDist = 6L
  val perms: Seq[(Int, Long, Long)] = (0 until NumPerms).map { j =>
    (j, (2654435761L * (j + 1)) % P, (1013904223L * (j + 1)) % P)
  }

  /** (doc_id, text) → (doc_id, shingle) distinct word-3-gram pairs. */
  private def shinglesOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .filter(size(col("ws")) >= 3)
      .select(col("doc_id"), explode(array_distinct(
        expr("transform(sequence(0, size(ws)-3), i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))")))
        .as("shingle"))

  private def shingles(s: SparkSession, dir: String): DataFrame =
    shinglesOf(Tables.documents(s, dir))

  /** Postings with the optional document-frequency cap applied: shingles
    * present in more than `maxDocFreq` documents are dropped before any
    * join (the standard hot-postings cut — one viral shingle otherwise
    * sends its whole postings list through a single reducer). */
  def cappedShingles(docs: DataFrame,
      maxDocFreq: Option[Long]): DataFrame = {
    val all = shinglesOf(docs)
    maxDocFreq match {
      case None => all
      case Some(cap) =>
        // df per shingle is map-side combinable; the semi-join back onto
        // the postings is a hash join on the shingle key
        val rare = all.groupBy(col("shingle"))
          .agg(count(lit(1)).as("df"))
          .filter(col("df") <= cap)
          .select("shingle")
        all.join(rare, Seq("shingle"), "left_semi")
    }
  }

  /** Distinct word-3-gram shingles, JVM-side (for the per-doc signature
    * kernels — same output as the `shingles` plan). */
  private def shingleSet(text: String): Iterator[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 3) Iterator.empty
    else ws.iterator.sliding(3).withPartial(false)
      .map(_.mkString(" ")).distinct
  }

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
    * arithmetic only (2*inter >= union ⇔ J >= 0.5).
    *
    * `maxDocFreq` (off by default, so the oracle query is unchanged) is
    * the standard hot-postings cut: shingles appearing in more than
    * that many documents are dropped BEFORE the self-join. At 100 TB a
    * single viral shingle otherwise lands its entire postings list on
    * one reducer and the join explodes quadratically in its length;
    * capping document frequency bounds every join bucket at
    * maxDocFreq², while near-identical pairs (which share many rare
    * shingles) keep their candidates. Note per-doc counts are computed
    * from the CAPPED postings, keeping the intersection and union sizes
    * consistent under the same filtered universe. */
  def ngramJaccard(s: SparkSession, dir: String,
      maxDocFreq: Option[Long] = None): DataFrame =
    ngramJaccardDocs(
      Tables.documents(s, dir).select("doc_id", "text"), maxDocFreq)

  /** DataFrame-input form of [[ngramJaccard]] (testable on synthetic
    * hot-shingle corpora).
    *
    * NOTE the join key is a 56-bit sha256 prefix of the shingle, not
    * the shingle string: two DIFFERENT shingles colliding on the prefix
    * would fabricate a spurious intersection row. By the birthday bound
    * that needs ~2^28 (≈270M) DISTINCT shingles corpus-wide for even
    * one expected collision — far above any per-partition postings set
    * this operator sees before the df cap — and a single collision
    * inflates one pair's `inter` by 1, which only matters for pairs
    * already at the J≥0.5 boundary. The DuckDB oracle applies the
    * identical hash, so any collision is shared by both engines. */
  def ngramJaccardDocs(docs: DataFrame,
      maxDocFreq: Option[Long] = None): DataFrame = {
    // checkpointed once: the postings feed both join sides and the
    // per-doc counts — without it the shingle explode runs three times.
    // The self-join keys on an 8-byte sha256-prefix of the shingle, not
    // the ~25-byte string: at 100 TB the postings shuffle is the
    // dominant cost and the hash key shrinks it ~3× (the oracle applies
    // the identical hash, so any collision is shared by both engines).
    val sh = cappedShingles(docs, maxDocFreq)
      .select(col("doc_id"),
        conv(substring(sha2(col("shingle"), 256), 1, 14), 16, 10)
          .cast("long").as("sh_h"))
      .localCheckpoint(true)
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val a = sh.as("a")
    val b = sh.as("b")
    val inter = a.join(b, col("a.sh_h") === col("b.sh_h") &&
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
    * (a_j*x + b_j) mod p, x = 28-bit sha256-prefix of the shingle.
    * Computed as a per-document kernel in one typed pass (zero shuffle;
    * the relational form — shingle explode × 16 permutations × two
    * groupBys — moves 16× the postings through a shuffle for the same
    * arithmetic). */
  private def minhashTriples(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val permArr = perms.toArray
    Tables.documents(s, dir)
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (docId, text) =>
        val mins = Array.fill(permArr.length)(Long.MaxValue)
        var any = false
        shingleSet(text).foreach { sh =>
          any = true
          val x = java.lang.Long.parseLong(
            graft.functions.TextUtil.sha256Hex(sh).substring(0, 7), 16)
          var j = 0
          while (j < permArr.length) {
            val h = (permArr(j)._2 * x + permArr(j)._3) % P
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
        if (!any) Iterator.empty
        else mins.iterator.zipWithIndex.map { case (h, j) => (docId, j, h) }
      }
      .toDF("doc_id", "j", "h")
  }

  /** Typed `Aggregator` form of the MinHash signature (the UDAF
    * extension surface): buffer = running minima per permutation,
    * reduce = fold one 28-bit shingle hash through all permutations,
    * merge = elementwise min — associative and commutative, so Spark
    * runs it with map-side partial aggregation. The per-document typed
    * kernel stays the default (zero shuffle when input is already one
    * row per document); this form is for when shingles arrive as an
    * EXPLODED relation (e.g. out of a join) and grouping is unavoidable
    * anyway. Output identical to [[minhashSignatures]]. */
  object MinHashAgg extends org.apache.spark.sql.expressions
      .Aggregator[Long, Array[Long], String] {
    override def zero: Array[Long] = Array.fill(NumPerms)(Long.MaxValue)
    override def reduce(buf: Array[Long], x: Long): Array[Long] = {
      var j = 0
      while (j < NumPerms) {
        val h = (perms(j)._2 * x + perms(j)._3) % P
        if (h < buf(j)) buf(j) = h
        j += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var j = 0
      while (j < NumPerms) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
      a
    }
    override def finish(buf: Array[Long]): String = buf.mkString(",")
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[String] =
      org.apache.spark.sql.Encoders.STRING
  }

  /** [[minhashSignatures]] via the Aggregator over exploded shingle
    * postings (28-bit sha prefix per shingle, as everywhere). */
  def minhashSignaturesAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val x = shingles(s, dir)
      .select(col("doc_id"),
        conv(substring(sha2(col("shingle"), 256), 1, 7), 16, 10)
          .cast("long").as("x"))
    x.as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(MinHashAgg.toColumn.name("sig"))
      .toDF("doc_id", "sig")
      .orderBy("doc_id")
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
    val t = minhashTriples(s, dir).localCheckpoint(true) // both join sides
    t.as("a").join(t.as("b"),
        col("a.j") === col("b.j") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("agree"))
      .filter(col("agree") >= NumPerms / 2)
      .orderBy("doc_a", "doc_b")
  }

  /** Broadcast cap for [[minhashPairsDelta]]'s batch side: 16 triples
    * ≈ 400 B per document, so 100k docs ≈ 40 MB — comfortably inside
    * executor broadcast budgets. Above it the band join falls back to
    * the ordinary (j,h)-shuffled form. */
  val DeltaBroadcastMaxDocs = 100000L

  /** Incremental near-dup verdict — the composition a daily ingest
    * actually runs at 100 TB: only the NEW batch's documents (the top
    * fifth of the id range here, standing in for today's delta) pair
    * against the corpus, via the same ≥8/16 minhash band agreement as
    * [[minhashPairs]], so candidate generation is new×(store∪batch)
    * and the store is NEVER paired against itself — the part that
    * grows quadratically with corpus age in a naive re-run. The batch
    * triples broadcast when the delta is small (the normal case,
    * [[DeltaBroadcastMaxDocs]]); the store-side triples then stream
    * map-side through a BroadcastHashJoin without shuffling the corpus
    * — the same broadcast direction as the streaming embed-reuse path.
    * One verdict row per new document: partner count, best agreement,
    * lowest partner id (partners are agreeing docs with smaller ids,
    * [[minhashPairs]]'s canonical orientation); pristine docs keep
    * zeros / -1. Documents with fewer than 3 words have no shingles
    * and no verdict, exactly as they have no [[minhashPairs]] row. */
  def minhashPairsDelta(s: SparkSession, dir: String): DataFrame = {
    val maxRow = Tables.documents(s, dir).agg(max(col("doc_id"))).head
    // empty corpus: batch from 0 selects nothing downstream and the
    // pipeline shape yields the empty result with the right schema
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val from = maxId * 4 / 5
    val t = minhashTriples(s, dir).localCheckpoint(true)
    val batch = t.filter(col("doc_id") >= from)
    val bSide =
      if (maxId - from + 1 <= DeltaBroadcastMaxDocs) broadcast(batch)
      else batch
    val pairs = t.as("a")
      .join(bSide.as("b"),
        col("a.j") === col("b.j") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("b.doc_id").as("doc_id"),
        col("a.doc_id").as("partner"))
      .agg(count(lit(1)).as("agree"))
      .filter(col("agree") >= NumPerms / 2)
    val verdict = pairs.groupBy("doc_id")
      .agg(count(lit(1)).as("n_partners"),
        max(col("agree")).as("best_agree"),
        min(col("partner")).as("first_partner"))
    batch.select("doc_id").distinct()
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        coalesce(col("best_agree"), lit(0L)).as("best_agree"),
        coalesce(col("first_partner"), lit(-1L)).as("first_partner"))
      .orderBy("doc_id")
  }

  /** (doc_id, simhash): 32-bit SimHash over distinct word-3-gram
    * shingles (hash bits weighted ±1, bit set where the sum is
    * positive). Per-document kernel in one typed pass — the relational
    * form (shingles × 32 bit-rows through two shuffled groupBys) moves
    * 32× the postings for the same arithmetic. */
  def simhashSignatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select("doc_id", "text").as[(Long, String)]
      .flatMap { case (docId, text) =>
        val sums = new Array[Long](32)
        var any = false
        shingleSet(text).foreach { sh =>
          any = true
          val w32 = java.lang.Long.parseLong(
            graft.functions.TextUtil.sha256Hex(sh).substring(0, 8), 16)
          var b = 0
          while (b < 32) {
            sums(b) += 2 * ((w32 >> b) & 1L) - 1
            b += 1
          }
        }
        if (!any) Iterator.empty
        else {
          var sig = 0L
          var b = 0
          while (b < 32) { if (sums(b) > 0) sig |= (1L << b); b += 1 }
          Iterator.single((docId, sig))
        }
      }
      .toDF("doc_id", "simhash")
      .orderBy("doc_id")
  }

  /** SimHash near-dup pairs: Hamming distance ≤ 6. Candidate generation
    * is banded, not quadratic: the 32-bit signature splits into 7 bands
    * (5+5+5+5+4+4+4 bits); ≤6 differing bits can corrupt at most 6
    * bands, so every qualifying pair matches exactly on ≥1 band
    * (pigeonhole) — output identical to the all-pairs scan, but the join
    * is a hash join on (band, value) whose cost follows bucket sizes,
    * not corpus². */
  def simhashPairs(s: SparkSession, dir: String): DataFrame =
    simhashPairs(s, dir, corpusSize = None, acceptQuadratic = false)

  /** Guarded form of the 32/6 report kernel. The candidate JOIN is
    * banded (never corpus²), but at dist ≤ 6 the random collision rate
    * r ≈ 2.7e-4 makes the OUTPUT itself quadratic above
    * [[SimhashAutoMaxDocs]] documents — no plan outruns its own result
    * set. Above the gate this refuses (directing callers to
    * [[simhashPairsWide]], the measured-linear 60/3 kernel, or to
    * [[nearDupPairsAuto]] which routes by size) unless the caller
    * explicitly accepts the quadratic output with
    * `acceptQuadratic = true` — the bounded-corpus report escape
    * hatch. `corpusSize` skips the routing count when known. */
  def simhashPairs(s: SparkSession, dir: String,
      corpusSize: Option[Long], acceptQuadratic: Boolean): DataFrame = {
    val n = corpusSize.getOrElse(Ingest.docCount(s, dir))
    require(acceptQuadratic || n <= SimhashAutoMaxDocs,
      s"simhashPairs(32/6) on $n docs (> SimhashAutoMaxDocs=" +
        s"$SimhashAutoMaxDocs): the dist-6 output is quadratic at this " +
        "size. Use simhashPairsWide (60/3 scale kernel) or " +
        "nearDupPairsAuto (size-routed), or pass acceptQuadratic=true " +
        "for a bounded-corpus report.")
    val sig = simhashSignatures(s, dir).localCheckpoint(true) // reused 2×
    // (doc_id, simhash, band, value)
    val banded = sig.select(col("doc_id"), col("simhash"),
      posexplode(array(
        expr("simhash & 31"), expr("(simhash >> 5) & 31"),
        expr("(simhash >> 10) & 31"), expr("(simhash >> 15) & 31"),
        expr("(simhash >> 20) & 15"), expr("(simhash >> 24) & 15"),
        expr("(simhash >> 28) & 15"))).as(Seq("band", "value")))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.value") === col("b.value") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      // distance filter BEFORE the dedup shuffle: band-duplicates carry
      // the same Hamming distance, so filtering first is order-safe and
      // shrinks the dropDuplicates exchange from millions of candidate
      // rows to the handful of qualifying pairs
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= SimhashMaxDist)
      .dropDuplicates("doc_a", "doc_b")
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** Wide-signature bits (60 = 15 hex chars of sha256 — the widest
    * prefix that parses as a signed BIGINT in both engines) and the
    * Hamming threshold of the SCALE near-dup kernel. 3-of-60 is the
    * near-identical regime of Manku, Jain & Das Sarma (WWW'07), the
    * published web-scale SimHash dedup setting. */
  val SimhashWideBits = 60
  val SimhashWideMaxDist = 3L

  /** (doc_id, simhash60): the wide form of [[simhashSignatures]] —
    * same shingle set, same ±1 weighting, 60 bits from the first 15
    * sha256 hex chars of each shingle. */
  def simhashWideSignatures(s: SparkSession, dir: String): DataFrame =
    simhashWideOf(Tables.documents(s, dir))

  private def simhashWideOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .flatMap { case (docId, text) =>
        val sums = new Array[Long](SimhashWideBits)
        var any = false
        shingleSet(text).foreach { sh =>
          any = true
          val w = java.lang.Long.parseLong(
            graft.functions.TextUtil.sha256Hex(sh).substring(0, 15), 16)
          var b = 0
          while (b < SimhashWideBits) {
            sums(b) += 2 * ((w >> b) & 1L) - 1
            b += 1
          }
        }
        if (!any) Iterator.empty
        else {
          var sig = 0L
          var b = 0
          while (b < SimhashWideBits) {
            if (sums(b) > 0) sig |= (1L << b); b += 1
          }
          Iterator.single((docId, sig))
        }
      }
      .toDF("doc_id", "simhash")
  }

  /** SCALE near-dup pairs: Hamming ≤ [[SimhashWideMaxDist]] on the
    * 60-bit signature, candidates from ADAPTIVE m-of-n compound
    * banding (Manku et al. WWW'07 §3). Why [[simhashPairs]]'s 32/6
    * semantic cannot be the 100 TB default: its random-collision rate
    * is Σ_{i≤6} C(32,i)/2^32 ≈ 2.7e-4, so the TRUE pair set itself
    * grows ~N² (334k pairs at 50k docs — measured by the 10x scale
    * probe as a 92 s cluster step). At 3-of-60 the random rate is
    * Σ_{i≤3} C(60,i)/2^60 ≈ 3e-14: output is true near-identicals
    * only, linear in corpus size.
    *
    * Banding exactness: split the 60 bits into n equal blocks and key
    * each doc by every m-subset of block values; ≤3 corrupted bits
    * corrupt ≤3 blocks, so with n = m+3 every qualifying pair shares
    * at least one UNCORRUPTED m-subset key (pigeonhole). m is chosen
    * from the corpus count so the compound key carries
    * ≥ log2(N)+8 bits — the false-candidate expectation N²·C(n,m)/2^K
    * then stays ≈ N·C(n,m)/256, i.e. LINEAR, at every N (the fixed
    * 7-band layout of the 32-bit form loses exactly this property).
    * Each doc emits C(n,m) keyed rows — 4..120 for n ≤ 10 — which is
    * the bounded price of exact banding, not a corpus² term. */
  def simhashPairsWide(s: SparkSession, dir: String): DataFrame =
    simhashPairsWideOf(simhashWideSignatures(s, dir))

  /** [[simhashPairsWideOf]] restricted to pairs whose HIGHER id is a
    * new-batch document (`newFrom`): the incremental wide-kernel run —
    * candidate generation is new×(store∪new), the store's banded rows
    * are never joined against themselves, and the batch side
    * broadcasts (C(n,m) ≤ 120 keyed rows per batch doc; above
    * [[DeltaBroadcastMaxDocs]]-scale deltas drop the hint and take the
    * ordinary band-key shuffle). */
  private[operators] def simhashPairsWideOf(sigDf: DataFrame): DataFrame =
    simhashPairsWideOf(sigDf, None)

  private[operators] def simhashPairsWideOf(sigDf: DataFrame,
      newFrom: Option[Long]): DataFrame = {
    import sigDf.sparkSession.implicits._
    val sig = sigDf.localCheckpoint(true) // reused: count + both join sides
    val n0 = sig.count()
    // smallest block count n (dividing 60, n = m+3) whose compound key
    // width m*60/n reaches log2(N)+8 bits
    val needBits = math.ceil(math.log(math.max(n0, 2).toDouble) /
      math.log(2.0)).toInt + 8
    val n = Seq(4, 5, 6, 10).find { nn =>
      (nn - 3) * (SimhashWideBits / nn) >= needBits
    }.getOrElse(10)
    val m = n - 3
    val blockBits = SimhashWideBits / n
    val blockMask = (1L << blockBits) - 1
    val combos: Seq[Seq[Int]] =
      (0 until n).combinations(m).map(_.toSeq).toSeq
    // (doc_id, simhash, combo, key): C(n,m) compound keys per doc
    val keyCols = combos.zipWithIndex.map { case (combo, ci) =>
      struct(lit(ci).as("combo"),
        concat_ws(":", combo.map(b =>
          expr(s"(simhash >> ${b * blockBits}) & $blockMask")): _*)
          .as("key"))
    }
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array(keyCols: _*)).as("ck"))
      .select(col("doc_id"), col("simhash"),
        col("ck.combo").as("combo"), col("ck.key").as("key"))
    val bSide = newFrom match {
      case Some(f) =>
        val batch = banded.filter(col("doc_id") >= f)
        // the promised fallback: an oversized delta takes the ordinary
        // band-key shuffle instead of a force-broadcast OOM (Spark
        // never vetoes an explicit hint); sig is checkpointed, so the
        // count is a cheap local scan
        if (sig.filter(col("doc_id") >= f).count() <= DeltaBroadcastMaxDocs)
          broadcast(batch)
        else batch
      case None => banded
    }
    banded.as("a").join(bSide.as("b"),
        col("a.combo") === col("b.combo") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sa"), col("b.simhash").as("sb"))
      .withColumn("hamming", expr("bit_count(sa ^ sb)").cast("long"))
      .filter(col("hamming") <= SimhashWideMaxDist)
      .dropDuplicates("doc_a", "doc_b")
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  /** The ORACLE row for the wide kernel, on a corpus that actually
    * contains near-identicals: every 25th document is unioned back
    * verbatim under a shifted id, and the wide kernel must find
    * exactly those (original, copy) pairs — planted ground truth the
    * all-pairs DuckDB mirror verifies, since at 3-of-60 the natural
    * corpus pairs nothing (random rate ≈ 3e-14). Dist-1..3 capture is
    * pinned separately by the banding property test (planted bit
    * flips vs brute force); text edits can't plant a GUARANTEED
    * Hamming bound, copies can. */
  def simhashWideDemo(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    simhashPairsWideOf(simhashWideOf(docs.unionByName(copies)))
  }

  /** Incremental WIDE-kernel dedup — [[minhashPairsDelta]]'s twin on
    * the 100 TB SimHash path: the new batch (every 25th document
    * planted back verbatim under a shifted id — the same ground-truth
    * construction as [[simhashWideDemo]], here playing the role of
    * today's delta) band-joins against the corpus with the store side
    * never self-paired, and each new document gets a verdict row:
    * partner count, best (minimum) Hamming distance, lowest partner
    * id. Every planted copy must report exactly its original at
    * Hamming 0 — and at 3-of-60 the natural corpus contributes
    * nothing (random rate ≈ 3e-14) — so the all-pairs DuckDB mirror
    * is exact ground truth. Pristine new docs (no shingles → no
    * signature) are absent, as in [[minhashPairs]]. */
  def simhashWideDelta(s: SparkSession, dir: String): DataFrame = {
    val cut = 10000000L
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + cut).as("doc_id"), col("text"))
    // checkpointed here because BOTH the pair kernel and the verdict's
    // new-doc list read it — without this the signature flatMap runs
    // twice
    val sig = simhashWideOf(docs.unionByName(copies)).localCheckpoint(true)
    val pairs = simhashPairsWideOf(sig, Some(cut))
    val verdict = pairs.groupBy(col("doc_b").as("doc_id"))
      .agg(count(lit(1)).as("n_partners"),
        min(col("hamming")).as("best_hamming"),
        min(col("doc_a")).as("first_partner"))
    sig.filter(col("doc_id") >= cut).select("doc_id").distinct()
      .join(verdict, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_partners"), lit(0L)).as("n_partners"),
        coalesce(col("best_hamming"), lit(-1L)).as("best_hamming"),
        coalesce(col("first_partner"), lit(-1L)).as("first_partner"))
      .orderBy("doc_id")
  }

  /** Near-dup CLUSTERING — the dedup endgame: pair evidence →
    * connected components → one canonical (minimum doc_id) per cluster.
    * Pairs alone can't drive deletion (near-dup is not transitive, but
    * retention policy must be: if A~B and B~C, keeping A and C but
    * dropping B is arbitrary); components make the keep-set well
    * defined.
    *
    * Scale: SIZE-ROUTED. Banded candidate generation shrinks the pair
    * list by orders of magnitude relative to the corpus, so the pair
    * EDGES usually fit the driver even when the corpus is 100 TB —
    * below `driverThreshold` pairs, a driver-side union-find closes the
    * components in one pass (the broadcast-the-small-dim pattern; at
    * 3981 pairs / 2720-node giant component the distributed loop paid
    * 22 synchronization rounds for the same answer). Above the
    * threshold, distributed min-label propagation with pointer jumping
    * (l(v) ← l(l(v)) self-join halves chain lengths per round) takes
    * over. Both paths produce the min-reachable-doc labels of the SQL
    * oracle's recursive-CTE closure; every document is a vertex, so
    * singletons cluster as themselves.
    *
    * The default threshold is 1M edges ≈ 16 MB of longs (~50 MB with
    * boxing overhead while building the map) — comfortably inside a
    * default 1 GB driver with headroom for the LongMap; raise it only
    * with a driver sized for the collect. */
  def clusters(s: SparkSession, dir: String, pairs: DataFrame,
      driverThreshold: Long = 1000000L): DataFrame =
    clustersOf(Tables.documents(s, dir).select(col("doc_id")),
      pairs, driverThreshold)

  /** [[clusters]] over an explicit vertex frame — shared by the
    * directory form above and corpora assembled in memory (the
    * planted-copy wide-kernel row). */
  def clustersOf(vertices: DataFrame, pairs: DataFrame,
      driverThreshold: Long = 1000000L): DataFrame = {
    val s = vertices.sparkSession
    import s.implicits._
    // materialize the (expensive) candidate-generation plan exactly
    // once; both routing branches read from this checkpoint
    val pairsCk = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .localCheckpoint(true)
    val docs = vertices.select(col("doc_id"))
    if (pairsCk.count() <= driverThreshold) {
      // union-find over the collected pair list; only docs appearing in
      // pairs enter the structure, everything else stays a singleton
      val parent = scala.collection.mutable.LongMap.empty[Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) {
          val n = parent.getOrElse(c, c); parent(c) = r; c = n
        }
        r
      }
      pairsCk.as[(Long, Long)].collect()
        .foreach { case (a, b) =>
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) {
            // union by min id keeps roots = component minimum
            if (ra < rb) parent(rb) = ra else parent(ra) = rb
          }
        }
      val labels = parent.keys.toSeq.map(k => (k, find(k)))
      val labelDf = labels.toDF("doc_id", "cluster_id")
      return docs
        .join(broadcast(labelDf), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
        .withColumn("is_canonical",
          (col("doc_id") === col("cluster_id")).cast("long"))
        .orderBy("doc_id")
    }
    val edges = pairsCk
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairsCk
        .select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true) // joined every round
    var labels = docs
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    // labels are monotonically non-increasing, so Σ(labels) strictly
    // decreases exactly while anything changes — convergence is a
    // scalar aggregate per round, not a join (decimal sum: no overflow
    // at any corpus size)
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("cluster_id").cast("decimal(38,0)")))
        .head().getDecimal(0)
    var prevSum = labelSum(labels)
    var changed = true
    while (changed) {
      // (a) neighbor-min
      val prop = labels.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("cluster_id"))
      val neighborMin = labels.unionByName(prop)
        .groupBy("doc_id").agg(min("cluster_id").as("cluster_id"))
      // (b) pointer jump: l(v) ← l(l(v)) — labels are doc ids, so the
      // jump is a self-join on cluster_id = doc_id, halving chain
      // lengths per round (convergence in O(log diameter) rounds)
      val next = neighborMin.as("a")
        .join(neighborMin.as("b"), col("a.cluster_id") === col("b.doc_id"))
        .select(col("a.doc_id").as("doc_id"),
          col("b.cluster_id").as("cluster_id"))
        .localCheckpoint(true)
      val s2 = labelSum(next)
      changed = s2.compareTo(prevSum) < 0
      prevSum = s2
      labels = next
    }
    labels
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("long"))
      .orderBy("doc_id")
  }

  /** Corpus-size ceiling for defaulting near-dup CONSUMERS to the 32/6
    * report kernel. Derivation: the 32-bit/dist-6 random-collision
    * rate is r = Σ_{i≤6} C(32,i)/2^32 ≈ 2.7e-4, so the TRUE pair set
    * carries an expected r·N²/2 random-pair term — which overtakes the
    * corpus size itself at N = 2/r ≈ 7,400 documents. Below that the
    * 32/6 semantic is a bounded (and richer, dist-≤6) report; above it
    * the output is quadratic BY DEFINITION and no plan can outrun its
    * own result set (measured: 1 s → 93 s at 10x, SCALEPROBE.md), so
    * consumers route to the measured-linear wide kernel instead. */
  val SimhashAutoMaxDocs = 8000L

  /** Size-routed near-duplicate pair source — the DEFAULT every pair
    * CONSUMER ([[simhashClusters]], [[crossSourceLeakage]],
    * `Curation.funnel`'s recompute path) now feeds from: the 32/6
    * report kernel up to [[SimhashAutoMaxDocs]] documents, the 60/3
    * scale kernel ([[simhashPairsWide]], Manku WWW'07) above it. 32/6
    * stays available as the EXPLICIT report mode ([[simhashPairs]] /
    * the `dedup_simhash_pairs` row); only the default routing is
    * size-guarded. `corpusSize` overrides the counted size (tests /
    * callers that already know it). */
  def nearDupPairsAuto(s: SparkSession, dir: String,
      corpusSize: Option[Long] = None): DataFrame = {
    val n = corpusSize.getOrElse(Ingest.docCount(s, dir))
    if (n <= SimhashAutoMaxDocs)
      simhashPairs(s, dir, Some(n), acceptQuadratic = false)
    else simhashPairsWide(s, dir)
  }

  /** Clusters over the size-routed near-dup pair evidence
    * (deterministic on both engines — below [[SimhashAutoMaxDocs]] the
    * oracle recomputes the same 32/6 pairs and closes them with a
    * recursive CTE; above it the wide kernel takes over, the chain the
    * `dedup_clusters_wide` row pins). */
  def simhashClusters(s: SparkSession, dir: String): DataFrame =
    clusters(s, dir, nearDupPairsAuto(s, dir))

  /** Quality-aware cluster RETENTION — what production dedup actually
    * ships: within each near-dup cluster keep the BEST member (longest
    * content here, the keep-longest heuristic; ties to the lowest id),
    * not the arbitrary first. One row per cluster: size, the keeper,
    * its length, and how many members a retention pass would drop.
    * Composition over two green layers — [[simhashClusters]] (the
    * cluster assignment) and the documents table — so the oracle
    * replays the component CTE and re-derives the argmax.
    *
    * Scale: inherits the clusters machinery (size-routed pair kernel,
    * pointer-jumped components); keeper selection is one window over
    * (cluster, member) rows — partitioned by cluster, never global. */
  def keepBest(s: SparkSession, dir: String): DataFrame = {
    val comp = simhashClusters(s, dir).select("doc_id", "cluster_id")
    val sized = comp.join(
      Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
    val keepers = sized
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("cluster_id"))
          .orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rn") === 1)
      .select(col("cluster_id"), col("doc_id").as("keeper_id"),
        col("n_chars").as("keeper_chars"))
    comp.groupBy("cluster_id")
      .agg(count(lit(1)).as("n_members"))
      .join(keepers, "cluster_id")
      .select(col("cluster_id"), col("n_members"), col("keeper_id"),
        col("keeper_chars"), (col("n_members") - 1).as("n_dropped"))
      .orderBy("cluster_id")
  }

  /** The dedup ENDGAME on the SCALE kernel: connected components over
    * the wide (60-bit/dist-3) pairs of the planted-copy corpus — the
    * full 100 TB chain (wide signatures → adaptive banding → union-find
    * retention) as one oracle row. Each planted copy clusters with its
    * original (canonical = the lower id); everything else stays a
    * singleton unless naturally near-identical. */
  def simhashWideClusters(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val copies = docs.filter(col("doc_id") % 25 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    val corpus = docs.unionByName(copies)
    clustersOf(corpus.select(col("doc_id")),
      simhashPairsWideOf(simhashWideOf(corpus)))
  }

  /** Embedding near-dup pairs: banded-LSH candidate generation (the same
    * deterministic hyperplane buckets as `Similarity.lshBuckets`) with an
    * exact cosine > 0.4 re-rank over candidates only.
    *
    * Scale design: candidates come from two equi-joins on the 4-bit band
    * signatures — shuffle ∝ bucket sizes, never corpus². The previous
    * all-pairs triangle join (`a.vec_id < b.vec_id`) was a cartesian:
    * 5·10¹⁵ pairs at 100M vectors. Norms are precomputed once per vector
    * before the join; the codegen'd `dot_f` keeps the re-rank in
    * whole-stage codegen with the oracle's left-to-right accumulation.
    * The cosine filter runs BEFORE the pair dedup (band duplicates carry
    * identical cosine, so filtering first is order-safe and shrinks the
    * dropDuplicates exchange). */
  def embeddingPairs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorExprs.register(s)
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
      .withColumn("norm", expr("sqrt(dot_f(embedding, embedding))"))
    val withB = Similarity.lshBuckets(s, dir)
      .select("vec_id", "bucket0", "bucket1")
      .join(e, "vec_id")
      .localCheckpoint(true) // feeds both sides of both band joins
    val a = withB.select(col("vec_id").as("vec_a"), col("embedding").as("ea"),
      col("norm").as("na"), col("bucket0").as("a0"), col("bucket1").as("a1"))
    val b = withB.select(col("vec_id").as("vec_b"), col("embedding").as("eb"),
      col("norm").as("nb"), col("bucket0").as("b0"), col("bucket1").as("b1"))
    // one equi-join per band, unioned — an OR condition would force a
    // nested-loop join; equi-joins stay hash-partitioned
    val cand0 = a.join(b, col("a0") === col("b0") && col("vec_a") < col("vec_b"))
    val cand1 = a.join(b, col("a1") === col("b1") && col("vec_a") < col("vec_b"))
    cand0.unionByName(cand1)
      .withColumn("cosine",
        expr("dot_f(ea, eb)") / (col("na") * col("nb")))
      .filter(col("cosine") > 0.4)
      .dropDuplicates("vec_a", "vec_b")
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** Cosine threshold (permille) for [[semanticDedup]] — the same 0.4
    * bar the banded embedding dedup uses. */
  val SemanticMinCosPermille = 400L

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    * near-duplicate removal in embedding space, bounded by the IVF
    * coarse quantizer — candidate pairs form WITHIN cells only, so the
    * pairwise cost is Σ cell², never corpus², and each cell's pairs
    * co-locate in one shuffle partition (the paper's exact trick for
    * running pairwise cosine at web scale). Keep-lowest rule: a vector
    * is dropped when ANY lower-id vector in its cell clears the cosine
    * threshold; `keeper_id` = the lowest such id (chains resolve
    * through [[simhashClusters]]-style components if full transitive
    * sets are needed). Cosines are permille-floored for cross-engine
    * bit-stability, like `emb_ann_range`. */
  def semanticDedup(s: SparkSession, dir: String,
      thresholdPermille: Long = SemanticMinCosPermille): DataFrame = {
    graft.functions.VectorExprs.register(s)
    val e = Tables.embeddings(s, dir).select("vec_id", "embedding")
    val withEmb = Similarity.ivfAssign(s, dir)
      .join(e, "vec_id").localCheckpoint(true) // feeds both pair sides
    val a = withEmb.select(col("cell"), col("vec_id").as("keep_id"),
      col("embedding").as("ea"))
    val b = withEmb.select(col("cell"), col("vec_id").as("drop_id"),
      col("embedding").as("eb"))
    a.join(b, Seq("cell")).filter(col("keep_id") < col("drop_id"))
      .withColumn("cos_permille",
        floor(expr("dot_f(ea, eb) / (sqrt(dot_f(ea, ea)) * " +
          "sqrt(dot_f(eb, eb)))") * 1000).cast("long"))
      .filter(col("cos_permille") >= thresholdPermille)
      .groupBy(col("drop_id"))
      .agg(min(col("keep_id")).as("keeper_id"),
        max(col("cos_permille")).as("max_cos_permille"),
        count(lit(1)).as("n_dups"))
      .orderBy("drop_id")
  }

  /** MinHash CALIBRATION report: for every candidate pair the signature
    * estimate of Jaccard (agree/NumPerms) next to the EXACT shingle
    * Jaccard and the absolute error, all integer permille. This is the
    * table a curator reads before trusting [[NumPerms]] and the ≥8/16
    * banding threshold on a new corpus — systematic over-estimation
    * means hash collisions or too few permutations; wide error spread
    * means the threshold is cutting in the noise band.
    *
    * Scale: the exact-Jaccard pass — the expensive part — runs only on
    * the CANDIDATE doc set: postings are semi-joined to the candidate
    * ids before the pair-intersection groupBy, so its cost scales with
    * |candidates|, never the corpus. The semi-join carries NO broadcast
    * hint on purpose: on a dup-heavy corpus the candidate set is
    * corpus-scale, and a forced driver broadcast is exactly the OOM a
    * hash semi-join avoids — AQE still broadcasts it when it is
    * actually small. Same 56-bit sha-prefix join key as
    * [[ngramJaccardDocs]] (collision analysis there; the oracle applies
    * the identical hash). */
  def minhashCalibration(s: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(s, dir).localCheckpoint(true) // feeds 2 joins
    val cand = pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id"))).distinct()
    val sh = shingles(s, dir)
      .select(col("doc_id"),
        conv(substring(sha2(col("shingle"), 256), 1, 14), 16, 10)
          .cast("long").as("sh_h"))
      .join(cand, Seq("doc_id"), "left_semi")
      .localCheckpoint(true) // feeds counts and both join sides
    val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(counts.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(counts.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .withColumn("inter", coalesce(col("inter"), lit(0L)))
      .withColumn("est_permille", expr(s"agree * 1000 div $NumPerms"))
      .withColumn("exact_permille",
        expr("inter * 1000 div (n_a + n_b - inter)"))
      .select(col("doc_a"), col("doc_b"), col("agree"),
        col("est_permille"), col("exact_permille"),
        abs(col("est_permille") - col("exact_permille"))
          .as("err_permille"))
      .orderBy("doc_a", "doc_b")
  }

  /** Cross-source near-duplicate LEAKAGE report: SimHash near-dup pairs
    * whose two documents come from DIFFERENT sources, aggregated per
    * (canonically ordered) source pair. The table a curator checks
    * before trusting a per-source holdout split — near-dups straddling
    * a train/eval source boundary leak the eval set into training no
    * matter how carefully the SPLIT was randomized. `min_doc_a/b` give
    * a deterministic example pair to pull for inspection.
    *
    * Scale: the near-dup pair set is bounded (banded candidates, never
    * all-pairs); attaching sources is two hash joins on doc id; the
    * aggregate collapses to ≤ #sources² rows. Persisted pair tables
    * can be injected, mirroring [[Curation.funnel]]; the recompute
    * default is the size-routed [[nearDupPairsAuto]] (32/6's true pair
    * set is itself quadratic above ~[[SimhashAutoMaxDocs]] docs). */
  def crossSourceLeakage(s: SparkSession, dir: String,
      pairs: Option[DataFrame] = None): DataFrame = {
    val pr = pairs.getOrElse(nearDupPairsAuto(s, dir))
      .select("doc_a", "doc_b")
    val src = Tables.documents(s, dir).select(col("doc_id"), col("source"))
    pr
      .join(src.select(col("doc_id").as("doc_a"),
        col("source").as("src_a")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"),
        col("source").as("src_b")), "doc_b")
      .filter(col("src_a") =!= col("src_b"))
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"),
        col("doc_a"), col("doc_b"))
      .groupBy("source_lo", "source_hi")
      .agg(count(lit(1)).as("n_pairs"),
        min(col("doc_a")).as("min_doc_a"),
        min(col("doc_b")).as("min_doc_b"))
      .orderBy("source_lo", "source_hi")
  }

  // ── Exact substring-span dedup (ExactSubstr, Lee et al. 2021) ────────

  /** Window length for exact substring duplication (chars). The paper
    * uses 50 BPE tokens; 40 chars keeps the synthetic fixture's planted
    * boilerplate detectable while exercising the same kernel. */
  val SubstrWindow = 40

  /** Planted boilerplate suffix for the %7 docs of the staged corpus
    * (leading space included — it is part of the appended text). */
  val SubstrBoilerplate =
    " copyright notice all rights reserved worldwide terms"

  /** Exact duplicated-substring spans across documents — the
    * training-data dedup the pair-level kernels can't express: two
    * documents that are globally dissimilar may still share a long
    * boilerplate run (license header, nav chrome, TOS footer) that
    * should be cut at SPAN granularity, not document granularity.
    *
    * Algorithm (suffix-array-free, shuffle-native):
    *   1. every stride-1 window of [[SubstrWindow]] chars is hashed
    *      (md5 — identical hex in DuckDB);
    *   2. CONTENT-DEFINED sampling keeps a window iff its first hash
    *      nibble is 0/4/8/c (1/4 of windows). Selection depends only on
    *      the window's content, so two documents sharing a run select
    *      the SAME windows regardless of where the run starts in each —
    *      the alignment robustness stride-k sampling lacks (winnowing's
    *      trick, Schleimer et al. 2003, done with mod-p instead of
    *      local-min for SQL parity);
    *   3. a selected window present in ≥2 distinct documents marks
    *      [start, start+W) duplicated in every document carrying it;
    *   4. per document, overlapping/adjacent marks merge into maximal
    *      spans (islands by running max of span ends).
    *
    * Scale: the window stream is |corpus-chars| rows before sampling —
    * at 100 TB this is the dominant cost and exactly what the mod-p
    * sampling divides; the duplicate test is one hash aggregate on the
    * sampled window hash (never all-pairs), and the island merge is a
    * per-document window after one hash partition by doc. Planted
    * construction: docs with doc_id % 7 == 0 carry a shared boilerplate
    * suffix at differing offsets, so the row proves alignment
    * robustness; natural vocabulary collisions are deterministic too.
    */
  /** Planted-boilerplate staging of a (doc_id, text) frame. */
  private def stagedDocs(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(SubstrBoilerplate)))
        .otherwise(col("text")).as("text"))

  /** Sampled-window stream of an already-staged (doc_id, text) frame.
    *
    * Typed per-partition kernel rather than the relational
    * explode(sequence)+substring+md5 form: the explode duplicates the
    * FULL document text onto every one of its ~|text| window rows
    * (300× data multiplication before the md5 even runs) — the same
    * reason [[simhashSignatures]] is a typed pass. Parity with the
    * DuckDB oracle: md5 over the window's UTF-8 bytes, lowercase hex,
    * high-nibble mod-4 sampling — identical for the BMP text this
    * corpus carries (Java indexes UTF-16 units where SQL counts code
    * points; like the other typed string kernels, supplementary-plane
    * text would need a code-point walk). */
  private def sampledWindowsOf(staged: DataFrame): DataFrame = {
    val s = staged.sparkSession
    import s.implicits._
    val W = SubstrWindow
    staged.select("doc_id", "text").as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val hexDigits = "0123456789abcdef".toCharArray
        it.flatMap { case (id, text) =>
          if (text.length < W) Iterator.empty
          else (0 to text.length - W).iterator.flatMap { st =>
            val h = md.digest(
              text.substring(st, st + W).getBytes("UTF-8"))
            // sampled iff the first hex char is 0/4/8/c — the high
            // nibble of byte 0 divisible by 4
            if ((((h(0) >> 4) & 0xf) & 0x3) == 0) {
              val sb = new java.lang.StringBuilder(32)
              var i = 0
              while (i < 16) {
                sb.append(hexDigits((h(i) >> 4) & 0xf))
                sb.append(hexDigits(h(i) & 0xf))
                i += 1
              }
              Iterator.single((id, st.toLong, sb.toString))
            } else Iterator.empty
          }
        }
      }
      .toDF("doc_id", "start", "h")
  }

  /** The staged corpus + sampled-window stream shared by
    * [[substringSpans]] and [[substringSpansDelta]]. */
  private def sampledWindows(s: SparkSession, dir: String): DataFrame =
    sampledWindowsOf(stagedDocs(
      Tables.documents(s, dir).select("doc_id", "text")))

  /** Merge duplicated-window marks into maximal per-document spans. */
  private def mergeSpans(marked: DataFrame): DataFrame = {
    // Island merge: a mark opens a new span iff it starts past every
    // prior mark's end; islands = running count of openers.
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("start"))
    val prevMaxEnd = max(col("end")).over(
      byDoc.rowsBetween(Window.unboundedPreceding, -1))
    marked
      .withColumn("opens",
        when(col("start") > coalesce(prevMaxEnd, lit(-1L)), 1L)
          .otherwise(0L))
      .withColumn("island", sum(col("opens")).over(byDoc))
      .groupBy("doc_id", "island")
      .agg(min(col("start")).as("span_start"),
        max(col("end")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_chars"))
      .orderBy("doc_id", "span_start")
  }

  def substringSpans(s: SparkSession, dir: String): DataFrame = {
    val W = SubstrWindow
    // checkpoint the SAMPLED stream: it feeds both the duplicate test
    // and the join-back — without it the md5-per-window scan (the
    // operator's dominant cost) runs twice
    val wins = sampledWindows(s, dir).localCheckpoint(true)

    val dupHashes = wins.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2)
      .select("h")

    val marked = wins.join(dupHashes, "h")
      .select(col("doc_id"), col("start"), (col("start") + W).as("end"))

    mergeSpans(marked)
  }

  /** Broadcast cap for [[substringSpansDelta]]'s batch window set:
    * ~1 sampled window per 4 chars at ~60 B a row, so 20k delta docs of
    * a few KB ≈ tens of MB — inside broadcast budgets. Above it the
    * hash join falls back to shuffling both sides on the window hash. */
  val SubstrDeltaBroadcastMaxDocs = 20000L

  /** Incremental substring-span dedup — the delta form of
    * [[substringSpans]], completing the delta family (minhash, wide
    * SimHash): only the NEW batch's windows (top fifth of the id range,
    * standing in for today's ingest) are tested against the STORE's
    * windows, and the store is never paired against itself — per-ingest
    * cost tracks the delta, not corpus². A span is reported for a batch
    * document exactly where its sampled windows also occur in some
    * store document; batch-internal duplication is left to the batch's
    * own full pass and does NOT appear here.
    *
    * Scale: the batch window set broadcasts under
    * [[SubstrDeltaBroadcastMaxDocs]]; the store-side window stream then
    * flows map-side through a BroadcastHashJoin with zero corpus
    * shuffle — the same direction as the minhash delta. Matched marks
    * deduplicate by (doc, start) before the island merge (one batch
    * window can hit many store documents). */
  def substringSpansDelta(s: SparkSession, dir: String): DataFrame = {
    val W = SubstrWindow
    val maxRow = Tables.documents(s, dir).agg(max(col("doc_id"))).head
    val maxId = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    val from = maxId * 4 / 5
    val wins = sampledWindows(s, dir).localCheckpoint(true)
    val batch = wins.filter(col("doc_id") >= from)
    val store = wins.filter(col("doc_id") < from)
      .select(col("h"))
    val bSide =
      if (maxId - from + 1 <= SubstrDeltaBroadcastMaxDocs) broadcast(batch)
      else batch
    val marked = store.join(bSide, "h")
      .select(col("doc_id"), col("start"), (col("start") + W).as("end"))
      .distinct()
    mergeSpans(marked)
  }

  /** [[substringSpansDelta]] run as a STREAM: the day's batch arrives
    * as micro-batches (two ascending id-range file slices,
    * maxFilesPerTrigger=1), each foreachBatch windows ONLY its slice,
    * probes the same fixed store window set, and appends its marks;
    * the final island merge over the accumulated marks must equal the
    * one-shot delta bit-for-bit — the two rows share one oracle, so a
    * mark lost or replayed across micro-batch boundaries is a hash
    * mismatch. Mark appends are idempotent under replay (distinct
    * before the merge), the same guard the chunk-store sink uses.
    *
    * Scale: per-trigger work is the window kernel over that slice plus
    * the store hash join — state never accumulates in the stream; the
    * store set plays the role the frozen quantizer plays in
    * `stream_ivf_parity`. */
  def substrDeltaStreamParity(s: SparkSession, dir: String): DataFrame = {
    val maxRow = Tables.documents(s, dir).agg(max(col("doc_id"))).head
    if (maxRow.isNullAt(0)) return substringSpansDelta(s, dir)
    val from = maxRow.getLong(0) * 4 / 5
    val W = SubstrWindow

    val base = java.nio.file.Files.createTempDirectory("substrstream")
    try {
      // staged inputs are pure functions of the corpus: the delta
      // slices AND the store-side window hashes (the expensive
      // per-char kernel over 4/5 of the corpus) — bench sessions pay
      // both once; marks/checkpoint stay per-run under the temp base
      val (inBase, cachedIn) = graft.streaming.StageCache.resolve(
        s"substrstream_${graft.streaming.StageCache.dirKey(dir)}") { d =>
        Tables.documents(s, dir).select("doc_id", "text")
          .filter(col("doc_id") >= from)
          .repartitionByRange(2, col("doc_id"))
          .write.mode("overwrite").parquet(s"$d/in")
        val t0 = System.currentTimeMillis() - 3600 * 1000L
        new java.io.File(s"$d/in").listFiles()
          .filter(_.getName.startsWith("part-")).sortBy(_.getName)
          .zipWithIndex
          .foreach { case (f, i) => f.setLastModified(t0 + i * 60000L) }
        sampledWindows(s, dir)
          .filter(col("doc_id") < from)
          .select("h")
          .write.mode("overwrite").parquet(s"$d/storewins")
      }
      val storeWins = s.read.schema("h STRING")
        .parquet(s"$inBase/storewins").localCheckpoint(true)
      val stream = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("doc_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType))))
        .option("maxFilesPerTrigger", 1).parquet(s"$inBase/in")
      val marksDir = s"$base/marks"
      val q = stream.writeStream
        .foreachBatch { (b: DataFrame, _: Long) =>
          sampledWindowsOf(stagedDocs(b))
            .join(storeWins, "h")
            .select(col("doc_id"), col("start"),
              (col("start") + W).as("end"))
            .distinct()
            .write.mode("append").parquet(marksDir)
          ()
        }
        .option("checkpointLocation", s"$base/ckpt").start()
      try q.processAllAvailable() finally q.stop()
      val marks =
        if (new java.io.File(marksDir).exists())
          s.read.parquet(marksDir).distinct()
        else s.emptyDataFrame
          .select(lit(0L).as("doc_id"), lit(0L).as("start"),
            lit(0L).as("end")).limit(0)
      // materialize before the temp tree is deleted (the ivf stream
      // parity's pattern)
      val out = mergeSpans(marks).localCheckpoint(true)
      if (!cachedIn) graft.operators.Sync.deleteTree(inBase.toFile)
      out
    } finally graft.operators.Sync.deleteTree(base.toFile)
  }

  /** The APPLY side of [[substringSpans]]: what cutting the duplicated
    * spans would do to the corpus, reported per source — the
    * before/after accounting a curator reads before committing a
    * span-cut pass (the C4/ExactSubstr papers report exactly this
    * "% of chars removed" figure). One row per source: documents
    * affected, total span chars cut, corpus chars (of the STAGED text
    * the spans index into), and removal permille.
    *
    * Scale: spans are the bounded output of the span pass; attaching
    * sources is one hash join on doc id; the rollup is ≤ |sources|
    * rows. */
  def substringApplyStats(s: SparkSession, dir: String): DataFrame = {
    val spans = substringSpans(s, dir)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_spans"),
        sum(col("span_chars")).as("cut_chars"))
    val staged = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 7 === 0,
          length(col("text")) + lit(SubstrBoilerplate.length))
          .otherwise(length(col("text"))).cast("long").as("chars"))
    staged.join(spans, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("n_spans").isNotNull, 1L).otherwise(0L))
          .as("n_docs_affected"),
        sum(coalesce(col("cut_chars"), lit(0L))).as("cut_chars"),
        sum(col("chars")).as("total_chars"))
      .withColumn("removed_permille",
        expr("cut_chars * 1000 div total_chars"))
      .orderBy("source")
  }
}
