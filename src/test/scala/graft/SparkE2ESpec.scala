package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.{Chunker, Multimodal, Similarity}
import graft.sources.ChunkStore
import graft.streaming.EventStream

/** End-to-end incremental-sync scenarios over a local SparkSession —
  * the Spark port of the reference's e2e sync-count oracles
  * (reference: tests/e2e.test.ts:165-480). */
class SparkE2ESpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def chunkCorpus(docs: Seq[(String, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("url", "markdown").as[(String, String)]
      .flatMap { case (url, md) =>
        Chunker.chunkMarkdown(md, "TestProduct", "1.0", url)
      }.toDF()
  }

  private val run1Docs = Seq(
    "doc://a" -> ("# A\n\n" + "alpha content. " * 60),
    "doc://b" -> ("# B\n\n" + "beta content. " * 60),
    "doc://c" -> ("# C\n\n" + "gamma content. " * 60))

  test("run1 stores all chunks; run2 re-embeds only the modified doc") {
    val stored = chunkCorpus(run1Docs)
    // run 2: doc b modified, a and c untouched
    val run2Docs = run1Docs.map {
      case (u, md) if u == "doc://b" => u -> (md + "\n\nnew paragraph.")
      case other => other
    }
    val incoming = chunkCorpus(run2Docs)

    // chunk-level skip: only b's chunks survive the anti-join
    val delta = incoming.join(stored.select("chunk_id"),
      Seq("chunk_id"), "left_anti")
    val deltaUrlsDf = delta.select("url").distinct()
    assert(deltaUrlsDf.collect().map(_.getString(0)).toSet == Set("doc://b"))

    // url-level diff counters (items_unchanged == N-1)
    def sig(df: DataFrame) = df.groupBy("url")
      .agg(sort_array(collect_list(col("chunk_id"))).as("sig"))
    val joined = sig(incoming).as("i")
      .join(sig(stored).as("s"), Seq("url"), "left")
      .withColumn("unchanged", col("i.sig") === col("s.sig"))
    assert(joined.filter(col("unchanged")).count() == 2)
    assert(joined.filter(!col("unchanged")).count() == 1)

    // upsert keeps store consistent: same urls, b fully replaced
    val upserted = ChunkStore.upsertByUrl(stored,
      incoming.join(deltaUrlsDf, Seq("url"), "left_semi"))
    assert(upserted.select("url").distinct().count() == 3)
    val bChunks = upserted.filter(col("url") === "doc://b")
    val expectedB = incoming.filter(col("url") === "doc://b")
    assert(bChunks.count() == expectedB.count())
    assert(bChunks.join(expectedB.select("chunk_id"), Seq("chunk_id"),
      "left_anti").count() == 0)
  }

  test("skip cascade reconciles with the four individual layer queries") {
    val dir = "/root/testdata/sf0.001"
    val cascade = operators.Sync.skipCascade(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(cascade.keySet ==
      Set("1_lastmod", "2_etag", "3_url_diff", "4_chunk_hash"))
    // layer 1 sees every url; each later layer sees the previous forward
    val lm = operators.Ingest.lastmodSkip(spark, dir)
    val et = operators.Ingest.etagSkip(spark, dir)
    val ud = operators.Sync.urlDiff(spark, dir)
    val cd = operators.Sync.chunkDelta(spark, dir)
    assert(cascade("1_lastmod")._1 == lm.count())
    assert(cascade("1_lastmod")._2 ==
      lm.filter(col("decision") === "skip").count())
    val after1 = lm.filter(col("decision") =!= "skip").select("url")
    assert(cascade("2_etag")._1 == after1.count())
    assert(cascade("2_etag")._2 == after1.join(
      et.filter(col("decision") === "skip"), Seq("url")).count())
    val after2 = after1.join(
      et.filter(col("decision") =!= "skip"), Seq("url")).select("url")
    val udIn = after2.join(ud, Seq("url"))
    assert(cascade("3_url_diff")._1 == udIn.count())
    assert(cascade("3_url_diff")._2 ==
      udIn.filter(col("status") === "unchanged").count())
    val after3 = udIn.filter(col("status") =!= "unchanged")
    val l4 = after3.join(cd, Seq("url"), "left")
      .agg(sum("n_chunks"), sum(coalesce(col("chunks_to_embed"), lit(0L))))
      .collect()(0)
    assert(cascade("4_chunk_hash")._1 == l4.getLong(0))
    assert(cascade("4_chunk_hash")._3 == l4.getLong(1))
    // funnel is monotone: each layer's input is the previous forward
    assert(cascade("2_etag")._1 == cascade("1_lastmod")._3)
  }

  test("store-gap bypass threads through the composed cascade layer 1") {
    val dir = "/root/testdata/sf0.001"
    def layers(df: DataFrame) = df.collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val plain = layers(operators.Sync.skipCascade(spark, dir))
    val gapped = layers(operators.Sync.skipCascadeStoreGap(spark, dir))
    // the bypassed urls: would-skip on lastmod but absent from the store
    val nGap = operators.Ingest.lastmodStoreGap(spark, dir)
      .filter(col("decision") === "fetch_store_gap").count()
    assert(nGap > 0, "staged store must contain gaps that would have skipped")
    // layer 1 sees the same url universe but skips exactly nGap fewer —
    // the gap urls forward into layer 2 instead of dying at layer 1
    assert(gapped("1_lastmod")._1 == plain("1_lastmod")._1)
    assert(gapped("1_lastmod")._2 == plain("1_lastmod")._2 - nGap)
    assert(gapped("2_etag")._1 == plain("2_etag")._1 + nGap)
    // the composed funnel stays monotone with the bypass threaded in
    assert(gapped("2_etag")._1 == gapped("1_lastmod")._3)
    assert(gapped("3_url_diff")._1 <= gapped("2_etag")._3)
  }

  test("cleanup removes unvisited urls but is skipped on partial scans") {
    import spark.implicits._
    val stored = chunkCorpus(run1Docs)
    val visited = Seq("doc://a", "doc://b").toDF("url") // c was deleted

    val cleaned = ChunkStore.cleanupObsolete(stored, visited,
      hasNetworkErrors = false, scanIncomplete = false)
    assert(cleaned.select("url").distinct().collect().map(_.getString(0))
      .toSet == Set("doc://a", "doc://b"))

    // guard: network errors ⇒ nothing is purged
    val guarded = ChunkStore.cleanupObsolete(stored, visited,
      hasNetworkErrors = true, scanIncomplete = false)
    assert(guarded.count() == stored.count())
    val guarded2 = ChunkStore.cleanupObsolete(stored, visited,
      hasNetworkErrors = false, scanIncomplete = true)
    assert(guarded2.count() == stored.count())
  }

  test("watermark advances only on failure-free runs") {
    assert(ChunkStore.advanceWatermark("t0", "t1", failures = 0) == "t1")
    assert(ChunkStore.advanceWatermark("t0", "t1", failures = 3) == "t0")
  }

  test("chunk store writes partitioned parquet and reads back losslessly") {
    import spark.implicits._
    val chunks = chunkCorpus(run1Docs)
    val tmp = java.nio.file.Files.createTempDirectory("store").toString + "/chunks"
    ChunkStore.write(chunks.toDF(), tmp)
    // physical layout: product_name=… / version=… directory pairs —
    // the (product, version) collection scope of SURVEY §1.3
    val partDirs = new java.io.File(tmp).listFiles()
      .filter(_.isDirectory)
    assert(partDirs.exists(_.getName.startsWith("product_name=")))
    assert(partDirs.filter(_.getName.startsWith("product_name="))
      .forall(_.listFiles().exists(_.getName.startsWith("version="))),
      "every product partition must nest version partitions")
    val back = ChunkStore.read(spark, tmp)
    assert(back.count() == chunks.count())
    assert(back.select("chunk_id").except(
      chunks.toDF().select("chunk_id")).count() == 0)
  }

  test("markdown store upsert and 404 cleanup") {
    import spark.implicits._
    val stored = Seq(
      ("u1", "P", "# old one", "2024-01-01"),
      ("u2", "P", "# two", "2024-01-01"),
      ("u3", "P", "# three", "2024-01-01"))
      .toDF("url", "product_name", "markdown", "updated_at")
    val incoming = Seq(("u1", "P", "# new one", "2024-02-01"))
      .toDF("url", "product_name", "markdown", "updated_at")
    val upserted = graft.sources.MarkdownStore.upsert(stored, incoming)
    assert(upserted.count() == 3)
    assert(upserted.filter(col("url") === "u1")
      .head().getAs[String]("markdown") == "# new one")
    val cleaned = graft.sources.MarkdownStore.deleteNotFound(
      upserted, Seq("u3").toDF("url"))
    assert(cleaned.select("url").collect().map(_.getString(0)).toSet ==
      Set("u1", "u2"))
  }

  test("file-list diff and allowedFiles gating") {
    import spark.implicits._
    val previous = Seq("a.md", "b.md", "c.md").toDF("path")
    val current = Seq("a.md", "c.md", "d.md").toDF("path")
    assert(graft.sources.LocalDirectory.deletedFiles(previous, current)
      .collect().map(_.getString(0)).toSeq == Seq("b.md"))
    val files = Seq(("a.md", 1L), ("c.md", 2L), ("d.md", 3L))
      .toDF("path", "mod_ms")
    val allowed = Seq("c.md").toDF("path")
    assert(graft.sources.LocalDirectory.restrictToAllowed(files, allowed)
      .collect().map(_.getString(0)).toSeq == Seq("c.md"))
  }

  test("streaming windowed aggregation over the events table") {
    val tmp = java.nio.file.Files.createTempDirectory("evstream").toString
    // stage a small slice of real events as the stream input
    Tables.events(spark, "/root/testdata/sf0.001")
      .limit(500).coalesce(1).write.mode("overwrite").parquet(tmp)

    val q = EventStream.windowedCounts(
        EventStream.readEvents(spark, tmp))
      .writeStream.format("memory").queryName("wincounts")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows; verify state machinery ran
      assert(q.lastProgress != null)
      val stateRows = q.lastProgress.stateOperators
      assert(stateRows.nonEmpty && stateRows.head.numRowsTotal > 0)
    } finally q.stop()
  }

  test("streaming session windows: gap-merged sessions with bounded state") {
    val tmp = java.nio.file.Files.createTempDirectory("evsess").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .limit(500).coalesce(1).write.mode("overwrite").parquet(tmp)
    val q = EventStream.sessionWindows(
        EventStream.readEvents(spark, tmp), gap = "30 minutes")
      .writeStream.format("memory").queryName("sesswin")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      // session-window state machinery ran and holds bounded rows
      assert(q.lastProgress != null)
      val ops = q.lastProgress.stateOperators
      assert(ops.nonEmpty && ops.head.operatorName.contains("sessionWindow"),
        ops.map(_.operatorName).mkString(","))
    } finally q.stop()
  }

  test("stateful streaming: per-user session state via flatMapGroupsWithState") {
    val tmp = java.nio.file.Files.createTempDirectory("evstate").toString
    Tables.events(spark, "/root/testdata/sf0.001")
      .limit(400).coalesce(1).write.mode("overwrite").parquet(tmp)
    val q = EventStream.sessionStates(spark,
        EventStream.readEvents(spark, tmp))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val out = spark.table("sessions")
      assert(out.count() > 0)
      // state accumulated per user: counts must equal the batch truth
      val truth = Tables.events(spark, "/root/testdata/sf0.001")
        .limit(400).groupBy("user_id").count()
      val got = out.groupBy("user_id")
        .agg(org.apache.spark.sql.functions.max("n_events").as("n"))
      val joined = truth.join(got, "user_id")
        .filter(org.apache.spark.sql.functions.col("count") =!=
          org.apache.spark.sql.functions.col("n"))
      assert(joined.count() == 0)
    } finally q.stop()
  }

  test("run-summary event channel: stats shape, JSON event, JSONL roundtrip") {
    import graft.operators.{RunSummary, Sync}
    val counters = Sync.runCounters(spark, "/root/testdata/sf0.001")
    val stats = RunSummary.sourceStats(counters, "DocsSite", "website",
      "1.0", durationMs = 1234L, ok = true)
    val row = stats.head()
    assert(row.getAs[String]("product_name") == "DocsSite")
    assert(row.getAs[Boolean]("ok"))
    assert(row.isNullAt(row.fieldIndex("error")))
    val ev = RunSummary.eventJson(stats, "2024-03-01T00:00:00Z")
    assert(ev.startsWith("""{"event":"run-summary","ts":"2024-03-01T00:00:00Z","sources":["""))
    assert(ev.contains(""""counters":{"""))
    // durable channel reads back as a table, appends accumulate
    val dir = java.nio.file.Files.createTempDirectory("runlog").toString + "/log"
    RunSummary.appendJsonl(stats, dir)
    RunSummary.appendJsonl(RunSummary.sourceStats(counters, "DocsSite",
      "website", "1.0", 2000L, ok = false, error = Some("net")), dir)
    val back = spark.read.json(dir)
    assert(back.count() == 2)
    assert(back.filter(col("ok") === false).head()
      .getAs[String]("error") == "net")
    assert(back.select("counters.items_new").head().getLong(0) ==
      counters.head().getAs[Long]("items_new"))
  }

  test("orphaned runs fail over on restart") {
    import spark.implicits._
    val runs = Seq(
      (1L, "ok", null.asInstanceOf[String]),
      (2L, "running", null.asInstanceOf[String]),
      (3L, "failed", "net")).toDF("run_id", "status", "error")
    val after = graft.operators.RunSummary.failOrphans(runs)
      .orderBy("run_id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(after.toSeq == Seq(
      (1L, "ok", None),
      (2L, "failed", Some("orphaned by restart")),
      (3L, "failed", Some("net"))))
  }

  test("MLlib ANN recall >= 0.8 against exact KNN") {
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.knnExact(spark, dir, k = 10)
      .filter(org.apache.spark.sql.functions.col("query_id") === 0)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    val approx = Similarity.annMllib(spark, dir, k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(exact.size == 10)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall below 0.8: got $approx vs $exact")
  }

  test("semanticDedup matches a driver-side within-cell brute force") {
    import spark.implicits._
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val got = Dedup.semanticDedup(spark, dir).collect()
      .map(r => (r.getAs[Long]("drop_id"), r.getAs[Long]("keeper_id"),
        r.getAs[Long]("max_cos_permille"), r.getAs[Long]("n_dups")))
    // brute-force reference over the same quantizer assignment
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    val seeds = (1L to 16L).map(vecs).toArray
    val cells = vecs.keys.toSeq.sorted
      .map(id => id -> Similarity.argmaxCell(vecs(id), seeds)).toMap
    def cosPm(a: Array[Float], b: Array[Float]): Long = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i); i += 1
      }
      math.floor(ab / (math.sqrt(aa) * math.sqrt(bb)) * 1000).toLong
    }
    val exp = (for {
      d <- vecs.keys.toSeq
      qual = vecs.keys.toSeq
        .filter(k => k < d && cells(k) == cells(d) &&
          cosPm(vecs(k), vecs(d)) >= Dedup.SemanticMinCosPermille)
      if qual.nonEmpty
    } yield (d, qual.min,
      qual.map(k => cosPm(vecs(k), vecs(d))).max,
      qual.size.toLong)).sortBy(_._1)
    assert(got.nonEmpty, "no semantic near-dups at sf0.001")
    assert(got.toSeq == exp, s"got ${got.toSeq}\nexp $exp")
  }

  test("minhash calibration: estimates and errors are internally consistent") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val rows = Dedup.minhashCalibration(spark, dir).collect()
    assert(rows.nonEmpty, "no candidate pairs at sf0.001")
    rows.foreach { r =>
      val (est, exact, err) = (r.getAs[Long]("est_permille"),
        r.getAs[Long]("exact_permille"), r.getAs[Long]("err_permille"))
      // banding keeps only pairs agreeing on >= 8/16 permutations
      assert(est >= 500 && est <= 1000, s"est $est out of band")
      assert(exact >= 0 && exact <= 1000, s"exact $exact not a ratio")
      assert(err == math.abs(est - exact), s"err $err != |$est-$exact|")
    }
    // the report covers exactly the candidate pair set
    assert(rows.length == Dedup.minhashPairs(spark, dir).count())
  }

  test("IVF append equals the one-shot index cell for cell") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val emb = graft.Tables.embeddings(spark, dir)
    val maxId = emb.agg(max(col("vec_id"))).head.getLong(0)
    val cut = maxId * 4 / 5
    val rows = Similarity.ivfAppendReport(spark, dir).collect()
    assert(rows.nonEmpty)
    // nothing lost or double-appended by the partitioned append
    assert(rows.map(_.getAs[Long]("n_vectors")).sum == emb.count())
    assert(rows.map(_.getAs[Long]("n_appended")).sum ==
      emb.filter(col("vec_id") >= cut).count())
    // build-then-append lands every code where a one-shot build would
    val oneShot = Similarity.clusterStats(spark, dir).collect()
      .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vectors")).toMap
    rows.foreach { r =>
      assert(oneShot(r.getAs[Long]("cell")) == r.getAs[Long]("n_vectors"),
        s"cell ${r.getAs[Long]("cell")}")
    }
  }

  test("distilled quality model agrees with the heuristic gate") {
    import graft.operators.TextAnalysis
    val dir = "/root/testdata/sf0.001"
    val agree = TextAnalysis.distillQuality(spark, dir)
    // the gate is an AND of thresholds — a linear probe on raw signals
    // ceilings near 89% here, so the meaningful pins are "well above
    // the majority-class baseline" (constant predictor = keep rate)
    // and an absolute floor with margin under LBFGS wobble
    val scored = TextAnalysis.qualityScore(spark, dir)
    val majority = scored.filter(col("keep")).count() * 1000 /
      math.max(1L, scored.count())
    info(s"train-set agreement: $agree permille (majority $majority)")
    assert(agree > majority, s"model $agree no better than majority $majority")
    assert(agree >= 870, s"distilled model agreement $agree below 870")
  }

  test("streaming IVF append lands the identical index as batch append") {
    import graft.operators.Similarity
    val dir = "/root/testdata/sf0.001"
    val batch = Similarity.ivfAppendReport(spark, dir).collect()
      .map(_.toSeq).toSeq
    val streamed = Similarity.ivfAppendStreamParity(spark, dir).collect()
      .map(_.toSeq).toSeq
    assert(batch.nonEmpty)
    assert(streamed == batch)
  }

  test("incremental minhash verdict reconciles with the full pair set") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val maxId = graft.Tables.documents(spark, dir)
      .agg(max(col("doc_id"))).head.getLong(0)
    val from = maxId * 4 / 5
    val full = Dedup.minhashPairs(spark, dir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("agree")))
    // the delta verdict must equal the full pair set folded onto new
    // docs: partners of a new doc are its smaller-id pair members
    val byNew = full.filter(_._2 >= from).groupBy(_._2)
    val got = Dedup.minhashPairsDelta(spark, dir).collect()
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Long]("n_partners"),
        r.getAs[Long]("best_agree"), r.getAs[Long]("first_partner")))
      .toMap
    assert(got.nonEmpty, "no new-batch docs at sf0.001")
    byNew.foreach { case (d, ps) =>
      assert(got(d) == ((ps.length.toLong, ps.map(_._3).max,
        ps.map(_._1).min)), s"verdict of new doc $d")
    }
    // docs without a full-set pair carry the pristine row
    got.filterNot { case (d, _) => byNew.contains(d) }.values
      .foreach(v => assert(v == ((0L, 0L, -1L))))
  }

  test("cross-source leakage reconciles with the simhash pair set") {
    import graft.operators.Dedup
    val dir = "/root/testdata/sf0.001"
    val report = Dedup.crossSourceLeakage(spark, dir).collect()
    assert(report.nonEmpty, "no cross-source near-dups at sf0.001")
    val pairs = Dedup.simhashPairs(spark, dir).select("doc_a", "doc_b")
    val srcs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"))
    val crossCount = pairs
      .join(srcs.select(col("doc_id").as("doc_a"),
        col("source").as("sa")), "doc_a")
      .join(srcs.select(col("doc_id").as("doc_b"),
        col("source").as("sb")), "doc_b")
      .filter(col("sa") =!= col("sb")).count()
    assert(report.map(_.getAs[Long]("n_pairs")).sum == crossCount)
    report.foreach { r =>
      assert(r.getAs[String]("source_lo") < r.getAs[String]("source_hi"),
        "source pair not canonically ordered")
    }
    // injected persisted pairs give the identical report
    val fed = Dedup.crossSourceLeakage(spark, dir,
      pairs = Some(Dedup.simhashPairs(spark, dir))).collect()
    assert(fed.toSeq == report.toSeq)
  }

  test("warcRecordsFromFiles streams archives from disk and matches " +
      "the column path record-for-record") {
    import graft.sources.Warc
    val tmp = java.nio.file.Files.createTempDirectory("warcsrc")
    val ids = 0L until 20L
    ids.foreach { id =>
      java.nio.file.Files.write(tmp.resolve(f"doc$id%03d.warc"),
        Warc.fixtureWarc(id))
    }
    import spark.implicits._
    val fromFiles = Warc.warcRecordsFromFiles(spark, tmp + "/*.warc")
      .withColumn("doc_id",
        expr("CAST(regexp_extract(path, 'doc(\\\\d+)', 1) AS BIGINT)"))
      .select("doc_id", "record_idx", "warc_type", "http_status",
        "n_body_bytes", "body_checksum")
      .as[(Long, Int, String, Int, Long, Long)].collect().sorted.toSeq
    val cols = ids.map(id => ("warc://" + id, Warc.fixtureWarc(id)))
      .toDF("path", "content")
    val fromCols = Warc.warcRecords(spark, cols)
      .withColumn("doc_id", expr("CAST(substring(path, 8) AS BIGINT)"))
      .select("doc_id", "record_idx", "warc_type", "http_status",
        "n_body_bytes", "body_checksum")
      .as[(Long, Int, String, Int, Long, Long)].collect().sorted.toSeq
    assert(fromFiles.nonEmpty && fromFiles == fromCols,
      s"disk-streamed records diverged from the column path")
  }

  test("persisted MLlib LSH model: probe after reload matches the inline path") {
    val dir = "/root/testdata/sf0.001"
    val modelDir = java.nio.file.Files
      .createTempDirectory("mlliblsh").resolve("model").toString
    Similarity.buildMllibLsh(spark, dir, modelDir)
    val probed = Similarity.probeMllibLsh(spark, dir, modelDir)
      .collect().map(_.getLong(0)).toSeq
    val inline = Similarity.annMllib(spark, dir)
      .collect().map(_.getLong(0)).toSeq
    assert(probed == inline,
      s"reloaded model diverged: $probed vs $inline")
  }

  test("IVF ANN recall >= 0.8 against exact KNN; probes a cell subset") {
    val dir = "/root/testdata/sf0.001"
    val exact = Similarity.knnExact(spark, dir, k = 10)
      .filter(col("query_id") === 0)
      .collect().map(_.getAs[Long]("neighbor_id")).toSet
    // the synthetic embeddings are weakly clustered, so hitting 0.8
    // recall needs wide probing (nprobe=10 of nlist=16) even with the
    // data-adaptive seed centroids; on corpora with real cluster
    // structure the default nprobe=4 is the scale setting
    val ivf = Similarity.annIvf(spark, dir, k = 10, nprobe = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    assert(recall >= 0.8, s"IVF recall $recall below 0.8")
  }

  test("rangeSearch is sound: every hit is a true within-radius pair") {
    val dir = "/root/testdata/sf0.001"
    val hits = Similarity.rangeSearch(spark, dir).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"),
        r.getAs[Long]("cosine_permille")))
    // exact radius set via driver-side brute force over the same split
    val vecs = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray)
      .toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    assert(hits.nonEmpty, "radius search returned nothing at sf0.001")
    hits.foreach { case (q, nb, pm) =>
      val c = cos(vecs(q), vecs(nb))
      assert(c >= Similarity.RangeMinCosine,
        s"($q,$nb) cosine $c below the radius floor")
      assert(pm == math.floor(c * 1000).toLong,
        s"($q,$nb) reported $pm, exact ${math.floor(c * 1000).toLong}")
    }
    assert(hits.map(h => (h._1, h._2)).distinct.length == hits.length)
  }

  test("mediaMeta dispatches on real container headers per payload kind") {
    import spark.implicits._
    def be32(v: Int) = Array(((v >> 24) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def le32(v: Int) = be32(v).reverse
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte) ++ be32(13) ++ "IHDR".getBytes ++ be32(320) ++
      be32(200) ++ Array[Byte](8, 2, 0, 0, 0)
    val wavB = "RIFF".getBytes ++ le32(36 + 16000) ++ "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++ le32(8000) ++
      le32(16000) ++ le16(2) ++ le16(16) ++ "data".getBytes ++ le32(16000)
    val mp4B = be32(16) ++ "ftyp".getBytes ++ "isom".getBytes ++ be32(0) ++
      be32(8 + 108) ++ "moov".getBytes ++
      be32(108) ++ "mvhd".getBytes ++ Array.fill[Byte](4)(0) ++
      be32(0) ++ be32(0) ++ be32(90000) ++ be32(450000) ++
      Array.fill[Byte](108 - 32)(0)
    val rows = Seq(
      ("a.png", "image/png", png),
      ("b.wav", "audio/wav", wavB),
      ("c.mp4", "video/mp4", mp4B),
      ("d.bin", "application/octet-stream", "whatever".getBytes))
      .toDF("path", "mime", "content")
    val out = graft.operators.Multimodal.mediaMeta(spark, rows)
      .collect().map(r => r.getAs[String]("path") -> r).toMap
    assert(out("a.png").getAs[String]("kind") == "image")
    assert(out("a.png").getAs[Int]("width") == 320)
    assert(out("b.wav").getAs[String]("kind") == "audio")
    assert(out("b.wav").getAs[Int]("sample_rate") == 8000)
    assert(out("b.wav").getAs[Long]("duration_ms") == 1000L)
    assert(out("c.mp4").getAs[String]("kind") == "video")
    assert(out("c.mp4").getAs[Long]("duration_ms") == 5000L)
    assert(out("d.bin").getAs[String]("kind") == "opaque")
    assert(out("d.bin").isNullAt(out("d.bin").fieldIndex("width")))
  }

  test("streaming curation: gate filters, span index dedups across micro-batches") {
    import spark.implicits._
    import graft.streaming.CurationStream
    val base = java.nio.file.Files.createTempDirectory("curstream")
    val in = base.resolve("in").toString
    val idx = base.resolve("idx").toString
    val kept = base.resolve("kept").toString
    val ckpt = base.resolve("ckpt").toString
    new java.io.File(in).mkdirs()
    val words = (1 to 30).map(i => s"w$i").mkString(" ")   // 30 words
    val other = (31 to 60).map(i => s"w$i").mkString(" ")
    def stage(name: String, rows: Seq[(Long, String, String)]): Unit =
      rows.toDF("doc_id", "text", "source").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    // batch 1: one normal doc, one too short for the gate
    stage("b1", Seq((1L, words, "src1"), (2L, "too short", "src1")))
    val q = CurationStream.curateStream(
      CurationStream.readDocs(spark, s"$in/*"), idx, kept, ckpt)
    try {
      q.processAllAvailable()
      val k1 = spark.read.parquet(kept).collect()
      assert(k1.map(_.getAs[Long]("doc_id")).toSet == Set(1L),
        "gate should drop the short doc; doc 1 should survive")
      // batch 2: doc 1's text re-sent under a new id (pure duplicate →
      // dropped), plus one genuinely new doc
      stage("b2", Seq((3L, words, "src2"), (4L, other, "src2")))
      q.processAllAvailable()
      val k2 = spark.read.parquet(kept).collect()
      assert(k2.map(_.getAs[Long]("doc_id")).toSet == Set(1L, 4L),
        s"re-sent content must dedup against the index: ${k2.toSeq}")
      // the index holds each span hash exactly once per first sighting
      val nHashes = spark.read.parquet(idx).distinct().count()
      assert(nHashes == 6, s"3 spans per kept doc x 2 docs, got $nHashes")
    } finally q.stop()
  }

  test("PQ ANN recall >= 0.8 against exact top-10 over the same corpus") {
    val dir = "/root/testdata/sf0.001"
    val all = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    val q = all.find(_._1 == 0L).get._2
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < a.length) {
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val exact = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(q, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val pq = Similarity.annPq(spark, dir, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    val recall = (exact & pq).size.toDouble / exact.size
    assert(recall >= 0.8, s"PQ recall $recall below 0.8: $pq vs $exact")
  }

  test("PQ build/probe: codes-only scan + pushed-IN vector fetch match inline PQ") {
    val dir = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("pqidx").toString + "/pq"
    Similarity.buildPqIndex(spark, dir, idx)
    val qv = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0)
      .toArray
    val probe = Similarity.probePq(spark, idx, dir, qv, k = 10,
      excludeId = Some(0L))
    val got = probe.collect().map(_.getAs[Long]("vec_id")).toSet
    val inline = Similarity.annPq(spark, dir, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got == inline, s"probe $got != inline $inline")
    // the vector fetch must push the shortlist IN filter to the scan
    val leaves = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("PushedFilters: [In(vec_id"), leaves.take(2000))
    // and the codes scan must never read a float vector column
    val codesScan = spark.read.parquet(idx)
    assert(!codesScan.schema.fieldNames.contains("embedding"))
  }

  test("IVF-PQ build/probe: partition-pruned codes scan + decent recall") {
    val dir = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("ivfpq").toString + "/ix"
    Similarity.buildIvfPqIndex(spark, dir, idx)
    val qv = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0)
      .toArray
    // wide probing on the weakly-clustered synthetic corpus (same
    // rationale as the IVF recall gate's nprobe=10)
    val probe = Similarity.probeIvfPq(spark, idx, dir, qv, k = 10,
      nprobe = 10, excludeId = Some(0L))
    val got = probe.collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got.size == 10)
    // the codes scan must prune by cell partition AND read no vectors
    val codesScan = spark.read.parquet(idx)
    assert(!codesScan.schema.fieldNames.contains("embedding"))
    val leaves = Similarity.probeIvfPq(spark, idx, dir, qv, nprobe = 2)
      .queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(leaves.contains("PushedFilters: [In(vec_id"), leaves.take(2000))
    // recall vs exact top-10 over the same corpus (vec_id != 0)
    val all = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getAs[Long]("vec_id"),
        r.getAs[scala.collection.Seq[Float]]("embedding").toArray))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0
      var i = 0
      while (i < a.length) {
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val exact = all.filter(_._1 != 0L)
      .map { case (id, v) => (id, cos(qv, v)) }
      .sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.7, s"IVF-PQ recall $recall below 0.7: $got vs $exact")
  }

  test("IVF build/probe: partition-pruned probe matches the inline plan") {
    val dir = "/root/testdata/sf0.001"
    val idx = java.nio.file.Files.createTempDirectory("ivfidx").toString
    // lloydIters=0 keeps the raw seed quantizer, so the persisted-index
    // probe must agree bit-for-bit with the inline (oracle-checked) plan
    Similarity.buildIvfIndex(spark, dir, idx, lloydIters = 0)
    val qv = graft.Tables.embeddings(spark, dir)
      .filter(col("vec_id") === 0)
      .select("embedding").head().getAs[scala.collection.Seq[Float]](0)
      .toArray
    // excludeId drops the query's self-match before the limit, so all
    // 10 probe slots are real neighbors, directly comparable to annIvf
    // (which excludes vec_id 0 internally)
    val probe = Similarity.probeIvf(spark, idx, qv, k = 10,
      excludeId = Some(0L))
    // the cell filter must prune partitions at the scan, not post-filter
    val scan = probe.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters") && scan.contains("cell"),
      scan.take(2000))
    val got = probe.collect().map(_.getAs[Long]("vec_id")).toSet
    val want = Similarity.annIvf(spark, dir, k = 10)
      .collect().map(_.getAs[Long]("vec_id")).toSet
    assert(got.size == 10 && got == want,
      s"probe $got diverges from inline $want")
  }

  test("Lloyd-refined IVF: mean recall at equal nprobe >= seed baseline") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val base = java.nio.file.Files.createTempDirectory("ivflloyd")
    val seedIdx = base.resolve("seed").toString
    val refIdx = base.resolve("refined").toString
    // identical probe machinery on both indexes; ONLY the quantizer
    // differs, so the comparison isolates the Lloyd refinement
    Similarity.buildIvfIndex(spark, dir, seedIdx, lloydIters = 0)
    Similarity.buildIvfIndex(spark, dir, refIdx)
    val vecs = graft.Tables.embeddings(spark, dir)
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var (ab, aa, bb) = (0.0, 0.0, 0.0)
      var i = 0
      while (i < a.length) {
        ab += a(i).toDouble * b(i); aa += a(i).toDouble * a(i)
        bb += b(i).toDouble * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val queries = (0L until 5L).toSeq
    def meanRecall(idx: String, nprobe: Int): Double = queries.map { q =>
      val exact = vecs.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(vecs(q), v), id) }
        .take(10).map(_._1).toSet
      val got = Similarity.probeIvf(spark, idx, vecs(q), k = 10,
        nprobe = nprobe, excludeId = Some(q))
        .collect().map(_.getAs[Long]("vec_id")).toSet
      (exact & got).size.toDouble / exact.size
    }.sum / queries.size
    // (1) Lloyd strictly decreases the spherical quantization objective
    // (mean 1 - dot(v, centroid(cell(v)))) — the quantity it optimizes.
    // On THIS corpus (near-uniform on the sphere, no cluster structure)
    // recall at equal nprobe is statistically flat (measured: seed
    // 0.80/0.96 vs refined 0.78/0.96 at nprobe 4/10), so the recall
    // gates here are parity bounds; the strict-improvement recall claim
    // is proven on a corpus WITH structure in the next test.
    def loadCents(idx: String): Array[Array[Float]] =
      spark.read.parquet(idx + ".centroids")
        .orderBy("cell").select("embedding").as[Array[Float]].collect()
    def objective(cents: Array[Array[Float]]): Double = {
      val per = vecs.values.map { v =>
        1.0 - cos(v, cents(Similarity.argmaxCell(v, cents)))
      }
      per.sum / per.size
    }
    val (seedObj, refObj) = (objective(loadCents(seedIdx)),
      objective(loadCents(refIdx)))
    info(s"objective: seed=$seedObj refined=$refObj")
    assert(refObj < seedObj,
      s"Lloyd did not decrease the quantization objective: $refObj >= $seedObj")
    Seq(4, 10).foreach { np =>
      val (refined, seed) = (meanRecall(refIdx, np), meanRecall(seedIdx, np))
      info(s"nprobe=$np: refined=$refined seed=$seed")
      assert(refined >= seed - 0.06,
        s"nprobe=$np: refined mean recall $refined fell below seed $seed")
      if (np == 10) assert(refined >= 0.9,
        s"refined recall $refined below 0.9 at nprobe=10")
    }
    // (2) refined centroids are unit-norm (spherical k-means invariant)
    loadCents(refIdx).foreach { c =>
      val n = math.sqrt(c.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-3, s"centroid norm $n drifted from 1")
    }
    // (3) emb_cluster_stats_lloyd pin: on this (near-uniform) corpus
    // Lloyd equalizes the Voronoi cells, so the refined balance report
    // must be strictly more balanced than the raw seeds'. (On a
    // CLUSTERED corpus count-balance can legitimately worsen while
    // recall improves — centroids snap to whole clusters of unequal
    // mass — so the balance pin lives here, the recall pin there.)
    // Imbalance = variance of per-cell counts over ALL nlist cells.
    def imbalance(df: org.apache.spark.sql.DataFrame): Double = {
      val byCell = df.collect()
        .map(r => r.getAs[Long]("cell") -> r.getAs[Long]("n_vectors")).toMap
      val counts = (0 until 16).map(c => byCell.getOrElse(c.toLong, 0L))
      val mean = counts.sum.toDouble / 16
      counts.map(n => (n - mean) * (n - mean)).sum / 16
    }
    val seedImb = imbalance(Similarity.clusterStats(spark, dir))
    val refImb = imbalance(Similarity.clusterStatsLloyd(spark, dir))
    info(s"cell-count variance: seed=$seedImb refined=$refImb")
    assert(refImb < seedImb,
      s"refined quantizer not more balanced: $refImb >= $seedImb")
  }

  test("Lloyd-refined IVF strictly beats seeds on clustered data") {
    import spark.implicits._
    // 16 well-separated clusters, 30 points each; data ordered so that
    // seed vectors (vec_id 1..16) fall in only the FIRST 8 clusters —
    // the classic bad-quantizer regime (each seeded cluster split
    // between two cells, each unseeded cluster absorbed wholesale).
    // Lloyd migrates the duplicated seeds onto the unseeded mass, so at
    // nprobe=1 the refined index probes the query's whole cluster while
    // the seed index sees only half of a split cluster.
    val dim = 64
    val rnd = new scala.util.Random(41)
    def unit(v: Array[Double]): Array[Float] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val centers = Array.fill(16)(unit(Array.fill(dim)(rnd.nextGaussian())))
    val rows = (0 until 480).map { i =>
      val c = if (i < 240) i % 8 else 8 + (i % 8)
      val noise = Array.fill(dim)(rnd.nextGaussian() * 0.05)
      val v = unit(centers(c).map(_.toDouble).zip(noise).map { case (a, b) => a + b })
      (i.toLong, v, c)
    }
    val base = java.nio.file.Files.createTempDirectory("ivfclustered")
    rows.toDF("vec_id", "embedding", "label")
      .repartition(4).write.parquet(base.resolve("embeddings.parquet").toString)
    val dirC = base.toString
    val seedIdx = base.resolve("seed").toString
    val refIdx = base.resolve("refined").toString
    Similarity.buildIvfIndex(spark, dirC, seedIdx, lloydIters = 0)
    Similarity.buildIvfIndex(spark, dirC, refIdx)
    val byId = rows.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var ab = 0.0; var i = 0
      while (i < a.length) { ab += a(i).toDouble * b(i); i += 1 }
      ab // all vectors unit-norm
    }
    val queries = (17L to 470L by 31L).toSeq // spans all 16 clusters
    def meanRecall(idx: String): Double = queries.map { q =>
      val exact = byId.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(byId(q), v), id) }
        .take(10).map(_._1).toSet
      val got = Similarity.probeIvf(spark, idx, byId(q), k = 10,
        nprobe = 1, excludeId = Some(q))
        .collect().map(_.getAs[Long]("vec_id")).toSet
      (exact & got).size.toDouble / exact.size
    }.sum / queries.size
    val (refined, seed) = (meanRecall(refIdx), meanRecall(seedIdx))
    info(s"clustered corpus, nprobe=1: refined=$refined seed=$seed")
    assert(refined > seed,
      s"refined recall $refined not strictly above seed $seed")
    assert(refined >= 0.9, s"refined recall $refined below 0.9")

    // recall gates for the OTHER two index families on the same
    // clustered corpus (the sf0.001 gates cover the near-uniform
    // regime; cluster structure is the regime LSH banding and PQ
    // codes can actually exploit or break on)
    def recallOf(got: Set[Long], q: Long): Double = {
      val exact = byId.toSeq.filter(_._1 != q)
        .sortBy { case (id, v) => (-cos(byId(q), v), id) }
        .take(10).map(_._1).toSet
      (exact & got).size.toDouble / exact.size
    }
    val pqIdx = base.resolve("pq").toString
    Similarity.buildPqIndex(spark, dirC, pqIdx)
    val pqRecall = queries.map { q =>
      recallOf(Similarity.probePq(spark, pqIdx, dirC, byId(q), k = 10,
        excludeId = Some(q)).collect().map(_.getAs[Long]("vec_id")).toSet, q)
    }.sum / queries.size
    info(s"clustered corpus: PQ recall=$pqRecall (shortlist=50)")
    assert(pqRecall >= 0.8, s"PQ recall $pqRecall below 0.8 on clustered data")
    val lshDir = base.resolve("lsh").toString
    Similarity.buildMllibLsh(spark, dirC, lshDir)
    val lshRecall = recallOf(
      Similarity.probeMllibLsh(spark, dirC, lshDir, k = 10)
        .collect().map(_.getAs[Long]("vec_id")).toSet, 0L)
    info(s"clustered corpus: MLlib LSH recall (query 0)=$lshRecall " +
      "(4 hash tables)")
    assert(lshRecall >= 0.8,
      s"LSH recall $lshRecall below 0.8 on clustered data")
  }

  test("streaming ingest: pages chunk+embed per micro-batch, parity with batch chunker") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("ingeststream")
    val in = base.resolve("in").toString
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    new java.io.File(in).mkdirs()
    def stage(name: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("url", "content").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    // a page long enough to produce MULTIPLE chunks through the real
    // 4000/600/10% chunker, plus a short one
    val longMd = (1 to 3).map { s =>
      s"# Section $s\n\n" + (s"words for section $s. " * 300)
    }.mkString("\n")
    stage("b1", Seq("doc://long" -> longMd, "doc://short" -> "# T\n\nbody"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = EventStream.ingestStream(stream, store, ckpt)
    try {
      q.processAllAvailable()
      val v1 = ChunkStore.readLatest(spark, store).get
      // parity: streamed chunk ids == the batch chunker's on the same page
      val streamedIds = v1.filter(col("url") === "doc://long")
        .select("chunk_id").collect().map(_.getString(0)).toSet
      val batchIds = Chunker
        .chunkMarkdown(longMd, "stream", "v1", "doc://long")
        .map(_.chunk_id).toSet
      assert(streamedIds == batchIds && streamedIds.size > 1,
        s"stream/batch chunk divergence: $streamedIds vs $batchIds")
      // embeddings are real (unit-norm, non-empty)
      v1.select("embedding").collect().foreach { r =>
        val e = r.getSeq[Float](0)
        assert(e.nonEmpty && math.abs(
          math.sqrt(e.map(x => x.toDouble * x).sum) - 1.0) < 1e-3)
      }
      // update the long page -> its chunks are replaced, short untouched
      stage("b2", Seq("doc://long" -> (longMd + "\n\nnew tail words")))
      q.processAllAvailable()
      val v2 = ChunkStore.readLatest(spark, store).get
      val longIds2 = v2.filter(col("url") === "doc://long")
        .select("chunk_id").collect().map(_.getString(0)).toSet
      assert(longIds2 != streamedIds, "updated page must re-chunk")
      assert(v2.filter(col("url") === "doc://short").count() ==
        v1.filter(col("url") === "doc://short").count())
    } finally q.stop()
  }

  test("streaming upsert sink: micro-batches merge into the versioned store") {
    import spark.implicits._
    import graft.sources.ChunkStore
    val base = java.nio.file.Files.createTempDirectory("upsink")
    val in = base.resolve("in").toString
    val store = base.resolve("store").toString
    val ckpt = base.resolve("ckpt").toString
    new java.io.File(in).mkdirs()
    def stage(name: String, rows: Seq[(String, String)]): Unit =
      rows.toDF("url", "content").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    // batch 1: two documents
    stage("b1", Seq("doc://a" -> "a1", "doc://b" -> "b1"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = EventStream.upsertStream(stream, store, ckpt)
    try {
      q.processAllAvailable()
      assert(ChunkStore.readLatest(spark, store).get.count() == 2)
      // batch 2: doc a updated, doc c new -> store merges to 3 urls
      stage("b2", Seq("doc://a" -> "a2", "doc://c" -> "c1"))
      q.processAllAvailable()
      val after = ChunkStore.readLatest(spark, store).get
        .orderBy("url").collect().map(r => (r.getString(0), r.getString(1)))
      assert(after.toSeq == Seq("doc://a" -> "a2", "doc://b" -> "b1",
        "doc://c" -> "c1"))
      assert(ChunkStore.latestVersion(store) >= 1)
    } finally q.stop()
  }

  test("streaming delete sink: tombstones purge across micro-batches; " +
      "redelivery converges") {
    import spark.implicits._
    import graft.sources.ChunkStore
    val base = java.nio.file.Files.createTempDirectory("delsink")
    val store = base.resolve("store").toString
    val tomb = base.resolve("tomb").toString
    new java.io.File(tomb).mkdirs()
    // seed store: 4 urls
    ChunkStore.upsertVersioned(spark, store,
      Seq("doc://a" -> "a1", "doc://b" -> "b1", "doc://c" -> "c1",
        "doc://d" -> "d1").toDF("url", "content"))
    def stageTomb(name: String, urls: Seq[String]): Unit =
      urls.toDF("url").coalesce(1)
        .write.mode("overwrite").parquet(s"$tomb/$name")
    // two micro-batches: one hits stored urls, one is all-absent (404
    // for something never stored — must be a no-op, not a crash)
    stageTomb("t1", Seq("doc://b", "doc://d"))
    stageTomb("t2", Seq("doc://nope"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType)))
    def runOnce(ckpt: String): Unit = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(s"$tomb/*")
      val q = EventStream.deleteStream(stream, store, ckpt)
      try q.processAllAvailable() finally q.stop()
    }
    runOnce(base.resolve("ck1").toString)
    val survivors = ChunkStore.readLatest(spark, store).get
      .orderBy("url").collect().map(_.getString(0)).toSeq
    assert(survivors == Seq("doc://a", "doc://c"), survivors)
    // at-least-once REDELIVERY: the same tombstones through a fresh
    // checkpoint (as after a checkpoint loss) must converge to the
    // same survivor set — deletes are idempotent per url set, and a
    // batch whose urls match NOTHING in the store mints no version
    // (the no-op probe), so redelivery cannot grow storage either
    val vBefore = ChunkStore.latestVersion(store)
    runOnce(base.resolve("ck2").toString)
    val again = ChunkStore.readLatest(spark, store).get
      .orderBy("url").collect().map(_.getString(0)).toSeq
    assert(again == survivors, s"redelivery diverged: $again")
    assert(ChunkStore.latestVersion(store) == vBefore,
      "no-op redelivery minted a store version")
    // an EMPTY store never mints a version from deletes
    val empty = base.resolve("store2").toString
    val stream2 = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$tomb/*")
    val q2 = EventStream.deleteStream(stream2, empty,
      base.resolve("ck3").toString)
    try q2.processAllAvailable() finally q2.stop()
    assert(ChunkStore.latestVersion(empty) == -1L)
    // an EMPTY micro-batch (0-row tombstone file) and a long-running
    // 404 stream of absent urls both leave storage untouched
    val vQuiet = ChunkStore.latestVersion(store)
    stageTomb("t3", Seq.empty[String])
    runOnce(base.resolve("ck4").toString) // replays t1,t2 + empty t3
    assert(ChunkStore.latestVersion(store) == vQuiet,
      "no-op / empty micro-batches minted store versions")
    // a batch that mixes a live url with absent ones still purges
    stageTomb("t4", Seq("doc://c", "doc://gone"))
    runOnce(base.resolve("ck5").toString)
    val afterMix = ChunkStore.readLatest(spark, store).get
      .orderBy("url").collect().map(_.getString(0)).toSeq
    assert(afterMix == Seq("doc://a"), afterMix)
    assert(ChunkStore.latestVersion(store) == vQuiet + 1)
  }

  test("streaming embed-skip reuses stored embeddings by chunk id") {
    import spark.implicits._
    // the stored embedding is a SENTINEL no real embedder would emit:
    // seeing it in the output proves the value was reused, not
    // recomputed (chunk ids are content hashes, so id equality ⇒
    // identical content ⇒ reuse is sound)
    val stored = Seq(("c1", Array(9f, 9f))).toDF("chunk_id", "embedding")
    val chunks = Seq(
      ("u", "c1", 0, 2, "s", "text one"),
      ("u", "c2", 1, 2, "s", "text two"))
      .toDF("url", "chunk_id", "chunk_index", "total_chunks",
        "section", "content")
    val out = graft.streaming.EventStream
      .embedWithReuse(chunks, Some(stored))
      .collect().map(r => r.getString(1) ->
        ((r.getSeq[Float](6).toSeq, r.getBoolean(7)))).toMap
    val (e1, r1) = out("c1")
    assert(r1 && e1 == Seq(9f, 9f), s"c1 not reused: $e1")
    val (e2, r2) = out("c2")
    assert(!r2 && e2 ==
      graft.functions.Embedder.embed("text two").toSeq,
      "c2 must be freshly embedded")
    // no store yet → everything embeds fresh
    val cold = graft.streaming.EventStream
      .embedWithReuse(chunks, None).collect()
    assert(cold.forall(!_.getBoolean(7)))
  }

  test("streaming sinks with vacuumKeepLast bound store growth") {
    import spark.implicits._
    import graft.sources.ChunkStore
    val base = java.nio.file.Files.createTempDirectory("vacsink")
    val in = base.resolve("in").toString
    val store = base.resolve("store").toString
    new java.io.File(in).mkdirs()
    (1 to 5).foreach { b =>
      Seq(s"doc://$b" -> s"# T$b\n\nbody $b").toDF("url", "content")
        .coalesce(1).write.parquet(s"$in/b$b")
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("url",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("content",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$in/*")
    val q = EventStream.ingestStream(stream, store,
      base.resolve("ckpt").toString, vacuumKeepLast = Some(2))
    try q.processAllAvailable() finally q.stop()
    // 5 micro-batches minted 5 versions; retention kept the newest 2
    val versions = Option(new java.io.File(store).listFiles()).get
      .filter(f => f.isDirectory && f.getName.matches("v\\d+"))
      .map(_.getName).sorted.toSeq
    assert(versions == Seq("v3", "v4"), versions.toString)
    // the surviving latest version holds all 5 documents
    assert(ChunkStore.readLatest(spark, store).get
      .select("url").distinct().count() == 5)
  }

  test("stream-stream interval join matches the batch interval join") {
    val tmp = java.nio.file.Files.createTempDirectory("evjoin").toString
    val slice = Tables.events(spark, "/root/testdata/sf0.001").limit(600)
    slice.coalesce(1).write.mode("overwrite").parquet(tmp)
    val q = EventStream.clickErrorJoin(EventStream.readEvents(spark, tmp))
      .writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ss_join").count()
      val clicks = slice.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"),
          col("ts").as("click_ts"))
      val errors = slice.filter(col("event_type") === "error")
        .select(col("user_id").as("err_user"), col("ts").as("err_ts"))
      val batch = clicks.join(errors,
        col("user_id") === col("err_user") &&
          col("err_ts") >= col("click_ts") - expr("INTERVAL 1 HOUR") &&
          col("err_ts") < col("click_ts")).count()
      assert(streamed == batch && batch > 0)
    } finally q.stop()
  }

  test("streaming dedup within watermark drops re-delivered events") {
    val tmp = java.nio.file.Files.createTempDirectory("evdup").toString
    val slice = Tables.events(spark, "/root/testdata/sf0.001").limit(300)
    // every event delivered twice (the at-least-once re-delivery case)
    slice.unionAll(slice).coalesce(1).write.mode("overwrite").parquet(tmp)
    val q = EventStream.dedupWithinWatermark(
        EventStream.readEvents(spark, tmp))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("dedup_stream").count() == slice.count())
    } finally q.stop()
  }

  test("collection and sqlite-path routing") {
    import graft.sources.ChunkStore
    assert(ChunkStore.collectionName("My Product", "2.1") ==
      "my_product_2.1")
    assert(ChunkStore.sqliteDbName("My Product", "2.1") ==
      "My_Product-2.1.db")
  }

  test("multimodal binary pipeline: metadata + batched feature extraction") {
    import spark.implicits._
    // a real PNG header (IHDR 640x480 truecolor) rides the decode path;
    // headerless payloads fall back to the deterministic stub
    val realPng = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, 0, 0, 0x01, 0xe0, 8, 2, 0, 0, 0).map(_.toByte)
    val binaries = Seq(
      ("img/a.png", "image/png", "fake-png-bytes-a".getBytes("UTF-8")),
      ("img/real.png", "image/png", realPng),
      ("img/b.png", "image/png", "fake-png-bytes-bb".getBytes("UTF-8")),
      ("aud/c.wav", "audio/wav", "fake-wav-bytes-ccc".getBytes("UTF-8")))
      .toDF("path", "mime", "content")
    val out = Multimodal.extractFeatures(spark, binaries).collect()
    assert(out.length == 4)
    val real = out.find(_.getString(0) == "img/real.png").get
    assert(real.getInt(4) == 640 && real.getInt(5) == 480 &&
      real.getInt(6) == 3) // decoded from the IHDR, not the stub
    val row = out.find(_.getString(0) == "img/a.png").get
    assert(row.getLong(2) == 16L) // n_bytes
    assert(row.getInt(4) >= 64 && row.getInt(5) >= 64) // stub dims
    assert(row.getSeq[Float](7).length == Multimodal.FeatureDim)
    // deterministic: same bytes → same features
    val again = Multimodal.extractFeatures(spark, binaries).collect()
      .find(_.getString(0) == "img/a.png").get
    assert(row.getSeq[Float](7) == again.getSeq[Float](7))
  }

  test("multimodal resize and frame sampling shapes") {
    import spark.implicits._
    val binaries = Seq(
      ("img/a.png", "image/png", Array.fill[Byte](600)(3)),
      ("vid/b.mp4", "video/mp4", Array.fill[Byte](25600)(7)))
      .toDF("path", "mime", "content")
    val resized = Multimodal.resizeImages(spark, binaries).collect()
    assert(resized.length == 2)
    val r = resized.find(_.getString(0) == "img/a.png").get
    assert(r.getInt(2) == 224 && r.getInt(3) == 224)
    assert(r.getString(4).length == 64) // sha of the resized payload
    // video: 25600/256 = 100 stub frames, every 30th -> frames 0,30,60,90
    val frames = Multimodal.sampleFrames(spark,
        binaries.filter($"path".startsWith("vid/")))
      .orderBy("frame_idx").collect()
    assert(frames.map(_.getLong(1)).toSeq == Seq(0L, 30L, 60L, 90L))
    assert(frames.map(_.getLong(2)).toSeq == Seq(0L, 1000L, 2000L, 3000L))
  }

  test("multimodal feature diagnostics pin the accumulator kernel") {
    import spark.implicits._
    // bytes at stride 16 of "abc…": only index 0 ('a'=97) and 16 ('q'=113)
    val payload = ('a' to 'z').mkString.getBytes("UTF-8") // 26 bytes
    val acc = Multimodal.featureAccum(payload)
    assert(acc(97 * 31 % 32) == 1L && acc(113 * 31 % 32) == 1L) // both odd
    val binaries = Seq(("p/x", "application/octet-stream", payload))
      .toDF("path", "mime", "content")
    val diag = Multimodal.featureDiagnostics(spark, binaries).collect()
    assert(diag.length == 1)
    val d = diag.head
    assert(d.getLong(1) == 2L) // ceil(26/16) samples
    assert(d.getLong(2) == acc.count(_ != 0).toLong)
    assert(d.getLong(3) ==
      acc.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum)
    // float path still normalizes the same accumulator
    val feats = Multimodal.featuresStub(payload)
    assert(feats.length == Multimodal.FeatureDim)
    assert(math.abs(feats.map(f => f.toDouble * f).sum - 1.0) < 1e-6)
  }

  test("multimodal query rows run over the documents-as-binaries corpus") {
    val dir = "/root/testdata/sf0.001"
    val resize = graft.operators.DocPipeline.mediaResize(spark, dir).collect()
    assert(resize.nonEmpty)
    assert(resize.forall(r => r.getInt(2) == 224 && r.getInt(3) == 224 &&
      r.getString(4).length == 64))
    val frames = graft.operators.DocPipeline.frameSample(spark, dir)
    val perDoc = frames.groupBy("path").count().collect()
    assert(perDoc.nonEmpty && perDoc.forall(_.getLong(1) >= 1L))
    val feat = graft.operators.DocPipeline.mediaFeatures(spark, dir).collect()
    assert(feat.nonEmpty && feat.forall(r => r.getLong(1) >= 1L))
  }
}
