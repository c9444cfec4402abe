package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sitemap XML parsing (reference `parseSitemap`,
  * content-processor.ts:277-319): extract `<url><loc>/<lastmod>` entries
  * from standard sitemaps and recurse through `<sitemap><loc>` links in
  * sitemap indexes. Offline build → a regex scan instead of an XML
  * library (the reference uses cheerio in xmlMode; the grammar needed
  * here is the fixed sitemap-protocol element set).
  *
  * Scale design: the sitemap TREE is a small dimension (thousands of
  * files), so the frontier of not-yet-parsed sitemap urls iterates on
  * the driver and broadcasts into each join — while the URL ENTRIES
  * (potentially billions of `<url>` rows at 100 TB) stay distributed:
  * one flatMap over staged XML bodies per recursion level, no shuffle
  * until the final per-url override resolution.
  */
object Sitemap {

  private val urlBlock = "(?s)<url\\b[^>]*>(.*?)</url>".r
  private val sitemapBlock = "(?s)<sitemap\\b[^>]*>(.*?)</sitemap>".r
  private val locRe = "(?s)<loc>(.*?)</loc>".r
  private val lastmodRe = "(?s)<lastmod>(.*?)</lastmod>".r

  /** `<url>` entries of one sitemap document: (loc, lastmod?). Empty
    * loc entries are dropped; blank lastmod → None (reference: `||
    * undefined`). */
  def parseUrls(xml: String): Seq[(String, Option[String])] =
    urlBlock.findAllMatchIn(xml).flatMap { m =>
      val body = m.group(1)
      locRe.findFirstMatchIn(body).map(_.group(1).trim).filter(_.nonEmpty)
        .map { loc =>
          (loc, lastmodRe.findFirstMatchIn(body).map(_.group(1).trim)
            .filter(_.nonEmpty))
        }
    }.toSeq

  /** Nested sitemap links (`<sitemap><loc>`) of a sitemap index. */
  def parseNested(xml: String): Seq[String] =
    sitemapBlock.findAllMatchIn(xml).flatMap { m =>
      locRe.findFirstMatchIn(m.group(1)).map(_.group(1).trim)
        .filter(_.nonEmpty)
    }.toSeq

  /** Resolve a sitemap tree from `seed` over staged sitemap documents
    * `(sitemap_url, xml)` → (url, lastmod, sitemap_url, depth).
    *
    * The reference recursion overwrites parent entries with nested ones
    * (`urlMap.set` in document order); the set-oriented analog keeps,
    * per url, the row from the deepest sitemap (tie-break: greatest
    * sitemap_url) — deterministic regardless of partitioning. */
  def resolve(s: SparkSession, staged: DataFrame, seed: String,
      maxDepth: Int = 10): DataFrame = {
    import s.implicits._
    var frontier = Seq(seed)
    var visited = Set(seed)
    var entries: Option[DataFrame] = None
    var depth = 0
    while (frontier.nonEmpty && depth < maxDepth) {
      val frontierDf = frontier.toDF("sitemap_url")
      val batch = staged.join(broadcast(frontierDf), "sitemap_url")
        .select("sitemap_url", "xml").as[(String, String)]
      val parsed = batch.flatMap { case (su, xml) =>
          parseUrls(xml).map { case (loc, lm) =>
            ("url", loc, lm.orNull, su)
          } ++ parseNested(xml).map(n => ("nested", n, null: String, su))
        }
        .toDF("kind", "loc", "lastmod", "sitemap_url")
        .localCheckpoint(true) // consumed twice: url rows + nested links
      val urls = parsed.filter(col("kind") === "url")
        .select(col("loc").as("url"), col("lastmod"), col("sitemap_url"),
          lit(depth.toLong).as("depth"))
      entries = Some(entries.fold(urls)(_.unionByName(urls)))
      // the nested-sitemap list is the small dimension of the recursion:
      // collecting it driver-side is the broadcast-the-dim pattern, the
      // url entries above never leave the executors
      val nested = parsed.filter(col("kind") === "nested")
        .select("loc").distinct().as[String].collect().toSeq
      frontier = nested.filterNot(visited)
      visited ++= frontier
      depth += 1
    }
    val all = entries.getOrElse(
      Seq.empty[(String, String, String, Long)]
        .toDF("url", "lastmod", "sitemap_url", "depth"))
    val w = Window.partitionBy(col("url"))
      .orderBy(col("depth").desc, col("sitemap_url").desc)
    all.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("url", "lastmod", "sitemap_url", "depth")
  }
}
