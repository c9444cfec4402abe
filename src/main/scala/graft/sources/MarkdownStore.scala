package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Markdown page store (SURVEY.md §2.6; reference markdown-store.ts:
  * 48-99): the raw-markdown copy of every crawled page, keyed by url —
  * `INSERT … ON CONFLICT (url) DO UPDATE` becomes replace-by-url;
  * 404 pages are deleted. Schema: (url PK, product_name, markdown,
  * updated_at). */
object MarkdownStore {

  /** Upsert: incoming pages replace stored pages with the same url. */
  def upsert(stored: DataFrame, incoming: DataFrame): DataFrame =
    stored.join(incoming.select("url").distinct(), Seq("url"), "left_anti")
      .unionByName(incoming)

  /** 404 cleanup: drop pages whose url is in the not-found set
    * (reference: delete on 404, markdown-store.ts:94-99). */
  def deleteNotFound(stored: DataFrame, notFoundUrls: DataFrame): DataFrame =
    stored.join(notFoundUrls.select("url").distinct(), Seq("url"),
      "left_anti")

  /** The store's whole write path as one oracle row (markdown-store.ts:
    * 79-99): a stored generation of pages [[upsert]]ed with an incoming
    * crawl batch — replace-by-url for overlapping urls, plain insert
    * for new ones — then [[deleteNotFound]] purges the 404 set. Staged
    * deterministically: stored = `v1` pages for 4 of every 5 docs,
    * incoming = `v2` pages for every 3rd doc, 404s = every 13th url.
    * A url present in both generations MUST come out `v2`; a 404 url
    * must be gone even when the incoming batch just rewrote it.
    *
    * Scale: two url-keyed anti-joins + a union — the store is only
    * ever touched per-url, never rewritten wholesale. */
  def upsertQuery(s: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.documents(s, dir)
    val stored = docs.filter(col("doc_id") % 5 =!= 4).select(
      concat(lit("doc://"), col("doc_id")).as("url"),
      concat(lit("v1:"), substring(col("text"), 1, 24)).as("markdown"))
    val incoming = docs.filter(col("doc_id") % 3 === 0).select(
      concat(lit("doc://"), col("doc_id")).as("url"),
      concat(lit("v2:"), substring(col("text"), 1, 24)).as("markdown"))
    val notFound = docs.filter(col("doc_id") % 13 === 0).select(
      concat(lit("doc://"), col("doc_id")).as("url"))
    deleteNotFound(upsert(stored, incoming), notFound).orderBy("url")
  }
}
