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
}
