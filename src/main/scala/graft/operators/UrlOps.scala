package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** URL/string transform cascade (reference §2.4: product-id extraction T1
  * at /root/reference/data_pipeline/scrapers/any_scraper.py:161-196,
  * high-res rewrite T2 at :224-265, URL parse T5, image-hash T3
  * at :198-222). The testdata has no URL column, so the operator derives a
  * deterministic URL per part row and then runs the real cascade over it —
  * the transforms are the operators under test, the synthesis is just
  * input plumbing (both engines synthesize identically).
  */
object UrlOps {

  /** Deterministic synthetic product URL per part row: three site shapes
    * driven by partkey modulo, echoing Amazon /dp/, Zalando .html and
    * generic path-segment forms.
    */
  def syntheticUrl(partkey: Column, name: Column): Column = {
    val slug = regexp_replace(name, " ", "-")
    when(partkey % 3 === 0,
        concat(lit("https://amazon.example.com/dp/B"),
          lpad(partkey.cast("string"), 9, "0"), lit("?ref=sr_1_1")))
      .when(partkey % 3 === 1,
        concat(lit("https://zalando.example.com/"), slug, lit("-"),
          partkey.cast("string"), lit(".html?size=M")))
      .otherwise(
        concat(lit("https://shop.example.com/p/"), slug, lit("/"),
          partkey.cast("string"), lit("/thumb_300x400.jpg")))
  }

  val syntheticUrlSql: String =
    """CASE WHEN p_partkey % 3 = 0 THEN
      |  'https://amazon.example.com/dp/B' || lpad(CAST(p_partkey AS VARCHAR), 9, '0') || '?ref=sr_1_1'
      |WHEN p_partkey % 3 = 1 THEN
      |  'https://zalando.example.com/' || regexp_replace(p_name, ' ', '-', 'g') || '-' || CAST(p_partkey AS VARCHAR) || '.html?size=M'
      |ELSE
      |  'https://shop.example.com/p/' || regexp_replace(p_name, ' ', '-', 'g') || '/' || CAST(p_partkey AS VARCHAR) || '/thumb_300x400.jpg'
      |END""".stripMargin

  /** T1 multi-pattern product-id cascade with md5 fallback. */
  def productId(url: Column): Column =
    coalesce(
      nullif(regexp_extract(url, "/dp/([A-Z0-9]{10})", 1), lit("")),
      nullif(regexp_extract(url, "([a-z0-9\\-]+)\\.html", 1), lit("")),
      nullif(regexp_extract(url, "/p/[^/]+/([0-9]+)/", 1), lit("")),
      md5(url))

  /** T2 high-res rewrite: strip thumbnail markers + query strings. */
  def highResUrl(url: Column): Column =
    regexp_replace(regexp_replace(url, "thumb_[0-9]+x[0-9]+", "full"),
      "\\?.*$", "")

  /** T5 host extraction. */
  def host(url: Column): Column = parse_url(url, lit("HOST"))

  def urlFeatures(part: DataFrame): DataFrame = {
    import part.sparkSession.implicits._
    part
      .select($"p_partkey", syntheticUrl($"p_partkey", $"p_name").as("url"))
      .select(
        $"p_partkey", $"url",
        productId($"url").as("product_id"),
        highResUrl($"url").as("hi_res"),
        host($"url").as("host"))
      .withColumn("same_domain", $"host" === "zalando.example.com")
  }

  type Q = (SparkSession, String) => DataFrame

  def queries: Map[String, Q] = Map(
    "q40_url_transforms" -> ((s, d) => urlFeatures(Tables.load(s, d).part))
  )

  def oracles: Map[String, String] = Map(
    "q40_url_transforms" ->
      s"""WITH u AS (SELECT p_partkey, $syntheticUrlSql AS url FROM part)
         |SELECT p_partkey, url,
         |  COALESCE(
         |    NULLIF(regexp_extract(url, '/dp/([A-Z0-9]{10})', 1), ''),
         |    NULLIF(regexp_extract(url, '([a-z0-9\\-]+)\\.html', 1), ''),
         |    NULLIF(regexp_extract(url, '/p/[^/]+/([0-9]+)/', 1), ''),
         |    md5(url)) AS product_id,
         |  regexp_replace(regexp_replace(url, 'thumb_[0-9]+x[0-9]+', 'full', 'g'),
         |    '\\?.*$$', '', 'g') AS hi_res,
         |  regexp_extract(url, '^https?://([^/]+)', 1) AS host,
         |  regexp_extract(url, '^https?://([^/]+)', 1) = 'zalando.example.com' AS same_domain
         |FROM u""".stripMargin
  )
}
