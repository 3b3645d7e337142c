package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The Raw→Formatted (Bronze→Silver) normalization stage — the reference's
  * `format_data` job (`scripts/formatting/format_to_parquet.py`) rebuilt
  * Spark-first:
  *
  *  - S1: multiLine JSON array scan over ALL date partitions via glob —
  *    but with an EXPLICIT schema (the reference lets Spark infer and then
  *    re-casts, `format_to_parquet.py:65-75`; inference costs an extra eager
  *    scan job and is non-deterministic under schema drift, SURVEY §1.4).
  *  - P1: type assertion casts (OHLC→double, volume/market_cap→long).
  *  - F1: string timestamps → real UTC TimestampType columns.
  *  - P3: news filtered to pub_date_utc ≥ 2020-01-01
  *    (`format_to_parquet.py:141`).
  *  - S4: full-refresh parquet sink — plain `overwrite` (the reference's
  *    rmtree+append is a WSL2 workaround, SURVEY §1.5), partitioned where a
  *    downstream benefits from pruning.
  */
object Format {

  val stocksSchema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("date", StringType),
    StructField("open", DoubleType), StructField("high", DoubleType),
    StructField("low", DoubleType), StructField("close", DoubleType),
    StructField("volume", LongType), StructField("fetched_at", StringType)))

  val companySchema: StructType = StructType(Seq(
    StructField("symbol", StringType), StructField("name", StringType),
    StructField("sector", StringType), StructField("industry", StringType),
    StructField("country", StringType), StructField("market_cap", LongType),
    StructField("currency", StringType), StructField("fetched_at", StringType)))

  val newsSchema: StructType = StructType(Seq(
    StructField("id", StringType), StructField("symbol", StringType),
    StructField("title", StringType), StructField("summary", StringType),
    StructField("pub_date", StringType), StructField("provider", StringType),
    StructField("url", StringType), StructField("category", StringType),
    StructField("image", StringType), StructField("sentiment_score", DoubleType),
    StructField("sentiment_label", StringType), StructField("fetched_at", StringType)))

  private def readRaw(spark: SparkSession, glob: String, schema: StructType): DataFrame =
    spark.read
      .option("multiLine", "true") // raw files are pretty-printed JSON ARRAYS
      .schema(schema)
      .json(glob)

  /** stocks: casts are asserted by the explicit schema; adds typed date and
    * UTC fetched_at (`format_to_parquet.py:68-75`). */
  def formatStocks(spark: SparkSession, rawDir: String): DataFrame =
    readRaw(spark, s"$rawDir/yahoo/stocks/*/stocks.json", stocksSchema)
      .withColumn("date_d", to_date(col("date"), "yyyy-MM-dd"))
      .withColumn("fetched_at_utc", to_timestamp(col("fetched_at")))
      .drop("fetched_at")

  /** company_info (`format_to_parquet.py:104-107`). */
  def formatCompany(spark: SparkSession, rawDir: String): DataFrame =
    readRaw(spark, s"$rawDir/yahoo/company_info/*/company_info.json", companySchema)
      .withColumn("fetched_at_utc", to_timestamp(col("fetched_at")))
      .drop("fetched_at")

  /** news: UTC timestamps + the ≥2020 filter + duplicate-id drop (U2,
    * `finnhub_news.py:176-188` does the dedup at ingestion; we push it here
    * so the formatted layer is clean regardless of source behavior).
    * Deterministic winner per id via row_number: latest pub/fetch first,
    * then EVERY remaining column as an ascending tie-break so the order is
    * TOTAL — with only the timestamps, two re-fetch variants tying on both
    * would leave the winner to engine whim, and the r17 cross-engine
    * oracle would flap (today's duplicate fixture rows are byte-identical,
    * but the determinism must not rest on that staying true). */
  def formatNews(spark: SparkSession, rawDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("id").orderBy(
      col("pub_date_utc").desc, col("fetched_at_utc").desc,
      col("symbol").asc, col("title").asc, col("summary").asc,
      col("provider").asc, col("url").asc, col("category").asc,
      col("image").asc, col("sentiment_score").asc, col("sentiment_label").asc)
    readRaw(spark, s"$rawDir/finnhub/news/*/news.json", newsSchema)
      .withColumn("pub_date_utc", to_timestamp(col("pub_date")))
      .withColumn("fetched_at_utc", to_timestamp(col("fetched_at")))
      .filter(col("pub_date_utc") >= lit("2020-01-01 00:00:00").cast("timestamp"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "pub_date", "fetched_at")
  }

  /** Run the full stage: write the three formatted tables as parquet.
    * stocks is partitioned by symbol — the access pattern downstream
    * (per-symbol forecast, per-symbol drill-down) prunes on it. */
  def run(spark: SparkSession, rawDir: String, outDir: String): Unit = {
    formatStocks(spark, rawDir)
      .write.mode("overwrite").partitionBy("symbol").parquet(s"$outDir/stocks")
    formatCompany(spark, rawDir)
      .write.mode("overwrite").parquet(s"$outDir/company_info")
    formatNews(spark, rawDir)
      .write.mode("overwrite").parquet(s"$outDir/news")
  }

  /** The reference's Gold combine (`combine_sources.py:45-131`) on the
    * formatted finance tables (the true-schema twin of
    * `Combine.enrichedOrders`, which runs the same plan shape on the
    * driver's star schema). */
  def combine(spark: SparkSession, formattedDir: String): DataFrame =
    combineFrames(
      spark.read.parquet(s"$formattedDir/stocks"),
      spark.read.parquet(s"$formattedDir/company_info"),
      spark.read.parquet(s"$formattedDir/news"))

  def combineFrames(stocks: DataFrame, companyInfo: DataFrame,
      news: DataFrame): DataFrame = {
    val company = companyInfo
      .select("symbol", "name", "sector", "industry", "market_cap")
    val newsAgg = news
      .groupBy("symbol")
      .agg(count(lit(1)).as("news_count"), max("pub_date_utc").as("latest_news_date"))
    stocks
      .join(broadcast(company), Seq("symbol"), "left")
      .join(newsAgg, Seq("symbol"), "left")
      .withColumn("daily_range", col("high") - col("low"))
      .withColumn("daily_change_pct",
        (col("close") - col("open")) / nullif(col("open"), lit(0.0)) * 100)
      .select("symbol", "name", "sector", "industry", "date", "open", "high",
        "low", "close", "volume", "market_cap", "daily_range",
        "daily_change_pct", "news_count", "latest_news_date", "fetched_at_utc")
  }

  /** Whole Bronze→Gold pipeline as a registered query: deterministic raw
    * JSON fixtures → multiLine JSON scan (S1) → format → combine. The sfDir
    * parameter is unused (the raw layer is the fixture set); registered so
    * the driver's gate exercises the JSON-source path end-to-end. */
  def fixturePipelineQuery(spark: SparkSession, dir: String): DataFrame = {
    val rawDir = Fixtures.ensureRawLayer(Fixtures.DefaultRoot)
    // carry the tree's OWN _DONE marker content (not the compiled-in
    // constant) so the oracle — which reads the same file via read_text —
    // fails identifiably if the tree it sees is stale or foreign (ADVICE
    // r17): a version mismatch lands on every row with its name on it.
    val markerContent = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(rawDir, "_DONE")))
    combineFrames(formatStocks(spark, rawDir), formatCompany(spark, rawDir),
      formatNews(spark, rawDir))
      .withColumn("latest_news_date",
        date_format(col("latest_news_date"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("fetched_at_utc",
        date_format(col("fetched_at_utc"), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("fixture_content_version", lit(markerContent))
  }

  /** Exact-valued summary of [[fixturePipelineQuery]] with a literal oracle
    * (the fixtures are content-versioned and deterministic): per symbol,
    * row/day counts — AAPL carries the duplicated raw partition — news
    * counts, the orphan company join, market caps (MSFT's is the zero edge
    * row), date span, and the guarded-division nulls from open==0. A drift
    * in the multiLine scan, the casts, the dedup, or the combine joins
    * lands here. */
  def fixtureSummaryQuery(spark: SparkSession, dir: String): DataFrame =
    fixturePipelineQuery(spark, dir)
      .groupBy("symbol").agg(
        count(lit(1)).as("n_rows"),
        countDistinct(col("date")).as("n_days"),
        max("news_count").as("news_count"),
        max(col("name").isNotNull).as("has_company_info"),
        max("market_cap").as("market_cap"),
        min("date").as("min_date"),
        max("date").as("max_date"),
        sum(when(col("daily_change_pct").isNull, 1L).otherwise(0L)).as("n_null_change"))

  /** Full-frame DuckDB oracle for [[fixturePipelineQuery]] (r17): re-derives
    * the ENTIRE Bronze→Gold contract — multiLine JSON-array scan with the
    * same explicit schema (`read_json(format='array', columns=...)` ingests
    * the SAME fixture files `readRaw` globs), offset-string → UTC timestamp
    * parse, the ≥2020 news filter, the deterministic per-id dedup, the
    * news aggregate, both left joins, and the guarded-division derived
    * columns — then hash-compares all 420 rows × 17 columns (the 17th is the tree's own _DONE marker content, read via read_text — r18). Timestamps go
    * through `timezone('UTC', CAST(x AS TIMESTAMPTZ))` so the oracle is
    * independent of the DuckDB session timezone (the fixture offsets are
    * explicit). Doubles are bit-exact on both sides: the same decimal JSON
    * literals parse to the same IEEE doubles and the derived arithmetic
    * (`high-low`, `(close-open)/open*100`) applies the same op order. */
  val fixtureCombineSql: String = {
    val fx = s"${Fixtures.DefaultRoot}/raw" // = Fixtures.ensureRawLayer's return
    s"""WITH stocks_raw AS (
       |  SELECT * FROM read_json('$fx/yahoo/stocks/*/stocks.json',
       |    format='array',
       |    columns={symbol:'VARCHAR', "date":'VARCHAR', "open":'DOUBLE', high:'DOUBLE',
       |             low:'DOUBLE', "close":'DOUBLE', volume:'BIGINT', fetched_at:'VARCHAR'})
       |), stocks AS (
       |  SELECT symbol, "date", "open", high, low, "close", volume,
       |         timezone('UTC', CAST(fetched_at AS TIMESTAMPTZ)) AS fetched_at_utc
       |  FROM stocks_raw
       |), company AS (
       |  SELECT symbol, name, sector, industry, market_cap
       |  FROM read_json('$fx/yahoo/company_info/*/company_info.json',
       |    format='array',
       |    columns={symbol:'VARCHAR', name:'VARCHAR', sector:'VARCHAR', industry:'VARCHAR',
       |             country:'VARCHAR', market_cap:'BIGINT', currency:'VARCHAR', fetched_at:'VARCHAR'})
       |), news_raw AS (
       |  SELECT *, timezone('UTC', CAST(pub_date AS TIMESTAMPTZ)) AS pub_date_utc,
       |         timezone('UTC', CAST(fetched_at AS TIMESTAMPTZ)) AS fetched_at_utc
       |  FROM read_json('$fx/finnhub/news/*/news.json',
       |    format='array',
       |    columns={id:'VARCHAR', symbol:'VARCHAR', title:'VARCHAR', summary:'VARCHAR',
       |             pub_date:'VARCHAR', provider:'VARCHAR', url:'VARCHAR', category:'VARCHAR',
       |             image:'VARCHAR', sentiment_score:'DOUBLE', sentiment_label:'VARCHAR',
       |             fetched_at:'VARCHAR'})
       |), news AS (
       |  SELECT * FROM (
       |    SELECT *, row_number() OVER (PARTITION BY id
       |        ORDER BY pub_date_utc DESC, fetched_at_utc DESC,
       |          symbol ASC NULLS FIRST, title ASC NULLS FIRST,
       |          summary ASC NULLS FIRST, provider ASC NULLS FIRST,
       |          url ASC NULLS FIRST, category ASC NULLS FIRST,
       |          image ASC NULLS FIRST, sentiment_score ASC NULLS FIRST,
       |          sentiment_label ASC NULLS FIRST) AS __rn
       |    FROM news_raw
       |    WHERE pub_date_utc >= TIMESTAMP '2020-01-01 00:00:00')
       |  WHERE __rn = 1
       |), news_agg AS (
       |  SELECT symbol, CAST(COUNT(*) AS BIGINT) AS news_count,
       |         MAX(pub_date_utc) AS latest_news_date
       |  FROM news GROUP BY symbol
       |)
       |SELECT s.symbol, c.name, c.sector, c.industry, s."date", s."open", s.high, s.low,
       |       s."close", s.volume, c.market_cap,
       |       s.high - s.low AS daily_range,
       |       (s."close" - s."open") / nullif(s."open", 0.0) * 100 AS daily_change_pct,
       |       n.news_count,
       |       strftime(n.latest_news_date, '%Y-%m-%d %H:%M:%S') AS latest_news_date,
       |       strftime(s.fetched_at_utc, '%Y-%m-%d %H:%M:%S') AS fetched_at_utc,
       |       fv.fixture_content_version
       |FROM stocks s
       |LEFT JOIN company c USING (symbol)
       |LEFT JOIN news_agg n ON s.symbol = n.symbol
       |CROSS JOIN (SELECT content AS fixture_content_version
       |            FROM read_text('$fx/_DONE')) fv""".stripMargin
  }

  val fixtureSummarySql: String =
    """SELECT * FROM (VALUES
      |  ('AAPL', CAST(140 AS BIGINT), CAST(70 AS BIGINT), CAST(2 AS BIGINT), true,
      |   CAST(1000000000000 AS BIGINT), '2024-01-01', '2024-04-05', CAST(2 AS BIGINT)),
      |  ('AMZN', CAST(70 AS BIGINT), CAST(70 AS BIGINT), CAST(NULL AS BIGINT), true,
      |   CAST(1300000000000 AS BIGINT), '2024-01-01', '2024-04-05', CAST(0 AS BIGINT)),
      |  ('GOOG', CAST(70 AS BIGINT), CAST(70 AS BIGINT), CAST(2 AS BIGINT), true,
      |   CAST(1200000000000 AS BIGINT), '2024-01-01', '2024-04-05', CAST(0 AS BIGINT)),
      |  ('MSFT', CAST(70 AS BIGINT), CAST(70 AS BIGINT), CAST(2 AS BIGINT), true,
      |   CAST(0 AS BIGINT), '2024-01-01', '2024-04-05', CAST(0 AS BIGINT)),
      |  ('TSLA', CAST(70 AS BIGINT), CAST(70 AS BIGINT), CAST(NULL AS BIGINT), false,
      |   CAST(NULL AS BIGINT), '2024-01-01', '2024-04-05', CAST(0 AS BIGINT)))
      |AS t(symbol, n_rows, n_days, news_count, has_company_info, market_cap,
      |     min_date, max_date, n_null_change)""".stripMargin
}
