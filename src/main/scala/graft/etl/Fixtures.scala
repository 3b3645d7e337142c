package graft.etl

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic raw-layer fixture generator — stands in for the reference's
  * yfinance/Finnhub ingestion (`scripts/ingestion/yahoo_stocks.py:18-44`,
  * `scripts/ingestion/finnhub_news.py:54-116`) in this zero-egress
  * environment (FIXTURES.md §2).
  *
  * Emits the reference's exact raw-layer layout: pretty-printed JSON ARRAYS
  * (so the reader must use multiLine=true) partitioned by ingestion date
  * `raw/<source>/<table>/YYYY-MM-DD/<table>.json`
  * (`scripts/ingestion/yahoo_stocks.py:68-81`), including every edge row
  * FIXTURES.md calls for: open==0, duplicate (symbol,date) across
  * partitions, missing dim symbol, pre-2020 news, duplicate news ids, empty
  * summaries, boundary sentiment scores.
  */
object Fixtures {

  val Symbols: Seq[String] = Seq("AAPL", "MSFT", "GOOG", "AMZN", "TSLA")

  /** Bump when generator logic changes — invalidates cached fixture dirs. */
  val contentVersion: String = "fixtures-v2-ohlc-bracketed"

  /** THE fixture root — the ONE location both the Spark fixture pipeline
    * (`Format.fixturePipelineQuery`) and the DuckDB oracle's `read_json`
    * paths (`Format.fixtureCombineSql`) derive from, so the two sides can
    * never silently read different trees (r17 review). Per-PROCESS since
    * r18 (ADVICE): a fixed host-wide /tmp path let concurrent JVMs (sbt
    * test alongside Verify) race one another's delete/rewrite against a
    * mid-flight multiLine read — and the DuckDB oracle is a third reader.
    * The pid-keyed root keeps one shared constant for Spark and oracle
    * WITHIN a run (the oracle SQL is generated in this same JVM and the
    * driver's DuckDB compare reads the path out of oracle_sql.json after
    * Verify exits). Lifecycle (touch, sweep, no delete-on-exit) lives in
    * the shared [[graft.TmpRoots]]; [[ensureRawLayer]] re-touches on
    * every call so a long-lived JVM's tree is never swept from under it. */
  val DefaultRoot: String = graft.TmpRoots.root("graft_fixtures")
  /** Symbol present in stocks but intentionally absent from company_info. */
  val OrphanSymbol = "TSLA"

  private def mulberry(seed: Long): () => Double = {
    var state = seed
    () => {
      state += 0x6D2B79F5L
      var z = state
      z = (z ^ (z >>> 15)) * (z | 1L)
      z ^= z + (z ^ (z >>> 7)) * (z | 61L)
      ((z ^ (z >>> 14)) & 0xFFFFFFFFL).toDouble / 4294967296.0
    }
  }

  private def jstr(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** ~70 weekday rows per symbol starting 2024-01-01 (enough for the ≥60-row
    * forecast floor, FIXTURES.md sizing note). */
  def stockRows(symbol: String): Seq[String] = {
    val rnd = mulberry(symbol.hashCode.toLong)
    var d = java.time.LocalDate.of(2024, 1, 1)
    var close = 100.0 + rnd() * 100
    (0 until 70).map { i =>
      while (d.getDayOfWeek.getValue >= 6) d = d.plusDays(1)
      val open = if (symbol == Symbols.head && i == 10) 0.0 // open==0 edge row
        else close * (0.99 + rnd() * 0.02)
      val base = if (open == 0.0) close else open
      close = base * (0.98 + rnd() * 0.04)
      // bracket AFTER the new close is known so low <= {open, close} <= high
      val high = math.max(base, close) * (1.0 + rnd() * 0.01)
      val low = math.min(base, close) * (1.0 - rnd() * 0.01)
      val vol = (1000000 + rnd() * 9000000).toLong
      val row =
        s"""  {"symbol": ${jstr(symbol)}, "date": ${jstr(d.toString)},
           |   "open": ${f"$open%.4f"}, "high": ${f"$high%.4f"}, "low": ${f"$low%.4f"},
           |   "close": ${f"$close%.4f"}, "volume": $vol,
           |   "fetched_at": "2024-04-15T08:00:00+00:00"}""".stripMargin
      d = d.plusDays(1)
      row
    }
  }

  def companyRows: Seq[String] =
    Symbols.filterNot(_ == OrphanSymbol).zipWithIndex.map { case (s, i) =>
      val (name, sector, industry, country, cap) =
        if (i == 1) ("", "", "", "", 0L) // empty-field edge row
        else (s"$s Inc.", "Technology", "Software", "United States",
          1000000000000L + i * 100000000000L)
      s"""  {"symbol": ${jstr(s)}, "name": ${jstr(name)}, "sector": ${jstr(sector)},
         |   "industry": ${jstr(industry)}, "country": ${jstr(country)},
         |   "market_cap": $cap, "currency": "USD",
         |   "fetched_at": "2024-04-15T08:00:00+00:00"}""".stripMargin
    }

  def newsRows: Seq[String] = {
    val texts = Seq(
      ("n1", "AAPL", "Apple beats expectations with record profit", "Strong growth this quarter", 0.7269, "positive", "2024-02-01T14:30:00+00:00"),
      ("n2", "AAPL", "Apple faces decline in overseas sales", "Weak demand and falling revenue", -0.5859, "negative", "2024-02-10T09:00:00+00:00"),
      ("n3", "MSFT", "Microsoft quarterly report", "", 0.0, "neutral", "2024-02-05T11:00:00+00:00"), // empty summary
      ("n4", "MSFT", "Exactly positive threshold", "x", 0.05, "positive", "2024-02-06T11:00:00+00:00"),
      ("n5", "GOOG", "Exactly negative threshold", "x", -0.05, "negative", "2024-02-07T11:00:00+00:00"),
      ("n6", "GOOG", "Zero sentiment", "x", 0.0, "neutral", "2024-02-08T11:00:00+00:00"),
      ("n7", "AMZN", "Old article must be filtered", "pre-2020", 0.3182, "positive", "2019-06-01T10:00:00+00:00"),
      ("n2", "AAPL", "Apple faces decline in overseas sales", "Weak demand and falling revenue", -0.5859, "negative", "2024-02-10T09:00:00+00:00")) // duplicate id
    texts.map { case (id, sym, title, summary, score, label, pub) =>
      s"""  {"id": ${jstr(id)}, "symbol": ${jstr(sym)}, "title": ${jstr(title)},
         |   "summary": ${jstr(summary)}, "pub_date": ${jstr(pub)},
         |   "provider": "TestWire", "url": "https://example.com/$id",
         |   "category": "company", "image": "",
         |   "sentiment_score": $score, "sentiment_label": ${jstr(label)},
         |   "fetched_at": "2024-04-15T08:05:00+00:00"}""".stripMargin
    }
  }

  private def writeJsonArray(path: Path, rows: Seq[String]): Unit = {
    Files.createDirectories(path.getParent)
    Files.write(path, rows.mkString("[\n", ",\n", "\n]").getBytes(StandardCharsets.UTF_8))
  }

  /** Write the full raw layer under `root`; returns the raw dir. Two
    * ingestion-date partitions, with one symbol's stocks duplicated across
    * both (full-refresh semantics must dedup-tolerate re-reads; here the
    * duplicate survives to formatted exactly as in the reference, which
    * re-reads all partitions, `scripts/formatting/format_to_parquet.py:57`). */
  def writeRawLayer(root: String): String = {
    val p1 = "2024-04-14"
    val p2 = "2024-04-15"
    val stocksAll = Symbols.flatMap(stockRows)
    writeJsonArray(Paths.get(root, "raw", "yahoo", "stocks", p2, "stocks.json"), stocksAll)
    // duplicate partition: first symbol's rows appear again under an earlier date
    writeJsonArray(Paths.get(root, "raw", "yahoo", "stocks", p1, "stocks.json"),
      stockRows(Symbols.head))
    writeJsonArray(Paths.get(root, "raw", "yahoo", "company_info", p2, "company_info.json"),
      companyRows)
    writeJsonArray(Paths.get(root, "raw", "finnhub", "news", p2, "news.json"), newsRows)
    s"$root/raw"
  }

  /** Idempotent, content-versioned raw layer at `root`: regenerating after
    * a generator change invalidates the cached copy (a stale /tmp layer
    * from an earlier build would otherwise silently feed consumers).
    * Returns the raw dir. */
  def ensureRawLayer(root: String): String = {
    if (root == DefaultRoot) graft.TmpRoots.root("graft_fixtures") // touch + sweep
    val marker = Paths.get(root, "raw", "_DONE")
    val stale = !Files.exists(marker) ||
      new String(Files.readAllBytes(marker)) != contentVersion
    if (stale) {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(s"$root/raw"))
      writeRawLayer(root)
      Files.write(marker, contentVersion.getBytes(StandardCharsets.UTF_8))
    }
    s"$root/raw"
  }

}
