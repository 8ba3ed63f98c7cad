package graft.sql

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** SQL statements taken verbatim from the reference's own parser test
  * suite (tests/integration/sql_parser_comprehensive_test.rs) must
  * parse AND execute on Spark through the dialect front-end — the
  * reference's test surface is SQL text, so this is the compatibility
  * bar that matters.
  */
class ReferenceStatementsSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val ctx: VeloContext = {
    val c = new VeloContext(spark, defaultTimeCol = "m.event_time")
    import spark.implicits._
    val md = Seq(
      ("AAPL", 100.0, 10.0, 500L, "BUY", ts("2024-01-02 10:00:00")),
      ("AAPL", 102.0, 5.0, 800L, "SELL", ts("2024-01-02 10:20:00")),
      ("AAPL", 101.0, 8.0, 300L, "BUY", ts("2024-01-02 11:10:00")),
      ("MSFT", 55.0, 20.0, 900L, "BUY", ts("2024-01-03 09:30:00")),
      ("MSFT", 56.0, 12.0, 100L, "SELL", ts("2024-01-03 09:45:00")),
      ("MSFT", 57.0, 11.0, 200L, "BUY", ts("2024-01-06 12:00:00")) // Saturday
    ).toDF("symbol", "price", "quantity", "volume", "side", "event_time")
    c.register("market_data", md)
    val pos = Seq(
      (7L, "AAPL", 150.0, ts("2024-01-01 00:00:00")),
      (8L, "MSFT", 200.0, ts("2024-01-01 00:00:00"))
    ).toDF("trader_id", "symbol", "quantity", "event_time")
    c.register("positions", pos)
    c
  }

  test("financial CSAS with INTO sink + dotted WITH config (sql_parser_comprehensive_test.rs)") {
    val df = ctx.sql(
      """CREATE STREAM aggregated_trades AS
              SELECT
                  p.trader_id,
                  p.symbol,
                  COUNT(*) as transaction_count,
                  AVG(m.price) as avg_price,
                  SUM(CASE WHEN m.side = 'BUY' THEN m.quantity ELSE 0.0 END) as total_buys,
                  SUM(CASE WHEN m.side = 'SELL' THEN m.quantity ELSE 0.0 END) as total_sells,
                  MAX(m.price) as max_price,
                  MIN(m.price) as min_price,
                  STDDEV(m.price) as price_volatility,
                  TUMBLE_END(m.event_time, INTERVAL '1' HOUR) as window_end
              FROM market_data m
              JOIN positions p ON m.symbol = p.symbol
              WHERE m.event_time >= '2024-01-01T00:00:00Z'
                  AND p.quantity > 100
                  AND m.price BETWEEN 50.0 AND 500.0
              GROUP BY p.trader_id, p.symbol
              WINDOW TUMBLING(1h)
              HAVING COUNT(*) > 5
                  AND AVG(m.price) > 100.0
              INTO kafka_sink
              WITH (
                market_data.type='kafka_source',
                market_data.config_file='config/market_data_source.properties',
                positions.type='kafka_source',
                positions.config_file='config/positions_source.properties',
                kafka_sink.type='kafka_sink',
                kafka_sink.config_file='config/kafka_sink.properties'
              )""")
    // the CSAS ITSELF parses into the right AST shape (the old check
    // parsed an unrelated trivial SELECT and asserted it was a Select)
    val csas = ctx.parseStatement(
      """CREATE STREAM aggregated_trades2 AS
         SELECT p.trader_id FROM market_data m
         JOIN positions p ON m.symbol = p.symbol
         GROUP BY p.trader_id
         WINDOW TUMBLING(1h)
         HAVING COUNT(*) > 5
         INTO kafka_sink
         WITH (kafka_sink.type='kafka_sink')""")
      .asInstanceOf[VeloSqlParser.CreateStreamAs]
    assert(csas.select.window.exists {
      case VeloSqlParser.Tumbling(sizeSec, _, _) => sizeSec == 3600L
      case _ => false
    })
    assert(csas.select.having.isDefined && csas.select.joins.nonEmpty)
    assert(csas.select.into.contains("kafka_sink"))
    assert(csas.props("kafka_sink.type") == "kafka_sink")
    // …and the original executes (HAVING COUNT(*) > 5 filters everything
    // in this toy set)
    assert(df.columns.contains("price_volatility") && df.columns.contains("window_end"))
    assert(df.count() == 0)
    // AST-level checks mirroring the reference test's assertions
    val cs = ctx.parseStatement(
      "CREATE STREAM s2 AS SELECT symbol FROM market_data INTO snk WITH (snk.type='kafka_sink')")
      .asInstanceOf[VeloSqlParser.CreateStreamAs]
    assert(cs.select.into.contains("snk"))
    assert(cs.props("snk.type") == "kafka_sink")
  }

  test("table-alias ROWS WINDOW (sql_parser_comprehensive_test.rs:157)") {
    val df = ctx.sql(
      "SELECT LAG(m.price, 1) OVER (ROWS WINDOW BUFFER 100 ROWS PARTITION BY p.trader_id ORDER BY m.event_time) FROM market_data m JOIN positions p ON m.symbol = p.symbol")
    assert(df.count() == 6)
  }

  test("anonymous ROWS WINDOW aggregate (sql_parser_comprehensive_test.rs:169)") {
    val c2 = new VeloContext(spark, defaultTimeCol = "event_time")
    val df = c2.sql(
      "SELECT AVG(price) OVER (ROWS WINDOW BUFFER 100 ROWS ORDER BY event_time) FROM market_data")
    assert(df.count() == 6)
  }

  test("EXTRACT field matrix, both syntaxes (sql_parser_comprehensive_test.rs:285-298)") {
    val fields = Seq("YEAR", "MONTH", "DAY", "HOUR", "MINUTE", "SECOND", "DOW", "DOY", "WEEK", "QUARTER")
    val std = ctx.sql("SELECT " +
      fields.map(f => s"EXTRACT($f FROM event_time) as f_$f").mkString(", ") +
      " FROM market_data m")
    val legacy = ctx.sql("SELECT " +
      fields.map(f => s"EXTRACT('$f', event_time) as f_$f").mkString(", ") +
      " FROM market_data m")
    val a = std.collect().map(_.toSeq.map(_.toString)).sortBy(_.mkString)
    val b = legacy.collect().map(_.toSeq.map(_.toString)).sortBy(_.mkString)
    assert(a.length == 6 && a.sameElements(b))
    // ground truth for one fixed row (both syntaxes share the mapping
    // table, so mutual agreement alone can't catch a wrong field map):
    // 2024-01-06 12:00 is a SATURDAY → DOW 6 (0=Sunday), DOY 6, week 1
    val sat = std.where(col("f_DAY") === 6).collect().head
    val by = fields.zipWithIndex.map { case (f, i) => f -> sat.get(i).toString }.toMap
    assert(by("YEAR") == "2024" && by("MONTH") == "1" && by("DAY") == "6")
    // SECOND is a DECIMAL in Spark's EXTRACT → compare numerically
    assert(by("HOUR") == "12" && by("MINUTE") == "0" && BigDecimal(by("SECOND")) == BigDecimal(0))
    assert(by("DOW") == "6", s"DOW of Saturday must be 6, got ${by("DOW")}")
    assert(by("DOY") == "6" && by("WEEK") == "1" && by("QUARTER") == "1")
  }

  test("moving percentile over a row frame — the VaR shape (advanced.md:399)") {
    // the ORDER BY expression is the measured VALUE (the reference
    // orders by `returns`); the frame bounds the trailing sample
    val df = ctx.sql(
      """SELECT symbol, price,
         PERCENTILE_CONT(0.05) OVER (PARTITION BY symbol ORDER BY price ROWS BETWEEN 252 PRECEDING AND CURRENT ROW) as var_95
         FROM market_data m""")
    assert(df.count() == 6)
    // exact values: per symbol, row i's trailing frame holds the i+1
    // smallest prices (ordered by price), so the 0.05-quantile is
    // lo + 0.05·i·(step) for unit-stepped prices — a wrong fraction,
    // frame, or order column changes these
    val got = df.collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val want = Map(
      ("AAPL", 100.0) -> 100.0, ("AAPL", 101.0) -> 100.05, ("AAPL", 102.0) -> 100.1,
      ("MSFT", 55.0) -> 55.0, ("MSFT", 56.0) -> 55.05, ("MSFT", 57.0) -> 55.1)
    want.foreach { case (k, v) =>
      assert(math.abs(got(k) - v) < 1e-9, s"$k: got ${got(k)}, want $v")
    }
  }

  test("EXTRACT forms: EPOCH over a difference, legacy two-arg (lines 180, 191)") {
    val d1 = ctx.sql(
      "SELECT EXTRACT(EPOCH FROM (m.event_time - p.event_time)) as duration FROM market_data m JOIN positions p ON m.symbol = p.symbol")
    // exact SECOND deltas vs the 2024-01-01 00:00 positions rows — a
    // millis-vs-seconds unit regression or a dropped subtraction would
    // keep every value > 0 but change these
    assert(d1.collect().map(_.getLong(0)).sorted.toSeq ==
      Seq(122400L, 123600L, 126600L, 207000L, 207900L, 475200L))
    val d2 = ctx.sql("SELECT EXTRACT('YEAR', event_time) as year FROM market_data")
    assert(d2.collect().forall(_.get(0).toString == "2024"))
  }

  test("complex combination: ROWS WINDOW + EXTRACT(HOUR/DOW) weekday filter (line 203)") {
    val df = ctx.sql(
      """SELECT
            p.trader_id,
            AVG(m.price) OVER (
                ROWS WINDOW
                    BUFFER 100 ROWS
                    PARTITION BY p.trader_id
                    ORDER BY m.event_time
            ) as hourly_avg,
            EXTRACT(HOUR FROM m.event_time) as hour_of_day
        FROM market_data m
        JOIN positions p ON m.symbol = p.symbol
        WHERE EXTRACT(DOW FROM m.event_time) BETWEEN 1 AND 5""")
    // the Saturday row (2024-01-06, DOW=6) is filtered out
    assert(df.count() == 5)
  }

  test("derived tables + 3-arg DATEDIFF + NOW interval arithmetic (docs/sql/examples/user-behavior.md shape)") {
    val df = ctx.sql(
      """SELECT
            symbol,
            total_volume,
            CASE
                WHEN total_volume > 1000 THEN 'HIGH'
                WHEN total_volume > 500 THEN 'MID'
                ELSE 'LOW'
            END as volume_band,
            DATEDIFF('minutes', first_trade, last_trade) as span_minutes
        FROM (
            SELECT
                symbol,
                SUM(volume) as total_volume,
                MIN(event_time) as first_trade,
                MAX(event_time) as last_trade,
                COUNT(CASE WHEN side = 'BUY' THEN 1 END) as buys
            FROM market_data
            WHERE event_time > NOW() - INTERVAL '3650' DAYS
            GROUP BY symbol
        ) sym_metrics
        ORDER BY total_volume DESC""")
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("AAPL", "MSFT"))
    assert(rows.head.getAs[String]("volume_band") == "HIGH")
    assert(rows.head.getAs[Long]("span_minutes") == 70L)
    // JOIN against a derived table
    val j = ctx.sql(
      """SELECT m.symbol, s.total_volume
         FROM market_data m
         JOIN (SELECT symbol, SUM(volume) as total_volume FROM market_data GROUP BY symbol) s
           ON m.symbol = s.symbol""")
    assert(j.count() == 6)
  }

  test("WITHIN INTERVAL stream-stream join shorthand (by-task/join-streams.md)") {
    val c2 = new VeloContext(spark, defaultTimeCol = "event_time")
    spark.table("market_data").createOrReplaceTempView("user_clicks")
    spark.table("positions").createOrReplaceTempView("user_purchases")
    val df = c2.sql(
      """SELECT
             click.symbol,
             purchase.trader_id
         FROM user_clicks click
         INNER JOIN user_purchases purchase ON click.symbol = purchase.symbol
         WITHIN INTERVAL '30' SECONDS;""")
    // positions event_time is 2024-01-01; only rows within ±30s match → none
    assert(df.count() == 0)
    val wide = c2.sql(
      """SELECT click.symbol FROM user_clicks click
         JOIN user_purchases purchase ON click.symbol = purchase.symbol
         WITHIN INTERVAL '30' DAYS""")
    assert(wide.count() == 6)
  }

  test("UNION ALL of alert branches (examples/real-time-dashboard.md shape)") {
    val df = ctx.sql(
      """SELECT 'HIGH_PRICE' as alert_type, symbol, price as metric FROM market_data m WHERE price > 100
         UNION ALL
         SELECT 'HIGH_VOLUME' as alert_type, symbol, volume as metric FROM market_data m WHERE volume > 800""")
    val byType = df.collect().groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byType == Map("HIGH_PRICE" -> 2, "HIGH_VOLUME" -> 1))
  }

  test("CTEs: WITH name AS (SELECT ...) body (by-task docs)") {
    val df = ctx.sql(
      """WITH sym_stats AS (
             SELECT symbol, AVG(price) as avg_price FROM market_data GROUP BY symbol
         ),
         hot AS (
             SELECT symbol FROM sym_stats WHERE avg_price > 100
         )
         SELECT m.symbol, COUNT(*) as n
         FROM market_data m
         JOIN hot h ON m.symbol = h.symbol
         GROUP BY m.symbol""")
    assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("AAPL", 3L)))
  }

  test("CSAS INTO a declared file sink materializes the output") {
    val dir = java.nio.file.Files.createTempDirectory("velo_sink").toString
    ctx.executeScript(
      s"""CREATE SINK fs_out WITH (path = 'file://$dir/out.parquet');
          CREATE STREAM expensive AS
          SELECT symbol, price FROM market_data WHERE price > 100
          INTO fs_out EMIT CHANGES;""")
    val written = spark.read.parquet(s"$dir/out.parquet")
    assert(written.count() == 2)
  }

  test("multi-statement .sql application script (the reference's deployable unit)") {
    val results = ctx.executeScript(
      """-- trading analytics application
        CREATE STREAM raw_feed WITH (
            topic = 'market-feed',
            bootstrap.servers = 'broker:9092'
        );

        -- hot symbols materialization
        CREATE TABLE hot_symbols AS
        SELECT symbol, COUNT(*) as n, AVG(price) as avg_price
        FROM market_data
        GROUP BY symbol
        HAVING AVG(price) > 100.0;  -- AAPL only

        -- enriched stream over the materialization
        CREATE STREAM enriched AS
        SELECT m.symbol, m.price, h.avg_price
        FROM market_data m
        JOIN hot_symbols h ON m.symbol = h.symbol
        EMIT CHANGES;

        SELECT COUNT(*) AS n FROM enriched;""")
    assert(results.length == 4)
    assert(results.last.collect().head.getLong(0) == 3L) // 3 AAPL trades
    assert(ctx.declaredSources.contains("raw_feed"))
  }

  test("full financial window-function battery executes (line 322 statement)") {
    val df = ctx.sql(
      """SELECT
            p.trader_id,
            p.symbol,
            m.price,
            m.quantity,
            m.volume,
            m.side,
            m.event_time,
            LAG(m.price, 1) OVER (ROWS WINDOW BUFFER 100 ROWS PARTITION BY p.trader_id ORDER BY m.event_time) as prev_price,
            LEAD(m.price, 1) OVER (ROWS WINDOW BUFFER 100 ROWS PARTITION BY p.trader_id ORDER BY m.event_time) as next_price,
            RANK() OVER (ROWS WINDOW BUFFER 100 ROWS PARTITION BY m.symbol ORDER BY m.volume DESC) as volume_rank,
            EXTRACT(EPOCH FROM (m.event_time - p.event_time)) as time_diff_seconds,
            AVG(m.price) OVER (
                ROWS WINDOW
                    BUFFER 100 ROWS
                    PARTITION BY p.trader_id
                    ORDER BY m.event_time
            ) as hourly_moving_avg,
            COUNT(*) OVER (
                ROWS WINDOW
                    BUFFER 100 ROWS
                    PARTITION BY m.symbol
                    ORDER BY m.event_time
            ) as trades_last_15min,
            SUM(CASE WHEN m.side = 'BUY' THEN m.quantity ELSE 0.0 END) OVER (
                ROWS WINDOW
                    BUFFER 100 ROWS
                    PARTITION BY p.trader_id
                    ORDER BY m.event_time
            ) as hourly_buys,
            SUM(CASE WHEN m.side = 'SELL' THEN m.quantity ELSE 0.0 END) OVER (
                ROWS WINDOW
                    BUFFER 100 ROWS
                    PARTITION BY p.trader_id
                    ORDER BY m.event_time
            ) as hourly_sells
        FROM market_data m
        JOIN positions p ON m.symbol = p.symbol
        WHERE m.event_time >= '2024-01-01T00:00:00Z'
            AND p.quantity > 100
            AND m.price BETWEEN 50.0 AND 500.0
            AND EXTRACT(DOW FROM m.event_time) BETWEEN 1 AND 5
            AND EXTRACT(HOUR FROM m.event_time) BETWEEN 9 AND 16""")
    assert(df.count() == 5)
    assert(df.columns.toSet.contains("hourly_sells"))
  }

  test("per-source WITH config mid-query + sink WITH chain (ctas_named_sources_sinks_test.rs)") {
    // the reference attaches source configs to the FROM source, with
    // GROUP BY / EMIT / INTO / sink-WITH continuing after it
    VeloSqlParser.parse(
      """CREATE TABLE user_analytics AS
         SELECT customer_id, COUNT(*) as order_count, SUM(volume) as total_spent
         FROM orders_source
         WITH ('config_file' = 'configs/orders_source.yaml')
         GROUP BY customer_id
         EMIT CHANGES
         INTO analytics_sink
         WITH ('analytics_sink.config_file' = 'configs/analytics_sink.yaml')""") match {
      case VeloSqlParser.CreateTableAs("user_analytics", s, _, _) =>
        assert(s.props("config_file") == "configs/orders_source.yaml")
        assert(s.props("analytics_sink.config_file") == "configs/analytics_sink.yaml")
        assert(s.into == Vector("analytics_sink"))
        assert(s.groupBy.nonEmpty && s.emit.contains(VeloSqlParser.EmitChanges))
      case other => fail(s"$other")
    }
    // WHERE continuing after the source WITH (ctas_emit_changes_test.rs shape)
    VeloSqlParser.parse(
      """SELECT symbol, AVG(price) as avg_price FROM market_data_source
         WITH ('config_file' = 'x.yaml')
         WHERE price > 0 GROUP BY symbol""") match {
      case VeloSqlParser.Select(s) =>
        assert(s.where.nonEmpty && s.props("config_file") == "x.yaml")
      case other => fail(s"$other")
    }
    // week shorthand duration (window_edge_cases_sql_test.rs: SESSION(1w))
    VeloSqlParser.parse(
      "SELECT customer_id, COUNT(*) as action_count FROM orders GROUP BY customer_id WINDOW SESSION(1w)") match {
      case VeloSqlParser.Select(s) =>
        assert(s.window.contains(VeloSqlParser.Session(604800L, None)))
      case other => fail(s"$other")
    }
  }
}
