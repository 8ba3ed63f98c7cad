package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Join-operator semantics: as-of enrichment and interval bands. */
class JoinsSpec extends AnyFunSuite with SparkTestSession {

  private def ts(s: Long): Timestamp = new Timestamp(s * 1000L)

  test("asOf picks the latest right row at-or-before each left row, within tolerance") {
    import spark.implicits._
    val trades = Seq(
      (1L, "AAPL", ts(100)), (2L, "AAPL", ts(205)), (3L, "AAPL", ts(500)),
      (4L, "MSFT", ts(150))
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("AAPL", ts(90), 10.0), ("AAPL", ts(200), 11.0), ("AAPL", ts(600), 12.0),
      ("MSFT", ts(10), 50.0) // 140s before the MSFT trade — outside tolerance
    ).toDF("sym", "q_ts", "px")

    val joined = Joins.asOf(trades, quotes, "sym", "t_ts", "q_ts",
      toleranceSeconds = 100L)
    val byTrade = joined.collect().map(r => r.getAs[Long]("trade_id") -> r.getAs[Double]("px")).toMap
    assert(byTrade == Map(1L -> 10.0, 2L -> 11.0)) // trade 3: nearest quote 300s stale; trade 4: 140s stale
  }

  test("asOf: equal-timestamp right rows resolve deterministically across reruns") {
    import spark.implicits._
    val trades = Seq((1L, "AAPL", ts(100))).toDF("trade_id", "sym", "t_ts")
    // two quotes with the SAME timestamp in the band: the winner must be
    // a function of the data (content-hash tie-break), not shuffle order
    val quotes = Seq(
      ("AAPL", ts(90), 10.0), ("AAPL", ts(90), 11.0)
    ).toDF("sym", "q_ts", "px").repartition(4)
    val picks = (1 to 3).map { _ =>
      Joins.asOf(trades, quotes, "sym", "t_ts", "q_ts",
        toleranceSeconds = 100L)
        .collect().map(_.getAs[Double]("px")).toSeq
    }
    assert(picks.head.size == 1 && picks.distinct.size == 1)
  }

  test("asOf: duplicate and null leftId values each keep their own output row") {
    import spark.implicits._
    // two trades share trade_id 1 and one has a null id: the rank must
    // partition per ROW, not per id value — keying by leftId would
    // silently collapse all three into one enrichment row
    val trades = Seq(
      (Some(1L), "AAPL", ts(100)), (Some(1L), "AAPL", ts(205)), (None, "AAPL", ts(210))
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("AAPL", ts(90), 10.0), ("AAPL", ts(200), 11.0)
    ).toDF("sym", "q_ts", "px")
    val out = Joins.asOf(trades, quotes, "sym", "t_ts", "q_ts",
      toleranceSeconds = 1000L)
      .collect().map(r => (Option(r.getAs[java.lang.Long]("trade_id")).map(_.toLong),
        r.getAs[Timestamp]("t_ts").getTime / 1000L, r.getAs[Double]("px")))
    assert(out.toSet == Set(
      (Some(1L), 100L, 10.0), (Some(1L), 205L, 11.0), (None, 210L, 11.0)))
  }

  test("asOf and interval reject unsatisfiable bands at the call site") {
    import spark.implicits._
    val df = Seq((1L, "A", ts(1))).toDF("id", "k", "t")
    intercept[IllegalArgumentException] {
      Joins.asOf(df, df, "k", "t", "t", toleranceSeconds = -1L)
    }
    intercept[IllegalArgumentException] {
      Joins.interval(df, df, df("k") === df("k"), df("t"), df("t"),
        lowerSeconds = 300L, upperSeconds = -300L)
    }
    // strict + tolerance 0 = rightTs in [leftTs, leftTs): empty band,
    // the whole join would run and return nothing with no error
    intercept[IllegalArgumentException] {
      Joins.asOf(df, df, "k", "t", "t", toleranceSeconds = 0L, strict = true)
    }
  }

  test("r12 review: working-column guards reject inputs carrying __graft_salt / __graft_matched / __graft_rk") {
    import spark.implicits._
    val df = Seq((1L, "A", ts(1))).toDF("id", "k", "t")
    // saltedJoin would silently REPLACE then DROP a caller's column
    // (r15: reserved names are __graft-namespaced, so an ad-hoc _salt
    // caller column no longer collides at all)
    val withSalt = df.withColumn("__graft_salt", lit(9))
    assert(intercept[IllegalArgumentException](
      Joins.saltedJoin(withSalt, df, "k", col("id"))).getMessage.contains("__graft_salt"))
    assert(intercept[IllegalArgumentException](
      Joins.saltedJoin(df, withSalt, "k", col("id"))).getMessage.contains("__graft_salt"))
    // a plain _salt column is CALLER data now — the join must accept it
    assert(Joins.saltedJoin(df.withColumn("_salt", lit(9)), df, "k", col("id"))
      .columns.contains("_salt"))
    // streamTableDegraded's match marker, ANY casing (resolver-aware)
    val withMark = df.withColumn("__GRAFT_MATCHED", lit(false))
    assert(intercept[IllegalArgumentException](
      Joins.streamTableDegraded(df, withMark, df("k") === withMark("k"),
        Joins.MissingDataStrategy.FailFast)).getMessage.contains("__graft_matched"))
    // asOf's rank column on the RIGHT side reaches the joined frame too
    val withRk = df.withColumn("__graft_rk", lit(1))
    assert(intercept[IllegalArgumentException](
      Joins.asOf(df, withRk, "k", "t", "t", toleranceSeconds = 10L))
      .getMessage.contains("__graft_rk"))
  }

  test("r15 review: asOf binds per side when right shares lineage with left (self-join enrichment)") {
    import spark.implicits._
    // right derived FROM left with the SAME column names — the shape
    // where pre-join df(col) references mis-bound after exprId dedup:
    // drop(right(key)) dropped the LEFT key and the window ordered by
    // the LEFT timestamp (constant per partition), so 'latest' fell to
    // the hash tie-break
    val trades = Seq(
      (1L, "A", ts(100), 10.0), (2L, "A", ts(200), 20.0),
      (3L, "A", ts(300), 30.0), (4L, "B", ts(250), 99.0)
    ).toDF("id", "k", "t", "v")
    val prior = trades.select("k", "t", "v") // shares lineage, same names
    val out = Joins.asOf(trades, prior, "k", "t", "t",
      toleranceSeconds = 1000L, strict = true)
    // columns: id, k, t, v (left) ++ t, v (right minus key)
    val got = out.collect().map(r => (r.getLong(0), r.getDouble(5))).sorted.toSeq
    // each trade enriched with the LATEST strictly-earlier v on its key;
    // trades 1 and 4 have no earlier row → dropped (inner)
    assert(got == Seq((2L, 10.0), (3L, 20.0)), got.toString)
    // the left key survives in the output (the mis-bound drop removed it)
    assert(out.columns.count(_ == "k") == 1 && out.select("k").collect().nonEmpty)
  }

  test("r15 review: UseDefaults rejects case-variant duplicate default keys") {
    import spark.implicits._
    val fact = Seq((1L, "A")).toDF("id", "k")
    val dim = Seq(("A", 5.0)).toDF("k", "Price")
    val e = intercept[IllegalArgumentException](
      Joins.streamTableDegraded(fact, dim, fact("k") === dim("k"),
        Joins.MissingDataStrategy.UseDefaults(Map("Price" -> 0.0, "price" -> -1.0))))
    assert(e.getMessage.contains("resolve to the same column"), e.getMessage)
  }

  test("saltedJoin rejects non-positive salt instead of silent data loss") {
    import spark.implicits._
    val f = Seq((1L, "x")).toDF("k", "v")
    val d = Seq((1L, "y")).toDF("k", "w")
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(f, d, "k", col("k"), salt = 0)
    }
  }

  test("interval join bounds matches to the time band") {
    import spark.implicits._
    val l = Seq((1L, ts(1000)), (2L, ts(5000))).toDF("k", "lts")
    val r = Seq((1L, ts(1500)), (1L, ts(9000)), (2L, ts(5100))).toDF("k2", "rts")
    val j = Joins.interval(l, r, col("k") === col("k2"), col("lts"), col("rts"), 0L, 600L)
    assert(j.collect().map(x => (x.getLong(0), x.getAs[Timestamp]("rts").getTime / 1000)).toSet
      == Set((1L, 1500L), (2L, 5100L)))
  }

  test("stream-table degradation strategies (graceful_degradation.rs semantics)") {
    import Joins.MissingDataStrategy._
    import spark.implicits._
    // fact row k=3 has no dim match — the degradation case
    val fact = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("dk", "tier")
    val cond = col("k") === col("dk")

    // SkipRecord: unenrichable records are filtered
    val skip = Joins.streamTableDegraded(fact, dim, cond, SkipRecord)
    assert(skip.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // EmitWithNulls: every record kept, null enrichment
    val nulls = Joins.streamTableDegraded(fact, dim, cond, EmitWithNulls)
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tier"))).toMap
    assert(nulls == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))

    // UseDefaults: missing enrichment filled from fallbacks
    val dflt = Joins.streamTableDegraded(fact, dim, cond, UseDefaults(Map("tier" -> "unrated")))
      .collect().map(r => r.getLong(0) -> r.getAs[String]("tier")).toMap
    assert(dflt(3L) == "unrated" && dflt(1L) == "gold")
    // ...and naming a non-table column is rejected at the call site
    intercept[IllegalArgumentException] {
      Joins.streamTableDegraded(fact, dim, cond, UseDefaults(Map("no_such" -> 1)))
    }

    // FailFast (the reference default): the unmatched record raises at
    // execution — the assert lives in a filter, so the optimizer cannot
    // prune it away
    val e = intercept[Exception] {
      Joins.streamTableDegraded(fact, dim, cond, FailFast).collect()
    }
    assert(e.getMessage != null && e.getMessage.contains("missing table data"))
    // a fully-matched fact passes FailFast untouched
    val ok = Joins.streamTableDegraded(fact.filter(col("k") < 3), dim, cond, FailFast)
    assert(ok.count() == 2)
  }

  test("UseDefaults fills only UNMATCHED records — a matched row's genuine NULL survives") {
    import Joins.MissingDataStrategy._
    import spark.implicits._
    val fact = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    // k=2 matches but its tier is genuinely NULL in the table — defaults
    // must not overwrite real table data, only absent lookups (k=3)
    val dim = Seq((1L, Some("gold")), (2L, None)).toDF("dk", "tier")
    val cond = col("k") === col("dk")
    val out = Joins.streamTableDegraded(fact, dim, cond, UseDefaults(Map("tier" -> "unrated")))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String]("tier"))).toMap
    assert(out == Map(1L -> Some("gold"), 2L -> None, 3L -> Some("unrated")))
    // a defaulted name that also exists on the stream side would be
    // ambiguous at runtime — rejected at the call site
    intercept[IllegalArgumentException] {
      Joins.streamTableDegraded(fact, dim.withColumnRenamed("tier", "v"), cond,
        UseDefaults(Map("v" -> 0.0)))
    }
  }

  test("r17 review: asOf keepUnmatched keeps every left row, null-enriched (merge_asof semantics)") {
    import spark.implicits._
    val trades = Seq(
      (1L, "AAPL", ts(100)), (2L, "MSFT", ts(150)), (3L, "NVDA", ts(200))
    ).toDF("trade_id", "sym", "t_ts")
    val quotes = Seq(
      ("AAPL", ts(90), 10.0),  // in band for trade 1
      ("MSFT", ts(10), 50.0)   // 140s stale — outside tolerance for trade 2
    ).toDF("sym", "q_ts", "px")
    val out = Joins.asOf(trades, quotes, "sym", "t_ts", "q_ts",
      toleranceSeconds = 100L, keepUnmatched = true).collect()
    // one output row per left row — unmatched ones survive null-enriched
    assert(out.length == 3, out.mkString(","))
    val byTrade = out.map(r =>
      r.getAs[Long]("trade_id") ->
        (if (r.isNullAt(r.fieldIndex("px"))) None else Some(r.getAs[Double]("px")))).toMap
    assert(byTrade == Map(1L -> Some(10.0), 2L -> None, 3L -> None))
  }

  test("r17 review: UseDefaults rejects a default whose type cannot fit the table column") {
    import spark.implicits._
    import Joins.MissingDataStrategy.UseDefaults
    val fact = Seq((1L, "a")).toDF("id", "k")
    val dim = Seq(("a", 5)).toDF("k2", "qty")
    // a STRING default on an INT column used to silently widen qty to
    // STRING for EVERY output row, matched ones included
    val e = intercept[IllegalArgumentException](Joins.streamTableDegraded(
      fact, dim, col("k") === col("k2"), UseDefaults(Map("qty" -> "0"))))
    assert(e.getMessage.contains("does not fit"), e.getMessage)
    // an up-castable default (Int for the INT column) keeps the dim type
    val ok = Joins.streamTableDegraded(
      fact, dim.withColumn("qty", col("qty").cast("long")),
      col("k") === col("k2"), UseDefaults(Map("qty" -> 7)))
    assert(ok.schema("qty").dataType.typeName == "long", ok.schema.treeString)
  }

  test("r17 review: streamTable right/full outer still joins (broadcast hint has no dim-side build there)") {
    import spark.implicits._
    val fact = Seq((1L, "a")).toDF("id", "k")
    val dim = Seq(("a", 5), ("b", 6)).toDF("k2", "qty")
    val r = Joins.streamTable(fact, dim, col("k") === col("k2"), "right_outer").collect()
    assert(r.length == 2) // unmatched dim row 'b' survives
    val f = Joins.streamTable(fact, dim, col("k") === col("k2"), "full_outer").collect()
    assert(f.length == 2)
  }

  test("asOf tolerates unhashable (map) right columns in the tie-break") {
    import spark.implicits._
    val trades = Seq((1L, "A", 100L)).toDF("trade_id", "sym", "t_ts")
      .withColumn("t_ts", col("t_ts").cast("timestamp"))
    val quotes = Seq(("A", 90L, 1.0), ("A", 95L, 2.0)).toDF("sym", "q_ts", "px")
      .withColumn("q_ts", col("q_ts").cast("timestamp"))
      .withColumn("attrs", map(lit("venue"), lit("X"))) // MapType: hash() rejects it
    val out = Joins.asOf(trades, quotes, "sym", "t_ts", "q_ts",
      toleranceSeconds = 60).collect()
    assert(out.length == 1 && out.head.getAs[Double]("px") == 2.0)
  }
}
