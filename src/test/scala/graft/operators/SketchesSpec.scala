package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** CMS heavy hitters: exact top-k identification with the Count-Min
  * error bound holding on skewed data. */
class SketchesSpec extends AnyFunSuite with SparkTestSession {

  test("cmsHeavyHitters: skewed keys surface in order, estimates within the CMS bound") {
    import spark.implicits._
    // zipf-ish skew: key 0 → 1000 rows, key 1 → 500, …, long tail of singletons
    val rows = (0L until 5L).flatMap(k => Seq.fill((1000 / (k + 1)).toInt)(k)) ++
      (100L until 600L)
    val df = rows.toDF("user_id")
    val out = Sketches.cmsHeavyHitters(df, "user_id", 5).collect()
    assert(out.map(_.getAs[String]("user_id")).toSeq == Seq("0", "1", "2", "3", "4"))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(1000L, 500L, 333L, 250L, 200L))
    assert(out.forall(_.getAs[Boolean]("est_ok")))
  }

  test("cmsHeavyHitters: reserved-name guard follows the session resolver; binary keys render hex (r12 review)") {
    import spark.implicits._
    // under default case-INSENSITIVE resolution a key named 'N'
    // collides with the report's 'n' after the full scan — reject now
    val df = Seq(1L, 1L, 2L).toDF("N")
    assert(intercept[IllegalArgumentException](
      Sketches.cmsHeavyHitters(df, "N", 2)).getMessage.contains("collides"))
    val df2 = Seq(1L).toDF("EST_OK")
    assert(intercept[IllegalArgumentException](
      Sketches.cmsHeavyHitters(df2, "EST_OK", 1)).getMessage.contains("collides"))
    // a BINARY key reports lowercase hex (stable, joinable), never the
    // JVM identity string ("[B@...")
    val bin = Seq(Array[Byte](0x0a, 0x7f), Array[Byte](0x0a, 0x7f), Array[Byte](1))
      .toDF("payload_key")
    val out = Sketches.cmsHeavyHitters(bin, "payload_key", 2).collect()
    assert(out.map(_.getAs[String]("payload_key")).toSeq == Seq("0a7f", "01"), out.mkString(","))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(2L, 1L))
    assert(out.forall(_.getAs[Boolean]("est_ok")))
  }

  test("r15 review: unsupported key type fails at the call site, not mid-scan in executors") {
    import spark.implicits._
    // CountMinSketch.add handles string/binary/integral keys only — a
    // DOUBLE key used to pay the full pass and die with an opaque
    // executor IllegalArgumentException
    val df = Seq((1.5, "x"), (2.5, "y")).toDF("price", "v")
    val e = intercept[IllegalArgumentException](
      Sketches.cmsHeavyHitters(df, "price", 5))
    assert(e.getMessage.contains("Count-Min supports"), e.getMessage)
    // integral keys stay legal
    assert(Sketches.cmsHeavyHitters(
      Seq((1L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v"), "k", 2).count() == 2)
  }

  test("r16 advice: the snapshot's blocks release deterministically, serialized level") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = (0L until 200L).map(_ % 7L).toDF("user_id")
    val out = Sketches.cmsHeavyHitters(df, "user_id", 3).collect()
    assert(out.length == 3)
    // Dataset.localCheckpoint left its blocks pinned until GC +
    // ContextCleaner (r15 advice); the RDD-level form unpersists in a
    // finally, so no persisted RDD outlives the call. blocking=false:
    // poll briefly for the async release.
    val deadline = System.nanoTime() + 10_000_000_000L
    def leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"persisted RDDs leaked: $leaked")
    // a failure AFTER the snapshot is pinned (bad eps throws inside
    // CountMinSketch.create, past persist + count) must still release
    // — the finally path; pre-fix these blocks outlived the exception
    intercept[IllegalArgumentException](
      Sketches.cmsHeavyHitters(df, "user_id", 3, eps = -1.0))
    while (leaked.nonEmpty && System.nanoTime() < deadline) Thread.sleep(50)
    assert(leaked.isEmpty, s"persisted RDDs leaked on the failure path: $leaked")
  }

  test("cmsHeavyHitters: null keys are excluded, not a driver crash") {
    import spark.implicits._
    val df = (Seq.fill(50)(Some(7L)) ++ Seq.fill(100)(Option.empty[Long]) ++
      Seq.fill(20)(Some(3L))).toDF("user_id")
    val out = Sketches.cmsHeavyHitters(df, "user_id", 5).collect()
    assert(out.map(_.getAs[String]("user_id")).toSeq == Seq("7", "3"))
    assert(out.map(_.getAs[Long]("n")).toSeq == Seq(50L, 20L))
    assert(out.forall(_.getAs[Boolean]("est_ok")))
  }
}
