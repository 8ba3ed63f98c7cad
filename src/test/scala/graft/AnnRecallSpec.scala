package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The recall probe's planted-twin machinery: the id-collision guard
  * must run against the corpus the twins are UNIONED INTO, not the
  * 200-smallest-ids base slice both callers pass (r16 review — a
  * bases-max guard could essentially never trip, silently corrupting
  * the recall number the floors gate on). */
class AnnRecallSpec extends AnyFunSuite with SparkTestSession {

  private def emb(ids: Seq[Long]) = {
    import spark.implicits._
    ids.map(i => (i, Seq.fill(8)(1.0f))).toDF("vec_id", "embedding")
  }

  test("r16 review: twin-id collision guard checks the union-target corpus") {
    val bases = emb(0L until 5L)
    // corpus ids reach the offset: planted tids would collide with real
    // vectors — must fail LOUD, not corrupt the measurement
    val hot = emb(Seq(1L, 2L, 1000L))
    val e = intercept[IllegalArgumentException](
      AnnRecall.withTwinVec(bases, 8, idOffset = 1000L, guardTarget = Some(hot)).collect())
    assert(e.getMessage.contains("does not clear the corpus"), e.getMessage)
    // pre-fix shape: the guard saw only the bases' max (4 < 1000) and
    // passed — pin that the TARGET is what decides
    val clear = emb(Seq(1L, 2L, 999L))
    val tw = AnnRecall.withTwinVec(bases, 8, idOffset = 1000L,
      guardTarget = Some(clear)).collect()
    assert(tw.length == 5 && tw.forall(_.getAs[Long]("tid") >= 1000L))
    // no target given: the guard falls back to the bases themselves
    val e2 = intercept[IllegalArgumentException](
      AnnRecall.withTwinVec(emb(Seq(5000L)), 8, idOffset = 1000L).collect())
    assert(e2.getMessage.contains("does not clear"), e2.getMessage)
  }

  test("planted twins are deterministic and span the documented difficulty band") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val base = Seq.tabulate(40)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat))).toDF("vec_id", "embedding")
    def cosSet() = AnnRecall.withTwinVec(base, 16, idOffset = 1000L)
      .select(col("vec_id"),
        graft.operators.Similarity.cosine(col("embedding"), col("tvec")).as("cos"))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("cos")).toMap
    val a = cosSet(); val b = cosSet()
    assert(a == b, "twins must be bit-deterministic across runs")
    // additive norm-scaled noise: the tier spans easy to hard near-dups
    // (the documented 0.78-0.96 band is for the 64-dim corpus; at this
    // toy dim=16 the hard end dips lower — only the spread is pinned)
    assert(a.values.max > 0.9 && a.values.min < 0.9, a.values.toSeq.sorted.take(3).toString)
    assert(a.values.forall(c => c > 0.0 && c <= 1.0), a.values.min.toString)
  }
}
