package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkTestSession

/** Property test: the distributed gaps-and-islands sessionization must
  * agree with a trivially-correct single-machine reference on arbitrary
  * event sets (ScalaCheck generators, fixed seed progression).
  */
class SessionizeSpec extends AnyFunSuite with SparkTestSession {

  private val gap = 100L

  /** Brute-force oracle: per key, sort, split on gap, aggregate. */
  private def oracle(events: Seq[(Long, Long)]): Set[(Long, Long, Long, Long)] =
    events.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.map(_._2).sorted
      val sessions = sorted.foldLeft(List.empty[List[Long]]) {
        case (Nil, e) => List(List(e))
        case (cur :: done, e) =>
          if (e - cur.head <= gap) (e :: cur) :: done else List(e) :: (cur :: done)
      }
      sessions.map(s => (k, s.size.toLong, s.min, s.max))
    }.toSet

  private val eventsGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(60, for {
      k <- Gen.choose(1L, 4L)
      t <- Gen.choose(0L, 2000L)
    } yield (k, t))

  test("sessionize == brute-force reference on random event sets") {
    import spark.implicits._
    (1 to 15).foreach { i =>
      val events = eventsGen(Gen.Parameters.default, Seed(42L + i)).get.distinct
      val df = events.toDF("user", "ep")
      val got = TimeWindows.sessionize(df, "ep", gap, Seq(col("user")), Seq(col("ep")),
        Seq(count(lit(1)).as("n"), min(col("ep")).as("s"), max(col("ep")).as("e")))
        .select("user", "n", "s", "e")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      assert(got == oracle(events), s"mismatch on seed ${42L + i}")
    }
  }
}
