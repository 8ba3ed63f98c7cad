package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Quality bounds for the dedup operators: exact-dedup normalization,
  * MinHash estimate accuracy vs true Jaccard, LSH candidate recall on
  * planted near-duplicates, SimHash Hamming behavior.
  */
class DedupQualitySpec extends AnyFunSuite with SparkTestSession {

  private val rnd = new scala.util.Random(7)
  private val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
    "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango")

  private def doc(words: Int): String =
    Seq.fill(words)(vocab(rnd.nextInt(vocab.size))).mkString(" ")

  /** Perturb ~frac of the words — a near-duplicate. */
  private def perturb(text: String, frac: Double): String =
    text.split(" ").map(w =>
      if (rnd.nextDouble() < frac) vocab(rnd.nextInt(vocab.size)) else w).mkString(" ")

  private def jaccard(a: String, b: String, k: Int = 3): Double = {
    def sh(t: String) = t.split(" ").sliding(k).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("exact dedup collapses case/whitespace variants and counts members") {
    import spark.implicits._
    val docs = Seq(
      (1L, "The Quick Brown Fox"),
      (2L, "the quick   brown fox"),
      (3L, "  THE QUICK BROWN FOX  "),
      (4L, "a different document")).toDF("doc_id", "text")
    val out = Dedup.exact(docs, "text", "doc_id").collect()
    assert(out.length == 2)
    val big = out.find(_.getAs[Long]("dup_count") == 3L).get
    assert(big.getAs[Long]("keep_id") == 1L)
  }

  test("minhash est_jaccard tracks true jaccard within the sampling bound") {
    import spark.implicits._
    val base = Seq.fill(40)(doc(120))
    val pairs = base.zipWithIndex.map { case (t, i) => (i, t, perturb(t, 0.04)) }
    val docs = pairs.flatMap { case (i, a, b) => Seq((i * 2L, a), (i * 2L + 1L, b)) }
      .toDF("doc_id", "text")
    // 32 hashes → stderr ≈ sqrt(j(1-j)/32) ≤ 0.09; assert within 4σ
    val est = Dedup.minhashLsh(docs, "text", "doc_id", numBands = 8, rowsPerBand = 4)
      .where(col("id_b") === col("id_a") + 1 && col("id_a") % 2 === 0)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Double]("est_jaccard"))).toMap
    val checked = pairs.count { case (i, a, b) =>
      val j = jaccard(a, b)
      est.get(i * 2L).exists(e => math.abs(e - j) < 0.36)
    }
    // high-similarity pairs must be found as candidates AND estimated well
    assert(checked >= 36, s"only $checked/40 pairs within bound")
  }

  test("minhash LSH finds planted near-duplicates (recall) and no self-noise") {
    import spark.implicits._
    val uniques = Seq.tabulate(100)(i => (i.toLong, doc(80)))
    val dups = uniques.take(20).map { case (i, t) => (1000L + i, perturb(t, 0.05)) }
    val docs = (uniques ++ dups).toDF("doc_id", "text")
    val cand = Dedup.minhashLsh(docs, "text", "doc_id")
      .where(col("id_b") === col("id_a") + 1000L)
    assert(cand.count() >= 18, "LSH missed planted near-dups")
  }

  test("simhash: near-duplicates land within the Hamming threshold, unrelated docs don't pair") {
    import spark.implicits._
    val uniques = Seq.tabulate(60)(i => (i.toLong, doc(100)))
    val dups = uniques.take(15).map { case (i, t) => (1000L + i, perturb(t, 0.03)) }
    val docs = (uniques ++ dups).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, "text", "doc_id", maxHamming = 8)
    val planted = pairs.where(col("id_b") === col("id_a") + 1000L).count()
    assert(planted >= 12, s"simhash found only $planted/15 planted near-dups")
  }

  test("ngram jaccard verify matches the scala definition on candidate pairs") {
    import spark.implicits._
    val a = doc(50); val b = perturb(a, 0.1)
    val docs = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L)).toDF("id_a", "id_b")
    val row = Dedup.ngramJaccard(pairs, docs, "text", "doc_id").collect().head
    assert(math.abs(row.getAs[Double]("jaccard") - jaccard(a, b)) < 1e-12)
  }
}
