package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measured ANN recall-vs-exact at the benched SF, emitted into the
  * per-round bench artifact.
  *
  * The recall floors for the approximate similarity operators otherwise
  * live only in SimilaritySpec at test scale — a config drift (bands,
  * nprobe, refine depth) that silently halved recall at the benched SF
  * would pass every spec and every rows-only correctness check. This
  * probe re-runs the exact baselines (q27 brute-force top-k, q38 exact
  * cosine self-join) and each approximate query at the SAME scale the
  * bench times, and writes measured recall + its floor into the
  * artifact so the drift is visible in per-round JSON.
  *
  * Floors are drift TRIPWIRES, not quality claims: set below the
  * operator's expected recall at these parameters (and aligned with the
  * SimilaritySpec floors where one exists — PQ 0.8, IVF-PQ 0.7,
  * high-sim LSH pairs 0.85). `q58…_all` records recall against ALL
  * exact pairs ≥ 0.3 — informational (floor 0): a 10-band/6-bit
  * hyperplane LSH is TUNED to catch high-cosine near-dups, and its
  * theoretical collision rate at cos≈0.3 is ~0.4; the contractual
  * surface is the high-sim row.
  */
object AnnRecall {

  final case class Entry(key: String, recall: Double, floor: Double, nExact: Long) {
    def ok: Boolean = recall >= floor
  }

  def measure(spark: SparkSession, sfDir: String): Seq[Entry] = {
    // exact top-10 per query (5 queries × k=10 — a driver-scale set)
    val exactTopK: Set[(Long, Long)] =
      SparkEntry.queries("q27_ann_bruteforce")(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet

    def topk(name: String, floor: Double): Entry = {
      val approx = SparkEntry.queries(name)(spark, sfDir)
        .select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      Entry(name, approx.intersect(exactTopK).size.toDouble / math.max(exactTopK.size, 1),
        floor, exactTopK.size.toLong)
    }

    // exact near-dup pair set (distributed joins — the pair sets scale
    // with the corpus, so nothing here lands on the driver)
    def canonPairs(df: DataFrame): DataFrame =
      df.select(least(col("id_a"), col("id_b")).as("pa"),
                greatest(col("id_a"), col("id_b")).as("pb"))
        .distinct()

    val exact = SparkEntry.queries("q38_embed_dedup")(spark, sfDir)
      .select(least(col("id_a"), col("id_b")).as("pa"),
              greatest(col("id_a"), col("id_b")).as("pb"), col("cos"))
      .dropDuplicates("pa", "pb").cache()
    val approx58 = canonPairs(SparkEntry.queries("q58_embed_dedup_lsh")(spark, sfDir)).cache()
    try {
      val exactHigh = exact.filter(col("cos") >= 0.9)
      val nAll = exact.count()
      val nHigh = exactHigh.count()
      val hitAll = approx58.join(exact, Seq("pa", "pb")).count()
      val hitHigh = approx58.join(exactHigh, Seq("pa", "pb")).count()
      // floors sit ~0.1 under the minimum measured across sf0.001/0.01/
      // 0.1 at the current parameters (q28 0.82-0.86 with multi-probe,
      // q52/q75 0.68-0.76 at nprobe=16, q74 0.86-1.0 at refine=8), so a
      // param drift that meaningfully degrades recall trips them while
      // corpus-to-corpus variance does not
      Seq(
        topk("q28_ann_lsh", floor = 0.7),
        topk("q52_ann_ivf", floor = 0.6),
        topk("q74_ann_pq", floor = 0.8),
        topk("q75_ann_ivfpq", floor = 0.6),
        Entry("q58_embed_dedup_lsh",
          if (nHigh == 0) 1.0 else hitHigh.toDouble / nHigh, 0.85, nHigh),
        Entry("q58_embed_dedup_lsh_all",
          if (nAll == 0) 1.0 else hitAll.toDouble / nAll, 0.0, nAll))
    } finally {
      exact.unpersist()
      approx58.unpersist()
    }
  }
}
