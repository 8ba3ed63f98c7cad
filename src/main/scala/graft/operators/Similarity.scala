package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *  - `bruteForceTopK`: exact cosine top-k — the correctness baseline.
  *    Broadcast the (small) query set, scan the corpus once, per-query
  *    top-k via window rank. At 100 TB the scan parallelizes perfectly;
  *    cost is O(n·q·d) — fine for small q.
  *  - `lshTopK`: random-hyperplane LSH bucketing — the scale path.
  *    Sign-bit sketch → bucket join → exact cosine only within buckets
  *    (multi-probe by sketch band). Candidate set ≪ n per query.
  *
  * Dot products are `functions.aggregate`/`zip_with` expression trees
  * (codegen'd) — no UDFs.
  */
object Similarity {

  /** cosine(a, b) for two array<float|double> columns. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v.cast("double") * v.cast("double")))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v.cast("double") * v.cast("double")))
    dot / (na * nb)
  }

  /** Exact top-k neighbors for each query vector (cross score + rank).
    * `queries` and `corpus` both need (idCol, vecCol); self-matches are
    * excluded.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Random-hyperplane sign sketch (numBits hyperplanes). Hyperplanes
    * are Rademacher ±1 vectors from a fixed-seed PRNG — identical on
    * every executor (literal arrays in the plan, no runtime RNG state).
    */
  def signSketch(vec: Column, numBits: Int, dim: Int): Column = {
    val rnd = new java.util.Random(42)
    val planes = Array.fill(numBits, dim)(if (rnd.nextBoolean()) 1.0d else -1.0d)
    val bits = (0 until numBits).map { b =>
      val plane = typedLit(planes(b).toSeq)
      val proj = aggregate(zip_with(vec, plane, (x, p) => x * p), lit(0.0d), (acc, v) => acc + v)
      when(proj > 0, lit(1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** LSH ANN: bucket by sketch bands, exact cosine within buckets, then
    * per-query top-k. Recall < 1 by construction; `numBands`×`bandBits`
    * trades recall vs candidate count.
    */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
              k: Int, dim: Int, numBands: Int = 4, bandBits: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val numBits = numBands * bandBits
    def banded(df: DataFrame, id: String, v: String) = {
      val sk = df.select(col(idCol).as(id), col(vecCol).as(v),
        signSketch(col(vecCol), numBits, dim).as("sk"))
      sk.select(col(id), col(v),
        explode(array((0 until numBands).map(b =>
          struct(lit(b).as("band"),
            shiftright(col("sk"), b * bandBits).bitwiseAND((1L << bandBits) - 1).as("chunk"))): _*)).as("bc"))
        .select(col(id), col(v), col("bc.band"), col("bc.chunk"))
    }
    val cb = banded(corpus, "neighbor_id", "cv")
    val qb = banded(queries, "query_id", "qv")
    val cand = cb.join(qb, Seq("band", "chunk"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), col("qv"), col("cv"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cos"), col("rk"))
  }

  /** Embedding-cosine near-duplicate pairs: all pairs above `minCos`,
    * generated via LSH buckets (not O(n²)).
    */
  def embeddingNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                            dim: Int, minCos: Double = 0.95,
                            numBands: Int = 8, bandBits: Int = 8): DataFrame = {
    val numBits = numBands * bandBits
    val sk = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signSketch(col(vecCol), numBits, dim).as("sk"))
    val banded = sk.select(col("id"), col("v"),
      explode(array((0 until numBands).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sk"), b * bandBits).bitwiseAND((1L << bandBits) - 1).as("chunk"))): _*)).as("bc"))
      .select(col("id"), col("v"), col("bc.band"), col("bc.chunk"))
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("v").as("va"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("band", "chunk"))
      .where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("va"), col("vb")))
      .where(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), col("cos"))
  }
}
