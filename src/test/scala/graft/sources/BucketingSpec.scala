package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

/** Bucketed tables must make the co-located join shuffle-free. */
class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("join of two same-key bucketed tables has no shuffle exchange") {
    import spark.implicits._
    val fact1 = Seq.tabulate(1000)(i => (i.toLong % 50, i.toLong, i * 2.0)).toDF("k", "row_id", "v1")
    val fact2 = Seq.tabulate(800)(i => (i.toLong % 50, i * 3.0)).toDF("k", "v2")
    Bucketing.writeBucketed(fact1, "bkt_fact1", "k", 8)
    Bucketing.writeBucketed(fact2, "bkt_fact2", "k", 8)

    // fact-fact shape: the tables are tiny here, so pin the planner to
    // the shuffle-join path a 100 TB fact-fact join would take
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.bucketedJoin(spark, "bkt_fact1", "bkt_fact2", "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"), "scan should use bucket layout")
      assert(joined.count() == 1000L * 16) // 20 rows/key × 16 rows/key per 50 keys

      // aggregation on the bucket key is also shuffle-free
      val agg = spark.table("bkt_fact1").groupBy("k").agg(sum("v1"))
      assert(!agg.queryExecution.executedPlan.toString.contains("Exchange"))

      // contrast: the same join on unbucketed data shuffles
      fact1.createOrReplaceTempView("flat1"); fact2.createOrReplaceTempView("flat2")
      val flat = spark.table("flat1").join(spark.table("flat2"), Seq("k"))
      assert(flat.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }
}
