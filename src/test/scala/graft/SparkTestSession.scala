package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local session for specs. */
trait SparkTestSession extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkTestSession.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkTestSession {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // same rationale as GraftSession: Hive-style ${var} substitution
      // corrupts ${...} inside dialect string literals
      .config("spark.sql.variable.substitute", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
