package graft

/** Driver-contract smoke: SparkEntry.entry must return rows on sf0.001
  * (the same check the round driver performs). */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.api.GraftSession("local[4]", 4)
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
