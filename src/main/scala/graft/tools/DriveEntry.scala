package graft.tools

object DriveEntry {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    val df = graft.SparkEntry.entry(spark)
    println("[drive] entry rows=" + df.count() + " cols=" + df.columns.mkString(","))
    spark.stop()
  }
}
