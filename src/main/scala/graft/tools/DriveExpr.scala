package graft.tools

/** Drive the SQL-registered expressions end-to-end (codegen path). */
object DriveExpr {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(4)
    graft.functions.GraftFunctions.ensureRegistered(spark)
    spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .createOrReplaceTempView("documents")
    val rows = spark.sql(
      """SELECT graft_rolling_hash64(text) AS rh,
        |  graft_simhash60(split(lower(text), ' ')) AS sh
        |FROM documents LIMIT 3""".stripMargin).collect()
    rows.foreach(r => println(s"[drive] rh=${r.getLong(0)} sh=${r.getLong(1)}"))
    println("[drive] distinct rh over corpus = " + spark.sql(
      "SELECT COUNT(DISTINCT graft_rolling_hash64(text)) FROM documents")
      .head().getLong(0))
    spark.stop()
  }
}
