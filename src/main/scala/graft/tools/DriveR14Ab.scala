package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** r14 re-measure probe (VERDICT r13 #1/#2): the single-tokenize
  * `text_index_build` plus the two suspected-jitter r13 regressions
  * (`text_search_ranked` 1.44×, `dedup_minhash` 1.26×), interleaved
  * min-of-7 against the `dedup_ngram_jaccard` phase anchor — the
  * DriveCleanAb discipline (alternating reps so no variant owns the
  * warm tail; minima cancel host phase). Not library surface.
  */
object DriveR14Ab {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // OLD build shape (pre-r14): the three artifact writes re-run the
    // unpersisted tokenize subtree per action — reproduced here as
    // the A side of the in-session A/B.
    def buildOld(): Long = {
      import org.apache.spark.sql.functions._
      val db = graft.catalog.GraftDatabase(spark,
        s"${graft.operators.CsvQueries.scratchRoot}/r14ab_old/db")
      val docs = graft.Tables(spark, sf, "documents")
      val n = spark.sparkContext.defaultParallelism
      val tok = graft.operators.TextIndex.tokenized(docs)
      val (postings, lens, stats) =
        graft.operators.TextIndex.batchArtifacts(tok, batchId = -1L)
      db.writeBucketed(postings, "p_old", "term", n)
      db.writeBucketed(lens, "p_old_len", "doc_id", n)
      val dfs = db.readBucketed("p_old").groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .select(lit(-1L).as("batch_id"), col("term"), col("df"))
      db.writeBucketed(dfs, "p_old_df", "term", n)
      db.write(stats, "p_old_corpus", org.apache.spark.sql.SaveMode.Overwrite)
      db.read("p_old_corpus").count()
    }

    val names = Seq("dedup_ngram_jaccard", "text_index_build",
      "text_search_ranked", "dedup_minhash")
    val best = scala.collection.mutable.Map[String, Double]()
    def timed(rep: Int, n: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      println(f"rep$rep $n%-22s $s%.3f")
    }
    // one untimed warm pass (classloading, parquet footers, index)
    names.foreach(n => SparkEntry.queries(n)(spark, sf).count())
    buildOld()
    for (rep <- 1 to reps) {
      names.foreach(n =>
        timed(rep, n)(SparkEntry.queries(n)(spark, sf).count()))
      timed(rep, "text_index_build_OLD")(buildOld())
    }
    println("== min-of-" + reps + " @ " + sf)
    (names :+ "text_index_build_OLD").foreach(n =>
      println(f"${n}%-22s ${best(n)}%.3f"))
  }
}
