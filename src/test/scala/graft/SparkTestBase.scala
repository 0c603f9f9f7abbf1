package graft

import org.apache.spark.sql.SparkSession

/** One shared local session across all suites (Spark sessions are
  * expensive; getOrCreate dedupes).
  */
trait SparkTestBase {
  lazy val spark: SparkSession = GraftSession.local(4)
  val sf: String = "/root/testdata/sf0.001"
  def scratch(name: String): String = {
    val dir = s"/root/repo/target/test_scratch/$name"
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm)
      f.delete(); ()
    }
    val f = new java.io.File(dir)
    if (f.exists()) rm(f)
    f.mkdirs()
    dir
  }
}
