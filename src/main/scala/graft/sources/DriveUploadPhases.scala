package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.{GraftSession, Tables}

/** r16 OPT probe: phase timers inside the upload path — sniff
  * (driver FS reads), multiline probe, inference action, typed
  * write — on the csv_sql_interface fixture shape. Lives in
  * graft.sources for access to the private helpers. Not library
  * surface. */
object DriveUploadPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [up] $label%-26s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val dir = "/root/repo/target/upload_phase_probe"
    val csvPath = s"$dir/orders_csv"
    Tables(spark, sfDir, "orders")
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").option("header", "true").csv(csvPath)

    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val db = new graft.catalog.GraftDatabase(spark.newSession(),
        s"$dir/db_$rep")
      val p = new org.apache.hadoop.fs.Path(csvPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val bytesTodo = t("getContentSummary") {
        fs.getContentSummary(p).getLength
      }
      val (encoding, sniff) = t("detectEncodingAndSniff") {
        CsvUploader.detectEncodingAndSniff(spark, csvPath,
          EncodingDetector.DefaultSniffBytes)
      }
      val windowText = t("decodeSniff") {
        CsvUploader.decodeSniff(encoding, sniff)
      }
      // replicate quotedNewlineInOtherParts's I/O shape: 15 part
      // windows of 256 KiB read sequentially on the driver + decode
      t("15x256KiB part windows") {
        val parts = fs.listStatus(p).filter(_.isFile)
          .map(_.getPath).filterNot(_.getName.startsWith("_"))
          .sortBy(_.getName).drop(1).take(15)
        parts.foreach { f =>
          val in = fs.open(f)
          try {
            val buf = new Array[Byte](256 * 1024)
            var off = 0; var r = 0
            while (off < buf.length &&
              { r = in.read(buf, off, buf.length - off); r > 0 }) off += r
            new String(buf, 0, off, java.nio.charset.StandardCharsets.UTF_8)
          } finally in.close()
        }
      }
      val raw = t("spark.read schema'd (lazy)") {
        val scanned = CsvUploader.scanWindow(windowText.get, ',')
        val schema = org.apache.spark.sql.types.StructType(
          scanned.header.map(n => org.apache.spark.sql.types.StructField(
            n, org.apache.spark.sql.types.StringType)))
        spark.read.option("header", "true").schema(schema).csv(csvPath)
      }
      // replicate inferWithCount's aggregate to split plan vs run
      locally {
        import org.apache.spark.sql.functions._
        import org.apache.spark.sql.types.{LongType, DoubleType}
        import org.apache.spark.sql.Column
        val D = "[0-9](_?[0-9])*"
        val IntRe = s"^[+-]?$D$$"
        val FloatRe = s"^[+-]?($D\\.?|$D\\.$D|\\.$D)([eE][+-]?$D)?$$"
        def missing(c: Column) = c.isNull || trim(c) === ""
        def canon(c: Column) = {
          val tt = translate(trim(c), "_", "")
          when(lower(tt).isin("inf", "+inf", "-inf"),
            concat(tt, lit("inity"))).otherwise(tt)
        }
        def isInt(c: Column) =
          canon(c).try_cast(LongType).isNotNull && trim(c).rlike(IntRe)
        def isFloat(c: Column) =
          canon(c).try_cast(DoubleType).isNotNull &&
            (!trim(c).contains("_") || trim(c).rlike(FloatRe))
        def aggFrame = {
          val counters = raw.columns.toSeq.flatMap { name =>
            val c = TypeInference.rawCol(name)
            Seq(
              coalesce(sum(when(!missing(c) && !isInt(c), 1L)
                .otherwise(0L)), lit(0L)).as(s"${name}__not_int"),
              coalesce(sum(when(!missing(c) && !isFloat(c), 1L)
                .otherwise(0L)), lit(0L)).as(s"${name}__not_float"))
          } :+ count(lit(1L)).as("__n_rows")
          raw.agg(counters.head, counters.tail: _*)
        }
        t("agg construct (columns)") { aggFrame }
        val af = aggFrame
        t("agg executedPlan") { af.queryExecution.executedPlan }
        t("agg head() (exec only)") { af.head() }
        val af2 = aggFrame
        t("agg fresh plan+head") { af2.head() }
      }
      val (types, rows) = t("inferWithCount ACTION") {
        TypeInference.inferWithCount(raw)
      }
      val typed = t("applyTypes (lazy)") {
        TypeInference.applyTypes(raw, types)
      }
      t("db.write typed ACTION") {
        db.write(typed, "uploaded_orders",
          org.apache.spark.sql.SaveMode.Overwrite)
      }
      println(s"  rows=$rows bytes=$bytesTodo enc=$encoding")
    }
    spark.stop()
  }
}
