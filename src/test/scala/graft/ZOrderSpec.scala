package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.GraftDatabase
import graft.functions.GraftFunctions.zorder

/** Z-order layout (SURVEY.md §2.H12): curve arithmetic + the
  * clustering property that makes it worth writing.
  */
class ZOrderSpec extends AnyFunSuite with SparkTestBase {

  private def zref(vals: Seq[Long]): Long = {
    val k = vals.size
    val bits = 63 / k
    var z = 0L
    for (j <- 0 until k; i <- 0 until bits)
      z |= ((vals(j) >>> i) & 1L) << (i * k + j)
    z
  }

  test("curve value matches the reference interleave (2 and 3 cols)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 20).toLong,
      rnd.nextInt(1 << 20).toLong, rnd.nextInt(1 << 10).toLong))
    val df = rows.toDF("a", "b", "c")
    val got2 = df.select(zorder(col("a"), col("b"))).as[Long].collect()
    rows.map(r => zref(Seq(r._1, r._2))).zip(got2).foreach {
      case (w, g) => assert(w == g)
    }
    val got3 = df.select(zorder(col("a"), col("b"), col("c")))
      .as[Long].collect()
    rows.map(r => zref(Seq(r._1, r._2, r._3))).zip(got3).foreach {
      case (w, g) => assert(w == g)
    }
  }

  test("curve value survives the interpreted (non-codegen) path and nulls") {
    import spark.implicits._
    val df = Seq((Some(3L), Some(5L)), (None, Some(1L)))
      .toDF("a", "b")
      .select(zorder(col("a"), col("b")).as("z"))
    // filter forces a second evaluation context; null row must stay null
    assert(df.collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq ==
      Seq(Some(zref(Seq(3L, 5L))), None))
  }

  test("curve accepts int columns (implicit cast) on both eval paths") {
    import spark.implicits._
    val df = Seq((3, 5), (7, 2)).toDF("a", "b") // IntegerType columns
    val got = df.select(zorder(col("a"), col("b")).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(zref(Seq(3L, 5L)), zref(Seq(7L, 2L))))
  }

  test("r15: null z-values survive bootstrap AND append; all-uncastable errors loudly") {
    import spark.implicits._
    val db = GraftDatabase(spark, scratch("z_nulls"))
    // bootstrap admits rows with null z-values as long as the column
    // has SOME data (the mixed-nullability corpus)
    val base = Seq((1L, Some(10L), 1L), (2L, Some(500L), 2L),
      (3L, None, 3L), (4L, Some(90L), 4L), (5L, Some(700L), 5L))
      .toDF("id", "k", "k2")
    db.writeZOrdered(base, "zn", Seq("k", "k2"), nFiles = 2)
    assert(db.read("zn").count() == 5)
    // an append carrying another null-z row must not NPE the
    // (foreachBatch-shaped) maintenance path — r15 review: a null
    // curve value made the touched-files collect throw, a permanent
    // stream failure
    db.appendZOrdered("zn",
      Seq((6L, Some(250L), 6L), (7L, Option.empty[Long], 7L))
        .toDF("id", "k", "k2"))
    assert(db.read("zn").count() == 7)
    assert(db.read("zn").filter(col("k").isNull).count() == 2)
    // every z-column derives NO bounds over NON-empty input (all
    // null; an uncastable string already throws loudly under ANSI):
    // loud, not a silent no-op that leaves no table and no error
    val ex = intercept[IllegalArgumentException] {
      db.writeZOrdered(
        Seq((1L, Option.empty[Long], Option.empty[Long]),
          (2L, Option.empty[Long], Option.empty[Long]))
          .toDF("id", "ka", "kb"),
        "zbad", Seq("ka", "kb"), nFiles = 2)
    }
    assert(ex.getMessage.contains("ka"))
  }

  test("r15: full-range z-column — sidecar corner ranges agree with row curve values") {
    import spark.implicits._
    val db = GraftDatabase(spark, scratch("z_fullrange"))
    // xxhash64-like keys spanning nearly the whole signed range:
    // hi - lo wraps negative in 64-bit arithmetic, and the arithmetic
    // vs unsigned shift divergence (r15 review) put sidecar ranges
    // and row curve values in different spaces — an append then
    // misassigned every row's segment
    val vals = Seq(Long.MinValue + 3, -1234567890123L, 0L,
      987654321098L, Long.MaxValue - 7)
    val base = vals.zipWithIndex.map { case (v, i) => (i.toLong, v, -v) }
      .toDF("id", "k", "k2")
    db.writeZOrdered(base, "zf", Seq("k", "k2"), nFiles = 2)
    assert(db.read("zf").count() == 5)
    // the append path recomputes curve values and probes the sidecar
    // ranges — consistency means every row lands in a segment and
    // nothing is lost or duplicated
    db.appendZOrdered("zf",
      Seq((10L, Long.MinValue + 99, 17L), (11L, 42L, -9999999L))
        .toDF("id", "k", "k2"))
    assert(db.read("zf").count() == 7)
    assert(db.read("zf").select(sum(col("id"))).head().getLong(0) ==
      (0L + 1 + 2 + 3 + 4 + 10 + 11))
  }

  test("segment index = last sorted bound <= value, O(log F)") {
    import spark.implicits._
    import graft.functions.GraftFunctions.segmentIndex
    val bounds = Array(10L, 20L, 20L, 40L)
    val got = Seq(5L, 10L, 15L, 20L, 39L, 40L, 99L).toDF("v")
      .select(segmentIndex(col("v"), bounds).as("i"))
      .as[Int].collect().toSeq
    // below-min clamps to 0; exact hits land on a matching bound;
    // between-bounds takes the lower segment
    assert(got(0) == 0 && got(1) == 0 && got(2) == 0)
    assert(bounds(got(3)) == 20L && got(4) >= 1 && bounds(got(4)) == 20L)
    assert(got(5) == 3 && got(6) == 3)
  }

  test("upsert skips an empty first batch and bootstraps on the next") {
    import spark.implicits._
    val dir = scratch("zempty_db")
    val db = GraftDatabase(spark, dir)
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    db.upsertZOrdered("t", empty, Seq("a", "b"), nFiles = 4) // no-op
    db.upsertZOrdered("t",
      (0L until 100L).map(i => (i % 10, i)).toDF("a", "b"),
      Seq("a", "b"), nFiles = 4)
    db.upsertZOrdered("t", empty, Seq("a", "b"), nFiles = 4) // no-op append
    assert(db.read("t").count() == 100)
  }

  test("z-ordered layout narrows per-file ranges on BOTH dimensions") {
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dir = scratch("zorder_db")
    val db = GraftDatabase(spark, dir)
    db.writeZOrdered(orders, "orders_z", Seq("o_custkey", "o_orderkey"),
      nFiles = 16)

    def avgWidthFrac(c: String): Double = {
      val widths = spark.read.parquet(s"$dir/orders_z")
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).cast("double").as("w"))
        .collect().map(_.getDouble(1))
      val global = orders.agg(
        (max(col(c)) - min(col(c))).cast("double")).head().getDouble(0)
      widths.sum / widths.length / global
    }
    // 16 curve segments ≈ a 4×4 grid: each file should span well
    // under half of each dimension's global range (a single-column
    // sort leaves the other column at fraction ~1.0); the slack above
    // 0.25 absorbs quantile boundaries straddling curve quadrants
    val fCust = avgWidthFrac("o_custkey")
    val fKey = avgWidthFrac("o_orderkey")
    assert(fCust < 0.6, s"custkey per-file width fraction $fCust")
    assert(fKey < 0.6, s"orderkey per-file width fraction $fKey")

    // sanity: same rows came back
    assert(db.read("orders_z").count() == orders.count())
  }

  test("incremental z-append rewrites only the overlapping curve segments") {
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dir = scratch("zinc_db")
    val db = GraftDatabase(spark, dir)
    db.writeZOrdered(orders, "oz", Seq("o_custkey", "o_orderkey"),
      nFiles = 16)

    def fileState(): Map[String, Long] = {
      val d = new java.io.File(s"$dir/oz")
      d.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(f => f.getName -> f.length()).toMap
    }
    val before = fileState()
    assert(before.size >= 8, s"want many files, got ${before.size}")

    // a batch confined to the low-key corner of the curve
    val Array(maxC, maxO) = orders
      .agg(max(col("o_custkey")), max(col("o_orderkey"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val batch = orders.filter(
      col("o_custkey") <= maxC / 10 && col("o_orderkey") <= maxO / 10)
    val nBatch = batch.count()
    assert(nBatch > 0)
    db.appendZOrdered("oz", batch)

    val after = fileState()
    val untouched = before.filter { case (n, len) =>
      after.get(n).contains(len)
    }
    assert(untouched.size >= before.size / 2,
      s"append rewrote ${before.size - untouched.size} of ${before.size} files")

    // content: exactly the original multiset plus the batch
    val expected = orders.unionAll(batch)
    val got = db.read("oz")
    assert(got.count() == orders.count() + nBatch)
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)

    // the sidecar stays consistent: a second append still works and
    // still targets a minority of files
    db.appendZOrdered("oz", batch)
    assert(db.read("oz").count() == orders.count() + 2 * nBatch)
  }

  test("z-append recovers a table stranded by a crashed merge") {
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dir = scratch("zcrash_db")
    val db = GraftDatabase(spark, dir)
    db.writeZOrdered(orders, "oz", Seq("o_custkey", "o_orderkey"),
      nFiles = 8)
    val n0 = orders.count()

    // Manufacture a mid-crash state: one sidecar-listed file backed
    // out to _zold_ (as if the crash hit between backup and sidecar
    // publish), a half-moved stage orphan in the table dir, and a
    // leftover stage dir.
    val tableDir = new java.io.File(s"$dir/oz")
    val aFile = tableDir.listFiles()
      .filter(f => f.isFile && f.getName.startsWith("part-")).head
    val backup = new java.io.File(s"$dir/_zold_oz")
    backup.mkdirs()
    assert(aFile.renameTo(new java.io.File(backup, aFile.getName)))
    java.nio.file.Files.write(
      new java.io.File(tableDir, "part-bogus-halfmoved").toPath,
      Array[Byte](1, 2, 3))
    new java.io.File(s"$dir/_zstage_oz").mkdirs()

    // the next append must first restore the consistent state, then
    // merge its batch normally
    val batch = orders.limit(50)
    db.appendZOrdered("oz", batch)
    assert(db.read("oz").count() == n0 + 50)
    assert(!backup.exists() && !new java.io.File(s"$dir/_zstage_oz").exists())
    assert(!new java.io.File(tableDir, "part-bogus-halfmoved").exists())
  }

  test("upsert after a crash in the sidecar-publish window appends, " +
      "not overwrites") {
    import spark.implicits._
    val dir = scratch("zbak_db")
    val db = GraftDatabase(spark, dir)
    db.upsertZOrdered("t",
      (0L until 100L).map(i => (i % 10, i)).toDF("a", "b"),
      Seq("a", "b"), nFiles = 4)
    // Manufacture the narrowest writeZMeta crash window: the current
    // sidecar has been moved aside to .bak and the tmp not yet moved
    // in — only the .bak exists. The next upsert must treat the table
    // as bootstrapped (append path), NOT re-bootstrap with
    // SaveMode.Overwrite and silently drop the 100 existing rows.
    val meta = new java.io.File(s"$dir/t/_zorder_meta.tsv")
    assert(meta.renameTo(new java.io.File(s"$dir/t/_zorder_meta.tsv.bak")))
    db.upsertZOrdered("t",
      (100L until 150L).map(i => (i % 10, i)).toDF("a", "b"),
      Seq("a", "b"), nFiles = 4)
    assert(db.read("t").count() == 150)
    assert(meta.exists(), "sidecar restored from .bak and republished")
  }

  test("writeZOrdered names an all-null z-column instead of NPE-ing") {
    import spark.implicits._
    val dir = scratch("znull_db")
    val db = GraftDatabase(spark, dir)
    val df = Seq((1L, Option.empty[Long]), (2L, Option.empty[Long]))
      .toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      db.writeZOrdered(df, "t", Seq("a", "b"), nFiles = 2)
    }
    assert(e.getMessage.contains("b"))
  }

  /** Per-file [min,max] of the ACTUAL curve values, recomputed from
    * the data with the sidecar's normalization (clamp, rebase, shift,
    * interleave). The sidecar's own per-file ranges are min/max-CORNER
    * bounds — conservative supersets that overlap by construction —
    * so disjointness is a property of the actual values, not of the
    * sidecar.
    */
  private def zFileRanges(dir: String, table: String): Seq[(Long, Long)] = {
    val src = scala.io.Source.fromFile(s"$dir/$table/_zorder_meta.tsv")
    val metas = try src.getLines().filter(_.startsWith("col\t"))
      .map(_.split("\t")).map(a => (a(1), a(2).toLong, a(3).toLong,
        a(4).toInt)).toList
      finally src.close()
    val cols = metas.map(_._1)
    val rows = spark.read.parquet(s"$dir/$table")
      .select(input_file_name().as("f"),
        struct(cols.map(col): _*).as("v"))
      .collect()
      .map { r =>
        val vs = metas.zipWithIndex.map { case ((_, lo, hi, sh), i) =>
          val c = math.min(math.max(r.getStruct(1).getLong(i), lo), hi) - lo
          if (sh > 0) c >>> sh else if (sh < 0) c << -sh else c
        }
        (r.getString(0), zref(vs))
      }
    rows.groupBy(_._1).values
      .map(g => (g.map(_._2).min, g.map(_._2).max)).toSeq.sortBy(_._1)
  }

  test("rebalanceZ bounds file sizes after skewed appends and keeps " +
      "ranges disjoint") {
    val orders = Tables(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val dir = scratch("zreb_db")
    val db = GraftDatabase(spark, dir)
    db.writeZOrdered(orders, "oz", Seq("o_custkey", "o_orderkey"),
      nFiles = 12)

    def fileSizes(): Seq[Long] = {
      val d = new java.io.File(s"$dir/oz")
      d.listFiles().filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.length()).toSeq
    }
    // skew: repeatedly append only the low corner — the overlapped
    // segments fatten while the rest stay put
    val Array(maxC, maxO) = orders
      .agg(max(col("o_custkey")), max(col("o_orderkey"))).head()
      .toSeq.map(_.asInstanceOf[Long]).toArray
    val corner = orders.filter(
      col("o_custkey") <= maxC / 8 && col("o_orderkey") <= maxO / 8)
    val nCorner = corner.count()
    (1 to 4).foreach(_ => db.appendZOrdered("oz", corner))
    val n = orders.count() + 4 * nCorner

    val total = fileSizes().sum
    val target = total / 12
    db.rebalanceZ("oz", targetBytes = target)

    // bounded factor: nothing fat, count near ideal (merged slivers)
    val after = fileSizes()
    assert(after.forall(_ <= 2 * target),
      s"oversized file after rebalance: ${after.sorted.reverse.take(3)}")
    assert(after.size <= 2 * 12 + 1, s"file count ${after.size}")
    // content: exact multiset preserved
    assert(db.read("oz").count() == n)
    val expected = (1 to 4).foldLeft(orders)((d, _) => d.unionAll(corner))
    assert(db.read("oz").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(db.read("oz")).count() == 0)
    // per-file curve ranges stay disjoint-ish: consecutive files (by
    // zmin) may touch at a boundary value but not nest/overlap beyond
    // a small remainder of untouched files
    val ranges = zFileRanges(dir, "oz")
    val overlaps = ranges.sliding(2).count {
      case Seq((_, aMax), (bMin, _)) => aMax > bMin
      case _ => false
    }
    assert(overlaps <= ranges.size / 4,
      s"$overlaps of ${ranges.size} consecutive ranges overlap")
    // the table stays maintainable: another append round-trips
    db.appendZOrdered("oz", corner.limit(10))
    assert(db.read("oz").count() == n + 10)
  }

  test("streaming ingest via upsertZOrdered keeps the table clustered") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = scratch("zstream_db")
    val db = GraftDatabase(spark, dir)
    val mem = MemoryStream[(Long, Long)]
    val q = mem.toDF().toDF("o_custkey", "o_orderkey")
      .writeStream
      .option("checkpointLocation", s"$dir/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        db.upsertZOrdered("oz", b, Seq("o_custkey", "o_orderkey"),
          nFiles = 4)
      }
      .start()
    try {
      mem.addData((0 until 400).map(i => (i.toLong % 100, i.toLong)): _*)
      q.processAllAvailable()
      mem.addData((400 until 500).map(i => (i.toLong % 100, i.toLong)): _*)
      q.processAllAvailable()
      assert(db.read("oz").count() == 500)
      // still curve-sorted within each file: z of consecutive rows in
      // any one file is non-decreasing for the first batch's bounds
      val perFile = spark.read.parquet(s"$dir/oz")
        .groupBy(input_file_name())
        .agg((max(col("o_custkey")) - min(col("o_custkey"))).as("w"))
        .collect().map(_.getLong(1))
      assert(perFile.exists(_ < 99), "no file narrowed the custkey range")
    } finally q.stop()
  }
}
