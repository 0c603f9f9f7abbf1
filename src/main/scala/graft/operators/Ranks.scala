package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global row numbering — a total-order rank with NO
  * single-reducer pass over the data.
  *
  * `row_number() OVER (ORDER BY …)` without a PARTITION BY plans a
  * single-partition window: the whole input funnels through one task,
  * which is exactly the bottleneck a 100 TB engine cannot have. The
  * scalable shape is the classic two-phase rank: range-exchange on
  * the order keys (sampled boundaries — the same machinery as
  * `orderBy`/`exportSorted`), local sort, then per-partition offsets
  * added to each row's local index.
  *
  * The offset phase is `RDD.zipWithIndex` over the sorted plan's ONE
  * materialized RDD lineage — its count job and the main job share
  * the same ShuffledRDD and partitioner instance, so the sampled
  * range boundaries are fixed once and every consumer sees the same
  * partition contents by construction. The earlier DataFrame-only
  * formulations were subtly unsound: offsets collected in a separate
  * query re-planned a NEW range exchange whose sample could differ
  * (wrong ranks the moment any SQL execution slipped between offset
  * job and consumer — observed via a `.rdd` call), and an in-plan
  * offsets-side/data-side pair agrees only while ReuseExchange
  * dedupes the two subtrees (a supported config away from silent
  * corruption). Dropping to the RDD for exactly this utility is the
  * licensed `mapPartitions`-class exception: per-partition positional
  * indexing is genuinely imperative.
  *
  * Ranks are deterministic outputs regardless of boundaries: under a
  * TOTAL order a row's position is unique, which is why `order` must
  * include a unique tiebreak column.
  */
object Ranks {

  /** `df` + a 1-based `out` column numbering rows under `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      out: String): DataFrame =
    globalRowNumberWithTotal(df, order, out)._1

  /** [[globalRowNumber]] that also returns the TOTAL row count — the
    * offset job (which every distributed rank must run anyway)
    * already folds per-partition counts on the driver, so the total
    * is free. Callers that would otherwise run a separate
    * `count()`/agg job plus a broadcast join to learn the corpus size
    * (C30's stage-width arithmetic) read it from here instead: one
    * fewer job and one fewer broadcast wave, identical ranks.
    */
  def globalRowNumberWithTotal(df: DataFrame, order: Seq[Column],
      out: String): (DataFrame, Long) = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    zipRanked(sorted, out)
  }

  /** [[globalRowNumber]] specialized to a LEADING key that is a
    * uniform hex-encoded hash (md5/sha — the deterministic-shuffle
    * keys of C22/C12): the range boundaries of a uniform key are
    * known analytically, so the sampling job `repartitionByRange`
    * runs to discover them — a full extra execution of the upstream
    * plan — is dropped entirely. Bucket = the key's first 15 hex
    * digits (60 bits) divided into `n` equal-width contiguous
    * ranges; bucket order IS lexicographic key order (fixed-width
    * hex), and ties beyond the prefix stay inside one bucket, where
    * the per-partition external sort (Spark's spillable
    * `sortWithinPartitions`, not an in-memory array sort) orders
    * them under the full `order`. Uniformity also makes the buckets
    * balanced by construction — the very guarantee sampling only
    * approximates.
    *
    * `hashKey` must be a fixed-width lowercase-hex NON-NULL column
    * and must be the first element of `order`; rank output is
    * identical to [[globalRowNumber]] on the same `order` (spec-
    * pinned), only the job count differs.
    */
  def hashOrderedRowNumber(df: DataFrame, hashKey: Column,
      order: Seq[Column], out: String): DataFrame =
    zipRanked(hashRangePartitioned(df, hashKey, order), out)._1

  /** The analytic-boundary core, also usable on its own (H16's
    * shuffled export): rows land in equal-width 60-bit-hash-prefix
    * buckets — bucket index = partition index, so partition order IS
    * lexicographic key order — and each partition runs Spark's
    * spillable sort under the full `order`. Globally sorted output
    * with no sampling job.
    */
  private[graft] def hashRangePartitioned(df: DataFrame, hashKey: Column,
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.functions.{conv, substring}
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // ceil-width so v/width < n for every v in [0, 2^60)
    val width = (1L << 60) / n + 1
    val b = "__graft_bucket"
    val withB = df.withColumn(b,
      (conv(substring(hashKey, 1, 15), 16, 10).cast(LongType) /
        width).cast("int"))
    val bIdx = withB.schema.fieldIndex(b)
    val parted = withB.rdd
      .map(r => (r.getInt(bIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(parted, withB.schema)
      .sortWithinPartitions(order: _*)
      .drop(b)
  }

  /** The offset core `zipWithIndex` hides: count each partition (job
    * 1, folding the per-partition counts on the driver — which makes
    * the TOTAL free for callers), then add exclusive prefix offsets
    * map-side (job 2, reading the same shuffle files — both jobs run
    * over the ONE `rdd` object, the same stage-reuse soundness
    * property `zipWithIndex` has).
    */
  private def zipRanked(sorted: DataFrame, out: String): (DataFrame, Long) = {
    val rdd = sorted.rdd
    val counts = rdd.mapPartitions { it =>
      var c = 0L
      while (it.hasNext) { it.next(); c += 1L }
      Iterator.single(c)
    }.collect()
    val offsets = counts.scanLeft(0L)(_ + _)
    val ranked = rdd.mapPartitionsWithIndex { (i, it) =>
      var pos = offsets(i)
      it.map { row => pos += 1L; Row.fromSeq(row.toSeq :+ pos) }
    }
    (sorted.sparkSession.createDataFrame(ranked,
      sorted.schema.add(out, LongType, nullable = false)), offsets.last)
  }

  /** Per-key cumulative sum with NO single-task-per-key stage — the
    * scalable replacement for `sum(v) OVER (PARTITION BY key ORDER BY
    * …)`, whose parallelism is the number of keys: a pretraining
    * corpus has FEW, HUGE sources, so that window folds each source's
    * entire stream on ONE task.
    *
    * Two-phase shape: the caller supplies an analytic `shard` column
    * that is (a) monotone non-decreasing along `order` within each
    * key and (b) bounded-cardinality (~2× parallelism). Rows
    * hash-exchange on (key, shard) — a deterministic exchange, no
    * range-sampling job, so the upstream plan runs ONCE — and sort
    * within partitions under (key, shard, order). Job 1 folds each
    * partition to one (key, shard, Σv) row (O(keys + shards) to the
    * driver); the exclusive per-(key, shard) offsets broadcast back;
    * job 2 adds offset + local running sum map-side. Both jobs run
    * over the SAME materialized RDD lineage, so they read the same
    * shuffle files (the [[zipRanked]] soundness property), and the
    * output value depends only on the (key, order) total order — any
    * monotone shard function yields identical sums.
    *
    * `order` must be a total order within each key (include a unique
    * tiebreak); `valueCol` must be an integral column (NULL sums as
    * 0); the appended `out` column is LongType. Shard balance is the
    * caller's lookout — a degenerate shard (all rows one value)
    * reproduces the window's serialization but never wrong sums.
    *
    * ==WARNING — non-monotone shards fail SILENTLY==
    * If `shard` is NOT monotone in `order` within a key (e.g.
    * `ord % 7`), the operator cannot detect it (the (key, shard)
    * exchange destroys the order information a local check would
    * need) and computes the prefix sum of the (shard, order) total
    * order instead — a plausible-looking but WRONG answer relative
    * to the window it replaces. `CorpusPrepSpec` pins this failure
    * mode with an explicit negative case. Derive the shard from the
    * leading order column via a non-decreasing function
    * ([[idRangeShard]], `floor((1-q)*S)` under `q desc`, …), never
    * a modulus or hash.
    *
    * `nullShard` places rows whose `shard` evaluates NULL (a NULL
    * order key upstream) rather than NPE-ing in the offset fold:
    * `Long.MinValue` (default) matches ASC NULLS FIRST window
    * semantics; pass `Long.MaxValue` when the window being replaced
    * ordered DESC (Spark's DESC is NULLS LAST). When null-shard rows
    * carry a NULL value (C12/C28: NULL text ⇒ NULL tokens, summed as
    * 0) other rows' sums don't depend on the choice — but when the
    * value is a non-null constant (C36 ranks with `one = 1`), every
    * row AFTER the null block shifts by the null count, so the
    * placement must match the window's null order exactly; and the
    * null row's OWN cum always depends on it (ADVICE r11).
    */
  def keyedPrefixSum(df: DataFrame, keyCols: Seq[String],
      order: Seq[Column], valueCol: String, shard: Column,
      out: String, nullShard: Long = Long.MinValue): DataFrame =
    keyedPrefixSumWithKeyTotals(df, keyCols, order, valueCol, shard,
      out, nullShard)._1

  /** [[keyedPrefixSum]] that also returns each key's TOTAL value sum
    * — the offset fold already computes it on the driver (the running
    * sum after a key's last shard IS the key total), so callers that
    * would otherwise pay a separate per-key aggregation job plus a
    * join to learn it (C36's per-source percentile denominator) read
    * it from here for free. Map keys are the key column values in
    * `keyCols` order.
    */
  def keyedPrefixSumWithKeyTotals(df: DataFrame, keyCols: Seq[String],
      order: Seq[Column], valueCol: String, shard: Column,
      out: String,
      nullShard: Long = Long.MinValue): (DataFrame, Map[List[Any], Long]) = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sCol = "__graft_psum_shard"
    val withS = df.withColumn(sCol,
      org.apache.spark.sql.functions.coalesce(shard.cast(LongType),
        org.apache.spark.sql.functions.lit(nullShard)))
    val sortCols = (keyCols.map(col) :+ col(sCol)) ++ order
    val parted = withS
      .repartition(n, keyCols.map(col) :+ col(sCol): _*)
      .sortWithinPartitions(sortCols: _*)
    val schema = parted.schema
    val kIdx = keyCols.map(schema.fieldIndex).toArray
    val sIdx = schema.fieldIndex(sCol)
    val vIdx = schema.fieldIndex(valueCol)
    def groupOf(r: Row): (List[Any], Long) =
      (kIdx.map(r.get(_)).toList, r.getLong(sIdx))
    def valOf(r: Row): Long =
      if (r.isNullAt(vIdx)) 0L
      else r.get(vIdx) match {
        case i: java.lang.Integer => i.longValue
        case l: java.lang.Long    => l.longValue
        case s: java.lang.Short   => s.longValue
        case b: java.lang.Byte    => b.longValue
        case o => throw new IllegalArgumentException(
          s"keyedPrefixSum value column '$valueCol' must be integral, " +
            s"got ${o.getClass.getName}")
      }
    val rdd = parted.rdd
    // Job 1: one (key, shard, Σv) row per group. Groups are contiguous
    // after the partition sort, but a map keyed on the group tolerates
    // hash-collision interleaving of DIFFERENT groups in one partition.
    // The per-partition cap fails in the EXECUTOR before a high-
    // cardinality misuse (many-key regime) can materialize every group
    // on the driver (ADVICE r11): groups hash-distribute over the
    // (key, shard) exchange, so one partition holding >4× its uniform
    // share of the 4M global bound is already the misuse.
    val perPartCap = math.max(65536L, 4L * 4 * 1024 * 1024 / math.max(n, 1))
    val totals = rdd.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[(List[Any], Long), Long]
      it.foreach { r =>
        val g = groupOf(r)
        m.update(g, m.getOrElse(g, 0L) + valOf(r))
        if (m.size > perPartCap) throw new IllegalStateException(
          s"keyedPrefixSum: one partition exceeds $perPartCap (key, shard) " +
            "groups — this is the MANY-key regime, where the plain per-key " +
            "window already parallelizes (parallelism = n_keys); use that " +
            "instead")
      }
      m.iterator
    }.collect()
    require(totals.length <= 4 * 1024 * 1024,
      s"keyedPrefixSum: ${totals.length} (key, shard) groups exceed the " +
        "driver offset bound — this is the MANY-key regime, where the " +
        "plain per-key window already parallelizes (parallelism = " +
        "n_keys); use that instead")
    // Exclusive offsets: for each key, Σ of totals with smaller shard.
    // The running sum after a key's LAST shard is that key's total —
    // collected alongside for keyedPrefixSumWithKeyTotals callers.
    val offsets = new scala.collection.mutable.HashMap[(List[Any], Long), Long]
    val keyTotals = Map.newBuilder[List[Any], Long]
    totals.groupBy(_._1._1).foreach { case (key, grp) =>
      var run = 0L
      grp.sortBy(_._1._2).foreach { case (g, tot) =>
        offsets.update(g, run)
        run += tot
      }
      keyTotals += key -> run
    }
    val bcOff = spark.sparkContext.broadcast(offsets.toMap)
    // Job 2: same shuffle files (stage skip) — offset + running sum.
    val outRdd = rdd.mapPartitions { it =>
      val off = bcOff.value
      var cur: (List[Any], Long) = null
      var run = 0L
      it.map { r =>
        val g = groupOf(r)
        if (g != cur) { cur = g; run = off.getOrElse(g, 0L) }
        run += valOf(r)
        Row.fromSeq(r.toSeq.patch(sIdx, Nil, 1) :+ run)
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      schema.fields.patch(sIdx, Nil, 1)).add(out, LongType, nullable = false)
    (spark.createDataFrame(outRdd, outSchema), keyTotals.result())
  }

  /** Analytic within-key shard for an integral order column: equal-
    * width windows of the column's GLOBAL [lo, hi] range (one pruned
    * min/max agg — the only pre-pass, reading just that column).
    * Monotone in the column for every key by construction; balanced
    * whenever ids are roughly dense, and a key spanning a wide id
    * range spreads over ~range/width shards regardless of how many
    * rows it holds. Exact integer floor-division (`div`): column `/`
    * is double division and misbins above 2^53.
    */
  def idRangeShard(df: DataFrame, idCol: String, targetShards: Int): Column = {
    import org.apache.spark.sql.functions.{col, max, min}
    val r = df.agg(min(col(idCol)).cast(LongType),
      max(col(idCol)).cast(LongType)).head()
    if (r.isNullAt(0)) org.apache.spark.sql.functions.lit(0L)
    else idRangeShardFromBounds(idCol, r.getLong(0), r.getLong(1),
      targetShards)
  }

  /** [[idRangeShard]] with the [lo, hi] bounds supplied by the
    * caller — e.g. exact parquet-footer column statistics
    * ([[graft.sources.ParquetStats.longColumnRange]]), which cost no
    * Spark job where the agg form pays a full column scan. Bounds
    * only shape shard BALANCE, never correctness: [[keyedPrefixSum]]
    * is bit-exact under ANY monotone shard, and equal-width windows
    * of any enclosing range are monotone in the id.
    */
  def idRangeShardFromBounds(idCol: String, lo: Long, hi: Long,
      targetShards: Int): Column = {
    import org.apache.spark.sql.functions.expr
    val target = targetShards.toLong.max(1L)
    val span = BigInt(hi) - BigInt(lo) // exact — raw hi - lo can
    // wrap negative when ids cover both signed extremes (e.g.
    // 64-bit hashed ids), which would make the shard ANTI-monotone
    // and silently violate keyedPrefixSum's contract (ADVICE r11).
    if (span.isValidLong) {
      val w = (span.toLong.max(0L) / target) + 1L
      expr(s"(cast($idCol as bigint) - ${lo}L) div ${w}L")
    } else {
      // Full-span regime: arithmetic shift right IS exact floor
      // division by 2^shift and is monotone over the entire signed
      // range — no subtraction, nothing to overflow. 2^k ≥ target
      // distinct shards across the full range.
      val k = if (target <= 1L) 0
        else 64 - java.lang.Long.numberOfLeadingZeros(target - 1L)
      val shift = (64 - k).max(1).min(63)
      expr(s"shiftright(cast($idCol as bigint), $shift)")
    }
  }
}
