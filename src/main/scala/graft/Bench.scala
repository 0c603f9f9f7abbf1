package graft

import org.apache.spark.sql.SparkSession

/** Headline benchmark: every SparkEntry query at the target scale
  * factor, one JSON line on stdout.
  *
  * Two passes: pass 1 warms the JVM (JIT, whole-stage codegen
  * compilation, class loading) and is discarded; caches are cleared
  * so pass 2 measures each operator's real work, not cache hits —
  * steady-state numbers, the regime a long-running cluster actually
  * operates in.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated subset for local iteration
    // (SPARK_GRAFT_ONLY=dedup_clusters,ann_pq); driver leaves it unset.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    // `*_check` entries are correctness-invariant rows (AnnChecks):
    // each one re-runs an approximate op PLUS its exact twin and a
    // reconciling join, so timing them would double-charge the ANN
    // family and pad the board with non-operator rows. They stay on
    // the Verify/CORRECTNESS surface only.
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(!_.endsWith("_check"))
      .filter(n => only.forall(_.contains(n)))

    // Cache is cleared per QUERY, not per pass: operators persist
    // intermediates and a 62-query pass otherwise accumulates dozens
    // of dead cached plans — the resulting eviction/GC pressure
    // inflated late-alphabet queries up to 10× (ann_pq 5.0 s in-suite
    // vs 0.48 s isolated). Clearing first makes each number the
    // operator's own cold-cache compute.
    // Queries already reported on stderr (first exception + stack
    // trace per query); the stdout JSON's "failed" list derives from
    // the published -1 sentinels so a -1.000 row is never silently
    // carried into a cross-round comparison (ADVICE r6).
    val failures = scala.collection.mutable.LinkedHashSet[String]()

    def runOne(name: String): Double = {
      spark.catalog.clearCache()
      // GC fence: collect the PREVIOUS query's garbage before timing
      // this one — a full board otherwise charges late queries with
      // earlier queries' heap debt (isolated re-runs measured
      // 20-60% under their in-suite times; DuckDB's side has no
      // equivalent cross-query tax to keep symmetric). The settle
      // window lets the async janitors (ContextCleaner's
      // broadcast/shuffle removal, listener-bus drain, GC reference
      // processing) finish OFF the clock — they run on their own
      // threads and were stealing cores from the timed region.
      System.gc()
      Thread.sleep(250)
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, sfDir).count() }
      catch {
        case e: Throwable =>
          if (failures.add(name)) {
            System.err.println(s"[bench] $name FAILED (recorded -1.000):")
            e.printStackTrace()
          }
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // TWO warmup passes (r12, VERDICT r11 #3): one pass leaves the
    // C2-JIT tier unreached on the deepest composite plans — the
    // clean-corpus tail measured 1.05 s at interleaved min-of-7 but
    // ~1.75 s under a single warmup (DriveCleanAb) — and a serving
    // process IS warm at that depth. The second untimed execution
    // closes the gap for every query symmetrically (DuckDB's side
    // already warms up before its min-of-2).
    names.foreach(runOne) // warmup pass 1 (discarded)
    names.foreach(runOne) // warmup pass 2 (discarded; C2-JIT depth)
    failures.clear()      // only measured-pass failures annotate the board

    // Two measured passes, per-query min: the host VM has visible
    // scheduling jitter (±10 s spikes on sub-second queries), and the
    // minimum is the stable steady-state estimator under one-sided
    // noise. The SECOND pass runs in REVERSE order (r10): even with
    // the per-query cache clear + GC fence, a long board leaks
    // cross-query debt to alphabetical successors (measured at the
    // 10× board: dedup_ngram_jaccard 17.8 s in-suite vs 7.2 s
    // isolated), and identically-ordered passes inherit identical
    // neighbors — min over two different predecessor sets
    // approximates the isolated number without an extra pass.
    val passes = Seq(names, names.reverse).map { order =>
      order.map(n => n -> runOne(n)).toMap
    }
    val results = names.map { n =>
      val ok = passes.map(p => p(n)).filter(_ >= 0.0)
      n -> (if (ok.nonEmpty) ok.min else -1.0)
    }

    // Warm-plan serving rows (VERDICT r10 #4): the star-join floor
    // decomposition pins ~0.4 s of the cold row as per-execution
    // analysis/AQE-replan/broadcast constants — a serving-context
    // cost Spark users amortize by REUSING a prepared Dataset. These
    // rows measure exactly that regime: the Dataset is built and
    // analyzed ONCE, one execution runs untimed (its AQE stats and
    // broadcast rebuilds included), then min-of-3 timed executions.
    // They are protocol-asymmetric (the cold rows stay the
    // like-for-like evidence) and are EXCLUDED from the board total.
    val warmTwins = Seq(
      "q3_bucketed_warm" -> "q3_bucketed",
      "q5_bucketed_warm" -> "q5_bucketed")
    val warmResults = warmTwins.flatMap { case (wname, cold) =>
      if (!names.contains(cold)) None
      else {
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(250)
        try {
          // ONE Dataset re-executed: `df.count()` would build a fresh
          // aggregation Dataset per call and re-run analysis, physical
          // planning, AQE, and every broadcast build each time (the
          // wave probe measured that recurring driver gap at ~0.5 s —
          // q3_bucketed_warm ≈ cold under the df.count() protocol).
          // Holding one counted Dataset reuses the analyzed plan, the
          // AQE final plan, and the cached broadcast futures — the
          // regime a serving deployment actually runs prepared
          // queries in.
          val counted = SparkEntry.queries(cold)(spark, sfDir)
            .groupBy().count()
          counted.head() // untimed: plan + codegen + broadcasts warm
          val t = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            counted.head()
            (System.nanoTime() - t0) / 1e9
          }.min
          Some(wname -> t)
        } catch { case _: Throwable => None }
      }
    }
    // The driver captures only the last 2000 chars of stdout, and the
    // full board (77+ queries) no longer fits on one line even at ms
    // precision — three rounds of BENCH_r*.json came back parsed:null.
    // So: the stdout line carries the board total plus a headline
    // subset (the BASELINE_LOCAL.json queries + one representative per
    // operator family) and is guaranteed to fit; the complete
    // per-query board goes to bench_full.json next to the build.
    def fmt(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def json(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
        .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum

    val headline = Seq(
      // baseline_local.py twins (bench_vs_baseline is computable on these)
      "q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue",
      "q6_forecast_revenue", "dedup_exact", "text_token_stats",
      // one representative per family
      "csv_ingest_mixed", "q_top_orders_per_customer", "q_events_sessionize",
      "dedup_minhash", "dedup_ngram_jaccard", "dedup_clusters",
      "dedup_substring", "dedup_lines", "text_encode_ids",
      "ann_topk_exact", "ann_pq", "ann_hnsw",
      "text_tfidf_top_terms", "text_index_build", "text_search_ranked",
      "text_perplexity",
      "curate_contamination", "pipeline_clean_corpus", "mm_frames",
      "layout_zorder",
      // r12/r13 additions (also in the scale10 like-for-like list)
      "q_events_hopping", "curate_quality_percentile",
      "pipeline_pack_split", "mm_integrity",
      // r15: the F7 count-gated shape and the routed-HNSW serve
      "mm_phash_neardup", "ann_hnsw_routed",
      // r16 (VERDICT #4): the C40c served split — production serve
      // shape next to the inline build-cost row
      "pipeline_split_assign_served")
    val resultMap = results.toMap
    val head = headline.flatMap(n => resultMap.get(n).map(n -> _))

    def jsonNames(ns: Iterable[String]): String =
      ns.map("\"" + _ + "\"").mkString("[", ",", "]")
    // A row is "failed" iff its published value is the -1 sentinel
    // (failed every measured pass); one flaky pass with a good twin
    // still yields a real timing and is stderr-only.
    val failedField =
      s""","failed":${jsonNames(results.filter(_._2 < 0).map(_._1))}"""
    // Label the approximate rows-only queries (measured but with no
    // DuckDB oracle twin — their correctness rides the `_check`
    // companions on the Verify surface), so the board count reads
    // unambiguously: queries_measured = |queries| map entries, of
    // which |rows_only| carry no oracle (VERDICT r7 #10).
    val rowsOnly = names.filter(n => !SparkEntry.oracleSql.contains(n))
    val rowsOnlyField = s""","rows_only":${jsonNames(rowsOnly)}"""

    // Host-phase anchor (VERDICT r11 #8): this VM has multi-hour
    // phases where sustained JVM stages run 2.5-3x slower on
    // UNCHANGED code. dedup_ngram_jaccard is the designated anchor
    // (CPU-heavy, code rarely touched); recording its measured value
    // in-artifact lets any later reader judge whether this board's
    // absolutes are comparable to another round's without
    // re-running archaeology.
    val anchorField = resultMap.get("dedup_ngram_jaccard")
      .map(v => s""","phase_anchor":{"query":"dedup_ngram_jaccard","sec":${fmt(v)}}""")
      .getOrElse("")

    // r16 (VERDICT r15 #9, measurement instrument only): the RAW
    // per-pass values behind each published min, sidecar-only (the
    // stdout line must stay under the driver's 2000-char capture).
    // The spread between a row's two passes is a mechanical noise
    // bound — a cross-round delta inside a row's own pass spread is
    // jitter, not a regression. Zero change to timed semantics or to
    // any published number.
    val passesRawField = {
      val m = names.map { n =>
        "\"" + n + "\":[" + passes.map(p => fmt(p(n))).mkString(",") + "]"
      }.mkString("{", ",", "}")
      s""","passes_raw":$m"""
    }

    // Protocol pinned in-artifact (VERDICT r10 #8) so boards compare
    // across rounds without archaeology.
    val protocol = "per-query cache clear + GC fence + 250ms settle; " +
      "2 discarded warmup passes (r12: one pass leaves C2-JIT depth " +
      "unreached on deep composite plans; a serving process is warm); " +
      "min over 2 measured passes, second " +
      "pass in REVERSE order (different predecessor sets approximate " +
      "isolated numbers); warm rows: ONE counted Dataset re-executed " +
      "(analyzed plan, AQE final plan, broadcast futures all reused), " +
      "1 untimed + min of 3 timed re-executions, excluded from total"
    val warmField =
      if (warmResults.isEmpty) ""
      else s""","warm_queries":${json(warmResults)}"""
    val fullLine =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${json(results)}$warmField$failedField$rowsOnlyField$anchorField$passesRawField,"sf":"$sfDir","passes":"warmup+measured","protocol":"$protocol"}"""
    // best-effort sidecar: an unwritable CWD must not destroy the
    // measured run's stdout line (the driver-parsed artifact)
    try java.nio.file.Files.write(
      java.nio.file.Paths.get("bench_full.json"),
      (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch {
      case e: Exception =>
        System.err.println(s"[bench] bench_full.json not written: $e")
    }

    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":${json(head)}$warmField,"queries_measured":${results.size},"rows_only_count":${rowsOnly.size}$failedField$anchorField,"full_board":"bench_full.json","sf":"$sfDir","passes":"warmup+measured"}""")
    spark.stop()
  }
}
