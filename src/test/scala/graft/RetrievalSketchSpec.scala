package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-9 additions: hybrid lexical+vector
  * retrieval with reciprocal-rank fusion (D13) and the single-pass
  * approximate-quantile sketch with its rank-error check (B29). The
  * oracle rows pin engine parity; these pin the properties the
  * oracle can't state.
  */
class RetrievalSketchSpec extends AnyFunSuite with SparkTestBase {

  test("hybrid RRF ≡ driver-side fusion of its two serving branches") {
    // Recompute both branch lists through their own public serving
    // paths (each independently oracle-green), fuse in plain Scala
    // with the same 1/(60+rank) arithmetic, and demand the operator's
    // fused top-10 is identical — ranks, scores, order, tie-breaks.
    val lex = graft.operators.TextIndex
      .queries("text_search_ranked")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .sortBy { case (id, s) => (-s, id) }
      .zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val vec = graft.operators.Ann.topkExact(spark, sf, 20, nQueries = 1)
      .collect()
      .map(r => r.getLong(r.fieldIndex("neighbor_id")) ->
        r.getInt(r.fieldIndex("rank")).toLong).toMap
    val expected = (lex.keySet ++ vec.keySet).toSeq.map { id =>
      val (lr, vr) = (lex.get(id), vec.get(id))
      val score = lr.map(r => 1.0 / (60.0 + r)).getOrElse(0.0) +
        vr.map(r => 1.0 / (60.0 + r)).getOrElse(0.0)
      (id, lr.getOrElse(0L), vr.getOrElse(0L), score)
    }.sortBy(t => (-t._4, t._1)).take(10)
    val got = graft.operators.HybridSearch.hybridRrf(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
  }

  test("hybrid RRF: literal-lexical fast path ≡ declarative plan") {
    // r11 serving shape: the ≤kLex lexical list collects and re-enters
    // as a LocalRelation (one action for vec+fusion). Same rows, same
    // ranks, same scores as the all-declarative G17 shape.
    val fused = graft.operators.HybridSearch.hybridRrf(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    val declarative = graft.operators.HybridSearch
      .hybridRrfFor(spark, sf, Seq("batch", "merge"), 0L,
        fuseLexLiteral = false)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(fused == declarative)
    assert(fused.nonEmpty)
  }

  test("hybrid RRF: a both-list document outscores single-list tails") {
    // RRF's defining property: presence in both lists beats a deep
    // rank in one — any doc in both lists scores strictly above any
    // doc whose single-list rank is worse than the both-doc's worst
    // rank. Verified on the operator's own output: score monotone in
    // (1/(60+lex) + 1/(60+vec)) with 0-rank contributing nothing.
    val rows = graft.operators.HybridSearch.hybridRrf(spark, sf)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    rows.foreach { case (lr, vr, s) =>
      val recomputed =
        (if (lr > 0) 1.0 / (60.0 + lr) else 0.0) +
          (if (vr > 0) 1.0 / (60.0 + vr) else 0.0)
      assert(s == recomputed)
    }
    val both = rows.filter(t => t._1 > 0 && t._2 > 0)
    val single = rows.filter(t => (t._1 == 0) != (t._2 == 0))
    for ((blr, bvr, bs) <- both;
         (slr, svr, ss) <- single
         if math.max(slr, svr) > math.max(blr, bvr))
      assert(bs > ss)
  }

  test("quantile sketch check: guarantee holds on skew and constants") {
    import spark.implicits._
    // adversarial shapes the lineitem pin can't produce: a 99%-mass
    // point value, an all-constant group, and a uniform small domain
    val rows =
      (1 to 10000).map(i =>
        ("skew", if (i % 100 == 0) i.toLong else 7L)) ++
        (1 to 500).map(_ => ("const", 42L)) ++
        (1 to 1000).map(i => ("uniform", (i % 97).toLong))
    val df = rows.toDF("grp", "v").repartition(7)
    val out = graft.operators.Analytics
      .qPercentilesSketchCheckOf(df, 100).collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(2) == 3L))
    assert(out.forall(_.getBoolean(3)), "rank-error guarantee violated")
  }

  test("quantile sketch: values are real group members at every SF") {
    // the sketch returns actual observed values (KLL/GK family keeps
    // sampled inputs, never interpolates) — pin it so an engine
    // upgrade to an interpolating sketch fails loudly (the _check
    // rank bracket assumes membership)
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    for (d <- dirs) {
      val sk = graft.operators.Analytics.qPercentilesSketch(spark, d)
      val li = Tables(spark, d, "lineitem")
        .select(org.apache.spark.sql.functions.col("l_returnflag"),
          org.apache.spark.sql.functions.col("l_quantity"))
        .collect()
        .groupBy(_.get(0))
        .map { case (k, rs) => k -> rs.map(r =>
          BigDecimal(r.get(1).toString)).toSet }
      sk.collect().foreach { r =>
        val vals = li(r.get(0))
        for (i <- 1 to 3)
          assert(vals.contains(BigDecimal(r.get(i).toString)))
      }
    }
  }
}
