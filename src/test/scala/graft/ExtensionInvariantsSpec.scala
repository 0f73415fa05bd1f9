package graft

import org.apache.spark.sql.functions._
import graft.transit.{Queries, TransitTables}

/** Property invariants for the round-7 extension operators — the theorems
  * the oracle's value-equality check can't express: structural guarantees
  * (walks follow edges), algebraic identities (inclusion–exclusion), and
  * bounds (lcc ∈ [0,1], |r| ≤ 1, rendezvous movement only toward the new
  * shard). */
class ExtensionInvariantsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val tables = TransitTables.fromTpch(spark, sf)

  private def edgeSet = {
    val st = tables.stopTimes.select(col("trip_id"), col("stop_id"), col("stop_sequence"))
    st.as("a").join(st.as("b"),
        col("a.trip_id") === col("b.trip_id") &&
          col("b.stop_sequence") === col("a.stop_sequence") + 1 &&
          col("a.stop_id") =!= col("b.stop_id"))
      .select(least(col("a.stop_id"), col("b.stop_id")).as("u"),
        greatest(col("a.stop_id"), col("b.stop_id")).as("v"))
      .distinct()
  }

  test("walk corpus: every consecutive step is a graph edge, walks have 4 nodes") {
    val corpus = Queries.walkCorpus(tables)
    val byWalk = corpus.groupBy("walk_id").agg(count(lit(1)).as("len"))
    assert(byWalk.filter(col("len") =!= 4).count() === 0)
    val hops = corpus.as("x").join(corpus.as("y"),
        col("x.walk_id") === col("y.walk_id") &&
          col("y.step") === col("x.step") + 1)
      .select(least(col("x.node"), col("y.node")).as("u"),
        greatest(col("x.node"), col("y.node")).as("v"))
    assert(hops.join(edgeSet, Seq("u", "v"), "left_anti").count() === 0,
      "walk contains a hop that is not an edge")
  }

  test("clustering coefficient: lcc in [0,1] and tri <= d(d-1)/2") {
    val lcc = Queries.clusteringCoef(tables)
    assert(lcc.filter(col("lcc") < 0 || col("lcc") > 1).count() === 0)
    assert(lcc.filter(col("tri") * 2 > col("d") * (col("d") - 1)).count() === 0)
  }

  test("assortativity r is a correlation: |r| <= 1") {
    val r = Queries.assortativity(tables).select(col("r")).head().getDouble(0)
    assert(r >= -1.0 && r <= 1.0, s"r=$r")
  }

  test("bitmap index satisfies inclusion-exclusion and matches direct counts") {
    val row = graft.relational.RelationalQueries.bitmapIndex(spark, sf).head()
    val (nA, nB, nAnd, nOr) = (row.getAs[Long]("n_a"), row.getAs[Long]("n_b"),
      row.getAs[Long]("n_and"), row.getAs[Long]("n_or"))
    assert(nA + nB === nAnd + nOr, "inclusion-exclusion violated")
    val direct = graft.sources.Tables.orders(spark, sf)
      .filter(expr("o_totalprice > 150000")).count()
    assert(nA === direct, s"bitmap n_a=$nA != direct $direct")
  }

  test("zone-map audit: same answer from both layouts, sorted layout scans less") {
    val rows = graft.relational.RelationalQueries.minmaxPrune(spark, sf)
      .collect().map(r => r.getAs[String]("layout") ->
        (r.getAs[Long]("rows_scanned"), r.getAs[Long]("rows_matched"))).toMap
    assert(rows("key_order")._2 === rows("date_sorted")._2,
      "layouts disagree on the query answer")
    assert(rows("date_sorted")._1 <= rows("key_order")._1,
      "date-clustered layout should never scan more")
  }

  test("rendezvous sharding: docs only ever move to the newly added shard") {
    import graft.functions.TextHash
    def key(n: Int) = greatest((0 until n).map { i =>
      TextHash.strHash(concat(lit(s"hrw:$i:"), col("doc_id").cast("string"))) * 16L + i
    }: _*)
    val perDoc = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), (key(8) % 16).as("s8"), (key(9) % 16).as("s9"))
    assert(perDoc.filter(col("s8") =!= col("s9") && col("s9") =!= 8).count() === 0,
      "a resize-moved doc landed somewhere other than the new shard")
    val n = perDoc.count().toDouble
    val moved = perDoc.filter(col("s8") =!= col("s9")).count().toDouble
    assert(moved / n < 0.35, s"movement ${moved / n} far above the ~1/9 theory")
  }

  test("dp release: released = n + noise, noise is re-run reproducible") {
    val a = graft.relational.RelationalQueries.dpNoise(spark, sf).collect()
    assert(a.forall(r => math.abs(
      r.getAs[Double]("released") - r.getAs[Long]("n") -
        r.getAs[Double]("noise")) < 1e-9))
    val b = graft.relational.RelationalQueries.dpNoise(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)),
      "noise changed between runs — privacy budget would burn on retries")
  }

  test("ood scores are valid cosines or the -2 singleton floor") {
    val s = graft.similarity.Similarity.oodKnn(spark, sf)
      .select(col("ood_score")).collect().map(_.getDouble(0))
    assert(s.nonEmpty && s.forall(x => x === -2.0 || (x >= -1.000001 && x <= 1.000001)))
  }

  test("count-min sketch never underestimates any key") {
    import graft.functions.TextHash
    val ev = graft.sources.Tables.events(spark, sf).select(col("user_id"))
    def bucket(d: Int) =
      TextHash.strHash(concat(lit(s"cms$d:"), col("user_id").cast("string"))) % 64
    val cms = (0 until 3).map { d =>
      ev.groupBy(bucket(d).as("bucket")).agg(count(lit(1)).as("cnt"))
        .select(lit(d).as("depth"), col("bucket"), col("cnt"))
    }.reduce(_ unionByName _)
    val keys = ev.groupBy(col("user_id")).agg(count(lit(1)).as("true_cnt"))
    val probes = (0 until 3).map { d =>
      keys.select(col("user_id"), col("true_cnt"), lit(d).as("depth"),
        bucket(d).as("bucket"))
    }.reduce(_ unionByName _)
    val under = probes.join(cms, Seq("depth", "bucket"))
      .groupBy(col("user_id"), col("true_cnt")).agg(min(col("cnt")).as("est"))
      .filter(col("est") < col("true_cnt")).count()
    assert(under === 0, "CMS underestimated a key — impossible by construction")
  }

  test("hashed-feature gradient partitions every token occurrence") {
    val g = graft.relational.RelationalQueries.hashFeaturesLr(spark, sf)
      .agg(sum(col("n_total")), sum(col("n_pos"))).head()
    val toks = graft.sources.Tables.documents(spark, sf)
      .select(explode(graft.functions.TextHash.tokens(col("text"))).as("t"))
      .count()
    assert(g.getLong(0) === toks, "feature counts don't cover the corpus")
    assert(g.getLong(1) > 0 && g.getLong(1) < toks)
  }

  test("dsir importance is rank-consistent and complete") {
    val rows = graft.text.TextAnalysis.dsirImportance(spark, sf).collect()
    assert(rows.map(_.getAs[Int]("rnk")).toSeq === (1 to rows.length))
    val imp = rows.map(_.getAs[Double]("importance"))
    assert(imp.zip(imp.tail).forall { case (x, y) => x >= y },
      "importance not descending with rank")
  }

  test("stress centrality: strictly positive and held by backbone interior nodes") {
    val rows = Queries.stressCentrality(tables).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("stress") > 0L))
    // through-counts require degree >= 2 in the backbone: an interior
    // vertex of any shortest path has at least two backbone neighbors
    val ids = rows.map(_.getAs[Long]("stop_id")).toSet
    val deg = edgeSet.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy("n").agg(count(lit(1)).as("d"))
      .filter(col("n").isInCollection(ids)).collect()
    assert(deg.forall(_.getAs[Long]("d") >= 2L))
  }

  test("bpe apply: compression <= 1 and symbol mass bounded by char mass") {
    val rows = graft.text.TextAnalysis.bpeApply(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Long]("symbols_total") <= r.getAs[Long]("chars_total"))
      val c = r.getAs[Double]("compression")
      assert(c > 0.0 && c <= 1.0, s"compression=$c")
    }
  }

  test("knn calibration: bins partition the query set, ECE in [0,1]") {
    val rows = graft.similarity.Similarity.knnCalibration(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_preds")).sum ===
      graft.similarity.Similarity.QuerySet.toLong)
    val ece = rows.map(_.getAs[Double]("ece_contrib")).sum
    assert(ece >= 0.0 && ece <= 1.0, s"ece=$ece")
  }

  test("service dates: 14-day spine is 10 weekdays + 2 Saturdays + 2 Sundays") {
    val rows = Queries.serviceDates(tables).collect()
    assert(rows.length === 14)
    val bySvc = rows.groupBy(_.getAs[String]("service_id")).view.mapValues(_.length).toMap
    assert(bySvc === Map("1" -> 10, "2" -> 2, "3" -> 2))
  }

  test("delete propagation: cascade is complete and orphan-free") {
    val r = graft.relational.RelationalQueries.deletePropagation(spark, sf).head()
    assert(r.getAs[Long]("n_orphan_survivors") === 0L)
    val totalOrders = graft.sources.Tables.orders(spark, sf).count()
    assert(r.getAs[Long]("n_orders_deleted") + r.getAs[Long]("n_orders_kept")
      === totalOrders)
    val totalLi = graft.sources.Tables.lineitem(spark, sf).count()
    assert(r.getAs[Long]("n_lineitems_deleted") + r.getAs[Long]("n_lineitems_kept")
      === totalLi)
  }

  test("matryoshka: full-dim row recalls exactly 1.0; all recalls in (0,1]") {
    val rows = graft.similarity.Similarity.matryoshkaRecall(spark, sf).collect()
    val byDim = rows.map(r => r.getAs[Int]("dims") -> r.getAs[Double]("recall_at_5")).toMap
    assert(byDim(64) === 1.0, "full-dim ranking must reproduce the truth")
    assert(byDim.values.forall(r => r > 0.0 && r <= 1.0))
  }

  test("association rules: confidences <= 1, lift positive, support >= min") {
    val rows = Queries.stopRules(tables).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getAs[Double]("conf_ab") <= 1.0 && r.getAs[Double]("conf_ba") <= 1.0)
      assert(r.getAs[Double]("lift") > 0.0)
      assert(r.getAs[Long]("n_ab") >= 5L)
    }
  }

  test("semi-additive: accounts never shrink day-over-day (LOCF only adds)") {
    val rows = graft.relational.RelationalQueries.semiAdditive(spark, sf).collect()
    val counts = rows.map(_.getAs[Long]("n_accounts"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b >= a },
      "carried-forward account census must be monotone")
  }

  test("temperature shares: each alpha sums to ~1 and lower alpha flattens the head") {
    val rows = graft.text.TextAnalysis.temperatureShares(spark, sf).collect()
    val byAlpha = rows.groupBy(_.getAs[String]("alpha"))
    for ((_, rs) <- byAlpha) {
      val s = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"shares sum to $s")
    }
    def maxShare(a: String) = byAlpha(a).map(_.getAs[Double]("share")).max
    assert(maxShare("0.25") <= maxShare("0.5") && maxShare("0.5") <= maxShare("1.0"),
      "lower temperature must flatten the largest source")
  }

  test("retraction merge equals direct recompute over the final state") {
    import org.apache.spark.sql.functions.{sum => fsum}
    val merged = graft.relational.RelationalQueries
      .incrementalAggRetract(spark, sf)
    val e = graft.sources.Tables.events(spark, sf)
      .filter(!(col("event_id") % 10 =!= 0 && col("event_id") % 20 === 3))
      .select(col("event_type"), col("value").cast("decimal(18,2)").as("v"))
    val direct = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        fsum(col("v")).cast("decimal(18,2)").cast("double").as("sum_value"))
      .select(col("event_type"), col("n_events"), col("sum_value"),
        round(col("sum_value") / col("n_events"), 6).as("avg_value"))
      .orderBy(col("event_type"))
    assert(merged.collect().toSeq === direct.collect().toSeq)
  }
}
