package graft

import graft.ops.Similarity

/** Recall ladder for the IVF ANN index: recall@5 against the exact
  * brute-force baseline as a function of nprobe, pinning (a) monotone
  * improvement and (b) the shipped default's floor — so a parameter or
  * quantizer edit that silently tanks recall fails a test, not a user. */
class AnnRecallSpec extends SparkSpec {

  private def recallAt5(nprobe: Int, dir: String): Double = {
    val exact = Similarity.annTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val approx = Similarity.annIvfMultiProbeTopK(spark, dir, nprobe = nprobe)
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exact.map { case (q, ex) =>
      approx.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size
    }
    per.sum / per.size
  }

  test("recall@5 is monotone in nprobe and the default meets its floor") {
    val ladder = Seq(1, 2, 4, 8).map(np => np -> recallAt5(np, Sf0001))
    info(ladder.map { case (n, r) => f"nprobe=$n recall@5=$r%.3f" }
      .mkString(", "))
    ladder.sliding(2).foreach { case Seq((_, lo), (npHi, hi)) =>
      assert(hi >= lo - 1e-9,
        s"recall must not decrease as nprobe grows (nprobe=$npHi dropped)")
    }
    val byNp = ladder.toMap
    // default chosen as the first rung at/above the 0.9 target (see
    // Similarity.IvfNProbe); training is deterministic so this is exact
    assert(byNp(Similarity.IvfNProbe) >= 0.899,
      f"shipped default nprobe=${Similarity.IvfNProbe} recall@5=" +
        f"${byNp(Similarity.IvfNProbe)}%.3f fell below its 0.9 target")
  }

  test("filtered ANN: every neighbor carries the query's label, ranks are " +
      "dense, and results equal the label-constrained exact scan on " +
      "probed candidates") {
    val labels = Similarity.embeddings(spark, Sf0001)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Similarity.annIvfTopKFiltered(spark, Sf0001).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      rs.foreach { r =>
        assert(r.getInt(1) == labels(q),
          s"query $q: neighbor ${r.getLong(2)} has a foreign label")
        assert(labels(r.getLong(2)) == labels(q),
          "the label column must BE the neighbor's source-table label")
      }
      assert(rs.map(_.getInt(3)).sorted.toSeq == (1 to rs.length),
        s"query $q: ranks not dense")
    }
    // pre-filtering keeps k results per query wherever the probed lists
    // hold at least k same-label candidates; never more than k
    assert(rows.groupBy(_.getLong(0)).values.forall(_.length <= 5))
  }

  test("mmr: replays a local greedy replica exactly and never repeats " +
      "a pick") {
    val out = Similarity.annMmrTopK(spark, Sf0001)
      .select("query_id", "neighbor_id", "mmr_rank", "relevance",
        "mmr_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3),
        r.getDouble(4)))
    assert(out.nonEmpty)
    val cand = Similarity.annIvfTopK(spark, Sf0001, Similarity.MmrCandidates)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    val vecs = Similarity.embeddings(spark, Sf0001)
      .select("vec_id", "vec").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      (0 until a.length).foreach { i =>
        d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val lam = Similarity.MmrLambda
    cand.groupBy(_._1).foreach { case (q, cs) =>
      val pool = cs.map(c => c._2 -> c._3).toMap
      var sel = Vector.empty[(Long, Int, Double, Double)]
      (1 to math.min(Similarity.MmrK, pool.size)).foreach { r =>
        val scored = pool.keys.filterNot(id => sel.exists(_._1 == id))
          .map { id =>
            val div = if (sel.isEmpty) 0.0
              else sel.map(s => cos(vecs(id), vecs(s._1))).max
            (id, lam * pool(id) - (1 - lam) * div)
          }.toSeq
        val (id, sc) = scored.minBy { case (i, s) => (-s, i) }
        sel :+= ((id, r, pool(id), sc))
      }
      val got = out.filter(_._1 == q).sortBy(_._3)
      assert(got.map(_._2).toSeq == sel.map(_._1),
        s"query $q: pick order diverged from the greedy definition")
      got.zip(sel).foreach { case (g, s) =>
        assert(math.abs(g._5 - s._4) < 1e-9 &&
          math.abs(g._4 - s._3) < 1e-12)
      }
      assert(got.map(_._2).distinct.length == got.length,
        "a result page must never repeat a document")
    }
  }

  test("two-stage rerank meets the 0.9 floor at a lower nprobe than " +
      "the single-stage default") {
    assert(Similarity.IvfRerankNProbe < Similarity.IvfNProbe,
      "the rerank path must probe fewer lists than single-stage IVF — " +
        "that cost saving is its reason to exist")
    val exact = Similarity.annTopK(spark, Sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val reranked = Similarity.annIvfAdcRerank(spark, Sf0001).collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exact.map { case (q, ex) =>
      reranked.getOrElse(q, Set.empty[Long]).count(ex).toDouble / ex.size
    }
    val recall = per.sum / per.size
    info(f"nprobe=${Similarity.IvfRerankNProbe} C=${Similarity.RerankC} " +
      f"recall@5=$recall%.3f")
    assert(recall >= 0.899,
      f"two-stage recall@5=$recall%.3f fell below the 0.9 floor — the ADC " +
        "top-C cut is dropping true neighbors the probed lists contain")
  }
}
