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
