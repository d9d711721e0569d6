package graft

import org.apache.spark.sql.functions._
import graft.ops.{Curation, Dedup, Similarity, TextOps}

/** Corpus-curation layer: Gopher rule gate, DSIR importance selection,
  * cluster-representative election, CCNet ppl terciles, deterministic
  * epoch shuffle, and SSL-prototype pruning. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  private def nDocs: Long =
    spark.read.parquet(s"$Sf0001/documents.parquet").count()

  test("gopher rules: verdict is the conjunction and each rule varies") {
    val out = Curation.gopherRules(spark, Sf0001).collect()
    assert(out.length == nDocs)
    out.foreach { r =>
      val rules = Seq("pass_word_count", "pass_word_len", "pass_stopwords",
        "pass_repetition").map(c => r.getAs[Int](c))
      assert(rules.forall(v => v == 0 || v == 1))
      assert(r.getAs[Int]("passes_all") == rules.product)
    }
    // the gate must discriminate on this corpus, not rubber-stamp
    val passed = out.count(_.getAs[Int]("passes_all") == 1)
    assert(passed > 0 && passed < out.length)
    // hand-check one doc end-to-end
    val d = spark.read.parquet(s"$Sf0001/documents.parquet")
      .filter(col("doc_id") === 0L).head()
    val words = d.getAs[String]("text").split(" ").toSeq
    val row = out.find(_.getAs[Long]("doc_id") == 0L).get
    assert(row.getAs[Long]("word_count") == words.length)
    assert(row.getAs[Long]("top_word_count") ==
      words.groupBy(identity).values.map(_.size).max)
    assert(row.getAs[Int]("stop_hits") ==
      Curation.GopherStopwords.count(words.contains))
  }

  test("dsir: rank is a permutation, quota is exact, and the target " +
      "language is preferentially selected") {
    val out = Curation.dsirSelect(spark, Sf0001).collect()
    val n = out.length
    assert(out.map(_.getAs[Int]("dsir_rank")).sorted.toSeq == (1 to n))
    val quota = out.count(_.getAs[Int]("selected") == 1)
    assert(quota == n / Curation.DsirSelectDenom)
    // selection follows the integer rank edge exactly
    out.foreach { r =>
      assert((r.getAs[Int]("selected") == 1) ==
        (r.getAs[Int]("dsir_rank") * Curation.DsirSelectDenom <= n))
    }
    // DSIR's point: docs from the target distribution rank ahead
    val lang = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val (en, rest) = out.partition(r =>
      lang(r.getAs[Long]("doc_id")) == Curation.DsirTargetLang)
    def meanRank(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(_.getAs[Int]("dsir_rank").toDouble).sum / rs.length
    assert(meanRank(en) < meanRank(rest),
      "target-language docs must rank ahead of the rest on average")
  }

  test("dsir: score is the quantized bucket-weight sum (order-invariant)") {
    val a = Curation.dsirSelect(spark, Sf0001)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    // recompute the whole pipeline under a different aggregation layout
    // (shuffle-partition count), not just reshuffle the finished output —
    // this exercises the BIGINT-sum invariance claim for real
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "7")
    val b = Curation.dsirSelect(s2, Sf0001)
      .select("doc_id", "score_q").as[(Long, Long)].collect().toMap
    assert(a == b, "BIGINT micro-unit scores must not depend on layout")
  }

  test("best-of-cluster: keeper is the max-quality member, one per cluster") {
    val clusters = Dedup.dedupClusters(spark, Sf0001)
      .select("doc_id", "cluster_id", "cluster_size")
      .as[(Long, Long, Long)].collect()
    val quality = TextOps.textStats(spark, Sf0001)
      .select("doc_id", "quality_score").as[(Long, Double)].collect().toMap
    val out = Curation.bestOfCluster(spark, Sf0001).collect()
    assert(out.length == clusters.map(_._2).distinct.length)
    out.foreach { r =>
      val cid = r.getAs[Long]("cluster_id")
      val members = clusters.filter(_._2 == cid)
      val keeper = r.getAs[Long]("keeper_doc_id")
      assert(members.exists(_._1 == keeper))
      val best = members.map(m => (quality(m._1), -m._1)).max
      assert(quality(keeper) == best._1 && keeper == -best._2)
      assert(r.getAs[Long]("n_dropped") == members.length - 1L)
      assert(r.getAs[Long]("cluster_size") == members.length.toLong)
    }
  }

  test("ppl buckets: per-language tercile edges are exact rank arithmetic") {
    val out = Curation.pplBuckets(spark, Sf0001).collect()
    out.groupBy(_.getAs[String]("lang")).foreach { case (_, rows) =>
      val n = rows.length
      assert(rows.map(_.getAs[Int]("ppl_rank")).sorted.toSeq == (1 to n))
      assert(rows.forall(_.getAs[Long]("lang_n") == n.toLong))
      val byBucket = rows.groupBy(_.getAs[String]("ppl_bucket"))
        .view.mapValues(_.length).toMap
      assert(byBucket.getOrElse("head", 0) == n / 3)
      assert(byBucket.getOrElse("head", 0) + byBucket.getOrElse("middle", 0)
        == 2 * n / 3)
      // ranking follows rare_frac ascending
      val sorted = rows.sortBy(_.getAs[Int]("ppl_rank"))
        .map(_.getAs[Double]("rare_frac"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a <= b })
    }
  }

  test("epoch shuffle: a content-stable permutation that changes per epoch") {
    val e0 = Curation.shuffleShards(spark, Sf0001, epoch = 0).collect()
    assert(e0.length == nDocs)
    // (shard, seq) is a bijection: seq is contiguous 1..n_s per shard
    e0.groupBy(_.getAs[Int]("shard_id")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("seq")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
    // determinism: identical on re-run
    val again = Curation.shuffleShards(spark, Sf0001, epoch = 0).collect()
    assert(e0.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // epoch 1 is a different permutation
    val e1 = Curation.shuffleShards(spark, Sf0001, epoch = 1).collect()
    def pos(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("shard_id"), r.getAs[Long]("seq"))).toMap
    assert(pos(e0) != pos(e1))
  }

  test("cross-source matrix: cells are unordered, counts add up to the " +
      "pair graph, and endpoints carry their documents' sources") {
    val pairs = Dedup.minhashLsh(spark, Sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val src = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("doc_id", "source").as[(Long, String)].collect().toMap
    val out = Curation.crossSource(spark, Sf0001).collect()
    assert(out.map(_.getAs[Long]("n_pairs")).sum == pairs.length.toLong)
    out.foreach(r => assert(r.getAs[String]("source_a") <=
      r.getAs[String]("source_b")))
    val expected = pairs.groupBy { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      if (sa <= sb) (sa, sb) else (sb, sa)
    }.view.mapValues(_.length.toLong).toMap
    assert(out.map(r => (r.getAs[String]("source_a"),
      r.getAs[String]("source_b")) -> r.getAs[Long]("n_pairs")).toMap
      == expected)
  }

  test("curation funnel: stages chain (n_in = previous n_out), every " +
      "count is consistent with the constituent operators") {
    val out = Curation.curationFunnel(spark, Sf0001).collect()
      .sortBy(_.getAs[Int]("stage"))
    assert(out.map(_.getAs[String]("stage_name")).toSeq ==
      Seq("exact_dedup", "near_dup_keepers", "quality_gate", "decontam"))
    out.foreach(r => assert(r.getAs[Long]("n_dropped") ==
      r.getAs[Long]("n_in") - r.getAs[Long]("n_out")))
    out.zip(out.tail).foreach { case (prev, next) =>
      assert(next.getAs[Long]("n_in") == prev.getAs[Long]("n_out"))
    }
    assert(out.head.getAs[Long]("n_in") == nDocs)
    // stage 1 out = distinct texts; stage 2 drops cluster_size-1 per cluster
    val distinctTexts = spark.read.parquet(s"$Sf0001/documents.parquet")
      .select("text").distinct().count()
    assert(out(0).getAs[Long]("n_out") == distinctTexts)
    val clusterDrops = Curation.bestOfCluster(spark, Sf0001)
      .select("n_dropped").as[Long].collect().sum
    assert(out(1).getAs[Long]("n_dropped") == clusterDrops)
    // the funnel must actually narrow somewhere after dedup
    assert(out.last.getAs[Long]("n_out") < out.head.getAs[Long]("n_in"))
  }

  test("quality by source: per-source ranks, exact percent_rank, " +
      "top-half gate") {
    val out = Curation.qualityBySource(spark, Sf0001).collect()
    assert(out.length == nDocs)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val n = rows.length
      assert(rows.forall(_.getAs[Long]("src_n") == n.toLong))
      assert(rows.map(_.getAs[Int]("q_rank")).sorted.toSeq == (1 to n))
      assert(rows.count(_.getAs[Int]("kept") == 1) == n / 2)
      rows.foreach { r =>
        val expectPct = if (n == 1) 0.0
          else (r.getAs[Int]("q_rank") - 1).toDouble / (n - 1)
        assert(r.getAs[Double]("pct") == expectPct)
      }
      // rank follows quality descending
      val sorted = rows.sortBy(_.getAs[Int]("q_rank"))
        .map(_.getAs[Double]("quality_score"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("decontam report: one row per compromised bench doc, maxima " +
      "match the pair table") {
    val pairs = graft.ops.Decontam.overlap(spark, Sf0001)
      .select("bench_id", "n_shared", "bench_frac")
      .as[(Long, Long, Double)].collect()
    val out = Curation.decontamReport(spark, Sf0001).collect()
    val byBench = pairs.groupBy(_._1)
    assert(out.length == byBench.size)
    out.foreach { r =>
      val b = byBench(r.getAs[Long]("bench_id"))
      assert(r.getAs[Long]("n_flagged") == b.length.toLong)
      assert(r.getAs[Long]("max_shared") == b.map(_._2).max)
      assert(r.getAs[Double]("worst_frac") == b.map(_._3).max)
    }
  }

  test("cluster cap: at most K kept per cluster, hash-ordered, " +
      "content-stable") {
    val out = Similarity.clusterCap(spark, Sf0001).collect()
    val nVec = spark.read.parquet(s"$Sf0001/embeddings.parquet").count()
    assert(out.length == nVec)
    out.groupBy(_.getAs[Long]("centroid_id")).foreach { case (_, rows) =>
      val n = rows.length
      assert(rows.forall(_.getAs[Long]("cluster_size") == n.toLong))
      assert(rows.map(_.getAs[Int]("cap_rank")).sorted.toSeq == (1 to n))
      val kept = rows.filter(_.getAs[Int]("kept") == 1)
      assert(kept.length == math.min(n, Similarity.ClusterCapK))
      assert(kept.forall(_.getAs[Int]("cap_rank") <= Similarity.ClusterCapK))
    }
    // determinism across sessions
    val again = Similarity.clusterCap(spark.newSession(), Sf0001).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("prototype prune: exactly the closest quarter of each cluster, " +
      "served from the shared index quantizer") {
    val out = Similarity.prototypePrune(spark, Sf0001).collect()
    val nVec = spark.read.parquet(s"$Sf0001/embeddings.parquet").count()
    assert(out.length == nVec)
    out.groupBy(_.getAs[Long]("centroid_id")).foreach { case (_, rows) =>
      val size = rows.length
      assert(rows.forall(_.getAs[Long]("cluster_size") == size.toLong))
      val pruned = rows.filter(_.getAs[Int]("pruned") == 1)
      assert(pruned.length == size / Similarity.PrototypePruneDenom)
      // pruned = the TOP ranks = the highest cosines (most prototypical)
      val maxPrunedRank =
        if (pruned.isEmpty) 0 else pruned.map(_.getAs[Int]("proto_rank")).max
      assert(rows.filter(_.getAs[Int]("pruned") == 0)
        .forall(_.getAs[Int]("proto_rank") > maxPrunedRank))
      val sorted = rows.sortBy(_.getAs[Int]("proto_rank"))
        .map(_.getAs[Double]("cosine"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }
}
