package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Events, Multimodal, Similarity, TextOps}

/** Unit-level behavior of the training-data operators (oracle parity is
  * covered end-to-end by Verify + tools/compare.py; these pin semantics). */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("exact dedup groups identical texts under one keeper") {
    val out = Dedup.exact(spark, Sf0001)
    assert(out.count() == 500) // corpus has no exact dups
    assert(out.agg(sum("dup_count")).head().getLong(0) == 500)
  }

  test("minhash signatures collide for identical docs and bands are stable") {
    // Same text => same shingle set => same minhash per seed => all bands
    // shared. Verified indirectly: a doc always pairs with itself if we
    // duplicate the corpus; here we check self-consistency via determinism.
    val a = Dedup.minhashLsh(spark, Sf0001).collect().toSet
    val b = Dedup.minhashLsh(spark, Sf0001).collect().toSet
    assert(a == b)
  }

  test("jaccard pairs are symmetric-free (a < b) and within [0,1]") {
    val rows = Dedup.ngramJaccard(spark, Sf0001, threshold = 0.0)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(rows.forall { case (a, b, j) => a < b && j >= 0.0 && j <= 1.0 })
  }

  test("ann_topk ranks self-excluded neighbors with k per query") {
    val out = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to 5))
      assert(!rows.exists(_._2 == q))
    }
  }

  test("vec_dot matches the interpreted HOF fold bit-for-bit") {
    graft.functions.VectorFunctions.register(spark)
    // the contract (and the DuckDB oracle's DOUBLE[] cast) widens each
    // element BEFORE multiplying — a float×float product would round to
    // float first and diverge; the HOF reference must widen the same way
    val df = Similarity.embeddings(spark, Sf0001).limit(50)
      .select(col("vec").as("a_vec"), col("vec").as("b_vec"))
    val cmp = df.select(
      expr("vec_dot(a_vec, b_vec)").as("native"),
      expr("""aggregate(zip_with(a_vec, b_vec,
          (x, y) -> cast(x as double) * cast(y as double)),
        0D, (acc, x) -> acc + x)""").as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("vec_dot / vec_dot_int: mismatched lengths yield null, never a truncated score") {
    graft.functions.VectorFunctions.register(spark)
    // non-foldable inputs so the codegen path runs: row id drives the
    // left array's length, the right side is fixed at 2 — only id=1
    // produces equal lengths, everything else must surface as NULL (the
    // HOF contract, where zip_with pads with null and poisons the fold)
    val rows = spark.range(4).select(
        expr("transform(sequence(0, cast(id as int)), x -> cast(x as double))").as("a"),
        expr("array(1.0D, 2.0D)").as("b"),
        expr("transform(sequence(0, cast(id as int)), x -> cast(x as int))").as("ai"),
        expr("array(1, 2)").as("bi"))
      .select(col("a"), expr("vec_dot(a, b)").as("d"),
        expr("vec_dot_int(ai, bi)").as("di"))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      if (r.getSeq[Double](0).length == 2) {
        assert(r.getDouble(1) == 1.0 * 0 + 2.0 * 1, "matched lengths compute")
        assert(r.getLong(2) == 2L)
      } else {
        assert(r.isNullAt(1), s"len ${r.getSeq[Double](0).length}: vec_dot must be null")
        assert(r.isNullAt(2), s"len ${r.getSeq[Double](0).length}: vec_dot_int must be null")
      }
    }
    // interpreted path (constant folding evals the expression driver-side)
    val folded = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D)) AS d,
                vec_dot_int(array(1, 2, 3), array(1, 2)) AS di""").head()
    assert(folded.isNullAt(0) && folded.isNullAt(1))
  }

  test("simhash: identical word multisets share all bands; hamming bounds hold") {
    val rows = Dedup.simhash(spark, Sf0001, maxHamming = 64)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect()
    assert(rows.forall { case (a, b, h) => a < b && h >= 0 && h <= 64 })
    // band-sharing candidates must agree on >= 16 bits by construction
    assert(rows.forall(_._3 <= 48))
  }

  test("approximate sketches stay within bounds of exact answers") {
    // HLL++ (approx_count_distinct) and the GK quantile sketch are the
    // 100 TB scale path where exact forms shuffle every key or buffer
    // whole groups; their outputs are algorithm-defined, so there is no
    // cross-engine oracle — the verification contract here is an error
    // bound against the exact answer instead.
    val e = Events.events(spark, Sf0001)
    val exactD = e.select(countDistinct(col("user_id"))).head().getLong(0)
    val approxD = e.select(approx_count_distinct("user_id", 0.02)).head().getLong(0)
    assert(math.abs(approxD - exactD).toDouble / exactD < 0.05,
      s"approx_count_distinct $approxD vs exact $exactD")
    val amounts = graft.silver.Silver.orders(spark, Sf0001).select("order_amount")
    val exactP50 = amounts.select(
      expr("percentile(order_amount, 0.5)")).head().getDouble(0)
    val sketchP50 = amounts.select(
      expr("percentile_approx(order_amount, 0.5, 1000)")).head().getDouble(0)
    assert(math.abs(sketchP50 - exactP50) / exactP50 < 0.02,
      s"percentile_approx $sketchP50 vs exact $exactP50")
  }

  test("store-failures tables carry the debuggable rows, not just counts") {
    import graft.quality.Checks
    val pay = graft.silver.Silver.payments(spark, Sf0001)
    val av = Checks.acceptedValuesFailures(pay, "payment_method",
      Seq("credit_card", "bank_transfer", "paypal", "cash", "other"))
      .as[(String, Long)].collect()
    // the reference's digital_wallet quirk: produced by the normalizer,
    // missing from the accepted list — so it MUST surface here
    assert(av.map(_._1).toSeq == Seq("digital_wallet"))
    assert(av.head._2 > 0)
    // silver keys are genuinely unique, so the unique-failures table is empty
    assert(Checks.uniqueFailures(pay, "payment_key").isEmpty)
  }

  test("dedup clusters: connected components of the minhash pair graph") {
    val pairs = Dedup.minhashLsh(spark, Sf0001)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    val clusters = Dedup.dedupClusters(spark, Sf0001)
      .select("doc_id", "cluster_id", "cluster_size").as[(Long, Long, Long)].collect()
    val label = clusters.map(c => c._1 -> c._2).toMap
    // every paired doc is labeled, pairs never straddle clusters
    assert(pairs.forall { case (a, b) => label(a) == label(b) })
    // the label is the smallest member (keep-first keeper id)
    val members = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    assert(members.forall { case (cid, ms) => ms.min == cid })
    // sizes consistent and every component genuinely connected via pairs:
    assert(clusters.forall { case (_, cid, sz) => members(cid).length == sz.toInt })
    info(s"${clusters.length} docs in ${members.size} clusters " +
      s"(max size ${clusters.map(_._3).max})")
  }

  test("lsh ann results are a subset-quality approximation of exact topk") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.annLshTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    // ranks well-formed, self excluded; any overlap with exact topk is a
    // bonus (recall depends on bucket occupancy at this tiny SF)
    assert(lsh.forall { case (q, n, r) => q != n && r >= 1 && r <= 5 })
    assert(lsh.nonEmpty)
    val _ = exact // exact set computed to ensure both paths run
  }

  test("sign_bits matches the SQL-expressible md5 formulation bit-for-bit") {
    graft.functions.VectorFunctions.register(spark)
    // the interpreted reference formulation the DuckDB oracle mirrors:
    // per plane j, fold coef(j,c)·vec[c] left-to-right, emit sign bit
    val planes = 9
    val hof = (0 until planes).map { j =>
      s"""CASE WHEN aggregate(sequence(1, size(vec)), cast(0.0 as double),
           (acc, c) -> acc + (2 * ((instr('0123456789abcdef',
             substring(md5(concat(cast($j as string), '_', cast(c as string))), 1, 1)) - 1) & 1) - 1)
             * element_at(vec, c), acc -> acc) > 0
         THEN '1' ELSE '0' END"""
    }.mkString("concat(", ", ", ")")
    val df = graft.ops.Similarity.embeddings(spark, Sf0001)
      .select(expr(s"sign_bits(vec, $planes)").as("native"), expr(hof).as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("multi-probe lsh recall dominates single-probe recall") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = Similarity.annLshTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .count(exact.contains)
    val multi = Similarity.annLshMultiProbeTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .count(exact.contains)
    info(s"recall hits vs exact: single-probe=$single multi-probe=$multi of ${exact.size}")
    assert(multi >= single, "probing Hamming-1 buckets can only add candidates")
  }

  test("ivf ann: trained k-means centroids, recall@5 vs exact baseline") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.annIvfTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(ivf.forall { case (q, n, r) => q != n && r >= 1 && r <= 5 })
    val recall = ivf.map(t => (t._1, t._2)).count(exact.contains).toDouble / exact.size
    info(f"ivf recall@5 vs exact = $recall%.2f (${exact.size} exact pairs)")
    // nprobe=1 over 16 trained centroids: the query's own list must still
    // surface a meaningful share of the true top-k
    assert(recall >= 0.2, f"ivf recall@5 $recall%.2f below floor")
  }

  test("ivf multi-probe recall dominates nprobe=1 recall") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val single = Similarity.annIvfTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .count(exact.contains)
    val multiRows = Similarity.annIvfMultiProbeTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(multiRows.forall { case (q, n, r) => q != n && r >= 1 && r <= 5 })
    val multi = multiRows.map(t => (t._1, t._2)).count(exact.contains)
    val singleR = single.toDouble / exact.size
    val multiR = multi.toDouble / exact.size
    info(f"ivf recall@5 vs exact: nprobe=1 $singleR%.2f  nprobe=${Similarity.IvfNProbe} $multiR%.2f (${exact.size} exact pairs)")
    // probing more inverted lists can only widen the candidate set, and at
    // nprobe=4 of ivfK(N) lists it must clear the production-shaped bar the
    // nprobe=1 variant (0.30 here) could not
    assert(multi >= single, "extra probes can only add candidates")
    assert(multiR >= 0.5, f"ivf multi-probe recall@5 $multiR%.2f below 0.5")
  }

  test("sessionization splits on >30min gaps only") {
    val sessions = Events.sessionize(spark, Sf0001)
    val nEvents = Events.events(spark, Sf0001).count()
    assert(sessions.agg(sum("n_events")).head().getLong(0) == nEvents)
    // durations are non-negative and sessions are internally gap-bounded
    assert(sessions.filter(col("duration_secs") < 0).count() == 0)
  }

  test("multimodal payloads are real BMPs and ImageIO decode matches " +
      "the seed arithmetic") {
    val f = Multimodal.features(spark, Sf0001)
    // decoded (not declared) dimensions land in the synthesis range
    assert(f.filter(col("width") < 1 || col("width") > 8).count() == 0)
    assert(f.filter(col("height") < 1 || col("height") > 8).count() == 0)
    // payload size includes header + 4-byte-padded stride rows
    assert(f.filter(col("n_bytes") < 54 + 4).count() == 0)
    assert(f.select("media_type").distinct().count() == 3)
    // a doctored payload (row order flipped by negating the height field
    // would change the checksum) — prove the checksum really comes from
    // decoded pixels: two docs with different texts must disagree
    assert(f.select("pixel_checksum").distinct().count() > 1)
  }

  test("language id picks the profile with most function-word hits") {
    val hit = TextOps.langId(spark, Sf0001)
      .filter(col("best_score") > 0)
    assert(hit.count() > 0)
    // deterministic across runs
    assert(TextOps.langId(spark, Sf0001).collect().toSeq ==
      TextOps.langId(spark, Sf0001).collect().toSeq)
  }

  test("winnowing: shared substring ≥ k+w-1 guarantees a shared fingerprint") {
    // two docs sharing an 11-char run (= WinnowK + WinnowW - 1) embedded in
    // otherwise unrelated text — the winnowing guarantee says at least one
    // selected fingerprint must coincide
    val shared = "abcdefghijk"
    require(shared.length == TextOps.WinnowK + TextOps.WinnowW - 1)
    val docs = Seq(
      (1L, s"xxxx yyyy $shared zzzz wwww"),
      (2L, s"totally different prefix $shared and suffix here"),
      (3L, "no overlap with anything else at all qqqq")).toDF("doc_id", "text")
    val fps = TextOps.winnowFingerprints(docs)
    val byDoc = fps.collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).toSet).toMap
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty,
      "docs sharing a k+w-1 substring must share a fingerprint")
    // density: winnowing selects ~2/(w+1) of grams, never more than 1/window
    val d1 = byDoc(1L).size.toDouble / (docs.filter(col("doc_id") === 1)
      .select(length(col("text"))).head().getInt(0) - TextOps.WinnowK + 1)
    assert(d1 > 0.1 && d1 < 0.8, s"fingerprint density out of range: $d1")
    // deterministic
    assert(TextOps.winnowFingerprints(docs).collect().toSet ==
      TextOps.winnowFingerprints(docs).collect().toSet)
  }

  test("winnow near-dup finds copied passages, not whole-doc similarity") {
    // docs 1 and 2 share one long passage inside otherwise-different text;
    // doc 3 is unrelated. The passage guarantees many shared fingerprints.
    val passage = "the quick brown fox jumps over the lazy dog repeatedly"
    val docs = Seq(
      (1L, s"intro alpha beta $passage outro gamma"),
      (2L, s"completely different start $passage and a different ending too"),
      (3L, "nothing in common with the others at all here qqq zzz")
    ).toDF("doc_id", "text")
    val pairs = Dedup.winnowNearDupFrom(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)),
      s"only the passage-sharing pair must surface, got $pairs")
  }

  test("winnow_fps handles multi-byte unicode like SQL substring (property)") {
    graft.functions.VectorFunctions.register(spark)
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    // WinnowFps walks code-point offsets into the raw UTF8 bytes by hand;
    // the HOF reference goes through Spark's own substring. Any offset bug
    // shows on strings mixing 1/2/3/4-byte encodings — generate exactly
    // those (ASCII, Latin-1 é, CJK 漢, astral 😀 as a surrogate pair).
    val alphabet = "ab 7é漢語🙂😀ß中"
    val rng = new scala.util.Random(20260813)
    val cps = alphabet.codePoints().toArray
    val docs = (0 until 120).map { i =>
      val n = rng.nextInt(40) // includes < k and < k+w-1 edge lengths
      val sb = new java.lang.StringBuilder
      (0 until n).foreach(_ => sb.appendCodePoint(cps(rng.nextInt(cps.length))))
      (i.toLong, sb.toString)
    }.toDF("doc_id", "text")
    val cmp = docs
      .withColumn("ng", greatest(length(col("text")) - lit(k - 1), lit(1)))
      .withColumn("hs",
        expr(s"transform(sequence(1, ng), i -> md5(substring(text, i, $k)))"))
      .withColumn("ref",
        expr(s"array_distinct(transform(sequence(1, greatest(ng - ${w - 1}, 1)), " +
          s"j -> array_min(slice(hs, j, $w))))"))
      .withColumn("native", expr(s"winnow_fps(text, $k, $w)"))
    assert(cmp.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("winnow_fps matches the HOF/SQL-expressible formulation exactly") {
    graft.functions.VectorFunctions.register(spark)
    val k = TextOps.WinnowK
    val w = TextOps.WinnowW
    // the interpreted reference formulation the DuckDB oracle mirrors —
    // NOT used in production (CollapseProject turns it O(ng²); see
    // graft.functions.WinnowFps)
    val hof = TextOps.documents(spark, Sf0001)
      .withColumn("ng", greatest(length(col("text")) - lit(k - 1), lit(1)))
      .withColumn("hs",
        expr(s"transform(sequence(1, ng), i -> md5(substring(text, i, $k)))"))
      .withColumn("ref",
        expr(s"array_distinct(transform(sequence(1, greatest(ng - ${w - 1}, 1)), " +
          s"j -> array_min(slice(hs, j, $w))))"))
      .withColumn("native", expr(s"winnow_fps(text, $k, $w)"))
    assert(hof.filter(col("native") =!= col("ref")).count() == 0)
  }

  test("winnowing handles docs shorter than one gram") {
    val tiny = Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text")
    val out = TextOps.winnowFingerprints(tiny).collect()
    assert(out.length == 2, "each short doc still gets exactly one fingerprint")
    assert(out.forall(_.getString(1).length == 32))
  }

  test("chunking covers every char, overlaps by size-stride, md5s are exact") {
    val text = ('a' to 'z').mkString * 20 // 520 chars
    val docs = Seq((1L, text), (2L, "short doc")).toDF("doc_id", "text")
    val rows = TextOps.chunkDocs(docs, size = 200, stride = 150)
      .orderBy("doc_id", "chunk_idx").collect()
    val (d1, d2) = rows.partition(_.getLong(0) == 1L)
    // 520 chars: starts 0/150/300/450 → ceil((520-200)/150)+1 = 4 chunks
    assert(d1.map(_.getLong(1)).toSeq == Seq(0L, 1L, 2L, 3L))
    assert(d1.map(_.getLong(2)).toSeq == Seq(200L, 200L, 200L, 70L))
    // md5 of each chunk matches a direct substring hash
    d1.zipWithIndex.foreach { case (r, i) =>
      val expect = java.security.MessageDigest.getInstance("MD5")
        .digest(text.substring(i * 150, math.min(i * 150 + 200, text.length))
          .getBytes("UTF-8")).map("%02x".format(_)).mkString
      assert(r.getString(3) == expect)
    }
    // short doc → exactly one chunk of its own length
    assert(d2.map(r => (r.getLong(1), r.getLong(2))).toSeq == Seq((0L, 9L)))
  }

  test("repetition signals: looping text scores high, diverse text low") {
    val docs = Seq(
      (1L, "spam spam spam spam"),
      (2L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val rows = TextOps.repetitionFrom(docs).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    // 4×"spam": dup words 3/4; "spam spam" is all 3 bigrams; trigrams all dup
    assert(rows(1L) == (0.75, 1.0, 0.5))
    // all-distinct words: no dup words, each bigram unique (top = 1/5)
    assert(rows(2L)._1 == 0.0 && rows(2L)._2 == 0.2 && rows(2L)._3 == 0.0)
  }

  test("decontam flags corpus docs sharing passages with the benchmark set") {
    val out = ops.Decontam.overlap(spark, Sf0001).collect()
    // every flagged pair crosses the boundary and meets the floor
    assert(out.forall(r => r.getLong(0) >= ops.Decontam.BenchmarkDocs &&
      r.getLong(1) < ops.Decontam.BenchmarkDocs &&
      r.getLong(2) >= ops.Decontam.MinSharedGrams))
    // bench_frac is a fraction of the benchmark doc's distinct grams
    assert(out.forall(r => r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0))
    assert(out.nonEmpty, "sf0.01 contains at least one contaminated pair")
  }

  test("bm25: tf monotonicity and rare-term dominance") {
    val out = ops.Search.bm25TopK(spark, Sf0001)
      .select("query_id", "rank", "doc_id", "score_q").collect()
    val byQ = out.groupBy(_.getInt(0))
    assert(byQ.keySet == ops.Search.QuerySet.map(_._1).toSet)
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq == (1 to sorted.length))
      // scores are non-increasing down the ranking
      val scores = sorted.map(_.getLong(3)).toSeq
      assert(scores == scores.sorted.reverse)
    }
    // query 3 contains "dup" (df ~26 of 500 docs): its top hit must
    // actually contain the rare term — idf dominance
    val top3 = out.filter(r => r.getInt(0) == 3 && r.getInt(1) == 1).head.getLong(2)
    val text = graft.ops.TextOps.documents(spark, Sf0001)
      .filter(col("doc_id") === top3).head.getAs[String]("text")
    assert(text.split(" ").contains("dup"))
  }

  test("int8 ANN agrees with exact ANN at high rank overlap") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val int8 = Similarity.annInt8TopK(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(int8.keySet == exact.keySet)
    // int8 quantization barely moves cosine: ≥80% top-5 overlap on average
    val overlap = exact.keys.toSeq
      .map(q => (exact(q) intersect int8(q)).size.toDouble / 5).sum / exact.size
    assert(overlap >= 0.8, s"int8 recall vs exact too low: $overlap")
  }

  test("split leakage matrix conserves the near-dup pair count, flags off-diagonal") {
    val pairs = Dedup.minhashLsh(spark, Sf0001).count()
    val m = Dedup.splitLeakage(spark, Sf0001).collect()
    assert(m.map(_.getLong(2)).sum == pairs, "every pair lands in exactly one cell")
    m.foreach { r =>
      assert((r.getInt(3) == 1) == (r.getString(0) != r.getString(1)))
    }
    assert(m.exists(_.getInt(3) == 1),
      "the synthetic corpus has near-dups crossing splits — the audit must surface them")
  }

  test("funnel steps are nested and ratios well-formed") {
    val r = Events.funnel(spark, Sf0001).head()
    val (v, vc, vcp) = (r.getLong(1), r.getLong(2), r.getLong(3))
    assert(v >= vc && vc >= vcp, "each funnel step can only lose users")
    assert(v > 0 && vc > 0, "the synthetic event stream converts at least one user")
    assert(r.getDouble(4) == vc.toDouble / v && r.getDouble(5) == vcp.toDouble / vc)
  }

  test("sequence packing conserves tokens and numbers sequences contiguously") {
    val docs = TextOps.documents(spark, Sf0001)
      .select(col("lang"), ceil(col("n_chars") / lit(4.0)).cast("bigint").as("tok"))
      .groupBy("lang").agg(sum("tok").as("total"), max("tok").as("max_doc"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val packed = TextOps.pack(spark, Sf0001).collect()
      .groupBy(_.getString(0))
    packed.foreach { case (lang, rows) =>
      val (total, maxDoc) = docs(lang)
      // token conservation: packing moves every token exactly once
      assert(rows.map(_.getLong(3)).sum == total)
      // sequence ids are a contiguous prefix 0..max
      val ids = rows.map(_.getLong(1)).sorted
      assert(ids.toSeq == (0L until ids.length).toSeq)
      // a sequence can only stay under seqLen if the next doc overflowed:
      // every non-final sequence holds > seqLen - max_doc tokens
      rows.filter(_.getLong(1) < ids.max).foreach { r =>
        assert(r.getLong(3) > TextOps.PackSeqLen - maxDoc)
      }
    }
  }

  test("pq adc: well-formed ranking whose picks beat random selection") {
    // full exact cosine list per query (k = N) — the quality reference
    val exactAll = Similarity.annTopK(spark, Sf0001, k = 1000)
      .select("query_id", "neighbor_id", "cosine")
      .as[(Long, Long, Double)].collect()
    val byQ = exactAll.groupBy(_._1)
      .view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val pq = Similarity.annPqAdc(spark, Sf0001, k = 5)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Int)].collect()
    assert(pq.groupBy(_._1).keySet == byQ.keySet)
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
      assert(rows.forall(r => r._1 != r._2))
      // the contract a 128×-compressed code can honestly make on a
      // near-random corpus (exact top cosines ≈ 0.33 vs noise ≈ 0.25):
      // not exact-top-5 recovery, but selections whose TRUE cosine is
      // decisively above the corpus average for that query
      val cos = byQ(q)
      val picked = rows.map(r => cos(r._2)).sum / rows.length
      val avg = cos.values.sum / cos.size
      assert(picked > avg + 0.1,
        f"query $q: pq picks avg true cosine $picked%.3f vs corpus $avg%.3f")
    }
  }

  test("rrf fusion: members come from the input lists, consensus wins") {
    val exact = Similarity.annTopK(spark, Sf0001, k = 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val int8 = Similarity.annInt8TopK(spark, Sf0001, k = 10)
      .select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    val fused = Similarity.annRrfFusion(spark, Sf0001)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect()
    val inputs = (exact ++ int8).map(r => (r._1, r._2)).toSet
    assert(fused.forall(f => inputs.contains((f._1, f._3))),
      "a fused hit must come from at least one input ranking")
    // where both rankers agree on the top hit, fusion must keep it at 1
    val top1exact = exact.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    val top1int8 = int8.filter(_._3 == 1).map(r => r._1 -> r._2).toMap
    val top1fused = fused.filter(_._2 == 1).map(f => f._1 -> f._3).toMap
    top1exact.foreach { case (q, n) =>
      if (top1int8.get(q).contains(n))
        assert(top1fused(q) == n, s"consensus top-1 for query $q must survive fusion")
    }
  }

  test("regex token counts diverge from whitespace counts where they should") {
    val docs = Seq(
      (1L, "don't stop 123 now!!"),
      (2L, "plain lowercase words only")).toDF("doc_id", "full_text")
    val rows = TextOps.withTokenCounts(docs)
      .select("doc_id", "ws_tokens", "re_tokens").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // "don't stop 123 now!!" → don | 't | _stop | _123 | _now | !! = 6
    assert(rows(1L) == (4L, 6L),
      s"contraction + digit run + punctuation must tokenize apart, got ${rows(1L)}")
    // on plain space-joined words all counters agree
    assert(rows(2L) == (4L, 4L))
  }

  test("range join attributes orders to containing promo windows only") {
    val out = graft.ops.RangeJoin.promoRevenue(spark, Sf0001).collect()
    assert(out.nonEmpty)
    // cross-check one promo against a direct filter (no join)
    val promos = graft.ops.RangeJoin.Promos
      .map { case (p, lo, hi) => p -> (lo, hi) }.toMap
    val orders = spark.read.parquet(s"$Sf0001/orders.parquet")
      .withColumn("d", col("o_orderdate").cast("timestamp_ntz").cast("date"))
    out.foreach { r =>
      val (lo, hi) = promos(r.getString(0))
      val expected = orders
        .filter(col("d") >= lit(lo).cast("date") && col("d") <= lit(hi).cast("date"))
        .count()
      assert(r.getLong(1) == expected,
        s"${r.getString(0)}: bucket-expansion join must equal the direct range count")
    }
  }

  test("mixture: sqrt-temperature resampling, exact copy counts per stratum") {
    val out = TextOps.mixture(spark, Sf0001)
      .select("lang", "n_lang", "target_docs", "n_copies")
      .as[(String, Long, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    assert(byLang.nonEmpty)
    byLang.foreach { case (lang, rows) =>
      val n = rows.head._2
      val target = rows.head._3
      assert(rows.length == n, s"$lang: one output row per document")
      val base = target / n
      // copy counts are whole epochs +/- the hash-threshold remainder copy
      assert(rows.forall(r => r._4 == base || r._4 == base + 1))
      // the threshold hits the remainder in expectation; bound the deviation
      val copies = rows.map(_._4).sum
      assert(math.abs(copies - target) <= math.max(8L, n / 4),
        s"$lang: total copies $copies vs target $target")
    }
    // sqrt weighting suppresses the head stratum and boosts the tail
    val strata = out.map(r => (r._1, r._2, r._3)).distinct
    val head = strata.maxBy(_._2)
    val tail = strata.minBy(_._2)
    if (head._2 > 2 * tail._2) {
      assert(head._3 < head._2, s"head ${head._1} must be downsampled")
      assert(tail._3 > tail._2, s"tail ${tail._1} must be upsampled")
    }
  }

  test("ranking family: ordinals well-formed and mutually consistent") {
    val rows = graft.ops.Analytics.methodRevenueRanks(spark, Sf0001)
      .select("order_year_month", "rnk", "dense_rnk", "pct_rank", "cume",
        "quartile")
      .as[(String, Int, Int, Double, Double, Int)].collect()
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (m, rs) =>
      val n = rs.length
      // ties are broken in the window order, so rank is the identity
      // permutation 1..n and dense_rank coincides with it
      assert(rs.map(_._2).sorted.toSeq == (1 to n), s"$m ranks")
      rs.foreach { r =>
        assert(r._2 == r._3, s"$m: tie-broken rank == dense_rank")
        val expectedPct = if (n == 1) 0.0 else (r._2 - 1).toDouble / (n - 1)
        assert(r._4 == expectedPct, s"$m percent_rank")
        assert(r._5 == r._2.toDouble / n, s"$m cume_dist with unique order")
        assert(r._6 >= 1 && r._6 <= 4, s"$m ntile bounds")
      }
    }
  }

  test("bpe: greedy merge scores are non-increasing and merges well-formed") {
    val rows = graft.ops.Bpe.merges(spark, Sf0001)
      .select("rank", "pair_a", "pair_b", "merged", "score")
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1 to graft.ops.Bpe.NumMerges))
    rows.foreach { case (_, a, b, m, score) =>
      assert(m == a + b, "merged symbol is the pair concatenation")
      assert(score > 0)
    }
    // any pair present after a merge either existed before (score <= max)
    // or was created by it (count <= the chosen pair's count), so the
    // greedy max sequence can never increase
    rows.sliding(2).foreach { case Array(x, y) =>
      assert(y._5 <= x._5, s"greedy scores must be non-increasing: $x -> $y")
    }
  }

  test("bpe segment: subwords reconstruct the word, end-of-word marker kept") {
    val rows = graft.ops.Bpe.segment(spark, Sf0001)
      .select("word", "segmented", "n_subwords")
      .as[(String, String, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (w, seg, n) =>
      assert(seg.endsWith("</w>"), s"$w: segmentation keeps the marker")
      assert(seg.replace(" ", "").stripSuffix("</w>") == w,
        s"$w: concatenating subwords must reconstruct the word")
      assert(n == seg.split(" ").length)
      assert(n <= w.length + 1, s"$w: merging can only shorten")
    }
  }

  test("bpe subword freq: counts exactly conserve the segmented token stream") {
    import graft.ops.Bpe
    val total = Bpe.subwordFreq(spark, Sf0001)
      .agg(sum("occurrences")).head().getLong(0)
    val tokens = TextOps.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$"))
    // at this corpus every distinct filtered word is inside the top-300
    // dictionary, so the dict segmentation covers the whole stream and
    // occurrence totals must match token-by-token subword counts exactly
    val bySeg = tokens.join(Bpe.segment(spark, Sf0001), "word")
      .agg(sum("n_subwords")).head().getLong(0)
    assert(total == bySeg, "corpus apply must equal per-word segmentation")
    assert(total >= tokens.count(), "every token yields at least one subword")
  }

  test("bpe_split === the doubled nested-replace SQL chain, on the real " +
      "dictionary AND adversarial repeated-pair words") {
    import graft.ops.Bpe
    graft.functions.VectorFunctions.register(spark)
    val ms = Bpe.merges(spark, Sf0001).collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)))
    val enc = ms.map { case (a, b, m) => s"$a $b $m" }.mkString(";")
    val seq0 = "concat(' ', regexp_replace(word, '(.)', '$1 '), '</w> ')"
    val chain = ms.foldLeft(seq0) { case (e, (a, b, m)) =>
      s"replace(replace($e, ' $a $b ', ' $m '), ' $a $b ', ' $m ')"
    }
    // real dictionary words + adversarial shapes: odd/even chains of the
    // SAME pair back-to-back exercise the consumed-separator skip (the
    // non-obvious half of string-replace semantics), and single chars /
    // the top merge symbols exercise boundary merges with </w>
    val adversarial = Seq("a", "e", "ee", "eee", "eeee", "eeeee",
      "eeeeee", "thethe", "ththth", "ererer", "erer", "ee" * 9,
      "the" * 5, "ananan", "aaaaaaab")
    import spark.implicits._
    val dictWords = TextOps.documents(spark, Sf0001)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word").rlike("^[a-z]+$")).distinct()
    val words = dictWords.union(adversarial.toDF("word"))
    val mismatches = words
      .withColumn("native", expr(s"bpe_split(word, '$enc')"))
      .withColumn("sql", split(trim(expr(chain)), " "))
      .filter(not(col("native") === col("sql")))
      .collect()
    assert(mismatches.isEmpty,
      s"bpe_split must match the replace chain: ${mismatches.take(5).toSeq}")
  }

  test("bpe train memo: content-fingerprint keyed — corpus change invalidates") {
    import graft.ops.{Bpe, IvfIndex}
    val tmp = java.nio.file.Files.createTempDirectory("bpe_memo").toString
    val dst = java.nio.file.Paths.get(tmp, "documents.parquet")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(Sf0001, "documents.parquet"), dst)
    // the memo key is (session, fingerprint, numMerges): a stable
    // fingerprint over an unchanged corpus IS the cache-hit guarantee
    val fpA = IvfIndex.fingerprint(spark, tmp, "documents.parquet")
    assert(IvfIndex.fingerprint(spark, tmp, "documents.parquet") == fpA,
      "unchanged corpus must fingerprint stably (memo hit)")
    val first = Bpe.merges(spark, tmp, numMerges = 4)
      .collect().map(_.toSeq).toSeq
    // swap the corpus under the same dir: different bytes, same schema —
    // the identity-hash keying this replaced keyed on (session, dir) only
    // and would have silently served the stale dictionary
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(Sf0001.replace("0.001", "0.01"),
        "documents.parquet"),
      dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    assert(IvfIndex.fingerprint(spark, tmp, "documents.parquet") != fpA,
      "content change must change the fingerprint (memo miss)")
    val retrained = Bpe.merges(spark, tmp, numMerges = 4)
      .collect().map(_.toSeq).toSeq
    assert(retrained != first,
      "the new corpus trains a new merge table, not the stale one")
    Bpe.clearCache() // smoke: the invalidation hook exists and is callable
  }

  test("semdedup: shares the serving index's quantizer — warm calls train nothing") {
    import graft.ops.{IvfIndex, Similarity}
    // warm the fingerprint's index, then pin that semDedup adds no
    // training work of its own — the N²-class per-call quantizer cost of
    // the earlier self-trained sizing is exactly what this forbids
    IvfIndex.lists(spark, Sf0001).count()
    val before = IvfIndex.trainings.get()
    val out = Similarity.semDedup(spark, Sf0001)
    out.count()
    assert(IvfIndex.trainings.get() == before,
      "a warm semDedup call must serve from the cached index quantizer")
    // and its clusters ARE the index's inverted lists
    val idx = IvfIndex.lists(spark, Sf0001)
      .select("vec_id", "centroid_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.select("vec_id", "centroid_id").collect().foreach { r =>
      assert(idx(r.getLong(0)) == r.getLong(1),
        "every dropped vector is scoped to its index list")
    }
  }

  test("semdedup: drops are dominated by an earlier in-cluster keeper") {
    val out = Similarity.semDedup(spark, Sf0001).collect()
    assert(out.nonEmpty, "threshold must yield rows on the test corpus")
    val dropped = out.map(_.getLong(0)).toSet
    out.foreach { r =>
      val (vecId, keeper, cos) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(keeper < vecId, "keeper is always the earlier id")
      assert(cos >= 0.35 - 1e-12, "dominating pair is above threshold")
    }
    // keep-set complement is what a pipeline consumes: dropped ∪ kept = N
    val n = Similarity.embeddings(spark, Sf0001).count()
    assert(dropped.size < n, "semantic dedup must never drop everything")
  }

  test("shard manifest: partitions the corpus, digest is membership-exact") {
    import graft.ops.Corpus
    val rows = Corpus.shardManifest(spark, Sf0001).collect()
    assert(rows.map(_.getInt(0)).toSet == (0 until Corpus.NumShards).toSet)
    val docs = TextOps.documents(spark, Sf0001)
    assert(rows.map(_.getLong(1)).sum == docs.count(),
      "shards partition the corpus exactly")
    assert(rows.map(_.getLong(3)).sum ==
      docs.agg(sum("n_chars")).head().getLong(0))
    // membership sensitivity: the same corpus minus one doc must change
    // exactly that doc's shard digest and count, and no other row
    val tmp = java.nio.file.Files.createTempDirectory("shardman").toString
    docs.filter(col("doc_id") =!= 7).coalesce(1)
      .write.parquet(s"$tmp/documents.parquet")
    val before = rows.map(r => r.getInt(0) -> (r.getLong(1), r.getLong(6))).toMap
    val after = Corpus.shardManifest(spark, tmp).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(6))).toMap
    val changed = before.keySet.filter(s => before(s) != after(s))
    assert(changed.size == 1, "one doc lives in exactly one shard")
    assert(before(changed.head)._1 - 1 == after(changed.head)._1)
    assert(before(changed.head)._2 != after(changed.head)._2,
      "the xor digest must see the missing member")
  }

  test("retention: diagonal equals cohort size, fractions bounded") {
    val rows = Events.retention(spark, Sf0001)
      .select(col("cohort_week").cast("string"),
        col("activity_week").cast("string"), col("week_offset"),
        col("active_users"), col("cohort_size"), col("retention"))
      .as[(String, String, Int, Long, Long, Double)].collect()
    assert(rows.length > 1, "the events span must yield a real matrix")
    rows.foreach { case (c, a, off, act, size, ret) =>
      assert(off >= 0, "no activity before the cohort's first week")
      assert((off == 0) == (c == a))
      assert(act <= size, "retained users are a subset of the cohort")
      assert(ret > 0 && ret <= 1.0 + 1e-12)
    }
    rows.groupBy(_._1).foreach { case (c, rs) =>
      val diag = rs.find(_._3 == 0)
      assert(diag.isDefined, s"cohort $c must contain its first week")
      assert(diag.get._4 == diag.get._5, "offset-0 activity IS the cohort size")
    }
  }

  /** Writes a boutique documents.parquet into a fresh dir, returning the
    * dir — lets operator tests construct exact overlap structure instead
    * of asserting weaker invariants on the synthetic corpus. */
  private def docsDir(texts: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("ops_docs").toString
    texts.zipWithIndex
      .map { case (t, i) =>
        (i.toLong, t, "en", "unit", t.length.toLong)
      }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("span profile counts exactly the cross-doc shared 3-gram spans") {
    // doc0 and doc1 share the 4-word run "q w e r" => 2 shared 3-grams;
    // doc2 is disjoint; doc3 is too short for any span (absent from out).
    val dir = docsDir(Seq(
      "q w e r a b", // spans: qwe wer era rab  (4)
      "x q w e r y", // spans: xqw qwe wer ery  (4)
      "m n o p",     // spans: mno nop          (2)
      "t u"))        // no spans
    val out = Dedup.spanProfile(spark, dir)
      .select("doc_id", "n_spans", "n_shared_spans", "shared_frac")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(0L, 1L, 2L))
    assert(out(0) == ((0L, 4L, 2L, 0.5)))
    assert(out(1) == ((1L, 4L, 2L, 0.5)))
    assert(out(2) == ((2L, 2L, 0L, 0.0)))
  }

  test("span profile stages on distinct-text reps: twins add no shared spans") {
    // an exact duplicate pair must NOT mark its own spans as shared
    val dir = docsDir(Seq("a b c d e", "a b c d e"))
    val out = Dedup.spanProfile(spark, dir)
      .select("doc_id", "n_shared_spans").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 0L)),
      "one rep per text; self-duplication is dedup_exact's finding")
  }

  test("cut spans: non-keeper docs cut shared spans, overlaps merge into " +
      "maximal islands, the keeper is untouched") {
    // "q w e" and "w e r" are shared; doc0 (min id) keeps, doc1 cuts at
    // p=2 and p=3 — overlapping 3-grams merge into ONE island [2,5]
    val dir = docsDir(Seq(
      "q w e r a b",
      "x q w e r y",
      "m n o p"))
    val out = Dedup.cutSpans(spark, dir)
      .select("doc_id", "span_start", "span_end", "n_words")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 2, 5, 4)),
      "exactly one merged island on the non-keeper; keeper has no row")
  }

  test("cut spans: non-adjacent shared spans stay separate islands and " +
      "within-doc repeats cut every occurrence") {
    val dir = docsDir(Seq(
      "u v w z",         // keeper of "u v w"
      "u v w x u v w"))  // shared at p=1 AND p=5
    val out = Dedup.cutSpans(spark, dir)
      .select("doc_id", "span_start", "span_end")
      .as[(Long, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq == Seq((1L, 1, 3), (1L, 5, 7)),
      "two islands with the middle word surviving")
  }

  test("trim spans: remediated text drops exactly the cut islands; " +
      "uncut docs pass text through verbatim") {
    val dir = docsDir(Seq(
      "q w e r a b",
      "x q w e r y",
      "m n o p"))
    val out = Dedup.trimSpans(spark, dir)
      .select("doc_id", "n_words_before", "n_words_after", "trimmed_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 6L, 6L, "q w e r a b"),
      (1L, 6L, 2L, "x y"),
      (2L, 4L, 4L, "m n o p")))
  }

  test("lm surprisal scores docs under the corpus bigram LM with exact " +
      "rational conditionals") {
    // corpus counts: (a,b)=3, (b,a)=1, (b,c)=1; totals a=3, b=2
    // cond: p(b|a)=1.0, p(a|b)=0.5, p(c|b)=0.5 — nothing under 1/1000
    val dir = docsDir(Seq("a b a b", "a b c"))
    val out = TextOps.lmSurprisal(spark, dir)
      .select("doc_id", "n_bigrams", "n_rare", "rare_frac", "min_cond_prob")
      .as[(Long, Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (0L, 3L, 0L, 0.0, 0.5),
      (1L, 2L, 0L, 0.0, 0.5)))
  }

  test("tfidf ranks a doc's rare term above its shared term") {
    val dir = docsDir(Seq(
      "alpha common common", // alpha df=1 tf=1; common df=2 tf=2
      "beta common"))
    val rows = TextOps.tfidfTopK(spark, dir)
      .select("doc_id", "rank", "token", "tf", "df", "score")
      .as[(Long, Int, String, Long, Long, Double)].collect()
    val doc0 = rows.filter(_._1 == 0L).sortBy(_._2)
    // score(alpha) = 1*(2+1)/(1+1) = 1.5; score(common) = 2*3/3 = 2.0 —
    // tf can outweigh idf; the ranking must follow the score exactly
    assert(doc0.map(t => (t._3, t._6)).toSeq ==
      Seq(("common", 2.0), ("alpha", 1.5)))
    val doc1 = rows.filter(_._1 == 1L).sortBy(_._2)
    // beta: 1*3/2 = 1.5 beats common: 1*3/3 = 1.0
    assert(doc1.map(_._3).toSeq == Seq("beta", "common"))
    rows.groupBy(_._1).values.foreach { rs =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length))
      assert(rs.sortBy(_._2).sliding(2).forall { pair =>
        pair.length < 2 || {
          val (a, b) = (pair(0), pair(1))
          a._6 > b._6 || (a._6 == b._6 && a._3 < b._3)
        }
      }, "ranks follow (score desc, token) exactly")
    }
  }

  test("kmv sketch is mergeable: bottom-k of shard bottom-k's equals global bottom-k") {
    import graft.ops.Sketch
    // the property that makes the sketch shard-composable at 100 TB:
    // min-k(A ∪ B) = min-k(min-k(A) ∪ min-k(B)), replayed on the real
    // hash population of the test corpus
    val hashes = Events.events(spark, Sf0001)
      .select(col("user_id"), expr(Sketch.md5U24Expr("user_id")).cast("long").as("h"))
      .distinct().as[(Long, Long)].collect()
    val (a, b) = hashes.partition(_._1 % 2 == 0)
    def bottomK(hs: Iterable[Long]) = hs.toSeq.distinct.sorted.take(Sketch.K)
    val merged = bottomK(bottomK(a.map(_._2)) ++ bottomK(b.map(_._2)))
    assert(merged == bottomK(hashes.map(_._2)),
      "per-shard sketches must merge losslessly into the global sketch")
  }

  test("kmv merge row: every group's merged sketch bit-equals the direct " +
      "global sketch") {
    import graft.ops.Sketch
    val rows = Sketch.kmvMergeShards(spark, Sf0001)
      .select("event_type", "n_shards", "sketch_agrees")
      .as[(String, Long, Int)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, nSh, agrees) =>
      assert(agrees == 1, s"$et: merged sketch diverged from global")
      assert(nSh >= 1 && nSh <= Sketch.MergeShards)
    }
  }

  test("cms heavy hitters: never underestimates, ranks dense, estimates " +
      "exact when a term's counters are collision-free") {
    import graft.ops.Sketch
    val rows = Sketch.cmsHeavyHitters(spark, Sf0001)
      .select("rank", "token", "exact_count", "cms_estimate", "over_ratio")
      .as[(Int, String, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.length == Sketch.CmsTopK)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    rows.foreach { case (_, tok, exact, est, ratio) =>
      assert(est >= exact,
        s"$tok: count-min must only ever OVERestimate ($est < $exact)")
      assert(ratio >= 1.0 - 1e-12)
    }
    // exact counts are non-increasing in rank (ties by token)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
      case _ =>
    }
  }

  test("kmv intersect: estimator sane — n_both bounded by the sample, " +
      "estimate within the sketch's design error of truth") {
    import graft.ops.Sketch
    val rows = Sketch.kmvIntersect(spark, Sf0001)
      .select("type_a", "type_b", "n_kept", "n_both", "jaccard_est",
        "union_est", "est_intersect", "exact_intersect")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (kept, both) = (r.getLong(2), r.getLong(3))
      val (jac, est, exact) =
        (r.getDouble(4), r.getDouble(6), r.getLong(7))
      assert(both <= kept && jac >= 0.0 && jac <= 1.0)
      assert(math.abs(jac - both.toDouble / kept) < 1e-12)
      // 3/sqrt(K) ≈ 37% three-sigma band on the union estimate, plus the
      // Jaccard sampling error — a loose but honest sanity floor; the
      // driver row pins the REALIZED values exactly
      if (exact > 0)
        assert(math.abs(est - exact) <= math.max(0.5 * exact, 10.0),
          s"${r.getString(0)}∩${r.getString(1)}: estimate $est strayed " +
            s"implausibly far from exact $exact")
    }
  }

  test("zorder layout: every file group's bounding box is bounded in " +
      "BOTH dimensions; the linear layout spans full user width") {
    val rows = graft.ops.Zorder.layoutStats(spark, Sf0001)
      .select("layout", "group_id", "n_events", "user_span", "ts_span")
      .as[(String, Long, Long, Long, Long)].collect()
    val byLayout = rows.groupBy(_._1)
    assert(byLayout.keySet == Set("zorder", "linear"))
    def meanSpan(l: String, f: ((String, Long, Long, Long, Long)) => Long) = {
      val g = byLayout(l); g.map(f).sum.toDouble / g.length
    }
    // time-sorted files: perfect time locality, zero user locality
    assert(meanSpan("linear", _._4) > 60000,
      "a time-sorted layout's files must span ~the whole user space — " +
        "that's the pruning failure z-order exists to fix")
    // z-order: BOTH dims bounded near 2^16/sqrt(groups) = 1/4 width
    assert(meanSpan("zorder", _._4) < meanSpan("linear", _._4) / 2,
      "z-ordered groups must at least halve the user span (theory: 4x)")
    assert(meanSpan("zorder", _._5) < 65536 / 2,
      "the time dimension must stay bounded too — z-order is a trade, " +
        "not a sacrifice of one dimension for the other")
    // groups partition the rows exactly once per layout
    assert(byLayout("zorder").map(_._3).sum == byLayout("linear").map(_._3).sum)
  }

  test("hist quantiles: upper-bound estimates within one bucket width, " +
      "shard histograms merge cell-wise") {
    import graft.ops.Sketch
    val rows = Sketch.histQuantiles(spark, Sf0001)
      .select("p", "n", "est_cents", "exact_cents", "err_cents")
      .as[(Int, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(50, 90, 99))
    val cents = graft.ops.Events.events(spark, Sf0001)
      .select(round(col("value") * 100).cast("long").as("c"))
      .as[Long].collect()
    val width = (cents.max - cents.min + 1 + Sketch.HistBuckets - 1) /
      Sketch.HistBuckets
    rows.foreach { case (p, n, est, exact, err) =>
      assert(n == cents.length)
      assert(err == est - exact)
      assert(est >= exact,
        s"p$p: the containing bucket's UPPER bound can never " +
          "underestimate the rank value")
      assert(err <= width,
        s"p$p: error $err exceeded the bucket width $width — the " +
          "histogram's entire accuracy contract")
      // the exact side really is the nearest-rank percentile
      val sorted = cents.sorted
      assert(exact == sorted(((n * p + 99) / 100 - 1).toInt))
    }
    // cell-wise merge: two shard histograms sum to the global one
    val (lo, hi) = (cents.min, cents.max)
    def cellsOf(vs: Array[Long]): Map[Long, Long] =
      vs.groupBy(c => (c - lo) * Sketch.HistBuckets / (hi - lo + 1))
        .view.mapValues(_.length.toLong).toMap
    val (a, b) = cents.zipWithIndex.partition(_._2 % 2 == 0)
    val merged = (cellsOf(a.map(_._1)).keySet ++ cellsOf(b.map(_._1)).keySet)
      .map(k => k -> (cellsOf(a.map(_._1)).getOrElse(k, 0L) +
        cellsOf(b.map(_._1)).getOrElse(k, 0L))).toMap
    assert(merged == cellsOf(cents))
  }

  test("cms counter tables merge by cell-wise addition across shards") {
    // the property that lets shard sketches roll up without a vocabulary
    // shuffle: count(A ∪ B) per cell = count(A) + count(B) per cell —
    // trivially true of counts, pinned here against the REAL hash layout
    // so a change to the bucket derivation can't silently break merges
    import graft.ops.Sketch
    val toks = TextOps.documents(spark, Sf0001)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    def cells(df: org.apache.spark.sql.DataFrame): Map[(Int, Int), Long] = {
      val hashed = df.withColumn("h", md5(col("token")))
        .select((0 until Sketch.CmsDepth).map { r =>
          expr(Sketch.cmsBucketExpr("h", r)).as(s"b$r")
        }: _*)
      (0 until Sketch.CmsDepth).flatMap { r =>
        hashed.groupBy(col(s"b$r")).count().collect()
          .map(x => (r, x.getInt(0)) -> x.getLong(1))
      }.toMap
    }
    val a = cells(toks.filter(col("doc_id") % 2 === 0))
    val b = cells(toks.filter(col("doc_id") % 2 =!= 0))
    val global = cells(toks)
    val mergedKeys = a.keySet ++ b.keySet
    assert(mergedKeys == global.keySet)
    mergedKeys.foreach { k =>
      assert(a.getOrElse(k, 0L) + b.getOrElse(k, 0L) == global(k),
        s"cell $k: shard counters must sum to the global counter")
    }
  }

  test("top paths: ranked prefix-capped session journeys") {
    val rows = Events.topPaths(spark, Sf0001)
      .select("path_rank", "path", "n_sessions")
      .as[(Int, String, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty && rows.length <= Events.TopPaths)
    assert(rows.map(_._1).toSeq == (1 to rows.length))
    rows.foreach { case (_, path, n) =>
      assert(path.split(">").length <= Events.PathLen, s"path $path over cap")
      assert(n >= 1)
    }
    // counts are non-increasing in rank; ties broken by path string
    rows.sliding(2).foreach {
      case Array(x, y) =>
        assert(x._3 > y._3 || (x._3 == y._3 && x._2 < y._2))
      case _ =>
    }
    // total sessions covered by paths ≤ total sessions
    val totalSessions = Events.sessionize(spark, Sf0001).count()
    assert(rows.map(_._3).sum <= totalSessions)
  }

  test("emb near-dup stages on distinct vectors: twins collapse to one rep") {
    import graft.ops.Similarity
    val dir = java.nio.file.Files.createTempDirectory("emb_reps").toString
    // v0 == v1 (exact twins), v2 close to both, v3 orthogonal
    Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.95f, 0.3f, 0.0f), 0),
      (3L, Array(0.0f, 0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val exact = Similarity.exactVecDedup(spark, dir)
      .select("keeper_id", "dup_count").as[(Long, Long)].collect().toSet
    assert(exact == Set((0L, 2L), (2L, 1L), (3L, 1L)),
      "twin group collapses under its min id")
    val pairs = Similarity.cosineNearDup(spark, dir)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(!pairs.exists(p => p._1 == 1L || p._2 == 1L),
      "the non-keeper twin must never appear in near-dup pairs — " +
        "exact duplication is emb_dedup_exact's finding")
    // the keeper still participates normally
    assert(pairs.contains((0L, 2L)),
      "rep-staged banding must still find the true near-dup")
  }

  test("ann negatives: kinds disjoint, counts exact, sampling reproducible") {
    import graft.ops.Similarity
    val rows = Similarity.annNegatives(spark, Sf0001)
      .select("query_id", "kind", "rank", "neighbor_id")
      .as[(Long, String, Int, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val byKind = rs.groupBy(_._2).view.mapValues(_.map(_._4).toSet).toMap
      assert(byKind("pos").size == Similarity.NegPosK)
      assert(byKind("hard").size == Similarity.NegHardK - Similarity.NegPosK)
      assert(byKind("rand").size == Similarity.NegRandK)
      // a random negative must never be a positive, a hard negative, or
      // the anchor itself — the contract that makes the labels trainable
      assert((byKind("rand") & (byKind("pos") ++ byKind("hard"))).isEmpty)
      assert(!byKind("rand").contains(q))
    }
    val again = Similarity.annNegatives(spark, Sf0001)
      .select("query_id", "kind", "rank", "neighbor_id")
      .as[(Long, String, Int, Long)].collect()
    assert(rows.toSet == again.toSet,
      "hash-order sampling must be run-to-run identical")
  }

  test("ann negatives (indexed): pool-drawn rand, exact counts, pool near target") {
    import graft.ops.Similarity
    val pool = Similarity.annNegativePool(spark, Sf0001)
      .as[Long].collect().toSet
    // adaptive integer threshold: the pool must sit near its target at any
    // N (80 of 500 ids clear u16·N < 65536·64 at this SF — deterministic)
    assert(pool.size >= Similarity.NegRandPool / 2 &&
      pool.size <= 2 * Similarity.NegRandPool,
      s"pool size ${pool.size} strayed from target ${Similarity.NegRandPool}")
    val rows = Similarity.annNegativesIndexed(spark, Sf0001)
      .select("query_id", "kind", "rank", "neighbor_id")
      .as[(Long, String, Int, Long)].collect()
    val byQ = rows.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rs) =>
      val byKind = rs.groupBy(_._2).view.mapValues(_.map(_._4).toSet).toMap
      assert(byKind("pos").size == Similarity.NegPosK)
      assert(byKind("hard").size == Similarity.NegHardK - Similarity.NegPosK)
      assert(byKind("rand").size == Similarity.NegRandK)
      // trainability contract: rand ∩ (pos ∪ hard) = ∅, anchor excluded
      assert((byKind("rand") & (byKind("pos") ++ byKind("hard"))).isEmpty)
      assert(!byKind("rand").contains(q))
      assert(byKind("rand").subsetOf(pool),
        "random negatives must draw from the shared pool only")
    }
    val again = Similarity.annNegativesIndexed(spark, Sf0001)
      .select("query_id", "kind", "rank", "neighbor_id")
      .as[(Long, String, Int, Long)].collect()
    assert(rows.toSet == again.toSet,
      "hash-order sampling must be run-to-run identical")
  }

  test("recall report: sane bounds and multiprobe dominance, as a table") {
    val r = Similarity.annRecallReport(spark, Sf0001)
      .select("variant", "hits", "exact_pairs", "recall")
      .as[(String, Long, Long, Double)].collect()
      .map(t => t._1 -> t).toMap
    assert(r.keySet == Set("int8", "lsh", "lsh_multiprobe", "rp"))
    r.values.foreach { case (v, hits, ep, rec) =>
      assert(hits <= ep && rec > 0.0 && rec <= 1.0, s"$v recall $rec")
    }
    assert(r("lsh_multiprobe")._4 >= r("lsh")._4,
      "multi-probe recall dominates single-probe (same property OpsSpec pins on the rankers)")
    assert(r("int8")._4 >= 0.9,
      "int8 quantization must barely perturb the ranking")
  }

  test("outliers: integer cross-multiplication equals the BigInt z-sq definition") {
    val vals = Events.events(spark, Sf0001)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("xc"))
      .as[(Long, String, Long)].collect()
    val expected = vals.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val n = BigInt(rows.length)
      val s = rows.map(r => BigInt(r._3)).sum
      val s2 = rows.map(r => BigInt(r._3) * r._3).sum
      rows.filter { r =>
        val d = n * r._3 - s
        d * d * (n - 1) > 9 * n * (n * s2 - s * s)
      }.map(_._1)
    }.toSet
    val got = Events.outliers(spark, Sf0001)
      .select("event_id").as[Long].collect().toSet
    assert(got == expected, "flag set must match the exact BigInt replay")
    assert(got.nonEmpty && got.size < vals.length / 10,
      "outliers exist and are rare")
  }

  test("bigram LM: exact MLE conditionals, ranked continuations per context") {
    val dir = docsDir(Seq("a b a b c"))
    // pairs: (a,b) (b,a) (a,b) (b,c) → a→b:2 of 2; b→{a:1, c:1} of 2
    val rows = TextOps.bigramLm(spark, dir)
      .select("w1", "next_rank", "w2", "bigram_count", "w1_count", "cond_prob")
      .as[(String, Int, String, Long, Long, Double)].collect().sorted
    assert(rows.toSeq == Seq(
      ("a", 1, "b", 2L, 2L, 1.0),
      ("b", 1, "a", 1L, 2L, 0.5), // count tie: w2 ascending breaks it
      ("b", 2, "c", 1L, 2L, 0.5)))
  }

  test("multimodal resize: nearest-neighbor index map on a hand-built raster") {
    import graft.ops.Multimodal
    // hand-assemble a 2×1 24bpp BMP: pixel0 = (R=10,G=20,B=30),
    // pixel1 = (R=40,G=50,B=60); stride pads 6 → 8 bytes
    val bmp = new Array[Byte](54 + 8)
    def le4(off: Int, v: Int): Unit = (0 to 3).foreach(i =>
      bmp(off + i) = ((v >> (8 * i)) & 0xff).toByte)
    bmp(0) = 'B'; bmp(1) = 'M'; le4(2, bmp.length); le4(10, 54); le4(14, 40)
    le4(18, 2); le4(22, 1); bmp(26) = 1; bmp(28) = 24; le4(34, 8)
    // bottom-up row: B G R per pixel
    bmp(54) = 30; bmp(55) = 20; bmp(56) = 10
    bmp(57) = 60; bmp(58) = 50; bmp(59) = 40
    val out = Multimodal.resized(Multimodal.MediaRow(7L, "image", bmp))
    assert((out.src_w, out.src_h, out.out_w, out.out_h) == ((2, 1, 4, 4)))
    // sx for xo=0..3 is 0,0,1,1 and sy is always 0 → each source pixel
    // sampled 8 times across the 4×4 grid
    val w0 = 10 + 256L * 20 + 65536L * 30
    val w1 = 40 + 256L * 50 + 65536L * 60
    assert(out.resized_checksum == 8 * w0 + 8 * w1)
    assert(out.luma_sum == 8 * (10 + 20 + 30) + 8 * (40 + 50 + 60))
  }

  test("frame sampling decodes exactly the strided frames, skips the rest") {
    import graft.ops.Multimodal
    val seed = Array.tabulate[Byte](16)(i => ((i * 37 + 11) & 0xff).toByte)
    val row = Multimodal.MediaRow(42L, "video", Multimodal.buildContainer(seed))
    val out = Multimodal.frameSample(row)
    val n = 2 + (seed(0) & 0xff) % 5
    assert(out.n_frames == n)
    assert(out.n_sampled == (n + 1) / 2, "every 2nd frame, starting at 0")
    assert(out.container_bytes == row.payload.length)
    // cross-check against the independently-verified single-frame
    // decoder: the container checksum is the sum of the SAMPLED frames'
    // standalone checksums under the 5f seed rotation
    val expected = (0 until n by Multimodal.FrameStride).map { f =>
      val r = (5 * f) % 16
      val frameSeed = (seed.drop(r) ++ seed.take(r)).toArray
      Multimodal.decode(Multimodal.MediaRow(42L, "image",
        graft.ops.Multimodal.buildBmp(frameSeed))).pixel_checksum
    }.foldLeft(0L)(_ + _)
    assert(out.frames_checksum == expected)
  }

  test("user erasure: erased customers vanish from the mart and " +
      "survivors are bit-identical to the normal build") {
    import graft.pipeline.Erasure
    val erased = Erasure.customerSummaryErased(spark, Sf0001).collect()
    assert(erased.nonEmpty)
    assert(erased.forall(_.getAs[Long]("customer_id") % Erasure.ErasureMod != 0),
      "an erased customer surviving anywhere in the mart is the failure " +
        "mode this op exists to prevent")
    val normal = graft.gold.Gold.customerSummary(spark, Sf0001).collect()
    val byId = normal.map(r => r.getAs[Long]("customer_id") -> r).toMap
    assert(normal.length - erased.length ==
      byId.keys.count(_ % Erasure.ErasureMod == 0),
      "exactly the erasure set may disappear — nothing else")
    erased.foreach { r =>
      assert(r == byId(r.getAs[Long]("customer_id")),
        "erasure must not perturb surviving customers' aggregates " +
          "(their orders/payments are untouched)")
    }
  }

  test("bloom geometry: floor below the knee, bits/gram-linear above, " +
      "capped; load factor bounded at the SFs the suite runs") {
    import graft.ops.Decontam
    // below the knee the derived m IS the proven floor — which is what
    // keeps every test-SF result bit-identical to the fixed-m engine
    assert(Decontam.bloomBits(0) == Decontam.BloomBitsFloor)
    assert(Decontam.bloomBits(1000) == Decontam.BloomBitsFloor)
    assert(Decontam.bloomBits(2048) == Decontam.BloomBitsFloor)
    // above it, 32 bits/gram: the 57%-load failure mode (m pinned while
    // the suite grows) can no longer recur
    assert(Decontam.bloomBits(10000) == 320000)
    assert(Decontam.bloomBits(1000000) == 32000000)
    assert(Decontam.bloomBits(Long.MaxValue) == Decontam.BloomBitsCap)
    // k/bitsPerGram bounds the load at ≤ 3/32 < 10% above the floor; at
    // the floor the bench side is smaller still — audit the real bitset
    val load = Decontam.bloomLoadFactor(spark, Sf0001)
    assert(load > 0.0 && load <= 0.10,
      s"bloom load factor $load breaches the 10% design bound")
    // at m = floor the modulus reduces each probe to the original 16-bit
    // nibble slice: the hi-nibble extension must be invisible there
    val probe = spark.sql(
      "SELECT ((( (instr('0123456789abcdef', substring(h, 13, 1)) - 1) * 256" +
      " + (instr('0123456789abcdef', substring(h, 14, 1)) - 1) * 16" +
      " + (instr('0123456789abcdef', substring(h, 15, 1)) - 1)) * 65536" +
      " + (instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096" +
      " + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256" +
      " + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16" +
      " + (instr('0123456789abcdef', substring(h, 4, 1)) - 1)) % 65536)" +
      " - ((instr('0123456789abcdef', substring(h, 1, 1)) - 1) * 4096" +
      " + (instr('0123456789abcdef', substring(h, 2, 1)) - 1) * 256" +
      " + (instr('0123456789abcdef', substring(h, 3, 1)) - 1) * 16" +
      " + (instr('0123456789abcdef', substring(h, 4, 1)) - 1)) AS d" +
      " FROM (SELECT md5(CAST(id AS STRING)) AS h FROM range(0, 500))")
    assert(probe.agg(org.apache.spark.sql.functions.max(
      org.apache.spark.sql.functions.abs(org.apache.spark.sql.functions
        .col("d")))).head().getInt(0) == 0)
  }

  test("bloom screen: never misses — every exactly-contaminated doc is " +
      "flagged, and bloom hits dominate exact hits row-wise") {
    import graft.ops.Decontam
    val screen = Decontam.bloomScreen(spark, Sf0001)
      .select("doc_id", "n_grams", "n_bloom_hits", "n_exact_hits",
        "n_false_pos")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(screen.nonEmpty)
    screen.foreach { case (id, grams, bloom, exact, fp) =>
      assert(bloom >= exact,
        s"doc $id: a Bloom filter can only ADD hits — bloom $bloom < " +
          s"exact $exact means a probe derivation diverged")
      assert(fp == bloom - exact && bloom <= grams)
    }
    // the screen's reason to exist: nothing the exact join would flag
    // may be lost (FPs cost a wasted exact check; FNs cost a shipped leak)
    val exactFlagged = Decontam.overlap(spark, Sf0001)
      .select("doc_id").as[Long].collect().toSet
    val screened = screen.map(_._1).toSet
    exactFlagged.foreach(id => assert(screened.contains(id),
      s"doc $id passes the exact overlap threshold but the screen " +
        "missed it — a Bloom pre-screen must be a superset"))
  }

  test("logreg distillation: beats majority class and matches an " +
      "independent local replica of the descent") {
    import graft.ops.Learn
    val row = Learn.logregQuality(spark, Sf0001).head()
    val (n, correct) = (row.getLong(0), row.getLong(1))
    val w = Array(row.getDouble(2), row.getDouble(3), row.getDouble(4))
    // replicate features + descent locally from the raw table
    val feats = TextOps.documents(spark, Sf0001)
      .select(col("text")).as[String].collect().map { text =>
        val words = text.split(" ", -1)
        val wc = words.length.toDouble
        val x1 = math.min(wc / 100.0, 1.0)
        val x2 = words.count(TextOps.StopwordsEn.contains) / wc
        val awl = text.replace(" ", "").length / wc
        val qs = x1 * 0.4 + math.min(x2 * 4.0, 1.0) * 0.3 +
          (if (awl >= 3 && awl <= 8) 0.3 else 0.0)
        (x1, x2, if (qs > Learn.QualityGate) 1.0 else 0.0)
      }
    assert(n == feats.length)
    var lw = Array(0.0, 0.0, 0.0)
    def sig(z: Double) = 0.5 + z / (2.0 * (1.0 + math.abs(z)))
    // the engine's 2^-24 gradient-term quantization makes the sums
    // order-invariant, so this sequential doc-order replica must land on
    // BIT-IDENTICAL weights — not merely close ones
    def q(v: Double) = math.floor(v * 16777216.0) / 16777216.0
    (1 to Learn.LogRegIters).foreach { _ =>
      val g = Array(0.0, 0.0, 0.0)
      feats.foreach { case (x1, x2, y) =>
        val e = sig(lw(0) + lw(1) * x1 + lw(2) * x2) - y
        g(0) += q(e); g(1) += q(e * x1); g(2) += q(e * x2)
      }
      lw = Array(lw(0) - Learn.LogRegLr * g(0) / n,
        lw(1) - Learn.LogRegLr * g(1) / n,
        lw(2) - Learn.LogRegLr * g(2) / n)
    }
    w.zip(lw).foreach { case (a, b) =>
      assert(a == b,
        s"engine weights $a must replay the reference descent $b " +
          "bit-exactly (quantized sums are order-invariant)")
    }
    val base = math.max(feats.count(_._3 == 1.0), feats.count(_._3 == 0.0))
    assert(correct > base,
      s"a fit ($correct/$n) that cannot beat majority-class ($base/$n) " +
        "distilled nothing")
  }

  test("scd2 temporal join: at most one version per fact, day-1-only " +
      "keys unmatched at T0, changed emails only visible at T1") {
    import graft.pipeline.IncrementalQueries
    val rows = IncrementalQueries.scd2TemporalJoin(spark, Sf0001)
      .select("order_id", "customer_id", "event_ts", "email", "matched")
      .collect()
    val facts = rows.map(_.getLong(0)).toSeq
    assert(facts.distinct.size == facts.size,
      "SCD2 versions are non-overlapping — a fact matching two versions " +
        "means the validity ranges broke")
    val byMatch = rows.groupBy(_.getBoolean(4))
    // unmatched facts exist (day-1-only customers probed at T0) and every
    // one of them is a T0 probe of a NewKeyMod customer
    assert(byMatch.contains(false))
    byMatch(false).foreach { r =>
      assert(r.getLong(1) % IncrementalQueries.Scd2NewKeyMod == 0 &&
        r.getLong(0) % 2 == 0,
        "only T0 probes of day-1-only customers may go unmatched")
      assert(r.isNullAt(3), "unmatched facts carry NULL dimension columns")
    }
    // a changed customer's T1 probe sees the updated email; its T0 probe
    // must still see the original — that's the point of the PIT join
    val changed = rows.filter(r => !r.isNullAt(3) &&
      r.getLong(1) % IncrementalQueries.Scd2ChangeMod == 0 &&
      r.getLong(1) % IncrementalQueries.Scd2NewKeyMod != 0)
    val (t1, t0) = changed.partition(_.getLong(0) % 2 == 1)
    assert(t0.nonEmpty && t1.nonEmpty)
    assert(t1.forall(_.getString(3).startsWith("updated_")))
    assert(t0.forall(!_.getString(3).startsWith("updated_")))
  }

  test("weighted sample: threshold law holds row-exactly, certainty " +
      "stratum always kept, expectation near target") {
    val kept = TextOps.weightedSample(spark, Sf0001)
      .select("doc_id", "n_tokens", "sample_key", "total_tokens")
      .as[(Long, Long, Long, Long)].collect()
    assert(kept.nonEmpty)
    val total = kept.head._4
    val k = TextOps.WeightedSampleTarget
    kept.foreach { case (_, w, u, t) =>
      assert(t == total)
      assert(u * t < 65536L * k * w, "every kept row must satisfy the law")
    }
    // recompute the universe to check the complement and the expectation
    val all = TextOps.documents(spark, Sf0001)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("w"),
        expr(graft.ops.TextOps.md5U16Expr("doc_id")).cast("long").as("u"))
      .as[(Long, Long, Long)].collect()
    val keptIds = kept.map(_._1).toSet
    all.foreach { case (id, w, u) =>
      assert(keptIds.contains(id) == (u * total < 65536L * k * w),
        s"doc $id: membership must BE the threshold law — nothing else")
      if (k * w >= total)
        assert(keptIds.contains(id), "certainty stratum must always be kept")
    }
    val expected = all.map { case (_, w, _) =>
      math.min(1.0, k.toDouble * w / total) }.sum
    assert(math.abs(kept.size - expected) < 4 * math.sqrt(expected),
      s"sample size ${kept.size} strayed from its design expectation $expected")
  }

  test("pagerank: mass conserved, hub outranks leaves on a star, " +
      "symmetric nodes tie exactly") {
    // star 1–2, 1–3, 1–4 plus the symmetric pair 5–6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val rows = graft.ops.Dedup.pagerankFrom(pairs)
      .select("doc_id", "degree", "pagerank")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(rows.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // no dangling nodes → each round redistributes all mass: Σpr = 1
    assert(math.abs(rows.values.map(_._3).sum - 1.0) < 1e-12)
    assert(rows(1L)._2 == 3 && rows(2L)._2 == 1)
    assert(rows(1L)._3 > rows(2L)._3,
      "the hub must outrank its leaves — that ordering IS the canonical-" +
        "doc selection signal")
    // structurally identical nodes get bit-identical scores
    assert(rows(2L)._3 == rows(3L)._3 && rows(3L)._3 == rows(4L)._3)
    assert(rows(5L)._3 == rows(6L)._3)
    // leaves of the hub rank below the 2-cycle's nodes (their neighbor
    // splits its mass 3 ways; the cycle returns everything)
    assert(rows(5L)._3 > rows(2L)._3)
  }

  test("audio: real WAV decode recovers the declared format and the " +
      "seed-formula waveform summary") {
    import graft.ops.Multimodal
    val seed = Array.tabulate[Byte](16)(i => ((i * 53 + 7) & 0xff).toByte)
    val out = Multimodal.decodeAudio(
      Multimodal.MediaRow(9L, "audio", Multimodal.buildWav(seed)))
    val n = Multimodal.AudioMinSamples +
      (seed(5) & 0xff) % Multimodal.AudioSampleMod
    val rate = Multimodal.AudioBaseRate + ((seed(6) & 0xff) % 8) * 1000
    val smp = (0 until n).map(i => ((seed((7 * i + 5) % 16) & 0xff) - 128) * 256)
    assert(out.n_samples == n)
    assert(out.sample_rate == rate,
      "rate must come from the DECODED format, not an assumption")
    assert(out.n_bytes == 44 + 2 * n)
    assert(out.peak_abs == smp.map(math.abs).max)
    assert(out.zero_crossings ==
      smp.sliding(2).count { case Seq(a, b) => (a < 0) != (b < 0) })
    assert(out.energy == smp.map(s => s.toLong * s).sum)
  }

  test("audio: hand-built 3-sample WAV decodes to known values") {
    import graft.ops.Multimodal
    // samples +1000, -2000, +32767 at 8000 Hz: peak 32767, 2 crossings,
    // energy 10⁶ + 4·10⁶ + 32767²
    val samples = Seq(1000, -2000, 32767)
    val buf = java.nio.ByteBuffer.allocate(44 + 6)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + 6)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000).putShort(2)
      .putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(6)
    samples.foreach(s => buf.putShort(s.toShort))
    val out = Multimodal.decodeAudio(
      Multimodal.MediaRow(1L, "audio", buf.array()))
    assert(out.n_samples == 3 && out.sample_rate == 8000)
    assert(out.peak_abs == 32767 && out.zero_crossings == 2)
    assert(out.energy == 1000L * 1000 + 2000L * 2000 + 32767L * 32767)
  }

  test("containment flags a near-subset doc that Jaccard structurally misses") {
    val short = "a b c d e" // 3 shingles: abc bcd cde
    val long = ("f1 f2 f3 f4 f5 f6 f7 " + short + " g1 g2 g3 g4 g5 g6 g7 g8")
    val dir = docsDir(Seq(short, long))
    val cont = Dedup.containment(spark, dir)
      .select("doc_a", "doc_b", "n_common", "containment_a", "containment_b")
      .as[(Long, Long, Long, Double, Double)].collect()
    assert(cont.length == 1)
    val (a, b, common, ca, cb) = cont.head
    assert((a, b, common) == ((0L, 1L, 3L)))
    assert(ca == 1.0, "every shingle of the short doc occurs in the long one")
    assert(cb < 0.2, "the long doc is mostly novel")
    // the symmetric measure cannot cross its threshold on this pair
    assert(Dedup.ngramJaccard(spark, dir).count() == 0,
      "subset duplication is invisible to Jaccard at its threshold")
  }

  test("kmv sketch: exact below k, bounded error above, deterministic") {
    import graft.ops.Sketch
    val out = Sketch.kmvDistinct(spark, Sf0001)
      .select("event_type", "n_kept", "kth_min", "est_distinct",
        "exact_distinct", "est_ratio")
      .as[(String, Long, Long, Double, Long, Double)].collect()
    assert(out.nonEmpty)
    out.foreach { case (et, kept, kth, est, exact, ratio) =>
      assert(kept <= Sketch.K)
      assert(kth >= 0 && kth < Sketch.HashSpace)
      if (kept < Sketch.K)
        // below k the sketch saw every distinct hash; only hash
        // collisions (identical in both engines) can shave the estimate
        assert(est == kept.toDouble && kept <= exact,
          s"$et: sub-k sketch must be the distinct-hash count")
      else
        assert(ratio > 0.5 && ratio < 2.0,
          s"$et: est/exact ratio $ratio outside the sane band for k=${Sketch.K}")
    }
    val again = Sketch.kmvDistinct(spark, Sf0001)
      .select("event_type", "est_distinct").as[(String, Double)]
      .collect().toMap
    assert(out.map(r => r._1 -> r._4).toMap == again,
      "hash-based sketches must be run-to-run identical")
  }

  test("kmeans at the k clamp: ivfK saturates, driver footprint bounded, " +
      "training deterministic") {
    import graft.ops.Similarity
    graft.functions.VectorFunctions.register(spark)
    // the clamp engages and the Int-shift guard holds at extreme N
    assert(Similarity.ivfK(1L) == Similarity.IvfKMin)
    assert(Similarity.ivfK(1L << 40) == Similarity.IvfKMax)
    assert(Similarity.ivfK(Long.MaxValue) == Similarity.IvfKMax,
      "the 30-bit shift guard must pin k at the cap, not wrap negative")
    // the documented per-iteration driver ceiling at the clamp: k×(dim+2)
    // doubles — ~67 MB at 512 dims. This arithmetic IS the scaladoc bound;
    // if IvfKMax moves, this pin forces the memory-budget conversation.
    val bytesAtClamp = Similarity.IvfKMax.toLong * (512 + 2) * 8
    assert(bytesAtClamp < 128L * 1024 * 1024,
      s"raising IvfKMax past the driver budget needs a design change " +
        s"($bytesAtClamp B at the clamp)")
    // exercise the clamp-k invocation path: k larger than the training
    // set degrades to one centroid per vector, localized and stable
    val tiny = (0 until 100).map(i =>
        (i.toLong, Seq(i.toDouble, (i % 7).toDouble), 0.0))
      .toDF("vec_id", "vec", "nrm")
      .withColumn("nrm", expr("vec_dot(vec, vec)"))
    val atClamp = Similarity.deterministicKmeans(spark, tiny,
      Similarity.IvfKMax)
    assert(atClamp.count() == 100, "k > N trains one centroid per vector")
    // a genuinely multi-hundred-centroid localization round-trips the
    // driver deterministically: same ids, same doubles, run to run
    val train = (0 until 1024).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7), math.cos(i * 0.3),
        (i % 13).toDouble, (i % 5).toDouble), 0.0)
    }.toDF("vec_id", "vec", "nrm")
      .withColumn("nrm", expr("vec_dot(vec, vec)")).localCheckpoint()
    val a = Similarity.deterministicKmeans(spark, train, 512)
      .collect().map(_.toSeq)
    val b = Similarity.deterministicKmeans(spark, train, 512)
      .collect().map(_.toSeq)
    assert(a.length == 512 && a.toSeq == b.toSeq,
      "the driver-localized Lloyd loop must be bit-deterministic")
  }

  test("attribution last-k: cap binds, recency ordered, window excluded, " +
      "plan fan-out bounded") {
    import graft.ops.Events
    // user 1: 5 clicks then a purchase — cap must keep the 3 most recent;
    // user 2: a click 45 min before its purchase — outside the window;
    // user 3: click AT the purchase timestamp — at-or-before includes it
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val rows = Seq(
      (1L, ts(0), 1L, "click", 0.0), (2L, ts(5), 1L, "click", 0.0),
      (3L, ts(10), 1L, "click", 0.0), (4L, ts(15), 1L, "click", 0.0),
      (5L, ts(20), 1L, "click", 0.0), (6L, ts(25), 1L, "purchase", 9.0),
      (7L, ts(0), 2L, "click", 0.0), (8L, ts(45), 2L, "purchase", 5.0),
      (9L, ts(30), 3L, "click", 0.0), (10L, ts(30), 3L, "purchase", 7.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = Events.attributionLastKFrom(rows, Events.AttributionLastK)
      .select("purchase_id", "click_id", "recency")
      .as[(Long, Long, Int)].collect().toSet
    assert(out == Set((6L, 5L, 1), (6L, 4L, 2), (6L, 3L, 3), (10L, 9L, 1)),
      s"cap=3 keeps the newest clicks, the 45-min click is outside the " +
        s"window, the same-ts click attributes: $out")
    // the bounded shape: the only join is an equi-join on
    // (user_id, click_seq) fed by an exploded <= k probe list — no
    // non-equi candidate fan-out anywhere in the plan
    val p = Events.attributionLastKFrom(rows, 3)
      .queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the capped form must never build the quadratic candidate set:\n" +
        p.take(600))
  }
}
