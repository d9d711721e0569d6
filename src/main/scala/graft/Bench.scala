package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Many queries x many stages overflow small codegen caches (the
      // default 100 caused 3x dq_summary recompiles in round 1; 2000 got
      // marginal at 42 queries x 2 passes in round 2) — size generously,
      // entries are just compiled-class references.
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      // same extension surface as Verify/deployment sessions
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // optional runtime-conf overrides (probe tooling — the driver never
    // sets it): SPARK_GRAFT_CONF="spark.graft.dq.silverstage=false,..."
    // is how kill-switch A/B pairs run without code edits
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(",").map(_.trim)
      .filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => spark.conf.set(k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF: token '$kv' has no '=' — expected " +
              "key=value[,key=value...]; note conf VALUES must not " +
              "contain commas through this env var")
        }
      })
    // Warm-up pass at the smallest SF: triggers JIT + whole-stage-codegen
    // compilation + parquet reader init once, so the measured pass below
    // reflects steady-state, data-proportional cost instead of charging
    // ~10 s of JVM warm-up to whichever query happens to run first.
    // optional row filter (local probe tooling — the driver never sets
    // it): run only the named queries, e.g. for per-row 10x A/B pairs
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (_, fn) =>
          try fn(spark, warmDir).count() catch { case _: Throwable => () }
        }
    // ANN index BUILD/SERVE split: the fingerprint-cached index tables
    // (IVF centroids/lists, PQ codebooks/codes, int8 codes) are
    // build-once/serve-many; unsplit, whichever ANN row runs first
    // alphabetically (ann_delete_topk) absorbs the entire one-time build
    // and cross-round diffs misread it as a per-query regression. The
    // build is paid HERE, timed, and reported as its own
    // "ann_index_build" field — still included in "value" so totals stay
    // comparable across rounds — leaving every per-query time below a
    // pure serve cost. Skipped in probe mode when no selected row
    // touches the index.
    val needsIndex = only.forall(_.exists(n =>
      n.startsWith("ann_") || n.startsWith("emb_")))
    // A FAILED build must not masquerade as a paid one (the first ANN row
    // would silently re-absorb the real build — the exact misattribution
    // this field exists to kill): report -1 on failure, log the cause,
    // and let the per-query times carry whatever the retry costs.
    val annBuild =
      if (!needsIndex) 0.0
      else {
        val tb = System.nanoTime()
        try {
          graft.ops.IvfIndex.centroids(spark, sfDir).count()
          graft.ops.IvfIndex.lists(spark, sfDir).count()
          graft.ops.IvfIndex.pqCodebooks(spark, sfDir).count()
          graft.ops.IvfIndex.pqCodes(spark, sfDir).count()
          graft.ops.IvfIndex.int8Codes(spark, sfDir).count()
          // the LSH signature table is the same build-once/serve-many
          // class; uncounted here it lands inside whichever LSH row runs
          // first and cross-replica diffs misread it as structural
          // (round 14's direct-vs-stacked check did exactly that)
          graft.ops.Similarity.lshSignatureBase(spark, sfDir).count()
          (System.nanoTime() - tb) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"ann index prebuild failed " +
              s"(first ANN query will pay the build): $e")
            -1.0
        }
      }
    // Steady-state takedown store: same build/serve split as the ANN
    // index — takedown_steady prices the marginal request against an
    // EXISTING store, so its build-once store is paid (and reported)
    // here, not inside the row's wall clock.
    val needsStore = only.forall(_.contains("takedown_steady"))
    val storeBuild =
      if (!needsStore) 0.0
      else {
        val tb = System.nanoTime()
        try {
          graft.ops.IncrementalDedup.steadyStore(spark, sfDir)
          (System.nanoTime() - tb) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"steady store prebuild failed " +
              s"(takedown_steady will pay the build): $e")
            -1.0
        }
      }
    // dq silver trio: same build/serve split — the three dq rows serve
    // from one fingerprint-keyed staged build (SilverStage), so the
    // build is paid (and reported) here, not inside whichever dq row
    // runs first.
    val needsDq = only.forall(_.exists(_.startsWith("dq_"))) &&
      graft.quality.SilverStage.enabled(spark)
    val dqBuild =
      if (!needsDq) 0.0
      else {
        val tb = System.nanoTime()
        try {
          graft.quality.SilverStage.tables(spark, sfDir)
          (System.nanoTime() - tb) / 1e9
        } catch {
          case scala.util.control.NonFatal(e) =>
            System.err.println(s"dq silver stage prebuild failed " +
              s"(first dq row will pay the build): $e")
            -1.0
        }
      }
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
      // GC between queries so one query's garbage (broadcasts, codegen,
      // shuffle buffers) isn't charged to the next one's wall clock —
      // isolated runs were ~3x more stable than back-to-back ones.
      System.gc()
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total =
      (if (results.nonEmpty) results.map(_._2).sum else 0.0) +
        math.max(annBuild, 0.0) + math.max(storeBuild, 0.0) +
        math.max(dqBuild, 0.0)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","ann_index_build":$annBuild,"takedown_store_build":$storeBuild,"dq_silver_build":$dqBuild,"queries":$qs,"sf":"$sfDir"}"""
    // stdout first — it is the channel the driver parses and must survive
    // even if the file copy fails (unwritable cwd, bad env override)
    println(json)
    // The driver captures a bounded tail of stdout; at 69 queries the one
    // JSON line outgrew it in round 3 and the head (including the
    // "metric":"total" prefix) was cut. The file is the durable copy.
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_LOCAL.json")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (json + "\n").getBytes("UTF-8"))
    } catch {
      // NonFatal, not just IOException: a malformed SPARK_GRAFT_BENCH_OUT
      // makes Paths.get throw InvalidPathException (a RuntimeException),
      // and the bench must still stop spark and exit 0 — the JSON is
      // already on stdout, which is the channel the driver parses.
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"bench file copy failed (stdout already has it): $e")
    }
    spark.stop()
  }
}
