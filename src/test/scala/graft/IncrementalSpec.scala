package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Incremental
import graft.sources.Seeds

/** Incremental/append/SCD2 materializations and the CSV seed loader. */
class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = expr(s"TIMESTAMP_NTZ '$s'")

  test("append inserts only rows past the high-water mark") {
    val target = Seq((1L, "2001-01-01 00:00:00"), (2L, "2001-01-02 00:00:00"))
      .toDF("id", "loaded").withColumn("loaded", col("loaded").cast("timestamp_ntz"))
    val incoming = Seq((2L, "2001-01-02 00:00:00"), (3L, "2001-01-03 00:00:00"))
      .toDF("id", "loaded").withColumn("loaded", col("loaded").cast("timestamp_ntz"))
    val out = Incremental.append(target, incoming, "loaded")
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("merge upserts by key") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val out = Incremental.merge(target, incoming, "id")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("merge on_schema_change=ignore drops new columns, null-fills vanished ones") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "amt")
    // incoming adds `extra`, drops `amt`
    val incoming = Seq((2L, "B", "x"), (3L, "c", "y")).toDF("id", "v", "extra")
    val out = Incremental.merge(target, incoming, "id")
    assert(out.columns.toSeq == Seq("id", "v", "amt"), "target schema wins")
    val rows = out.as[(Long, String, Option[Double])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", Some(10.0)), (2L, "B", None), (3L, "c", None)),
      "replaced/new rows carry NULL for the vanished column")
  }

  test("merge on_schema_change=append_new_columns widens the result") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "B", "x"), (3L, "c", "y")).toDF("id", "v", "extra")
    val out = Incremental.merge(target, incoming, "id", Incremental.AppendNewColumns)
    assert(out.columns.toSeq == Seq("id", "v", "extra"))
    val rows = out.as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq((1L, "a", None), (2L, "B", Some("x")), (3L, "c", Some("y"))),
      "pre-existing rows carry NULL in the new column")
  }

  test("delete+insert: composite key, many rows per key, and row deletion") {
    val target = Seq(
      (1L, "2001-01-01", "o1", 10.0), (1L, "2001-01-01", "o2", 20.0),
      (1L, "2001-01-02", "o3", 30.0), (2L, "2001-01-01", "o4", 40.0))
      .toDF("cust", "day", "ord", "amt")
    // customer 1's Jan-1 reloads with three rows (one replaced, two new)
    // and DROPS o2 — merge can't express either: the key is composite and
    // the batch carries several rows per key tuple
    val incoming = Seq(
      (1L, "2001-01-01", "o1", 11.0), (1L, "2001-01-01", "o5", 50.0),
      (1L, "2001-01-01", "o6", 60.0))
      .toDF("cust", "day", "ord", "amt")
    val out = Incremental.deleteInsert(target, incoming, Seq("cust", "day"))
      .as[(Long, String, String, Double)].collect().sortBy(_._3)
    assert(out.toSeq == Seq(
      (1L, "2001-01-01", "o1", 11.0), (1L, "2001-01-02", "o3", 30.0),
      (2L, "2001-01-01", "o4", 40.0), (1L, "2001-01-01", "o5", 50.0),
      (1L, "2001-01-01", "o6", 60.0)),
      "o2 must vanish with its reloaded customer-day; other keys untouched")
  }

  test("on_schema_change=sync_all_columns: the incoming schema becomes the contract") {
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "v", "amt")
    // incoming DROPS amt and ADDS extra — sync follows it on both sides
    val incoming = Seq((2L, "B", "x"), (3L, "c", "y")).toDF("id", "v", "extra")
    val out = Incremental.merge(target, incoming, "id", Incremental.SyncAllColumns)
    assert(out.columns.toSeq == Seq("id", "v", "extra"),
      "vanished column dropped AND new column added")
    val rows = out.as[(Long, String, Option[String])].collect().sortBy(_._1)
    assert(rows.toSeq == Seq(
      (1L, "a", None), (2L, "B", Some("x")), (3L, "c", Some("y"))),
      "surviving target rows lose amt and carry NULL extra")
  }

  test("insert_overwrite replaces touched partitions wholesale, keeps the rest") {
    val target = Seq(
      (Option("2001-01"), 1L, "keep"), (Option("2001-02"), 2L, "replace-me"),
      (Option("2001-02"), 3L, "vanishes"), (Option.empty[String], 4L, "null-part"))
      .toDF("mo", "id", "v")
    val incoming = Seq((Option("2001-02"), 2L, "replaced")).toDF("mo", "id", "v")
    val out = Incremental.insertOverwrite(target, incoming, Seq("mo"))
      .as[(Option[String], Long, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq(
      (Some("2001-01"), 1L, "keep"), (Some("2001-02"), 2L, "replaced"),
      (None, 4L, "null-part")),
      "id 3 vanishes with its recomputed month; the NULL partition survives")
  }

  test("merge on_schema_change=fail aborts on any column-set difference") {
    val target = Seq((1L, "a")).toDF("id", "v")
    val incoming = Seq((2L, "B", "x")).toDF("id", "v", "extra")
    intercept[IllegalArgumentException](
      Incremental.merge(target, incoming, "id", Incremental.FailOnChange))
  }

  test("registry incremental widens via rewrite when the build adds a column") {
    import graft.pipeline.Registry
    var src = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val mdl = Seq(Registry.Model("evolving", "silver",
      Registry.Incremental(Some("id"), "id",
        onSchemaChange = Incremental.AppendNewColumns),
      Seq.empty, (_, _, _) => src))
    val sink = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_wh_evolve").toString)
    Registry.run(spark, Sf0001, sink, all = mdl)
    src = Seq((2L, "B", "x"), (3L, "c", "y")).toDF("id", "v", "extra")
    Registry.run(spark, Sf0001, sink, all = mdl)
    val out = sink.read(spark, "silver", "evolving")
    assert(out.columns.toSet == Set("id", "v", "extra"))
    assert(out.count() == 3)
    assert(out.filter(col("id") === 1L).select("extra").head().isNullAt(0))
  }

  test("scd2 timestamp strategy: bumped stamps version; ghost changes stay invisible") {
    def feed(rows: Seq[(Long, String, String)]) = rows.toDF("id", "email", "at")
      .withColumn("at", col("at").cast("timestamp_ntz"))
    val snap0 = Incremental.Scd2.init(
      feed(Seq((1L, "a@x", "2001-01-01 00:00:00"),
        (2L, "b@x", "2001-01-01 00:00:00"))), ts("2001-01-02 00:00:00"))
    val day1 = feed(Seq(
      (1L, "a2@x", "2001-01-05 00:00:00"), // stamp bumped → close + reopen
      (2L, "GHOST@x", "2001-01-01 00:00:00"), // changed, stamp NOT bumped
      (3L, "c@x", "2001-01-03 00:00:00"))) // new key
    val snap1 = Incremental.Scd2.advanceTimestamp(snap0, day1, "id", "at",
      ts("2001-01-06 00:00:00"))
    assert(snap1.count() == 4, "1 closed + 1 reopened + 1 unchanged + 1 new")
    assert(snap1.filter(col("_is_current") && col("id") === 1L)
      .select("email").as[String].head() == "a2@x")
    assert(snap1.filter(!col("_is_current")).select("id").as[Long]
      .collect().toSeq == Seq(1L))
    assert(snap1.filter(col("_is_current") && col("id") === 2L)
      .select("email").as[String].head() == "b@x",
      "a change without an updated_at bump must be invisible — dbt's caveat")
    assert(snap1.filter(col("id") === 3L).count() == 1)
  }

  test("invalidate_hard_deletes: vanished keys close; a re-arriving key " +
      "opens a fresh version (resurrection)") {
    def feed(rows: Seq[(Long, String)]) = rows.toDF("id", "email")
    val t = (s: String) => ts(s)
    val snap0 = Incremental.Scd2.init(
      feed(Seq((1L, "a@x"), (2L, "b@x"), (3L, "c@x"))), t("2001-01-01 00:00:00"))
    // day 1: key 2 vanishes, key 3 changes — both close, only 3 reopens
    val day1 = feed(Seq((1L, "a@x"), (3L, "c2@x")))
    val adv1 = Incremental.Scd2.advance(snap0, day1, "id", Seq("email"),
      t("2001-01-02 00:00:00"))
    val snap1 = Incremental.Scd2.invalidateHardDeletes(adv1, day1, "id",
      t("2001-01-02 00:00:00"))
    assert(snap1.count() == 4, "1 live + 1 delete-closed + 1 change-closed + 1 reopened")
    val k2 = snap1.filter(col("id") === 2L).collect()
    assert(k2.length == 1 && !k2.head.getAs[Boolean]("_is_current") &&
      k2.head.getAs[java.time.LocalDateTime]("_valid_to") != null,
      "the vanished key's version must close with nothing reopened")
    assert(snap1.filter(col("id") === 1L && col("_is_current")).count() == 1)
    // day 2: key 2 re-arrives — dbt resurrection: a fresh version opens
    val day2 = feed(Seq((1L, "a@x"), (2L, "b2@x"), (3L, "c2@x")))
    val adv2 = Incremental.Scd2.advance(snap1, day2, "id", Seq("email"),
      t("2001-01-03 00:00:00"))
    val snap2 = Incremental.Scd2.invalidateHardDeletes(adv2, day2, "id",
      t("2001-01-03 00:00:00"))
    val k2v = snap2.filter(col("id") === 2L).orderBy("_valid_from").collect()
    assert(k2v.length == 2 && !k2v(0).getAs[Boolean]("_is_current") &&
      k2v(1).getAs[Boolean]("_is_current") &&
      k2v(1).getAs[String]("email") == "b2@x",
      "a deleted key that re-arrives must open a fresh current version")
  }

  test("SQL snapshot config accepts strategy='timestamp' with updated_at") {
    import graft.pipeline.{Registry, SqlModels}
    val r = SqlModels.render("snap_ts", "silver",
      """{{ config(materialized='snapshot', strategy='timestamp',
        |          unique_key='id', updated_at='at') }}
        |SELECT id, email, at FROM {{ ref('m') }}""".stripMargin)
    assert(r.materialization == Registry.Snapshot("id", Seq.empty, Some("at")))
    intercept[IllegalArgumentException](SqlModels.render("snap_bad", "silver",
      "{{ config(materialized='snapshot', strategy='timestamp', unique_key='id') }}\nSELECT 1"))
  }

  test("incremental_predicates bound the merge scan: out-of-slice rows " +
      "bypass the anti-join verbatim") {
    val target = Seq(
      (1L, "2001-06-10", "old-recent"),
      (2L, "2001-01-05", "old-ancient"), // outside the slice
      (3L, "2001-06-20", "keep")).toDF("id", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val incoming = Seq(
      (1L, "2001-06-11", "new-recent"),
      (2L, "2001-06-12", "new-ancient"), // its target row is OUT of slice
      (4L, "2001-06-13", "insert")).toDF("id", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val merged = Incremental.merge(target, incoming, "id",
      predicates = Seq("DBT_INTERNAL_DEST.d >= '2001-06-01'"))
    val rows = merged.collect().map(r =>
      (r.getLong(0), r.getString(2))).toSet
    // key 1: in-slice → replaced; key 3: in-slice, no match → kept;
    // key 2: target row outside the slice → UNTOUCHED, and the incoming
    // row inserts a second version — dbt's documented predicate contract
    assert(rows == Set((1L, "new-recent"), (3L, "keep"),
      (2L, "old-ancient"), (2L, "new-ancient"), (4L, "insert")))
    // the anti-join's target side must carry the predicate filter (the
    // slice bound reaches the scan; out-of-slice rows skip the shuffle) —
    // asserted on the analyzed plan: the optimizer folds the filter into
    // this test's LocalRelation, on parquet it lands in PushedFilters
    val analyzed = merged.queryExecution.analyzed.toString
    assert(analyzed.contains("2001-06-01"), "predicate missing from the plan")
    assert(raw"Join LeftAnti".r
      .findAllIn(merged.queryExecution.optimizedPlan.toString).size == 1)
  }

  test("MergeSql puts incremental_predicates in the ON clause with the " +
      "target alias") {
    val sql = graft.pipeline.MergeSql.upsertByKey("db.t", "src", "id",
      Seq("DBT_INTERNAL_DEST.d >= '2001-06-01'", "d < '2002-01-01'"))
    assert(sql.contains(
      "ON t.id = s.id AND (t.d >= '2001-06-01') AND (d < '2002-01-01')"))
  }

  test("SQL incremental config parses incremental_predicates (double-quoted)") {
    import graft.pipeline.{Registry, SqlModels}
    val r = SqlModels.render("inc_pred", "silver",
      """{{ config(materialized='incremental', unique_key='id',
        |          incremental_predicates=["d >= '2001-06-01'"]) }}
        |SELECT id, d FROM {{ ref('m') }}""".stripMargin)
    assert(r.materialization == Registry.Incremental(Some("id"), "id",
      predicates = Seq("d >= '2001-06-01'")))
  }

  test("SQL snapshot config parses invalidate_hard_deletes=true") {
    import graft.pipeline.{Registry, SqlModels}
    val r = SqlModels.render("snap_hd", "silver",
      """{{ config(materialized='snapshot', unique_key='id',
        |          check_cols=['email'], invalidate_hard_deletes=true) }}
        |SELECT id, email FROM {{ ref('m') }}""".stripMargin)
    assert(r.materialization ==
      Registry.Snapshot("id", Seq("email"), None, invalidateHardDeletes = true))
    val r2 = SqlModels.render("snap_ts_hd", "silver",
      """{{ config(materialized='snapshot', strategy='timestamp',
        |          unique_key='id', updated_at='at',
        |          invalidate_hard_deletes=true) }}
        |SELECT id, email, at FROM {{ ref('m') }}""".stripMargin)
    assert(r2.materialization ==
      Registry.Snapshot("id", Seq.empty, Some("at"), invalidateHardDeletes = true))
  }

  test("registry append-path sync_all_columns reshapes the stored table") {
    import graft.pipeline.Registry
    var src = Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("id", "v", "amt")
    val mdl = Seq(Registry.Model("evolving_sync", "silver",
      Registry.Incremental(None, "id",
        onSchemaChange = Incremental.SyncAllColumns),
      Seq.empty, (_, _, _) => src))
    val sink = new graft.pipeline.ParquetSink(
      java.nio.file.Files.createTempDirectory("graft_wh_sync").toString)
    Registry.run(spark, Sf0001, sink, all = mdl)
    // the refresh DROPS amt and ADDS extra — stored rows must reshape too
    src = Seq((3L, "c", "x")).toDF("id", "v", "extra")
    Registry.run(spark, Sf0001, sink, all = mdl)
    val out = sink.read(spark, "silver", "evolving_sync")
    assert(out.columns.toSet == Set("id", "v", "extra"),
      "incoming schema is the contract: amt gone, extra added")
    assert(out.count() == 3)
    assert(out.filter(col("id") === 1L).select("extra").head().isNullAt(0))
  }

  test("scd2 check-strategy tracks changes with valid_from/valid_to") {
    val day1 = Seq((1L, "alice", "x"), (2L, "bob", "y")).toDF("id", "name", "attr")
    val snap1 = Incremental.Scd2.init(day1, ts("2001-01-01 00:00:00"))
    assert(snap1.filter(col("_is_current")).count() == 2)

    // day 2: id=1 changes attr, id=3 appears, id=2 unchanged
    val day2 = Seq((1L, "alice", "z"), (2L, "bob", "y"), (3L, "eve", "w"))
      .toDF("id", "name", "attr")
    val snap2 = Incremental.Scd2.advance(snap1, day2, "id",
      Seq("name", "attr"), ts("2001-01-02 00:00:00"))

    val cur = snap2.filter(col("_is_current"))
      .select("id", "attr").as[(Long, String)].collect().sortBy(_._1)
    assert(cur.toSeq == Seq((1L, "z"), (2L, "y"), (3L, "w")))
    val closed = snap2.filter(!col("_is_current"))
      .select("id", "attr", "_valid_to").collect()
    assert(closed.length == 1 && closed(0).getLong(0) == 1L && closed(0).getString(1) == "x")
    assert(closed(0).getAs[java.time.LocalDateTime](2) ==
      java.time.LocalDateTime.parse("2001-01-02T00:00"))

    // day 3: id=1 changes back to x — a THIRD version opens (history kept)
    val day3 = Seq((1L, "alice", "x"), (2L, "bob", "y"), (3L, "eve", "w"))
      .toDF("id", "name", "attr")
    val snap3 = Incremental.Scd2.advance(snap2, day3, "id",
      Seq("name", "attr"), ts("2001-01-03 00:00:00"))
    assert(snap3.filter(col("id") === 1L).count() == 3)
    assert(snap3.filter(col("id") === 1L && col("_is_current")).count() == 1)
  }

  test("scd2 timestamp strategy: NULL audit stamps are UNCHANGED — no " +
      "version churn (dbt counts changed only when strictly newer is true)") {
    def feed(rows: Seq[(Long, String, Option[String])]) =
      rows.toDF("id", "email", "at")
        .withColumn("at", col("at").cast("timestamp_ntz"))
    val snap0 = Incremental.Scd2.init(
      feed(Seq((1L, "a@x", None), (2L, "b@x", Some("2001-01-01 00:00:00")))),
      ts("2001-01-02 00:00:00"))
    // identical re-delivery: key 1 has a NULL stamp both sides, key 2 is
    // not strictly newer — NOTHING may close or reopen
    val snap1 = Incremental.Scd2.advanceTimestamp(snap0,
      feed(Seq((1L, "a@x", None), (2L, "b@x", Some("2001-01-01 00:00:00")))),
      "id", "at", ts("2001-01-03 00:00:00"))
    assert(snap1.count() == 2, "a NULL stamp must not churn a version")
    assert(snap1.filter(!col("_is_current")).count() == 0)
    // and replaying again stays fixed (the old <= comparison grew the
    // snapshot by 2 rows per run forever)
    val snap2 = Incremental.Scd2.advanceTimestamp(snap1,
      feed(Seq((1L, "a@x", None))), "id", "at", ts("2001-01-04 00:00:00"))
    assert(snap2.count() == 2)
  }

  test("insert_overwrite: an incoming NULL partition REPLACES the " +
      "stored NULL partition (dynamic partition overwrite semantics)") {
    val target = Seq(
      (Option("2001-01"), 1L, "keep"), (Option.empty[String], 2L, "old-null"))
      .toDF("mo", "id", "v")
    val incoming = Seq((Option.empty[String], 3L, "new-null")).toDF("mo", "id", "v")
    val out = Incremental.insertOverwrite(target, incoming, Seq("mo"))
      .as[(Option[String], Long, String)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((Some("2001-01"), 1L, "keep"), (None, 3L, "new-null")),
      "a plain equi anti-join never matches NULL and would duplicate " +
        "NULL-partition rows on every run")
  }

  test("microbatch: NULL-period target rows survive a refresh; " +
      "batch_size='hour' fails loudly before anything lands") {
    val target = Seq((Option("2001-01-02"), 1L), (Option.empty[String], 2L))
      .toDF("day", "v").withColumn("day", col("day").cast("date"))
    val incoming = Seq((Option("2001-01-02"), 10L))
      .toDF("day", "v").withColumn("day", col("day").cast("date"))
    val out = Incremental.microbatchRefresh(target, incoming, "day",
      lookback = 0, unit = "day")
      .select("v").as[Long].collect().sorted
    assert(out.toSeq == Seq(2L, 10L),
      "the NULL-period row belongs to no refreshable period and must " +
        "not be silently deleted")
    intercept[IllegalArgumentException](
      Incremental.periodOf(col("ts"), "hour"))
  }

  test("csv seed loads with header and registers a ref()-able view") {
    val dir = java.nio.file.Files.createTempDirectory("graft_seed")
    val f = dir.resolve("country_codes.csv")
    java.nio.file.Files.writeString(f, "code,name\nDE,Germany\nFR,France\n")
    val df = Seeds.seed(spark, f.toString)
    assert(df.count() == 2)
    assert(spark.sql("select name from country_codes where code = 'DE'")
      .as[String].head() == "Germany")
  }
}
