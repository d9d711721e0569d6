package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** dbt incremental / snapshot materializations, completed for Spark.
  *
  * The reference configures neither (`snapshots/.gitkeep` only; every model
  * is full-refresh `view`/`table` — SURVEY.md §2.10), but both are part of
  * dbt's model-materialization surface, so the engine provides them:
  *
  *  - [[append]] — `incremental` with no unique key: only rows newer than
  *    the target's high-water mark are inserted.
  *  - [[merge]] — `incremental` with `unique_key`: upsert semantics
  *    (target rows with an incoming key are replaced).
  *  - [[Scd2.apply]] — dbt snapshot `check` strategy: slowly-changing
  *    dimension type 2 with valid_from/valid_to/is_current.
  *
  * All are expressed as pure DataFrame transforms over (target, incoming)
  * and write nothing themselves — the Registry's table sink persists the
  * result, which keeps them storage-format agnostic (plain parquet
  * overwrite here; MERGE INTO on Delta/Iceberg drops in at the sink).
  *
  * Scale notes: `merge` is one left-anti equi-join (AQE-broadcast when the
  * incoming batch is small — the common case); `append` is a scalar
  * high-water-mark lookup plus a filter, no shuffle at all; SCD2 shuffles
  * once on the snapshot key.
  */
object Incremental {

  /** The rows [[append]] would insert: incoming rows strictly newer than
    * `max(watermarkCol)` in the target. Factored out so a storage sink can
    * write ONLY the fresh rows (`TableSink.append`) instead of rewriting
    * target ∪ fresh — at scale the difference between appending a day's
    * files and rewriting the table. The high-water mark is a one-row
    * scalar aggregate (and on parquet/lakehouse tables prunes to footer
    * statistics), not a scan-and-collect. */
  def freshRows(target: DataFrame, incoming: DataFrame, watermarkCol: String): DataFrame = {
    val hwm = target.agg(max(col(watermarkCol))).head().get(0)
    if (hwm == null) incoming
    else incoming.filter(col(watermarkCol) > lit(hwm))
  }

  /** Insert-only incremental load: incoming rows strictly newer than
    * `max(watermarkCol)` in the target. */
  def append(target: DataFrame, incoming: DataFrame, watermarkCol: String): DataFrame =
    target.unionByName(freshRows(target, incoming, watermarkCol))

  /** dbt `on_schema_change` policies for incremental models. */
  sealed trait OnSchemaChange
  /** New incoming columns are dropped; vanished ones become NULL (dbt's
    * default). */
  case object Ignore extends OnSchemaChange
  /** New incoming columns are added to the result; existing target rows
    * carry NULL there. Vanished incoming columns stay, NULL-filled. */
  case object AppendNewColumns extends OnSchemaChange
  /** Any column-set difference aborts the load. */
  case object FailOnChange extends OnSchemaChange
  /** The INCOMING schema becomes the contract: new columns are added
    * (existing target rows NULL there, like [[AppendNewColumns]]) AND
    * vanished columns are dropped from the result — dbt's
    * `sync_all_columns`. */
  case object SyncAllColumns extends OnSchemaChange

  /** Align `incoming` to the target's column set per `policy` — a pure
    * projection, no data movement. (Whether the RESULT widens is the
    * caller's decision: Registry.materialize compares column sets to pick
    * append vs rewrite.) */
  private[pipeline] def align(target: DataFrame, incoming: DataFrame,
      policy: OnSchemaChange): DataFrame = {
    val tCols = target.columns.toSeq
    val iCols = incoming.columns.toSet
    policy match {
      case FailOnChange =>
        require(iCols == tCols.toSet,
          s"on_schema_change=fail: incoming columns $iCols != target $tCols")
        incoming
      case Ignore =>
        // dbt ignore: the target schema is the contract — drop additions,
        // NULL-fill removals (cast NULL to the target column's type)
        incoming.select(tCols.map(c =>
          if (iCols.contains(c)) col(c)
          else lit(null).cast(target.schema(c).dataType).as(c)): _*)
      case AppendNewColumns | SyncAllColumns => incoming
    }
  }

  /** Project `target` onto the INCOMING column set — the
    * [[SyncAllColumns]] reshape: columns the incoming batch dropped
    * vanish from the stored rows too; columns it added appear NULL-typed
    * to the incoming type. A pure projection, no data movement. */
  private[pipeline] def syncTarget(target: DataFrame, incoming: DataFrame): DataFrame = {
    val tCols = target.columns.toSet
    target.select(incoming.columns.toSeq.map(c =>
      if (tCols.contains(c)) col(c)
      else lit(null).cast(incoming.schema(c).dataType).as(c)): _*)
  }

  /** The policy-adjusted (target, incoming) pair every keyed strategy
    * unions: SyncAllColumns reshapes the TARGET to the incoming column
    * set, the other policies align INCOMING via [[align]]. */
  private def aligned(target: DataFrame, incoming: DataFrame,
      policy: OnSchemaChange): (DataFrame, DataFrame) = policy match {
    case SyncAllColumns => (syncTarget(target, incoming), incoming)
    case p => (target, align(target, incoming, p))
  }

  /** Upsert incremental load: target rows whose `key` appears in the
    * incoming batch are replaced by the incoming version.
    *
    * `predicates` is dbt's `incremental_predicates`: SQL conditions over
    * target columns (a `DBT_INTERNAL_DEST.` prefix is accepted and
    * stripped) that bound the slice of the target the merge scans. Rows
    * outside the slice bypass the key anti-join VERBATIM — at 100 TB a
    * date-bounded predicate turns the merge's shuffle from whole-table
    * to last-week-sized, and on a MERGE-capable sink the same predicate
    * lands in the `ON` clause so the format's file skipping applies.
    * dbt's documented contract carries over: the predicate must cover
    * every target row the batch could match, or the merge inserts a
    * duplicate instead of replacing (the rows outside the slice are
    * deliberately never compared). */
  def merge(target: DataFrame, incoming: DataFrame, key: String,
      onSchemaChange: OnSchemaChange = Ignore,
      predicates: Seq[String] = Seq.empty): DataFrame =
    if (predicates.isEmpty) deleteInsert(target, incoming, Seq(key), onSchemaChange)
    else {
      val (t, inc) = aligned(target, incoming, onSchemaChange)
      val p = coalesce(predicates.map(s => expr(stripDestAlias(s))).reduce(_ && _),
        lit(false))
      // NULL-valued predicates fall outside the scanned slice, exactly
      // like a MERGE ON clause that evaluates to unknown
      val merged = t.filter(p)
        .join(inc.select(col(key)).distinct(), Seq(key), "left_anti")
        .unionByName(t.filter(!p))
      merged.unionByName(inc,
        allowMissingColumns = onSchemaChange == AppendNewColumns)
    }

  /** Strip dbt's target alias from an incremental predicate so it binds
    * to the target DataFrame's own columns. */
  private[pipeline] def stripDestAlias(pred: String): String =
    raw"(?i)\bDBT_INTERNAL_DEST\.".r.replaceAllIn(pred, "")

  /** dbt `incremental_strategy='delete+insert'`: target rows matching any
    * incoming key are deleted, then the WHOLE incoming batch is inserted.
    * Same single-anti-join dataflow as [[merge]] — the semantic extras
    * over merge are what dbt gives the strategy: the key may be
    * COMPOSITE, and the incoming batch may carry MANY rows per key (a
    * reloaded customer-day with three orders), which MERGE-based adapters
    * reject as a cardinality violation. Scale shape: one left-anti
    * equi-join on the key tuple, broadcast when the batch's key set is
    * small (the common case). */
  def deleteInsert(target: DataFrame, incoming: DataFrame, keys: Seq[String],
      onSchemaChange: OnSchemaChange = Ignore): DataFrame = {
    val (t, inc) = aligned(target, incoming, onSchemaChange)
    t.join(inc.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .unionByName(inc, allowMissingColumns = onSchemaChange == AppendNewColumns)
  }

  /** dbt `incremental_strategy='insert_overwrite'`: every PARTITION the
    * incoming batch touches is replaced wholesale — rows of those
    * partitions absent from the batch are deleted (the recompute-a-day
    * semantics neither merge nor delete+insert has: a cancelled order
    * vanishes when its month is recomputed), untouched partitions keep
    * their rows byte-identical. This is the logical transform; the
    * physical fast path is [[TableSink.overwritePartitions]], which
    * writes ONLY the incoming partitions' directories (dynamic partition
    * overwrite) instead of rewriting the table — at 100 TB the difference
    * between rewriting a day and rewriting years. */
  def insertOverwrite(target: DataFrame, incoming: DataFrame,
      partitionCols: Seq[String],
      onSchemaChange: OnSchemaChange = Ignore): DataFrame = {
    val (t, inc) = aligned(target, incoming, onSchemaChange)
    // null-SAFE partition match: dynamic partition overwrite (the
    // physical fast path) replaces the NULL partition
    // (__HIVE_DEFAULT_PARTITION__) like any other; a plain equi
    // anti-join never matches NULLs and would duplicate NULL-partition
    // rows on every run
    val incParts = inc
      .select(partitionCols.map(c => col(c).as(s"_p_$c")): _*).distinct()
    val cond = partitionCols.map(c => t(c) <=> incParts(s"_p_$c"))
      .reduce(_ && _)
    t.join(incParts, cond, "left_anti")
      .unionByName(inc, allowMissingColumns = onSchemaChange == AppendNewColumns)
  }

  /** Period-start column `lookback` periods before `c` (dbt microbatch's
    * re-process window). */
  private[pipeline] def periodsBack(c: Column, lookback: Int, unit: String): Column =
    unit match {
      case "day" => date_sub(c, lookback)
      case "month" => add_months(c, -lookback)
      case "year" => add_months(c, -12 * lookback)
      case other => throw new IllegalArgumentException(
        s"microbatch batch_size '$other' unsupported (day|month|year)")
    }

  /** The event-time period (batch) a row belongs to, as a DATE. The unit
    * is validated HERE, at first use, because the period column is a
    * DATE: an unsupported finer unit (dbt's 'hour') would otherwise
    * silently collapse to day buckets on the first build and only throw
    * at the first refresh, after the table landed with the wrong
    * granularity. */
  private[graft] def periodOf(eventTime: Column, unit: String): Column = {
    require(Set("day", "month", "year").contains(unit),
      s"microbatch batch_size '$unit' unsupported (day|month|year)")
    date_trunc(unit, eventTime).cast("date")
  }

  /** dbt `incremental_strategy='microbatch'` as a pure transform: the
    * target's newest `lookback` periods AND every newer period are
    * replaced by the incoming recompute; strictly older periods keep
    * their stored rows — so late data inside the lookback window lands
    * on refresh, and late data beyond it is (by the strategy's contract)
    * dropped until a backfill reprocesses its period. `batchCol` is the
    * period column (see [[periodOf]]); the refresh start is
    * `max(batchCol) − lookback` periods, a one-row scalar aggregate like
    * [[freshRows]]' high-water mark. At scale each refresh scans only
    * the window's periods and rewrites only their partitions
    * ([[TableSink.overwritePartitions]] on the Registry path). */
  def microbatchRefresh(target: DataFrame, incoming: DataFrame,
      batchCol: String, lookback: Int, unit: String = "day"): DataFrame = {
    val maxB = target.agg(max(col(batchCol))).head().get(0)
    if (maxB == null) incoming
    else {
      val start = periodsBack(lit(maxB), lookback, unit)
      // NULL-period rows belong to no refreshable period: they stay with
      // the strictly-older half (a bare `< start` silently deletes them —
      // NULL fails both sides of the split)
      target.filter(col(batchCol) < start || col(batchCol).isNull)
        .unionByName(incoming.filter(col(batchCol) >= start))
    }
  }

  /** SCD2 snapshot, dbt `check` strategy. */
  object Scd2 {
    val ValidFrom = "_valid_from"
    val ValidTo = "_valid_to"
    val IsCurrent = "_is_current"

    /** Initialize a snapshot table from a first source read. */
    def init(source: DataFrame, asOf: Column): DataFrame =
      source
        .withColumn(ValidFrom, asOf)
        .withColumn(ValidTo, lit(null).cast("timestamp_ntz"))
        .withColumn(IsCurrent, lit(true))

    /** Advance the snapshot: rows whose tracked columns changed get their
      * current version closed (valid_to = asOf) and a new version opened;
      * new keys open a first version; vanished keys stay open (dbt does
      * not hard-delete). Contract (dbt's own): the source carries ONE
      * row per key — duplicate keys would each open a simultaneous
      * 'current' version, exactly as a dbt snapshot over a non-unique
      * key corrupts. The change hash joins checked columns with a
      * \u0000 delimiter and a \u0001 NULL sentinel — boundary- and
      * NULL-unambiguous for any text content without those bytes. */
    def advance(snapshot: DataFrame, source: DataFrame, key: String,
        checkCols: Seq[String], asOf: Column): DataFrame = {
      val current = snapshot.filter(col(IsCurrent))
      val history = snapshot.filter(!col(IsCurrent))
      val changeKey = sha2(concat_ws("\u0000",
        checkCols.map(c => coalesce(col(c).cast("string"), lit("\u0001"))): _*), 256)

      val curKeyed = current.withColumn("_chk", changeKey)
      val srcKeyed = source.withColumn("_chk", changeKey)

      val joined = curKeyed.select(col(key).as("_k"), col("_chk").as("_cur_chk"))
      // new or changed source rows: ONE anti-join, consumed by both the
      // opened versions and the set of current versions to close
      val fresh = srcKeyed
        .join(joined, srcKeyed(key) === joined("_k") &&
          srcKeyed("_chk") === joined("_cur_chk"), "left_anti")
      val opened = fresh
        .drop("_chk")
        .withColumn(ValidFrom, asOf)
        .withColumn(ValidTo, lit(null).cast("timestamp_ntz"))
        .withColumn(IsCurrent, lit(true))
      val changedKeys = fresh.select(col(key).as("_closed_k")).distinct()
      val closed = curKeyed
        .join(changedKeys, curKeyed(key) === changedKeys("_closed_k"), "left_semi")
        .drop("_chk")
        .withColumn(ValidTo, asOf)
        .withColumn(IsCurrent, lit(false))
      val stillCurrent = curKeyed
        .join(changedKeys, curKeyed(key) === changedKeys("_closed_k"), "left_anti")
        .drop("_chk")

      history.unionByName(closed).unionByName(stillCurrent).unionByName(opened)
    }

    /** Advance the snapshot under dbt's `timestamp` strategy (dbt's
      * default): a key re-arriving with `updatedAtCol` STRICTLY GREATER
      * than its current version's closes that version and opens a new
      * one — no content hashing, the source's own audit column is the
      * change signal (rows whose content changed without bumping
      * `updatedAtCol` are invisible, exactly dbt's documented caveat).
      * New keys open a first version; vanished keys stay open. Same
      * single-equi-shuffle shape as [[advance]]. */
    def advanceTimestamp(snapshot: DataFrame, source: DataFrame, key: String,
        updatedAtCol: String, asOf: Column): DataFrame = {
      val current = snapshot.filter(col(IsCurrent))
      val history = snapshot.filter(!col(IsCurrent))
      val cur = current.select(col(key).as("_k"),
        col(updatedAtCol).as("_cur_at"))
      // new keys (no current version) or bumped audit stamps open. The
      // match condition is "NOT strictly newer" with NULLs folded to a
      // match: dbt's timestamp strategy counts a row as changed only
      // when source.updated_at > snapshotted.updated_at is TRUE, so a
      // NULL stamp (either side) is UNCHANGED — a plain <= comparison
      // evaluated NULL, dropped the row from the match, and churned a
      // closed+reopened version for the key on every run forever.
      val fresh = source
        .join(cur, source(key) === cur("_k") &&
          !coalesce(source(updatedAtCol) > cur("_cur_at"), lit(false)),
          "left_anti")
      val opened = fresh
        .withColumn(ValidFrom, asOf)
        .withColumn(ValidTo, lit(null).cast("timestamp_ntz"))
        .withColumn(IsCurrent, lit(true))
      val changedKeys = fresh.select(col(key).as("_closed_k")).distinct()
      val closed = current
        .join(changedKeys, current(key) === changedKeys("_closed_k"), "left_semi")
        .withColumn(ValidTo, asOf)
        .withColumn(IsCurrent, lit(false))
      val stillCurrent = current
        .join(changedKeys, current(key) === changedKeys("_closed_k"), "left_anti")
      history.unionByName(closed).unionByName(stillCurrent).unionByName(opened)
    }

    /** dbt `invalidate_hard_deletes=true`: after an advance, close the
      * current version of every key the source no longer carries
      * (valid_to = asOf, no replacement opened) — a key that later
      * re-arrives opens a fresh version through the normal advance path,
      * dbt's documented resurrection behavior. One key-anti-join over
      * the current set; history rows pass through untouched. */
    def invalidateHardDeletes(advanced: DataFrame, source: DataFrame,
        key: String, asOf: Column): DataFrame = {
      val srcKeys = source.select(col(key).as("_live_k")).distinct()
      val current = advanced.filter(col(IsCurrent))
      val history = advanced.filter(!col(IsCurrent))
      val vanished = current
        .join(srcKeys, current(key) === srcKeys("_live_k"), "left_anti")
        .withColumn(ValidTo, asOf)
        .withColumn(IsCurrent, lit(false))
      val live = current
        .join(srcKeys, current(key) === srcKeys("_live_k"), "left_semi")
      history.unionByName(vanished).unionByName(live)
    }
  }
}
