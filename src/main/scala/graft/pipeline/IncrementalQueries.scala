package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.bronze.Bronze
import graft.oracle.OracleSql

/** Driver-checked batch replays of the incremental/snapshot
  * materializations ([[Incremental]]): each splits the bronze feed into a
  * deterministic "already loaded" / "arriving batch" pair, runs the real
  * merge / SCD2 transform, and is verified against a DuckDB oracle that
  * performs the same split and upsert in pure SQL — closing the gap where
  * these surfaces were covered by ScalaTest only.
  *
  * Scale notes are [[Incremental]]'s: merge is one left-anti equi-join
  * (broadcast when the batch is small), SCD2 shuffles once on the key.
  */
object IncrementalQueries {

  val CutoffDate = "2000-01-01"
  /** Restated-order key modulus: old orders with order_id % 97 == 0
    * re-arrive in the incoming batch with a corrected status. */
  val RestateMod = 97

  /** dbt `incremental` with `unique_key`, replayed as a batch: target =
    * orders before the cutoff, incoming = orders from the cutoff on plus
    * restatements of old orders (status corrected to 'returned'); the
    * merge must keep exactly one row per order_id, preferring incoming. */
  def incrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val bronze = Bronze.orders(spark, dir)
    val cutoff = to_date(lit(CutoffDate))
    val target = bronze.filter(col("order_date") < cutoff)
    val corrections = target.filter(col("order_id") % RestateMod === 0)
      .withColumn("order_status", lit("returned"))
    val incoming = bronze.filter(col("order_date") >= cutoff)
      .unionByName(corrections)
    Incremental.merge(target, incoming, "order_id")
  }

  def incrementalMergeOracle: String =
    s"""${OracleSql.prelude},
    target AS (
      SELECT * FROM bronze_orders WHERE order_date < DATE '$CutoffDate'),
    corrections AS (
      SELECT * REPLACE ('returned' AS order_status)
      FROM target WHERE order_id % $RestateMod = 0),
    incoming AS (
      SELECT * FROM bronze_orders WHERE order_date >= DATE '$CutoffDate'
      UNION ALL SELECT * FROM corrections),
    merged AS (
      SELECT * FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.order_id = t.order_id)
      UNION ALL SELECT * FROM incoming)
    SELECT * FROM merged"""

  /** dbt `incremental` with no unique key (insert-only), replayed as a
    * batch: target = orders before the cutoff; the incoming batch is the
    * WHOLE feed (the common at-least-once redelivery shape) — the
    * high-water-mark filter must keep exactly the rows strictly newer
    * than max(order_date) in the target. */
  def incrementalAppend(spark: SparkSession, dir: String): DataFrame = {
    val bronze = Bronze.orders(spark, dir)
    val cutoff = to_date(lit(CutoffDate))
    // null order_dates excluded from the target so the high-water mark is
    // well-defined; they also fail the > hwm filter on the incoming side,
    // mirroring the oracle's NULL comparison semantics
    val target = bronze.filter(col("order_date") < cutoff)
    Incremental.append(target, bronze, "order_date")
  }

  def incrementalAppendOracle: String =
    s"""${OracleSql.prelude},
    target AS (
      SELECT * FROM bronze_orders WHERE order_date < DATE '$CutoffDate'),
    appended AS (
      SELECT * FROM target
      UNION ALL
      SELECT * FROM bronze_orders
      WHERE order_date > (SELECT max(order_date) FROM target))
    SELECT * FROM appended"""

  /** dbt `incremental_strategy='delete+insert'` replayed as a batch, with
    * the two shapes MERGE-based upsert cannot express: a COMPOSITE key
    * (customer_id, order_date — "reload a customer's day") and
    * many-rows-per-key batches (a reloaded day carries ALL its orders).
    * Target = orders before the cutoff; incoming = the new window plus a
    * full reload of every customer-day containing a [[RestateMod]]-marked
    * order — minus that day's cancelled orders (the reload DROPS rows,
    * which delete+insert honors and merge never can: merge only replaces
    * or adds) — re-stamped 'restated'. One left-anti equi-join on the key
    * tuple; at scale the batch's key set broadcasts. */
  def incrementalDeleteInsert(spark: SparkSession, dir: String): DataFrame = {
    val bronze = Bronze.orders(spark, dir)
    val cutoff = to_date(lit(CutoffDate))
    val target = bronze.filter(col("order_date") < cutoff)
    val reloadDays = target.filter(col("order_id") % RestateMod === 0)
      .select("customer_id", "order_date").distinct()
    val reloaded = target
      .join(reloadDays, Seq("customer_id", "order_date"), "left_semi")
      .filter(!(col("order_status") <=> lit("cancelled")))
      .withColumn("order_status", lit("restated"))
    val incoming = bronze.filter(col("order_date") >= cutoff)
      .unionByName(reloaded)
    Incremental.deleteInsert(target, incoming,
      Seq("customer_id", "order_date"))
  }

  def incrementalDeleteInsertOracle: String =
    s"""${OracleSql.prelude},
    target AS (
      SELECT * FROM bronze_orders WHERE order_date < DATE '$CutoffDate'),
    reload_days AS (
      SELECT DISTINCT customer_id, order_date
      FROM target WHERE order_id % $RestateMod = 0),
    reloaded AS (
      SELECT * REPLACE ('restated' AS order_status) FROM target t
      WHERE EXISTS (SELECT 1 FROM reload_days d
        WHERE d.customer_id = t.customer_id AND d.order_date = t.order_date)
        AND t.order_status IS DISTINCT FROM 'cancelled'),
    incoming AS (
      SELECT * FROM bronze_orders WHERE order_date >= DATE '$CutoffDate'
      UNION ALL SELECT * FROM reloaded),
    merged AS (
      SELECT * FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM incoming i
        WHERE i.customer_id = t.customer_id AND i.order_date = t.order_date)
      UNION ALL SELECT * FROM incoming)
    SELECT * FROM merged"""

  /** Months replaced by the [[incrementalInsertOverwrite]] recompute: the
    * data's two newest order months. */
  val OverwriteMonths = 2

  /** dbt `incremental_strategy='insert_overwrite'` replayed as a batch:
    * the table is partitioned by order month; the batch recomputes the
    * two newest months WITHOUT their cancelled orders. Every touched
    * month is replaced wholesale — the cancelled orders VANISH (the
    * recompute-a-partition semantics: rows absent from the batch are
    * deleted, which neither merge nor delete+insert-by-order-key does) —
    * and every other month is untouched (and, via
    * [[TableSink.overwritePartitions]], untouched ON DISK: only the two
    * month directories are rewritten; the spec pins the physical claim).
    * NULL-dated orders live outside any replaced month and survive. */
  def incrementalInsertOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val base = Bronze.orders(spark, dir)
      .withColumn("order_month", date_format(col("order_date"), "yyyy-MM"))
    val newest = base.select("order_month").filter(col("order_month").isNotNull)
      .distinct().orderBy(col("order_month").desc).limit(OverwriteMonths)
    val incoming = base.join(newest, Seq("order_month"), "left_semi")
      .filter(!(col("order_status") <=> lit("cancelled")))
    Incremental.insertOverwrite(base, incoming, Seq("order_month"))
  }

  def incrementalInsertOverwriteOracle: String =
    s"""${OracleSql.prelude},
    base AS (
      SELECT *, strftime(order_date, '%Y-%m') AS order_month
      FROM bronze_orders),
    newest AS (
      SELECT DISTINCT order_month FROM base WHERE order_month IS NOT NULL
      ORDER BY order_month DESC LIMIT $OverwriteMonths),
    incoming AS (
      SELECT * FROM base b
      WHERE EXISTS (SELECT 1 FROM newest n WHERE n.order_month = b.order_month)
        AND b.order_status IS DISTINCT FROM 'cancelled'),
    replaced AS (
      SELECT * FROM base b
      WHERE NOT EXISTS (SELECT 1 FROM incoming i
        WHERE i.order_month = b.order_month)
      UNION ALL SELECT * FROM incoming)
    SELECT * FROM replaced"""

  /** Late-event modulus for [[incrementalMicrobatch]]: every 101st event
    * is "late" — absent from the first load, present on refresh. */
  val LateMod = 101
  val MicrobatchLookback = 1

  /** dbt `incremental_strategy='microbatch'` replayed as a batch over the
    * daily events rollup, demonstrating the strategy's defining
    * semantics: the refresh recomputes only the periods from
    * `max(day) − lookback` on, so LATE events landing inside that window
    * are picked up while late events on older days stay missing until a
    * backfill reprocesses their period (exactly dbt's contract — neither
    * a merge nor an append behaves this way). Target = daily rollup
    * without the [[LateMod]]-marked events; incoming = the full rollup;
    * one scalar max + two period filters, partition-scoped on the
    * Registry path. */
  def incrementalMicrobatch(spark: SparkSession, dir: String): DataFrame = {
    val e = graft.ops.Events.events(spark, dir).select(col("event_id"),
      col("ts").cast("date").as("day"),
      round(col("value") * 100).cast("long").as("c"))
    def daily(df: DataFrame): DataFrame = df.groupBy("day")
      .agg(count(lit(1)).as("n_events"), sum(col("c")).as("cs"))
    val target = daily(e.filter(col("event_id") % LateMod =!= 0))
    val incoming = daily(e)
    Incremental.microbatchRefresh(target, incoming, "day", MicrobatchLookback)
      .withColumn("value_sum", col("cs") / 100.0).drop("cs")
  }

  def incrementalMicrobatchOracle: String =
    s"""WITH e AS (
      SELECT event_id, CAST(ts AS DATE) AS day,
        CAST(round(value * 100) AS BIGINT) AS c
      FROM events),
    tgt AS (
      SELECT day, count(*) AS n_events, sum(c) AS cs
      FROM e WHERE event_id % $LateMod != 0 GROUP BY 1),
    inc AS (
      SELECT day, count(*) AS n_events, sum(c) AS cs
      FROM e GROUP BY 1),
    mx AS (SELECT max(day) - $MicrobatchLookback AS refresh_start FROM tgt),
    refreshed AS (
      SELECT t.* FROM tgt t, mx WHERE t.day < mx.refresh_start
      UNION ALL
      SELECT i.* FROM inc i, mx WHERE i.day >= mx.refresh_start)
    SELECT day, n_events, cs / 100.0 AS value_sum FROM refreshed"""

  val Scd2T0 = "2001-08-14 00:00:00"
  val Scd2T1 = "2001-08-15 00:00:00"
  /** Day-1 email mutation modulus and day-0 late-arrival modulus. */
  val Scd2ChangeMod = 11
  val Scd2NewKeyMod = 17

  /** dbt snapshot (`check` strategy) replayed as a batch: day 0 =
    * customers except every [[Scd2NewKeyMod]]th key (those "appear" on
    * day 1), day 1 = all customers with every [[Scd2ChangeMod]]th email
    * rewritten. One [[Incremental.Scd2.advance]] must close the changed
    * versions, open new ones, and keep the rest current. */
  def scd2Snapshot(spark: SparkSession, dir: String): DataFrame = {
    val cust = Bronze.customers(spark, dir).select("customer_id", "email")
    val day0 = cust.filter(col("customer_id") % Scd2NewKeyMod =!= 0)
    val day1 = cust.withColumn("email",
      when(col("customer_id") % Scd2ChangeMod === 0,
        concat(lit("updated_"), col("email"))).otherwise(col("email")))
    val snap0 = Incremental.Scd2.init(day0, expr(s"TIMESTAMP_NTZ '$Scd2T0'"))
    Incremental.Scd2.advance(snap0, day1, "customer_id", Seq("email"),
      expr(s"TIMESTAMP_NTZ '$Scd2T1'"))
  }

  /** Email-change modulus whose day-1 rows FORGET to bump `updated_at` —
    * the timestamp strategy's documented blind spot. */
  val Scd2StaleMod = 13

  /** dbt snapshot `timestamp` strategy (dbt's DEFAULT) replayed as a
    * batch: day 0 = customers except every [[Scd2NewKeyMod]]th key, each
    * carrying `created_at` as its audit stamp; day 1 = all customers,
    * with every [[Scd2ChangeMod]]th email rewritten AND its stamp bumped
    * one day (→ close + reopen), and every [[Scd2StaleMod]]th email
    * rewritten WITHOUT bumping the stamp — those ghost changes must stay
    * invisible (the old version, old email, stays current): the caveat
    * that distinguishes `timestamp` from `check`, pinned cross-engine. */
  def scd2SnapshotTimestamp(spark: SparkSession, dir: String): DataFrame = {
    val cust = Bronze.customers(spark, dir).select(col("customer_id"),
      col("email"), col("created_at").as("updated_at"))
    val day0 = cust.filter(col("customer_id") % Scd2NewKeyMod =!= 0)
    val bumped = col("customer_id") % Scd2ChangeMod === 0
    val stale = col("customer_id") % Scd2StaleMod === 0
    val day1 = cust
      .withColumn("email",
        when(bumped, concat(lit("updated_"), col("email")))
          .when(stale, concat(lit("ghost_"), col("email")))
          .otherwise(col("email")))
      .withColumn("updated_at",
        when(bumped, col("updated_at") + expr("INTERVAL 1 DAY"))
          .otherwise(col("updated_at")))
    val snap0 = Incremental.Scd2.init(day0, expr(s"TIMESTAMP_NTZ '$Scd2T0'"))
    Incremental.Scd2.advanceTimestamp(snap0, day1, "customer_id",
      "updated_at", expr(s"TIMESTAMP_NTZ '$Scd2T1'"))
  }

  def scd2SnapshotTimestampOracle: String =
    s"""${OracleSql.prelude},
    cust AS (
      SELECT customer_id, email, created_at AS updated_at
      FROM bronze_customers),
    day0 AS (SELECT * FROM cust WHERE customer_id % $Scd2NewKeyMod != 0),
    day1 AS (
      SELECT customer_id,
        CASE WHEN customer_id % $Scd2ChangeMod = 0 THEN 'updated_' || email
             WHEN customer_id % $Scd2StaleMod = 0 THEN 'ghost_' || email
             ELSE email END AS email,
        CASE WHEN customer_id % $Scd2ChangeMod = 0
             THEN updated_at + INTERVAL 1 DAY ELSE updated_at END AS updated_at
      FROM cust),
    changed AS (
      SELECT d1.customer_id FROM day1 d1
      WHERE NOT EXISTS (SELECT 1 FROM day0 d0
        WHERE d0.customer_id = d1.customer_id
          AND d1.updated_at <= d0.updated_at)),
    opened AS (
      SELECT customer_id, email, updated_at,
        TIMESTAMP '$Scd2T1' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day1 WHERE customer_id IN (SELECT customer_id FROM changed)),
    closed AS (
      SELECT customer_id, email, updated_at,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        TIMESTAMP '$Scd2T1' AS _valid_to, FALSE AS _is_current
      FROM day0 WHERE customer_id IN (SELECT customer_id FROM changed)),
    still AS (
      SELECT customer_id, email, updated_at,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day0 WHERE customer_id NOT IN (SELECT customer_id FROM changed))
    SELECT * FROM opened
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM still"""

  /** Every Nth key vanishes from day 1 of [[scd2HardDelete]]. */
  val Scd2DeleteMod = 7

  /** dbt `invalidate_hard_deletes=true` replayed as a batch: day 0 = all
    * customers; day 1 drops every [[Scd2DeleteMod]]th key (hard deletes —
    * their versions must CLOSE at T1 with nothing reopened) and rewrites
    * every [[Scd2ChangeMod]]th email (normal close + reopen). The one
    * flow exercises both closure causes so the oracle distinguishes a
    * delete-closed version from a change-closed one. */
  def scd2HardDelete(spark: SparkSession, dir: String): DataFrame = {
    val cust = Bronze.customers(spark, dir).select(col("customer_id"),
      col("email"))
    val day1 = cust.filter(col("customer_id") % Scd2DeleteMod =!= 0)
      .withColumn("email",
        when(col("customer_id") % Scd2ChangeMod === 0,
          concat(lit("updated_"), col("email"))).otherwise(col("email")))
    val snap0 = Incremental.Scd2.init(cust, expr(s"TIMESTAMP_NTZ '$Scd2T0'"))
    val t1 = expr(s"TIMESTAMP_NTZ '$Scd2T1'")
    val advanced = Incremental.Scd2.advance(snap0, day1, "customer_id",
      Seq("email"), t1)
    Incremental.Scd2.invalidateHardDeletes(advanced, day1, "customer_id", t1)
  }

  def scd2HardDeleteOracle: String =
    s"""${OracleSql.prelude},
    cust AS (SELECT customer_id, email FROM bronze_customers)
    -- day-0 versions: closed at T1 when deleted (mod $Scd2DeleteMod) or
    -- changed (mod $Scd2ChangeMod among survivors — a NULL email is NOT
    -- a change: 'updated_' || NULL stays NULL, so check-cols match),
    -- else still current
    SELECT customer_id, email,
      TIMESTAMP '$Scd2T0' AS _valid_from,
      CASE WHEN customer_id % $Scd2DeleteMod = 0
             OR (customer_id % $Scd2ChangeMod = 0 AND email IS NOT NULL)
           THEN TIMESTAMP '$Scd2T1' END AS _valid_to,
      NOT (customer_id % $Scd2DeleteMod = 0
             OR (customer_id % $Scd2ChangeMod = 0 AND email IS NOT NULL))
        AS _is_current
    FROM cust
    UNION ALL
    -- reopened versions: changed survivors only — deletes reopen nothing
    SELECT customer_id, 'updated_' || email,
      TIMESTAMP '$Scd2T1', CAST(NULL AS TIMESTAMP), TRUE
    FROM cust
    WHERE customer_id % $Scd2DeleteMod != 0
      AND customer_id % $Scd2ChangeMod = 0 AND email IS NOT NULL"""

  /** Days held back as the "new data" phase of [[incrementalAggMerge]]. */
  val AggDeltaDays = 7

  /** Incremental AGGREGATE maintenance — the materialized-view update
    * path: yesterday's stored per-group partial aggregates plus a
    * partial over only the NEW data must equal a from-scratch rebuild.
    * [[Incremental]] maintains tables at ROW grain (append/merge); this
    * is the aggregate grain, and it works because the aggregates are
    * ALGEBRAIC: counts and sums add, min/max fold, avg is recomposed
    * from (sum, count) — never averaged-of-averages — and distinct
    * users, NOT algebraic, ride the KMV sketch whose bottom-k union IS
    * its merge ([[graft.ops.Sketch.kmvMergeShards]], here sharded by
    * time instead of hash). The engine computes the TWO-PHASE path
    * (events split at max_date − [[AggDeltaDays]]); the oracle computes
    * the single-phase rebuild — their hash-equality is the losslessness
    * proof, column by column.
    *
    * At scale: the stored partials are group-cardinality rows (not
    * events); each refresh scans only the delta. The exact distinct
    * column is the audit branch, as always. */
  def incrementalAggMerge(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Events, Sketch}
    val e = Events.events(spark, dir)
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("c"),
        col("ts").cast("date").as("d"))
    val cutoff = e.agg(date_sub(max(col("d")), AggDeltaDays).as("cut"))
    val tagged = e.crossJoin(broadcast(cutoff))
      .withColumn("phase", when(col("d") < col("cut"), "old").otherwise("new"))
    // phase partials: what the store would hold / what the refresh computes
    val partials = tagged.groupBy("event_type", "phase")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
        min(col("c")).as("mn"), max(col("c")).as("mx"))
    val merged = partials.groupBy("event_type")
      .agg(sum(col("n")).as("n_events"), sum(col("s")).as("csum"),
        min(col("mn")).as("value_min_cents"),
        max(col("mx")).as("value_max_cents"),
        sum(when(col("phase") === "old", col("n")).otherwise(0L)).as("n_old_phase"),
        sum(when(col("phase") === "new", col("n")).otherwise(0L)).as("n_new_phase"))
    // KMV distinct-user sketches per phase, merged by union + re-bottom-k
    val hashes = tagged.select(col("event_type"), col("phase"),
        expr(Sketch.md5U24Expr("user_id")).cast("long").as("h"))
      .distinct()
    val phaseSk = hashes
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type", "phase").orderBy("h")))
      .filter(col("rn") <= Sketch.K)
    val mergedSk = phaseSk.select("event_type", "h").distinct()
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("h")))
      .filter(col("rn") <= Sketch.K)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth"))
      .withColumn("kmv_users_est",
        when(col("n_kept") < Sketch.K, col("n_kept").cast("double"))
          .otherwise((lit(Sketch.K - 1) * lit(Sketch.HashSpace.toDouble))
            / col("kth")))
      .select("event_type", "kmv_users_est")
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    merged.join(mergedSk, Seq("event_type"))
      .join(exact, Seq("event_type"))
      .withColumn("value_sum", col("csum") / 100.0)
      .withColumn("avg_value",
        (col("csum") / col("n_events")).cast("double") / 100.0)
      .select("event_type", "n_events", "n_old_phase", "n_new_phase",
        "value_sum", "avg_value", "value_min_cents", "value_max_cents",
        "kmv_users_est", "exact_users")
  }

  def incrementalAggMergeOracle: String =
    s"""WITH e AS (
      SELECT event_type, user_id, CAST(round(value * 100) AS BIGINT) AS c,
        CAST(ts AS DATE) AS d
      FROM events),
    cut AS (SELECT max(d) - $AggDeltaDays AS cut FROM e),
    full_agg AS (
      SELECT event_type, count(*) AS n_events,
        sum(CASE WHEN d < cut THEN 1 ELSE 0 END) AS n_old_phase,
        sum(CASE WHEN d >= cut THEN 1 ELSE 0 END) AS n_new_phase,
        sum(c) AS csum, min(c) AS value_min_cents,
        max(c) AS value_max_cents,
        count(DISTINCT user_id) AS exact_users
      FROM e CROSS JOIN cut GROUP BY 1),
    sk AS (
      SELECT event_type, count(*) AS n_kept, max(h) AS kth FROM (
        SELECT event_type, h,
          row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM (SELECT DISTINCT event_type,
                ${graft.ops.Sketch.md5U24SqlDuck("user_id")} AS h
              FROM e))
      WHERE rn <= ${graft.ops.Sketch.K} GROUP BY 1)
    SELECT f.event_type, f.n_events,
      CAST(f.n_old_phase AS BIGINT) AS n_old_phase,
      CAST(f.n_new_phase AS BIGINT) AS n_new_phase,
      f.csum / 100.0 AS value_sum,
      CAST(f.csum / f.n_events AS DOUBLE) / 100.0 AS avg_value,
      f.value_min_cents, f.value_max_cents,
      CASE WHEN s.n_kept < ${graft.ops.Sketch.K}
        THEN CAST(s.n_kept AS DOUBLE)
        ELSE (${graft.ops.Sketch.K - 1} * ${graft.ops.Sketch.HashSpace.toDouble}) / s.kth
      END AS kmv_users_est,
      f.exact_users
    FROM full_agg f JOIN sk s USING (event_type)"""

  /** Point-in-time (temporal) join: each fact joined to the SCD2
    * dimension version VALID AT its event time — `_valid_from ≤ ts <
    * _valid_to` (open versions have NULL `_valid_to`) — the canonical
    * "what did the customer look like when they ordered" lakehouse query
    * that plain current-version joins get wrong. Facts are the bronze
    * orders with a deterministic synthetic event time alternating
    * between the snapshot's two version boundaries (`T0 + (order_id % 2)
    * days` lands exactly on [[Scd2T0]] or [[Scd2T1]]), so both the
    * closed and the open version are exercised, and day-1-only customers
    * probed at T0 exercise the no-version-yet NULL path (LEFT join — a
    * fact with no valid version surfaces with NULLs, it does not
    * silently drop).
    *
    * SCD2 versions are non-overlapping by construction, so each fact
    * matches AT MOST one version: the join stays row-linear. Scale
    * shape: one equi-shuffle on the dimension key with the validity
    * range as a join-time filter — the same single-shuffle shape as
    * [[graft.ops.Events.attribution]]; at 100 TB the dimension side is
    * the small one and broadcasts. */
  def scd2TemporalJoin(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2Snapshot(spark, dir).select(
      col("customer_id").as("dim_customer_id"), col("email"),
      col("_valid_from"), col("_valid_to"))
    val facts = Bronze.orders(spark, dir).select(
      col("order_id"), col("customer_id"),
      expr(s"timestampadd(DAY, cast(order_id % 2 AS INT), " +
        s"TIMESTAMP_NTZ '$Scd2T0')").as("event_ts"))
    facts.join(dim,
      col("dim_customer_id") === col("customer_id") &&
        col("_valid_from") <= col("event_ts") &&
        (col("_valid_to").isNull || col("event_ts") < col("_valid_to")),
      "left")
      .select(col("order_id"), col("customer_id"), col("event_ts"),
        col("email"), col("_valid_from").as("version_from"),
        col("dim_customer_id").isNotNull.as("matched"))
  }

  def scd2TemporalJoinOracle: String =
    s"""${OracleSql.prelude},
    snap AS (SELECT * FROM ($scd2SnapshotOracle) s),
    facts AS (
      SELECT order_id, customer_id,
        TIMESTAMP '$Scd2T0' + INTERVAL 1 DAY * (order_id % 2) AS event_ts
      FROM bronze_orders)
    SELECT f.order_id, f.customer_id, f.event_ts, s.email,
      s._valid_from AS version_from,
      (s.customer_id IS NOT NULL) AS matched
    FROM facts f LEFT JOIN snap s ON s.customer_id = f.customer_id
      AND s._valid_from <= f.event_ts
      AND (s._valid_to IS NULL OR f.event_ts < s._valid_to)"""

  def scd2SnapshotOracle: String =
    s"""${OracleSql.prelude},
    cust AS (SELECT customer_id, email FROM bronze_customers),
    day0 AS (SELECT * FROM cust WHERE customer_id % $Scd2NewKeyMod != 0),
    day1 AS (
      SELECT customer_id,
        CASE WHEN customer_id % $Scd2ChangeMod = 0
             THEN 'updated_' || email ELSE email END AS email
      FROM cust),
    changed AS (
      SELECT d1.customer_id
      FROM day1 d1 LEFT JOIN day0 d0 USING (customer_id)
      WHERE d0.customer_id IS NULL
         OR coalesce(d1.email, '') != coalesce(d0.email, '')),
    opened AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T1' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day1 WHERE customer_id IN (SELECT customer_id FROM changed)),
    closed AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        TIMESTAMP '$Scd2T1' AS _valid_to, FALSE AS _is_current
      FROM day0 WHERE customer_id IN (SELECT customer_id FROM changed)),
    still AS (
      SELECT customer_id, email,
        TIMESTAMP '$Scd2T0' AS _valid_from,
        CAST(NULL AS TIMESTAMP) AS _valid_to, TRUE AS _is_current
      FROM day0 WHERE customer_id NOT IN (SELECT customer_id FROM changed))
    SELECT * FROM opened
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM still"""
}
