package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryModule, Tables}

/** Event-log dataflow operators from SURVEY §2, expressed over the driver's
  * `events` table (event_id = append id, ts = event time).
  *
  * The mapping to the reference's operators (file:line cites are to
  * /root/reference):
  *  - ev_keyset_scan → S4/F1/G2, the replicator's resumable total-order scan
  *    with a row-value `(lsn,id)` cursor
  *    (tech.kage.event.replicator/.../EventReplicatorWorker.java:66-72);
  *    here `(ts, event_id)` plays `(lsn, id)`. Struct comparison gives
  *    row-value semantics and pushes down as a range predicate.
  *  - ev_lag → A1, the replication-lag gauge `MAX(lsn) − cursor`
  *    (EventReplicatorWorker.java:77, 242-248).
  *  - ev_last_per_key → A3, the progress-topic fold "last value per key"
  *    (tech.kage.event.replicator/.../EventReplicator.java:238-246).
  *  - ev_count_by_type → A5 count assertions.
  *  - ev_window_tumble / ev_session → §2.7 extensions: event-time windowed
  *    aggregation and session windows (Structured Streaming gives the same
  *    operators on unbounded input; batch form is oracle-checkable).
  *  - ev_json_props → T7-style enrichment: projecting typed fields out of a
  *    serialized payload (JSON here standing in for the Avro body).
  *
  * Scale: every aggregation is a map-side-combinable `groupBy`; the keyset
  * scan's cursor predicate prunes parquet row groups via min/max stats (at
  * 100 TB the event log is written in `(lsn)`-ordered segment files, so the
  * cursor filter skips all but the tail segments — see graft.store.EventLog).
  */
object EventQueries extends QueryModule {
  private val dec2 = DecimalType(18, 2)

  /** dq_kanon privacy threshold: a quasi-identifier combination carried
    * by fewer than this many distinct users is reported as a
    * re-identification risk (k=5 is the conventional floor; production
    * picks per-jurisdiction values). */
  private val KAnonK = 5

  /** layout_zorder: bits per interleaved dimension — shared with the
    * oracle's interleave-expression generator. */
  private val ZBits = 8

  /** ev_kmv_distinct sketch size and the h60 hash space — aliases of the
    * [[graft.operators.MergeableStats]] constants (the oracle SQL
    * interpolates them, so the query and the streaming StatsView share one
    * definition). */
  val KmvK: Int = graft.operators.MergeableStats.K
  val HashSpace: Long = graft.operators.MergeableStats.HashSpace

  /** Per-type mergeable stats state (ev_stats_incr) — see
    * [[graft.operators.MergeableStats]]. */
  def statsView(events: DataFrame): DataFrame =
    graft.operators.MergeableStats.statsOf(events)

  /** Merge two stats states and project the published view columns. */
  def mergeStatsViews(old: DataFrame, delta: DataFrame): DataFrame =
    graft.operators.MergeableStats.publish(
      graft.operators.MergeableStats.merge(old, delta))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S4: resumable ordered keyset scan after a (ts,id) cursor. The
    // redundant `ts >= cursor` bound is parquet-pushable (row-group
    // pruning); the struct comparison supplies exact row-value semantics.
    "ev_keyset_scan" -> { (s, dir) =>
      import s.implicits._
      val cursorTs = to_timestamp(lit("2024-01-15 00:00:00"))
      Tables.load(s, dir, "events")
        .filter($"ts" >= cursorTs &&
          struct($"ts", $"event_id") > struct(cursorTs, lit(4500L)))
        .orderBy($"ts", $"event_id")
        .limit(500)
        .select($"event_id", $"user_id", $"event_type", $"ts")
    },

    // A1: lag gauge = max(id) − cursor, null → 0.
    "ev_lag" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .agg((coalesce(max($"event_id"), lit(0L)) - 42L).as("lag_events"))
    },

    // A3: last-value-per-key fold (compacted-topic replay).
    "ev_last_per_key" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          max_by($"event_type", $"event_id").as("last_type"),
          max_by($"value", $"event_id").as("last_value"),
          max($"event_id").as("last_event_id"),
          count(lit(1)).as("n_events"))
    },

    // A5: golden row counts per type.
    "ev_count_by_type" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          countDistinct($"user_id").as("n_users"))
    },

    // §2.7 extension: tumbling event-time window aggregation.
    "ev_window_tumble" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"value".cast(dec2)).cast("double").as("sum_value"))
        .select($"w.start".as("window_start"), $"event_type", $"n", $"sum_value")
    },

    // §2.7 extension: session windows (30-minute inactivity gap per user).
    "ev_session" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(session_window($"ts", "30 minutes").as("w"), $"user_id")
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id", $"w.start".as("session_start"),
          $"w.end".as("session_end"), $"n_events")
    },

    // Purchase→session attribution via the general point-in-interval
    // join (operators/IntervalJoin): browsing sessions (view/click,
    // 6-hour gap rule — sized to the sparse synthetic cadence) become
    // [first,last]-ts intervals and each purchase
    // joins the same-user session containing it. The interval join grid-
    // buckets instead of planning a cartesian/BNLJ — the named operator
    // class Spark lacks natively (PlanAuditSpec pins no-cartesian); the
    // oracle runs the naive BETWEEN join (DuckDB IEJoin), so the gate
    // proves the bucketed plan row-identical to the inequality-join
    // spelling.
    "ev_interval_attr" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val gapMs = 6L * 3600 * 1000
      val sess = ev.filter($"event_type".isin("view", "click"))
        .withColumn("new_s",
          when(lag($"ts", 1).over(w).isNull ||
            (unix_millis($"ts") - unix_millis(lag($"ts", 1).over(w))) >= gapMs,
            1).otherwise(0))
        .withColumn("sess", sum($"new_s")
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val intervals = sess.groupBy($"user_id", $"sess")
        .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
          min($"event_id").as("session_id"))
      val points = ev.filter($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      graft.operators.IntervalJoin.pointsInIntervals(points, "ts",
          intervals, "session_start", "session_end", Seq("user_id"), 21600L)
        .select($"event_id", $"user_id", $"session_id", $"session_start")
    },

    // §2.7 extension: sliding event-time windows (1h window, 30m slide —
    // each event lands in two windows; Spark's window() generates them,
    // the oracle unrolls the same two bucket starts per event).
    "ev_window_sliding" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy(window($"ts", "1 hour", "30 minutes").as("w"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select($"w.start".as("window_start"), $"event_type", $"n")
    },

    // Top-k per group: rank events per user by value (window + filter).
    "ev_topk_per_user" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("rnk", row_number().over(w))
        .filter($"rnk" <= 3)
        .select($"user_id", $"event_id", $"rnk".cast("long").as("rnk"), $"value")
    },

    // As-of join: point-in-time state lookup — for each (user, t) find the
    // latest event at or before t. Spark has no native ASOF JOIN; the
    // composition (range join + max_by) expresses it exactly (DuckDB's
    // built-in ASOF JOIN is the oracle). At scale the range join shuffles
    // both sides by user_id once; max_by is a map-side-combinable agg.
    "ev_asof" -> { (s, dir) =>
      import s.implicits._
      val events = Tables.load(s, dir, "events")
      val asOf = Seq("2024-01-10 00:00:00", "2024-01-20 00:00:00")
      val times = asOf.toDF("t").select(to_timestamp($"t").as("at_ts"))
      val queries = events.select($"user_id".as("q_user")).distinct().crossJoin(times)
      queries.join(events,
          $"q_user" === $"user_id" && $"ts" <= $"at_ts", "left")
        .groupBy($"q_user".as("user_id"), $"at_ts")
        .agg(
          // event ids are append-ordered (monotone in ts), so id is the
          // as-of ordering; a (ts,id) struct would be needed if ids could
          // lag event time
          max_by($"event_id", $"event_id").as("last_event_id"),
          max_by($"event_type", $"event_id").as("last_type"))
    },

    // Conversion funnel: users whose first signup precedes a later purchase
    // (conditional event-time aggregation per key).
    "ev_funnel" -> { (s, dir) =>
      import s.implicits._
      val per = Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          min(when($"event_type" === "signup", $"ts")).as("first_signup"),
          max(when($"event_type" === "purchase", $"ts")).as("last_purchase"))
      per.agg(
        count(lit(1)).as("n_users"),
        sum(when($"first_signup".isNotNull && $"last_purchase".isNotNull &&
          $"first_signup" < $"last_purchase", 1).otherwise(0)).as("n_converted"))
    },

    // Hour-over-hour retention: users active in h and h+1.
    "ev_retention" -> { (s, dir) =>
      import s.implicits._
      // cached: the (user, hour) activity set sits on BOTH sides of the
      // adjacent-hour self-join — uncached, the scan + distinct executed
      // twice (r17 optimization)
      val active = Tables.load(s, dir, "events")
        .select($"user_id", window($"ts", "1 hour")("start").as("h"))
        .distinct()
        .cache()
      active.as("a").join(active.as("b"),
          $"a.user_id" === $"b.user_id" &&
            $"b.h" === $"a.h" + expr("INTERVAL 1 HOUR"))
        .groupBy($"a.h".as("window_start"))
        .agg(count(lit(1)).as("retained"))
    },

    // Exact interpolated percentiles of value per type (both engines sort
    // and linearly interpolate at p·(n−1) — identical doubles).
    "ev_percentiles" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          expr("percentile(value, 0.5)").as("p50"),
          expr("percentile(value, 0.9)").as("p90"),
          expr("percentile(value, 0.99)").as("p99"),
          min($"value").as("vmin"),
          max($"value").as("vmax"))
    },

    // Quantiles from a DETERMINISTIC hash sample — the third sketch shape
    // next to HLL (ev_approx_stats) and KMV (ev_kmv_distinct): the sample
    // membership is a pure row property (h60(event_id) mod R), so it is
    // mergeable (a map-side filter), reproducible across engines, reruns
    // and partitionings. The estimator is the NEAREST-RANK percentile
    // spelled as explicit selection — sort the (R-fold-reduced) sample,
    // pick index ceil(p·n) — because interpolated percentile builtins
    // (Spark `percentile`, DuckDB `quantile_cont`) use different
    // lower+frac·(upper−lower) formulas whose doubles can differ in the
    // last ulp (r6 advisor). Here the only float op is ONE IEEE multiply +
    // ceil, identical in both engines; the quantile itself is a selected
    // data value, never arithmetic. At 100 TB the filter fuses into the
    // scan and the per-group sorted sample is R-fold reduced.
    "ev_quantile_sample" -> { (s, dir) =>
      import s.implicits._
      def rankTh(p: Double) = when(size($"vs") >= 1,
        element_at($"vs", ceil(lit(p) * size($"vs")).cast("int")))
      Tables.load(s, dir, "events")
        .filter(CrossHash.h60($"event_id".cast("string")) % 10 === 0)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_sample"),
          sort_array(collect_list($"value")).as("vs"))
        .select($"event_type", $"n_sample",
          rankTh(0.5).as("p50_est"), rankTh(0.95).as("p95_est"))
    },

    // Pivot: event_type → columns (relational reshape of the stream).
    "ev_pivot" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .select($"user_id", $"click".as("n_click"), $"view".as("n_view"),
          $"purchase".as("n_purchase"), $"signup".as("n_signup"), $"error".as("n_error"))
    },

    // Inter-event gap statistics per user (lag window): the heartbeat /
    // activity-cadence operator. Gaps in exact integer microseconds so
    // both engines agree bit-for-bit; the mean is one double division.
    "ev_gaps" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("gap_us", unix_micros($"ts") - unix_micros(lag($"ts", 1).over(w)))
        .filter($"gap_us".isNotNull)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_gaps"),
          min($"gap_us").as("min_gap_us"),
          max($"gap_us").as("max_gap_us"),
          (sum($"gap_us").cast("double") / count(lit(1))).as("mean_gap_us"))
    },

    // Running cumulative value per user in (ts, event_id) order — the
    // stateful running-total projection (decimal-exact, then one cast).
    "ev_cumsum" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id",
          sum($"value".cast(dec2)).over(w).cast("double").as("running_value"))
    },

    // First-touch attribution: each user's earliest event (min_by fold) —
    // the mirror of ev_last_per_key's compacted-topic semantics.
    "ev_first_touch" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"user_id")
        .agg(
          min_by($"event_type", $"event_id").as("first_type"),
          min($"ts").as("first_ts"),
          min($"event_id").as("first_event_id"))
    },

    // Consecutive-duplicate collapse per user (lag filter): stream
    // compaction that keeps only type-change points — the event-log analog
    // of Kafka log compaction restricted to adjacent records.
    "ev_dedup_consec" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
        .select($"user_id", $"event_id", $"event_type", $"ts")
    },

    // Fixed-width value histogram per event type (numeric binning; both
    // engines compute floor(value/100) over doubles identically).
    "ev_histogram" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .groupBy($"event_type", floor($"value" / 100.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"),
          min($"value").as("vmin"),
          max($"value").as("vmax"))
    },

    // Time-series densification: hourly event counts per type INCLUDING
    // empty hours (sequence-explode over each type's [min,max] span,
    // left join, zero-fill) — sparse log → dense series for downstream
    // rate/anomaly models. The generated span table is |types|·|hours| —
    // tiny relative to the log — and joins broadcast at scale.
    "ev_densify" -> { (s, dir) =>
      import s.implicits._
      val hourly = Tables.load(s, dir, "events")
        .groupBy($"event_type", date_trunc("hour", $"ts").as("h"))
        .agg(count(lit(1)).as("cnt"))
      val dense = hourly.groupBy($"event_type")
        .agg(min($"h").as("h0"), max($"h").as("h1"))
        .select($"event_type",
          explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
      dense.join(hourly, Seq("event_type", "h"), "left")
        .select($"event_type", $"h".as("window_start"),
          coalesce($"cnt", lit(0L)).as("n"))
    },

    // Path analysis: each user's first five event types in (ts, event_id)
    // order as a ">"-joined path, counted corpus-wide (top-20). The
    // per-user ordering rides a sort_array over (rank, type) structs —
    // collect_list alone has no order guarantee across partitions.
    "ev_paths" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 5)
        .groupBy($"user_id")
        .agg(collect_list(struct($"rn", $"event_type")).as("steps"))
        .select(concat_ws(">",
          expr("transform(array_sort(steps), s -> s.event_type)")).as("path"))
        .groupBy($"path")
        .agg(count(lit(1)).as("n_users"))
        .orderBy($"n_users".desc, $"path")
        .limit(20)
    },

    // Anomaly flags: per-type z-score over value, |z| >= 3. Moments are
    // exact decimal sums (order-independent); the z arithmetic is the
    // same double expression in both engines.
    "ev_anomaly" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
      val stats = ev.groupBy($"event_type".as("t"))
        .agg(
          count(lit(1)).as("n"),
          sum($"value".cast(dec2)).cast("double").as("s"),
          sum(($"value".cast(dec2) * $"value".cast(dec2))).cast("double").as("sq"))
        // guards (Spark 4's ANSI default turns /0 into job aborts; the
        // oracle yields NULL and drops the rows): singleton groups get a
        // NULL sd via the n > 1 case; fp-noise-negative variance clamps
        // to 0; a zero sd nulls z instead of dividing by zero
        .select($"t", ($"s" / $"n").as("mean"),
          when($"n" > 1,
            sqrt(greatest(($"sq" - $"s" * $"s" / $"n") / ($"n" - 1), lit(0.0))))
            .as("sd"))
      ev.join(broadcast(stats), $"event_type" === $"t")
        .withColumn("z", ($"value" - $"mean") / nullif($"sd", lit(0.0)))
        .filter(abs($"z") >= 3.0)
        .select($"event_id", $"event_type", $"value", $"z".as("z"))
    },

    // Per-user-hour first/last snapshot (first_value/last_value over the
    // full window frame): the open/close values of each activity bucket.
    "ev_first_last" -> { (s, dir) =>
      import s.implicits._
      // one map-side-combinable aggregate instead of a full-frame window
      // + distinct (r17 optimization: 2 exchanges + per-row frame
      // materialization → 1 partial-agg exchange). min_by/max_by on the
      // (ts, event_id) struct pick exactly the first/last row's value —
      // event_id is unique, so the order is total and the group collapses
      // to the same single row the old distinct kept.
      Tables.load(s, dir, "events")
        .withColumn("h", date_trunc("hour", $"ts"))
        .groupBy($"user_id", $"h")
        .agg(min_by($"value", struct($"ts", $"event_id")).as("open_value"),
          max_by($"value", struct($"ts", $"event_id")).as("close_value"))
        .select($"user_id", $"h".as("window_start"),
          $"open_value", $"close_value")
    },

    // Event-type transition matrix (Markov counts): for each user-stream
    // step, count (type → next type) pairs in (ts, event_id) order — the
    // behavioral-model input. One window shuffle on user_id, then a
    // map-side-combinable pair count.
    "ev_transitions" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, dir, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("from_type"), $"next_type".as("to_type"))
        .agg(count(lit(1)).as("n"))
    },

    // Data-quality audit: key uniqueness across the primary tables — the
    // assert-before-training stage (a dup key silently double-weights a
    // training row). Each leg is one map-side-combinable groupBy on a
    // single column; the union is three tiny aggregates.
    "dq_uniqueness" -> { (s, dir) =>
      import s.implicits._
      def dups(table: String, keyCol: String) =
        Tables.load(s, dir, table)
          .groupBy(col(keyCol)).agg(count(lit(1)).as("c"))
          .agg(
            count(lit(1)).as("n_keys"),
            sum(when($"c" > 1, 1L).otherwise(0L)).as("n_dup_keys"),
            sum(when($"c" > 1, $"c").otherwise(0L)).as("n_dup_rows"))
          .select(lit(table).as("table_name"), $"n_keys", $"n_dup_keys", $"n_dup_rows")
      dups("events", "event_id")
        .unionAll(dups("documents", "doc_id"))
        .unionAll(dups("embeddings", "vec_id"))
    },

    // Data-quality audit: referential integrity of the star schema —
    // orphan counts per foreign-key edge (anti-join aggregates; each edge
    // is one shuffle on the key, or a broadcast when the parent is a dim).
    // Pipeline-freshness audit — the staleness monitor every ingestion
    // SLA dashboard runs: per event type, how far its newest event lags
    // the stream head. A type whose lag grows run over run is a stuck
    // producer/partition. One shuffle on the (tiny) type key with partial
    // aggregation; the stream head joins back as a 1-row cross join.
    // Exact integer microseconds (unix_micros), no float time math.
    // Ingest VOLUME anomaly audit: per day, today's event count against
    // the trailing-7-day total as an exact ppm ratio (n·7·10⁶ ÷ trail —
    // one integer floor, no float time math), the signal a pipeline
    // pages on when a feed doubles or silently halves. Day self-join on
    // the O(days) table only — the corpus aggregates once.
    "dq_volume" -> { (s, dir) =>
      import s.implicits._
      val perDay = Tables.load(s, dir, "events")
        .groupBy(to_date($"ts".cast("timestamp")).as("day"))
        .agg(count(lit(1)).as("n_events"))
      perDay.as("a").join(perDay.as("b"),
          $"b.day" >= date_sub($"a.day", 6) && $"b.day" <= $"a.day")
        .groupBy($"a.day".as("day"), $"a.n_events".as("n_events"))
        .agg(sum($"b.n_events").as("trail7"))
        .select($"day", $"n_events", $"trail7",
          expr("(n_events * 7 * 1000000) div trail7").as("ratio_ppm"))
    },

    "dq_freshness" -> { (s, dir) =>
      import s.implicits._
      // cached: the O(types) rollup feeds both the head scalar and the
      // final projection — uncached, the events scan executed once per
      // side of the cross join (r17 optimization)
      val perType = Tables.load(s, dir, "events")
        .select($"event_type", unix_micros($"ts").as("us"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_events"), max($"us").as("latest_us"))
        .cache()
      val head = perType.agg(max($"latest_us").as("head_us"))
      perType.crossJoin(head) // 1 row — AQE broadcasts
        .select($"event_type", $"n_events", $"latest_us",
          ($"head_us" - $"latest_us").as("lag_us"))
    },

    // Data-quality audit: COMPLETENESS — per audited column, how many
    // rows are null or blank-after-trim (the ingestion-contract check a
    // pipeline runs before trusting a field for filtering/joins). One
    // pass per table: every column audits inside the same partial
    // aggregate, so the whole report costs one scan per table and a
    // |columns|-row result — no shuffle of row data at any scale.
    "dq_completeness" -> { (s, dir) =>
      import s.implicits._
      def audit(table: String,
          checks: (String, org.apache.spark.sql.Column)*): DataFrame = {
        val df = Tables.load(s, dir, table)
        val aggs = count(lit(1)).as("n_rows") +:
          checks.map { case (c, bad) => sum(when(bad, 1L).otherwise(0L)).as(s"_$c") }
        // cached: the 1-row audit aggregate is re-projected once per
        // audited column — uncached, the table scan executed once per
        // column (r17 optimization)
        val row = df.agg(aggs.head, aggs.tail: _*).cache()
        checks.map { case (c, _) =>
          row.select(lit(table).as("table_name"), lit(c).as("column_name"),
            $"n_rows", col(s"_$c").as("n_missing"),
            (col(s"_$c").cast("double") / $"n_rows").as("missing_frac"))
        }.reduce(_.unionAll(_))
      }
      audit("events",
          "event_type" -> ($"event_type".isNull || trim($"event_type") === ""),
          "props" -> ($"props".isNull || trim($"props") === ""),
          "value" -> $"value".isNull)
        .unionAll(audit("documents",
          "text" -> ($"text".isNull || trim($"text") === ""),
          "lang" -> ($"lang".isNull || trim($"lang") === ""),
          "source" -> ($"source".isNull || trim($"source") === "")))
        .unionAll(audit("embeddings",
          "embedding" -> ($"embedding".isNull || size($"embedding") === 0)))
    },

    // Data-quality audit: distribution DRIFT — per event type, the share
    // shift between the stream's first and second half (split at the
    // midpoint timestamp), the monitor that catches a producer whose mix
    // changes silently (a type surging or dying between windows skews
    // any model trained on the blend). Shares are exact integer ppm
    // (n·10⁶ DIV total — the Dice/collocation discipline: bounded exact
    // longs at ANY corpus size, no float division), so the drift column
    // is hash-exact cross-engine. One partial-agg shuffle on the type
    // key + two 1-row scalar aggregates (midpoint, window totals) that
    // join back broadcast — the dq_freshness cost shape. An empty second
    // window (all events share one timestamp) yields NULL ppm_b/drift,
    // never a divide-by-zero abort.
    "dq_drift" -> { (s, dir) =>
      import s.implicits._
      val ev = Tables.load(s, dir, "events")
        .select($"event_type", unix_micros($"ts").as("us"))
      val bounds = ev.agg(expr("min(us) + (max(us) - min(us)) DIV 2").as("mid"))
      // per cached: the O(types) rollup feeds both the window totals and
      // the final projection — uncached, the events scan (plus the
      // midpoint scalar's scan) executed once per side of the second
      // cross join (r17 optimization)
      val per = ev.crossJoin(bounds) // 1 row — AQE broadcasts
        .groupBy($"event_type")
        .agg(
          sum(when($"us" > $"mid", 0L).otherwise(1L)).as("n_a"),
          sum(when($"us" > $"mid", 1L).otherwise(0L)).as("n_b"))
        .cache()
      val tot = per.agg(sum($"n_a").as("ta"), sum($"n_b").as("tb"))
      per.crossJoin(tot) // 1 row — AQE broadcasts
        .select($"event_type", $"n_a", $"n_b",
          expr("(n_a * 1000000) DIV ta").as("ppm_a"),
          expr("CASE WHEN tb = 0 THEN NULL ELSE (n_b * 1000000) DIV tb END").as("ppm_b"),
          expr("CASE WHEN tb = 0 THEN NULL ELSE abs((n_b * 1000000) DIV tb - (n_a * 1000000) DIV ta) END")
            .as("drift_ppm"))
    },

    "dq_integrity" -> { (s, dir) =>
      import s.implicits._
      def orphans(edge: String, child: DataFrame, key: String, parent: DataFrame, pkey: String) =
        child.select(col(key).as("k"))
          .join(parent.select(col(pkey).as("k")), Seq("k"), "left_anti")
          .agg(count(lit(1)).as("n_orphans"))
          .select(lit(edge).as("fk_edge"), $"n_orphans")
      val li = Tables.load(s, dir, "lineitem")
      val orders = Tables.load(s, dir, "orders")
      orphans("lineitem.orderkey->orders", li, "l_orderkey", orders, "o_orderkey")
        .unionAll(orphans("orders.custkey->customer", orders, "o_custkey",
          Tables.load(s, dir, "customer"), "c_custkey"))
        .unionAll(orphans("lineitem.partkey->part", li, "l_partkey",
          Tables.load(s, dir, "part"), "p_partkey"))
        .unionAll(orphans("lineitem.suppkey->supplier", li, "l_suppkey",
          Tables.load(s, dir, "supplier"), "s_suppkey"))
    },

    // Sketch aggregates: HLL++ distinct users + approximate value
    // percentiles per event type — the ONLY viable interactive shape at
    // 100 TB: both sketches are fixed-size and map-side MERGEABLE, so the
    // shuffle carries |types| × KB sketch bytes instead of the distinct
    // key space an exact count must move. Approximate by construction →
    // no DuckDB hash oracle (rows-only check); ScaleOpsSpec pins ≤5%
    // relative error for the HLL count and rank-tolerance for the
    // percentiles against the exact spellings.
    // KMV (k-minimum-values) distinct-user sketch per event type — the
    // second sketch shape next to ev_approx_stats' HLL, with the property
    // HLL lacks: the k smallest distinct hashes are order-independent, so
    // the sketch AND its estimator ((k−1)·M/h₍ₖ₎) are bit-identical across
    // engines and merge orders → hash-exact oracle for an approximate
    // aggregate. graft_kmv is a native TypedImperativeAggregate: bounded
    // k-long buffer, map-side combined, no distinct shuffle at all — the
    // shuffle carries |types| × k longs. ScaleOpsSpec pins the estimate's
    // relative error against the exact distinct count.
    "ev_kmv_distinct" -> { (s, dir) =>
      import s.implicits._
      val k = KmvK
      // guarded like MergeableStats.publish: an all-NULL-hash group has
      // empty minima and element_at(mins, 0) aborts under ANSI
      val kth = when(size($"mins") >= 1, element_at($"mins", size($"mins")))
      Tables.load(s, dir, "events")
        .select($"event_type",
          CrossHash.h60($"user_id".cast("string")).as("h"))
        .groupBy($"event_type")
        .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
        .select($"event_type",
          size($"mins").cast("long").as("kmv_n"),
          kth.as("kmv_kth"),
          when(size($"mins") < k, size($"mins").cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(HashSpace).cast("double") / kth)
            .as("est_users"))
    },

    // KMV SET ALGEBRA — union / intersection distinct-user estimates for
    // every event-type pair FROM THE SKETCHES ALONE (Beyer et al., "On
    // Synopses for Distinct-Value Estimation Under Multiset Operations",
    // SIGMOD 2007): the k smallest of minsA ∪ minsB are exactly the KMV
    // sketch of A ∪ B (no corpus re-scan — the union estimator reuses the
    // (k−1)·M/h₍ₖ₎ form), and the fraction of those k that appear in BOTH
    // input sketches estimates |A∩B|/|A∪B|, giving the intersection
    // estimate ρ·Û without ever materializing the intersection. This is
    // the sketch-algebra answer to "how many users do checkout and refund
    // share?" at 100 TB: one corpus pass builds |types|×k longs, the
    // pairwise pass is O(types²) on KB-sized rows, and — because KMV
    // minima are deterministic integers and each estimator is a single
    // IEEE expression — the whole thing stays HASH-EXACT cross-engine,
    // which no HLL set operation can offer. inter_cnt is the raw overlap
    // count so the oracle pins the integer core, not just the floats.
    "ev_kmv_setops" -> { (s, dir) =>
      import s.implicits._
      val k = KmvK
      val mins = Tables.load(s, dir, "events")
        .select($"event_type", CrossHash.h60($"user_id".cast("string")).as("h"))
        .groupBy($"event_type")
        .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
        // an all-NULL-user type has an empty sketch — no set algebra to
        // do (the oracle's h IS NOT NULL chain drops the type the same way)
        .filter(size($"mins") >= 1)
        // cached: the O(types) sketch table sits on BOTH sides of the
        // pair self-join (the ev_kmv_sliding shape — r17 optimization)
        .cache()
      val a = mins.select($"event_type".as("type_a"), $"mins".as("ma"))
      val b = mins.select($"event_type".as("type_b"), $"mins".as("mb"))
      val kth = when(size($"mg") >= 1, element_at($"mg", size($"mg")))
      a.join(b, $"type_a" < $"type_b")
        .withColumn("mg", slice(array_sort(array_union($"ma", $"mb")), 1, k))
        .withColumn("union_n", size($"mg").cast("long"))
        .withColumn("est_union",
          when($"union_n" < k, $"union_n".cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(HashSpace).cast("double") / kth))
        .withColumn("inter_cnt",
          size(array_intersect($"mg", array_intersect($"ma", $"mb"))).cast("long"))
        .select($"type_a", $"type_b", $"union_n", $"est_union", $"inter_cnt",
          ($"inter_cnt" * $"est_union" / lit(k.toDouble)).as("est_inter"))
    },

    // Z-ORDER layout key (Morton interleave of min-max-bucketed
    // user_id × event-time) — the multi-dimensional clustering key
    // behind [[graft.operators.ZOrderLayout]]: sorting by it gives
    // every output file a narrow min/max envelope on BOTH dimensions,
    // so file/row-group pruning works for filters on either (the
    // Delta/Iceberg Z-ORDER BY operation). ZOrderSpec measures the
    // pruning claim against a time-sorted layout; THIS query pins the
    // key algebra itself cross-engine — all integer (exact-divisible
    // floored scaling + shift/and interleave), so the full z-value
    // column hash-matches DuckDB bit for bit.
    "layout_zorder" -> { (s, dir) =>
      import s.implicits._
      import graft.operators.ZOrderLayout
      val e = Tables.load(s, dir, "events")
        .select($"event_id", $"user_id".cast("long").as("a"),
          unix_micros($"ts").as("b"))
      val r = e.agg(min($"a"), max($"a"), min($"b"), max($"b")).head()
      // empty table: the stats row is all NULLs — zval of nothing is nothing
      if (r.isNullAt(0))
        e.select($"event_id", lit(0L).as("zval")).limit(0)
      else
        e.select($"event_id", ZOrderLayout.minMaxZval(
          $"a", r.getLong(0), r.getLong(1),
          $"b", r.getLong(2), r.getLong(3), ZBits).as("zval"))
    },

    // Sliding-window distinct estimation FROM PER-DAY SKETCHES — the
    // production pattern behind every "distinct users, trailing N days"
    // dashboard at 100 TB: one corpus pass builds a k-long KMV sketch
    // per day, and ANY window is answered by merging the member days'
    // sketches (the k smallest of the union of per-day minima ARE the
    // window's KMV sketch — the ev_kmv_setops mergeability argument
    // along the time axis), never re-scanning events. The oracle
    // computes each window's sketch FROM SCRATCH over the raw rows, so
    // the hash equality is the merge ≡ recompute proof (the
    // ev_stats_incr doctrine); |days|×k longs of state total.
    "ev_kmv_sliding" -> { (s, dir) =>
      import s.implicits._
      val k = KmvK
      // cached: the O(days) sketch table sits on BOTH sides of the
      // window self-join — uncached, the corpus pass + KMV fold executed
      // twice (r17 optimization)
      val perDay = Tables.load(s, dir, "events")
        .select(to_date($"ts".cast("timestamp")).as("day"),
          CrossHash.h60($"user_id".cast("string")).as("h"))
        .groupBy($"day")
        .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
        .cache()
      val windows = perDay.as("a").join(perDay.as("b"),
          $"b.day" >= date_sub($"a.day", 2) && $"b.day" <= $"a.day")
        .select($"a.day".as("day"), explode($"b.mins").as("h"))
        .distinct()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"day").orderBy($"h")
      windows.withColumn("rk", row_number().over(w)).filter($"rk" <= k)
        .groupBy($"day")
        .agg(count(lit(1)).as("kmv_n"), max($"h").as("kmv_kth"))
        .select($"day", $"kmv_n", $"kmv_kth",
          when($"kmv_n" < k, $"kmv_n".cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(HashSpace).cast("double") / $"kmv_kth")
            .as("est_users"))
    },

    // Incremental materialized-view maintenance: a per-type stats view
    // (count / decimal sum / min / max / KMV distinct sketch) refreshed by
    // MERGING yesterday's state with a delta aggregate — never rescanning
    // the full history. Every statistic is chosen mergeable: counts add,
    // decimal sums add exactly, min/max fold, and the KMV minima union
    // back into a KMV sketch (sketch mergeability is precisely what makes
    // the distinct count incrementally maintainable — an exact distinct
    // is NOT mergeable without the full key set). The registered query
    // computes old-state ∪ delta via the merge path; the oracle computes
    // the same view over ALL events in one pass — hash equality IS the
    // incremental-correctness proof.
    "ev_stats_incr" -> { (s, dir) =>
      import s.implicits._
      val events = Tables.load(s, dir, "events")
      mergeStatsViews(
        statsView(events.filter($"event_id" % 10 =!= 0)),
        statsView(events.filter($"event_id" % 10 === 0)))
    },

    "ev_approx_stats" -> { (s, dir) =>
      import s.implicits._
      // The percentile pair is flattened to scalar columns: the driver's
      // rows-only comparator sorts result columns and cannot hash an
      // array cell (r5 regression — pandas "unhashable numpy.ndarray").
      Tables.load(s, dir, "events")
        .groupBy($"event_type")
        .agg(
          approx_count_distinct($"user_id", rsd = 0.02).as("approx_users"),
          percentile_approx($"value", array(lit(0.5), lit(0.95)), lit(10000))
            .as("ps"))
        .select($"event_type", $"approx_users",
          element_at($"ps", 1).as("value_p50"),
          element_at($"ps", 2).as("value_p95"))
    },

    // Moving average over an explicit ROWS frame (last 3 events per user
    // in stream order) — the bounded-frame window variant (cumsum is the
    // unbounded one). Decimal-exact inside the frame, one cast out.
    "ev_moving_avg" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
        .rowsBetween(-2, Window.currentRow)
      Tables.load(s, dir, "events")
        .select($"user_id", $"event_id",
          (sum($"value".cast(dec2)).over(w).cast("double") /
            count(lit(1)).over(w)).as("avg3"))
    },

    // T7 analog: typed projection out of a serialized payload column.
    "ev_json_props" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_id",
          get_json_object($"props", "$.k").cast("long").as("k"))
        .filter($"k" >= 50)
    },

    // k-anonymity audit over event quasi-identifiers — the re-
    // identification check a privacy review runs before events feed
    // analytics or training: treating (event_type, props.k) as the
    // quasi-identifier tuple, any combination carried by fewer than
    // KAnonK distinct users can single someone out. Emits a per-type
    // SUMMARY (the dq_* audit shape — non-vacuous on a healthy corpus,
    // so the hash check always bites): combination count, the smallest
    // user population behind any combination, and how many combinations
    // fall below the k=KAnonK floor — the suppression/generalization
    // worklist size. Completes the privacy battery alongside text_pii
    // (content), crypto-shredding (storage), and Takedown (artifacts).
    // Scale: one (qid, user) distinct-count shuffle, then a |types|-row
    // rollup — both map-side combinable.
    "dq_kanon" -> { (s, dir) =>
      import s.implicits._
      Tables.load(s, dir, "events")
        .select($"event_type",
          coalesce(get_json_object($"props", "$.k").cast("long"), lit(-1L)).as("k"),
          $"user_id")
        .groupBy($"event_type", $"k")
        .agg(countDistinct($"user_id").as("nu"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_combos"),
          min($"nu").as("min_users"),
          sum(when($"nu" < KAnonK, 1L).otherwise(0L)).as("n_risky"))
    }
  )

  def oracles: Map[String, String] = Map(
    // The oracle is the NON-incremental spelling: one pass over all
    // events. Hash equality proves the merge path reconstructs the full
    // recompute exactly (decimal sums add associatively; KMV minima union
    // losslessly).
    "ev_stats_incr" ->
      s"""WITH h AS (SELECT event_type, value,
         |    ${CrossHash.oH60("CAST(user_id AS VARCHAR)")} AS h FROM events),
         |d AS (SELECT DISTINCT event_type, h FROM h WHERE h IS NOT NULL),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk FROM d),
         |kmv AS (SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_n,
         |    max(h) AS kmv_kth FROM r WHERE rk <= $KmvK GROUP BY event_type),
         |base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
         |    min(value) AS vmin, max(value) AS vmax
         |  FROM h GROUP BY event_type)
         |SELECT b.event_type, b.n, b.sum_value, b.vmin, b.vmax,
         |  coalesce(k.kmv_n, 0) AS kmv_n, k.kmv_kth,
         |  CASE WHEN coalesce(k.kmv_n, 0) < $KmvK
         |       THEN CAST(coalesce(k.kmv_n, 0) AS DOUBLE)
         |       ELSE ${(KmvK - 1).toDouble} * CAST($HashSpace AS DOUBLE) / k.kmv_kth
         |  END AS est_users
         |FROM base b LEFT JOIN kmv k ON b.event_type = k.event_type""".stripMargin,

    "ev_kmv_distinct" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    ${CrossHash.oH60("CAST(user_id AS VARCHAR)")} AS h FROM events),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM h WHERE h IS NOT NULL),
         |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS kmv_n,
         |    max(h) AS kmv_kth FROM r WHERE rk <= $KmvK GROUP BY event_type),
         |t AS (SELECT DISTINCT event_type FROM events)
         |SELECT t.event_type, coalesce(s.kmv_n, 0) AS kmv_n, s.kmv_kth,
         |  CASE WHEN coalesce(s.kmv_n, 0) < $KmvK
         |       THEN CAST(coalesce(s.kmv_n, 0) AS DOUBLE)
         |       ELSE ${(KmvK - 1).toDouble} * CAST($HashSpace AS DOUBLE) / s.kmv_kth
         |  END AS est_users
         |FROM t LEFT JOIN s ON t.event_type = s.event_type""".stripMargin,

    // the per-type sketch chain of ev_kmv_distinct, then pure list
    // algebra per pair — mirrors the Spark array_union/array_intersect
    // path op for op
    "ev_kmv_setops" ->
      s"""WITH h AS (SELECT DISTINCT event_type,
         |    ${CrossHash.oH60("CAST(user_id AS VARCHAR)")} AS h FROM events),
         |r AS (SELECT event_type, h,
         |    row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
         |  FROM h WHERE h IS NOT NULL),
         |m AS (SELECT event_type, list(h ORDER BY h) AS mins
         |  FROM r WHERE rk <= $KmvK GROUP BY event_type),
         |p AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
         |    a.mins AS ma, b.mins AS mb
         |  FROM m a JOIN m b ON a.event_type < b.event_type),
         |g AS (SELECT type_a, type_b, ma, mb,
         |    list_sort(list_distinct(list_concat(ma, mb)))[1:$KmvK] AS mg FROM p),
         |x AS (SELECT type_a, type_b,
         |    CAST(len(mg) AS BIGINT) AS union_n,
         |    mg[len(mg)] AS kth,
         |    CAST(len(list_intersect(mg, list_intersect(ma, mb))) AS BIGINT) AS inter_cnt
         |  FROM g),
         |y AS (SELECT type_a, type_b, union_n, inter_cnt,
         |    CASE WHEN union_n < $KmvK THEN CAST(union_n AS DOUBLE)
         |         ELSE ${(KmvK - 1).toDouble} * CAST($HashSpace AS DOUBLE) / kth
         |    END AS est_union
         |  FROM x)
         |SELECT type_a, type_b, union_n, est_union, inter_cnt,
         |  inter_cnt * est_union / ${KmvK.toDouble} AS est_inter
         |FROM y""".stripMargin,

    // the same bucket-and-interleave arithmetic in SQL bit ops
    "layout_zorder" -> {
      val inter = (0 until ZBits).map { j =>
        s"(((ba >> $j) & 1) << ${2 * j + 1}) + (((bb >> $j) & 1) << ${2 * j})"
      }.mkString(" + ")
      s"""WITH e AS (SELECT event_id, CAST(user_id AS BIGINT) AS a,
         |    epoch_us(CAST(ts AS TIMESTAMP)) AS b FROM events),
         |st AS (SELECT min(a) AS amin, max(a) AS amax,
         |              min(b) AS bmin, max(b) AS bmax FROM e),
         |bk AS (SELECT event_id,
         |    ((a - (SELECT amin FROM st)) * ${1L << ZBits})
         |      // ((SELECT amax - amin + 1 FROM st)) AS ba,
         |    ((b - (SELECT bmin FROM st)) * ${1L << ZBits})
         |      // ((SELECT bmax - bmin + 1 FROM st)) AS bb
         |  FROM e)
         |SELECT event_id, CAST($inter AS BIGINT) AS zval FROM bk""".stripMargin
    },

    // from-scratch per-window recompute — hash equality vs the Spark
    // sketch-merge path proves merge ≡ recompute (see the query comment)
    "ev_kmv_sliding" ->
      s"""WITH h AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
         |    ${CrossHash.oH60("CAST(user_id AS VARCHAR)")} AS h FROM events),
         |hh AS (SELECT day, h FROM h WHERE h IS NOT NULL),
         |days AS (SELECT DISTINCT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day FROM events),
         |win AS (SELECT DISTINCT d.day, x.h
         |        FROM days d JOIN hh x ON x.day BETWEEN d.day - 2 AND d.day),
         |r AS (SELECT day, h,
         |    row_number() OVER (PARTITION BY day ORDER BY h) AS rk FROM win),
         |s AS (SELECT day, CAST(count(*) AS BIGINT) AS kmv_n, max(h) AS kmv_kth
         |      FROM r WHERE rk <= $KmvK GROUP BY day)
         |SELECT day, kmv_n, kmv_kth,
         |  CASE WHEN kmv_n < $KmvK THEN CAST(kmv_n AS DOUBLE)
         |       ELSE ${(KmvK - 1).toDouble} * CAST($HashSpace AS DOUBLE) / kmv_kth
         |  END AS est_users
         |FROM s""".stripMargin,

    "ev_keyset_scan" ->
      """SELECT event_id, user_id, event_type, CAST(ts AS TIMESTAMP) AS ts
        |FROM events
        |WHERE (CAST(ts AS TIMESTAMP), event_id) > (TIMESTAMP '2024-01-15 00:00:00', 4500)
        |ORDER BY ts, event_id
        |LIMIT 500""".stripMargin,

    "ev_lag" ->
      "SELECT coalesce(max(event_id), 0) - 42 AS lag_events FROM events",

    "ev_last_per_key" ->
      """SELECT user_id,
        |  arg_max(event_type, event_id) AS last_type,
        |  arg_max(value, event_id) AS last_value,
        |  max(event_id) AS last_event_id,
        |  count(*) AS n_events
        |FROM events GROUP BY user_id""".stripMargin,

    "ev_count_by_type" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY event_type""".stripMargin,

    "ev_window_tumble" ->
      """SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,

    // Gaps-and-islands sessionization; Spark's session_window end is
    // last-event-time + gap, new session when gap >= 30 min.
    "ev_session" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR CAST(ts AS TIMESTAMP) - CAST(lag(ts) OVER w AS TIMESTAMP) >= INTERVAL '30 minutes'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT user_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM flagged
        |)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL '30 minutes' AS session_end,
        |  count(*) AS n_events
        |FROM numbered GROUP BY user_id, sess""".stripMargin,

    "ev_interval_attr" ->
      """WITH base AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_type IN ('view', 'click')
        |), flagged AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN lag(ts) OVER w IS NULL
        |           OR ts - lag(ts) OVER w >= INTERVAL '6 hours'
        |         THEN 1 ELSE 0 END AS new_s
        |  FROM base
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |), numbered AS (
        |  SELECT user_id, event_id, ts,
        |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM flagged
        |), iv AS (
        |  SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
        |    min(event_id) AS session_id
        |  FROM numbered GROUP BY user_id, sess
        |), p AS (
        |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events
        |  WHERE event_type = 'purchase'
        |)
        |SELECT p.event_id, p.user_id, iv.session_id, iv.session_start
        |FROM p JOIN iv ON p.user_id = iv.user_id
        |  AND p.ts BETWEEN iv.session_start AND iv.session_end""".stripMargin,

    "ev_window_sliding" ->
      """WITH starts AS (
        |  SELECT event_type,
        |    unnest([time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
        |            time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)) - INTERVAL '30 minutes'
        |           ]) AS window_start
        |  FROM events)
        |SELECT window_start, event_type, count(*) AS n
        |FROM starts GROUP BY 1, 2""".stripMargin,

    "ev_topk_per_user" ->
      """SELECT user_id, event_id, rnk, value FROM (
        |  SELECT user_id, event_id, value,
        |    CAST(row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS BIGINT) AS rnk
        |  FROM events
        |) WHERE rnk <= 3""".stripMargin,

    "ev_asof" ->
      """WITH q AS (
        |  SELECT user_id, unnest([TIMESTAMP '2024-01-10 00:00:00',
        |                          TIMESTAMP '2024-01-20 00:00:00']) AS at_ts
        |  FROM (SELECT DISTINCT user_id FROM events)),
        |e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events)
        |SELECT q.user_id, q.at_ts,
        |  arg_max(e.event_id, e.event_id) AS last_event_id,
        |  arg_max(e.event_type, e.event_id) AS last_type
        |FROM q LEFT JOIN e ON q.user_id = e.user_id AND e.ts <= q.at_ts
        |GROUP BY q.user_id, q.at_ts""".stripMargin,

    "ev_funnel" ->
      """SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN first_signup IS NOT NULL AND last_purchase IS NOT NULL
        |            AND first_signup < last_purchase THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
        |FROM (
        |  SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
        |    max(CASE WHEN event_type = 'purchase' THEN CAST(ts AS TIMESTAMP) END) AS last_purchase
        |  FROM events GROUP BY user_id)""".stripMargin,

    "ev_retention" ->
      """WITH active AS (
        |  SELECT DISTINCT user_id,
        |    time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS h
        |  FROM events)
        |SELECT a.h AS window_start, count(*) AS retained
        |FROM active a JOIN active b
        |  ON a.user_id = b.user_id AND b.h = a.h + INTERVAL '1 hour'
        |GROUP BY a.h""".stripMargin,

    "ev_percentiles" ->
      """SELECT event_type,
        |  quantile_cont(value, 0.5) AS p50,
        |  quantile_cont(value, 0.9) AS p90,
        |  quantile_cont(value, 0.99) AS p99,
        |  min(value) AS vmin, max(value) AS vmax
        |FROM events GROUP BY event_type""".stripMargin,

    // nearest-rank selection with the IDENTICAL ceil(p·n) index arithmetic
    // as the Spark plan — the list is filtered to non-null (Spark's
    // collect_list drops nulls; DuckDB's list() keeps them)
    "ev_quantile_sample" ->
      s"""WITH g AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_sample,
         |    list(value ORDER BY value) FILTER (WHERE value IS NOT NULL) AS vs
         |  FROM events
         |  WHERE ${CrossHash.oH60("CAST(event_id AS VARCHAR)")} % 10 = 0
         |  GROUP BY event_type)
         |SELECT event_type, n_sample,
         |  CASE WHEN len(vs) >= 1
         |    THEN vs[CAST(ceil(0.5 * len(vs)) AS BIGINT)] END AS p50_est,
         |  CASE WHEN len(vs) >= 1
         |    THEN vs[CAST(ceil(0.95 * len(vs)) AS BIGINT)] END AS p95_est
         |FROM g""".stripMargin,

    "ev_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
        |FROM events GROUP BY user_id""".stripMargin,

    "ev_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |    epoch_us(CAST(ts AS TIMESTAMP))
        |      - epoch_us(CAST(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS TIMESTAMP)) AS gap_us
        |  FROM events)
        |SELECT user_id, count(*) AS n_gaps,
        |  min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us,
        |  CAST(sum(gap_us) AS DOUBLE) / count(*) AS mean_gap_us
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY user_id""".stripMargin,

    "ev_cumsum" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |    OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_value
        |FROM events""".stripMargin,

    "ev_first_touch" ->
      """SELECT user_id,
        |  arg_min(event_type, event_id) AS first_type,
        |  min(CAST(ts AS TIMESTAMP)) AS first_ts,
        |  min(event_id) AS first_event_id
        |FROM events GROUP BY user_id""".stripMargin,

    "ev_dedup_consec" ->
      """SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM (
        |  SELECT user_id, event_id, event_type, ts,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        |  FROM events)
        |WHERE prev_type IS NULL OR prev_type <> event_type""".stripMargin,

    "ev_histogram" ->
      """SELECT event_type, CAST(floor(value / 100.0) AS BIGINT) AS bucket,
        |  count(*) AS n, min(value) AS vmin, max(value) AS vmax
        |FROM events GROUP BY 1, 2""".stripMargin,

    "ev_densify" ->
      """WITH hourly AS (
        |  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, count(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |spans AS (
        |  SELECT event_type, unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h
        |  FROM hourly GROUP BY event_type)
        |SELECT s.event_type, s.h AS window_start, coalesce(cnt, 0) AS n
        |FROM spans s LEFT JOIN hourly USING (event_type, h)""".stripMargin,

    "ev_paths" ->
      """WITH ranked AS (
        |  SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events),
        |paths AS (
        |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
        |  FROM ranked WHERE rn <= 5 GROUP BY user_id)
        |SELECT path, count(*) AS n_users
        |FROM paths GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 20""".stripMargin,

    "ev_anomaly" ->
      """WITH stats AS (
        |  SELECT event_type AS t,
        |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mean,
        |    CASE WHEN count(*) > 1 THEN
        |      sqrt(greatest(
        |        (CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |         - CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
        |           * CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |        / (count(*) - 1), 0))
        |    END AS sd
        |  FROM events GROUP BY event_type)
        |SELECT event_id, event_type, value, (value - mean) / nullif(sd, 0) AS z
        |FROM events JOIN stats ON event_type = t
        |WHERE abs((value - mean) / nullif(sd, 0)) >= 3.0""".stripMargin,

    "ev_moving_avg" ->
      """SELECT user_id, event_id,
        |  CAST(sum(CAST(value AS DECIMAL(18,2)))
        |         OVER (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
        |  / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS avg3
        |FROM events""".stripMargin,

    "ev_first_last" ->
      """SELECT DISTINCT user_id,
        |  date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
        |  first_value(value) OVER w AS open_value,
        |  last_value(value) OVER w AS close_value
        |FROM events
        |WINDOW w AS (
        |  PARTITION BY user_id, date_trunc('hour', CAST(ts AS TIMESTAMP))
        |  ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,

    "ev_transitions" ->
      """SELECT event_type AS from_type, next_type AS to_type, count(*) AS n
        |FROM (
        |  SELECT event_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |  FROM events)
        |WHERE next_type IS NOT NULL
        |GROUP BY 1, 2""".stripMargin,

    "dq_uniqueness" ->
      """SELECT 'events' AS table_name, count(*) AS n_keys,
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_keys,
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT) AS n_dup_rows
        |FROM (SELECT event_id, count(*) AS c FROM events GROUP BY event_id)
        |UNION ALL
        |SELECT 'documents', count(*),
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |FROM (SELECT doc_id, count(*) AS c FROM documents GROUP BY doc_id)
        |UNION ALL
        |SELECT 'embeddings', count(*),
        |  CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT),
        |  CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS BIGINT)
        |FROM (SELECT vec_id, count(*) AS c FROM embeddings GROUP BY vec_id)""".stripMargin,

    "dq_volume" ->
      """WITH d AS (SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS n_events
        |  FROM events GROUP BY 1)
        |SELECT a.day, a.n_events, CAST(sum(b.n_events) AS BIGINT) AS trail7,
        |  CAST((a.n_events * 7 * 1000000) // sum(b.n_events) AS BIGINT) AS ratio_ppm
        |FROM d a JOIN d b ON b.day BETWEEN a.day - 6 AND a.day
        |GROUP BY a.day, a.n_events""".stripMargin,

    "dq_freshness" ->
      """WITH per AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
        |    CAST(max(epoch_us(CAST(ts AS TIMESTAMP))) AS BIGINT) AS latest_us
        |  FROM events GROUP BY event_type),
        |head AS (SELECT max(latest_us) AS head_us FROM per)
        |SELECT event_type, n_events, latest_us,
        |  CAST(head_us - latest_us AS BIGINT) AS lag_us
        |FROM per CROSS JOIN head""".stripMargin,

    "dq_completeness" ->
      """WITH ev AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN event_type IS NULL OR trim(event_type) = '' THEN 1 ELSE 0 END) AS BIGINT) AS m_type,
        |    CAST(sum(CASE WHEN props IS NULL OR trim(props) = '' THEN 1 ELSE 0 END) AS BIGINT) AS m_props,
        |    CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS m_value
        |  FROM events),
        |dc AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS m_text,
        |    CAST(sum(CASE WHEN lang IS NULL OR trim(lang) = '' THEN 1 ELSE 0 END) AS BIGINT) AS m_lang,
        |    CAST(sum(CASE WHEN source IS NULL OR trim(source) = '' THEN 1 ELSE 0 END) AS BIGINT) AS m_source
        |  FROM documents),
        |em AS (SELECT count(*) AS n,
        |    CAST(sum(CASE WHEN embedding IS NULL OR len(embedding) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m_emb
        |  FROM embeddings)
        |SELECT 'events' AS table_name, 'event_type' AS column_name, n AS n_rows,
        |  m_type AS n_missing, CAST(m_type AS DOUBLE) / n AS missing_frac FROM ev
        |UNION ALL SELECT 'events', 'props', n, m_props, CAST(m_props AS DOUBLE) / n FROM ev
        |UNION ALL SELECT 'events', 'value', n, m_value, CAST(m_value AS DOUBLE) / n FROM ev
        |UNION ALL SELECT 'documents', 'text', n, m_text, CAST(m_text AS DOUBLE) / n FROM dc
        |UNION ALL SELECT 'documents', 'lang', n, m_lang, CAST(m_lang AS DOUBLE) / n FROM dc
        |UNION ALL SELECT 'documents', 'source', n, m_source, CAST(m_source AS DOUBLE) / n FROM dc
        |UNION ALL SELECT 'embeddings', 'embedding', n, m_emb, CAST(m_emb AS DOUBLE) / n FROM em""".stripMargin,

    "dq_drift" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events),
        |b AS (SELECT min(us) + (max(us) - min(us)) // 2 AS mid FROM ev),
        |per AS (
        |  SELECT event_type,
        |    CAST(sum(CASE WHEN us > mid THEN 0 ELSE 1 END) AS BIGINT) AS n_a,
        |    CAST(sum(CASE WHEN us > mid THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        |  FROM ev CROSS JOIN b GROUP BY event_type),
        |tot AS (SELECT CAST(sum(n_a) AS BIGINT) AS ta, CAST(sum(n_b) AS BIGINT) AS tb FROM per)
        |SELECT event_type, n_a, n_b,
        |  CAST((n_a * 1000000) // ta AS BIGINT) AS ppm_a,
        |  CAST(CASE WHEN tb = 0 THEN NULL ELSE (n_b * 1000000) // tb END AS BIGINT) AS ppm_b,
        |  CAST(CASE WHEN tb = 0 THEN NULL
        |       ELSE abs((n_b * 1000000) // tb - (n_a * 1000000) // ta) END AS BIGINT) AS drift_ppm
        |FROM per CROSS JOIN tot""".stripMargin,

    "dq_integrity" ->
      """SELECT 'lineitem.orderkey->orders' AS fk_edge, count(*) AS n_orphans
        |FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
        |UNION ALL
        |SELECT 'orders.custkey->customer', count(*)
        |FROM orders WHERE NOT EXISTS (SELECT 1 FROM customer WHERE c_custkey = o_custkey)
        |UNION ALL
        |SELECT 'lineitem.partkey->part', count(*)
        |FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM part WHERE p_partkey = l_partkey)
        |UNION ALL
        |SELECT 'lineitem.suppkey->supplier', count(*)
        |FROM lineitem WHERE NOT EXISTS (SELECT 1 FROM supplier WHERE s_suppkey = l_suppkey)""".stripMargin,

    "ev_json_props" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |FROM events
        |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50""".stripMargin,

    "dq_kanon" ->
      s"""WITH q AS (
         |  SELECT event_type,
         |    coalesce(CAST(json_extract_string(props, '$$.k') AS BIGINT), -1) AS k,
         |    user_id
         |  FROM events),
         |g AS (SELECT event_type, k, count(DISTINCT user_id) AS nu
         |      FROM q GROUP BY event_type, k)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_combos,
         |  CAST(min(nu) AS BIGINT) AS min_users,
         |  CAST(sum(CASE WHEN nu < $KAnonK THEN 1 ELSE 0 END) AS BIGINT) AS n_risky
         |FROM g GROUP BY event_type""".stripMargin
  )
}
