package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables._

/** Window functions (SURVEY.md §2.3 `win_*`).
  *
  * In the reference every "per-group, order-aware" computation is a
  * hand-written streaming reducer over a sorted run (`reducer.py:16-40`,
  * relying on `Worker/worker.py:179-183`'s partition sort). Spark's window
  * operator is the declarative generalization: one shuffle on the partition
  * key, one in-partition sort, then a streaming frame evaluation — same
  * physical shape, but spillable (UnsafeExternalSorter) and codegen'd.
  *
  * Scale notes: the per-entity windows shuffle exactly once, on the
  * window partition key; the deliberate exceptions are the LOW-
  * CARDINALITY ranking queries (`win_rank`'s two-phase top-k and the
  * [[twoPassRank]] scaffold under `win_distribution`/`win_ntile`),
  * which spend a second, smaller exchange precisely so the whole fact
  * table never funnels into #distinct-group sort tasks. Determinism:
  * tie-broken total orders everywhere a `row_number` or ranking feeds
  * the result (SURVEY.md §5.2 discipline).
  */
object Windows {
  type Q = (SparkSession, String) => DataFrame

  /** Global per-group rank + group size over a TIE-BROKEN total order,
    * without a #groups-task window — the full-ranking dual of
    * `win_rank`'s two-phase top-k, for the distribution functions whose
    * partition key has a handful of values (a 3-value partitionBy over a
    * fact table funnels everything into 3 sort tasks at 100 TB). The
    * TWO-PASS prefix composition ([[TwoPass]]): range-partition on the
    * ORDER key (order-preserving across pids for any subset, so
    * within-group global order = (pid, local order) — the same boundary
    * invariance the scaffold's other consumers pin), local row_number
    * per (pid, group) in parallel, then per-(pid, group) counts —
    * a pid×#groups-sized relation — prefix-scanned into per-group
    * offsets and broadcast back. Because the order is tie-broken total,
    * rank = dense peers = row_number, so percent_rank/cume_dist/ntile
    * are all closed forms over (rn, n).
    */
  private def twoPassRank(df: DataFrame, grp: String,
                          ord: Seq[org.apache.spark.sql.Column])
      : DataFrame = {
    val part = TwoPass.rangedByPid(df, ord: _*)
    val local = part.withColumn("lrn", row_number().over(
      Window.partitionBy(col("pid"), col(grp)).orderBy(ord: _*)))
    // pid×#groups rows: the prefix/total windows below run over a
    // bounded relation (the composition's one deliberately tiny window)
    val cnt = part.groupBy(col("pid"), col(grp))
      .agg(count(lit(1)).as("c"))
    val off = cnt.select(col("pid"), col(grp),
      coalesce(sum(col("c")).over(
        Window.partitionBy(col(grp)).orderBy(col("pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
        .as("goff"),
      sum(col("c")).over(Window.partitionBy(col(grp))).as("gn"))
    // null-safe on the group key: groupBy and Window.partitionBy both
    // treat NULL as a real partition, so the offsets relation carries a
    // NULL-group row — a plain equi-join here would silently drop every
    // NULL-group input row (ADVICE r10, high). pid stays a plain equi-key
    // (spark_partition_id is never null).
    val offR = off.select(col("pid").as("o_pid"), col(grp).as("o_grp"),
      col("goff"), col("gn"))
    local.join(broadcast(offR),
        col("pid") === col("o_pid") && col(grp) <=> col("o_grp"))
      .drop("o_pid", "o_grp")
      .withColumn("rn", col("lrn") + col("goff"))
  }

  /** Spark-equivalent NTILE(k) closed form over (rn, n): the first
    * n mod k tiles carry ⌈n/k⌉ rows, the rest ⌊n/k⌋ — evaluated only
    * on the branch whose divisor is nonzero. Spark's `/` on integral
    * types is DOUBLE division, so quotients are made exact by
    * subtracting the remainder first; the cast-long truncation of the
    * remaining non-exact quotients is a true floor (operands
    * non-negative, true quotient never within an ulp of an integer).
    */
  private def ntileExpr(rn: org.apache.spark.sql.Column,
                        n: org.apache.spark.sql.Column, k: Int)
      : org.apache.spark.sql.Column = {
    val r = n % k
    val q = ((n - r) / k).cast("long")
    val big = r * (q + 1)
    when(rn <= big, ((rn - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + ((rn - big - 1) / greatest(q, lit(1L))).cast("long")
        + 1)
      .cast("int")
  }

  val queries: Map[String, Q] = Map(
    // rank / dense_rank / row_number per group, top-50. l_returnflag has
    // ~3 distinct values, so a single window partitioned on it funnels the
    // whole fact table into 3 sort tasks — a scale-killer at 100 TB
    // (round-1 verdict). Two-phase top-k instead:
    //   phase 1: local top-50 per (flag, input-partition) — the window key
    //     has 3×P values, so the full-data shuffle spreads over all
    //     reducers and each task sorts ~1/P of the data;
    //   phase 2: the global flag-window runs over ≤ 50×P survivors.
    // Lossless for all three ranks: the phase-1 cut uses the same total
    // order, and a dropped row (a) can never reach the global top-50 and
    // (b) ties on the full ORDER BY with no kept row, so rank()/
    // dense_rank() of every surviving row are unchanged.
    "win_rank" -> ((s, d) => {
      val ord: Array[org.apache.spark.sql.Column] = Array(
        col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val localW = Window
        .partitionBy(col("l_returnflag"), spark_partition_id())
        .orderBy(ord: _*)
      val w = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
      lineitem(s, d)
        .withColumn("lrn", row_number().over(localW))
        .filter(col("lrn") <= 50)
        .drop("lrn")
        .withColumn("rnk", rank().over(w))
        .withColumn("drnk", dense_rank().over(w))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 50)
        .select(col("l_returnflag"), col("rn"), col("rnk"), col("drnk"),
                col("l_orderkey"), col("l_linenumber"))
        .orderBy("l_returnflag", "rn")
    }),

    // Top-k per group — the scalable "greatest-n-per-group": no global
    // sort, just one hash shuffle + per-partition heapless sort, and the
    // filter drops everything past k before any further stage.
    "win_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("rn"), col("o_orderkey"),
                col("o_totalprice"))
        .orderBy("o_custkey", "rn")
    }),

    // Running sum + moving average over trailing ROW frames per user
    // (4-row trailing window — for value-defined trailing TIME
    // semantics see win_range_frame below; bursty same-timestamp events
    // make the two genuinely different).
    "win_running" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val cum = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = ord.rowsBetween(-3, Window.currentRow)
      events(s, d)
        .select(col("event_id"),
          round(sum(col("value")).over(cum), 4).as("run_sum"),
          round(avg(col("value")).over(mov), 4).as("mov_avg"))
        .orderBy("event_id")
    }),

    // Time-RANGE frame (vs the row frames above): per user, aggregate
    // every event inside the trailing 30 MINUTES — the frame is defined
    // by the ordering VALUE, not a row count, so equal timestamps are
    // frame peers and sparse/bursty streams get the correct window either
    // way. Spark's rangeBetween needs a numeric ordering key: order on
    // unix_micros(ts) with a -30min..0 microsecond frame, the full
    // precision of the engine's timestamp, matching DuckDB's RANGE
    // BETWEEN INTERVAL '30 minutes' PRECEDING at every boundary that is
    // representable in micros (an epoch-SECONDS key would widen the frame
    // for any row sharing the boundary second with the exact cutoff).
    // Only the float summation order may differ, absorbed by the rounding.
    "win_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")))
        .rangeBetween(-1800000000L, Window.currentRow)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          round(sum(col("value")).over(w), 4).as("sum_30m"),
          count(lit(1)).over(w).as("n_30m"))
        .orderBy("event_id")
    }),

    // Distribution functions: percent_rank / cume_dist / ntile quartiles
    // per group. The ORDER BY is tie-broken to a total order (unique
    // o_orderkey) so all three are deterministic and engine-independent
    // — and that same total order is what lets the r10 plan drop the
    // #groups-task window: o_orderstatus has ~3 values, so the old
    // partitionBy(status) funneled the whole orders table into 3 sort
    // tasks (the exact shape win_rank's comment brands the round-1
    // scale-killer). [[twoPassRank]] yields the identical (rn, n) per
    // status via the range-partitioned two-pass prefix composition, and
    // with rank = row_number (tie-broken order) the three functions are
    // closed forms: pr = (rn−1)/(n−1), cd = rn/n, ntile per
    // [[ntileExpr]] — the same doubles Spark's window operators compute,
    // so the oracle hash is unchanged. Honest local cost: 1.4→2.4 s at
    // sf0.1 (the range exchange + offsets broadcast are pure overhead
    // while 3 sort tasks still fit the data) — the same
    // pay-at-toy-scale/survive-at-100 TB trade as the blocked
    // near-embedding default.
    "win_distribution" -> ((s, d) => {
      twoPassRank(
        orders(s, d).select(col("o_orderkey"), col("o_orderstatus"),
          col("o_totalprice")),
        "o_orderstatus",
        Seq(col("o_totalprice"), col("o_orderkey")))
        .select(col("o_orderkey"), col("o_orderstatus"),
          // division results → floor spelling (see win_ratio_to_report)
          (floor(when(col("gn") > 1,
            (col("rn") - 1).cast("double") / (col("gn") - 1))
            .otherwise(0.0) * 1e6 + 0.5) / 1e6).as("pr"),
          (floor(col("rn").cast("double") / col("gn") * 1e6 + 0.5) / 1e6)
            .as("cd"),
          ntileExpr(col("rn"), col("gn"), 4).as("quartile"))
        .orderBy("o_orderkey")
    }),

    // first_value / last_value / nth_value with an explicit full-frame:
    // each user's first, latest, and second event against every row —
    // the "compare to baseline" window shape. last_value NEEDS the
    // unbounded-following frame (the default frame ends at CURRENT ROW,
    // where last_value degenerates to the row itself — a classic
    // correctness trap both engines share, so the oracle pins the
    // explicit frame too). Ordering tie-broken by event_id → total
    // order → deterministic in both engines.
    "win_first_last" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          first(col("event_id")).over(w).as("first_ev"),
          last(col("event_id")).over(w).as("last_ev"),
          nth_value(col("event_id"), 2).over(w).as("second_ev"))
        .orderBy("event_id")
    }),

    // NTILE quartiles per segment — the rank-based bucketing a feature
    // pipeline uses for quantile binning without computing quantiles
    // (equal-COUNT buckets, earlier buckets absorb the remainder — both
    // engines share the ANSI definition). Total order (balance, key)
    // makes the bucket assignment deterministic under balance ties.
    // Same two-pass shape as win_distribution: c_mktsegment has ~5
    // values, so the single-window form is the low-cardinality funnel.
    // repartitionByRange orders ASC NULLS FIRST, matching the window's
    // explicit null ordering.
    "win_ntile" -> ((s, d) => {
      twoPassRank(
        customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal")),
        "c_mktsegment",
        Seq(asc_nulls_first("c_acctbal"), col("c_custkey")))
        .select(col("c_custkey"), col("c_mktsegment"),
          ntileExpr(col("rn"), col("gn"), 4).as("bal_quartile"))
        .orderBy("c_custkey")
    }),

    // SCD-2 validity intervals (slowly-changing-dimension type 2): each
    // order becomes a version row [eff_from, eff_to) per customer, closed
    // by the NEXT version's start via lead(); the open current version
    // carries eff_to NULL. The warehouse temporal-versioning build, as a
    // single per-entity window — one exchange on the entity key, no
    // self-join (the naive form joins each row to its successor). Ties
    // on the date are broken by the order key, so intervals are
    // deterministic under same-day updates.
    "win_scd2" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          col("o_orderdate").as("eff_from"),
          lead(col("o_orderdate"), 1).over(w).as("eff_to"),
          lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
        .orderBy("o_custkey", "eff_from", "o_orderkey")
    }),

    // RATIO-TO-REPORT: each event's share of its user's total — the
    // classic reporting window (value / sum over partition). Full-frame
    // sum, one user exchange; the total is exact-per-partition double
    // summation whose order may differ between engines, absorbed by the
    // rounding (shares are O(1), ulps at 1e-16). The zero-total guard
    // returns NULL for an all-zero user (value = 0 rows EXIST at sf0.1)
    // instead of the asymmetric ANSI-error/inf split the sibling window
    // guards all prevent.
    "win_ratio_to_report" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val tot = sum(col("value")).over(w)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          // floor(x·1e6 + 0.5), not round(): this column is a DIVISION
          // result, the class where win_pct_change measured the two
          // engines' round() disagreeing on a representable
          // half-boundary — the floor spelling is the identical IEEE
          // expression on both sides (ties toward +∞, measure-zero)
          (when(tot =!= 0.0,
            floor(col("value") / tot * 1e6 + 0.5) / 1e6) + lit(0.0))
            .as("share"))
        .orderBy("event_id")
    }),

    // Period-over-period PERCENT CHANGE per entity — the reporting
    // staple: (value − prev)/prev against the previous observation in
    // event-time order. First row per user is NULL (no prior), and a
    // zero prior is guarded to NULL on both engines (the ANSI
    // divide-by-zero class; the sf0.1 events fixture CONTAINS value=0
    // rows, so the guard is load-bearing at bench scale, not merely
    // contractual). Truncation is FLOOR-based, not round(): both
    // engines compute the identical ratio double, and floor of the
    // identical double is bit-identical, while round() hit a decimal
    // half-boundary (8.0046875) where the engines' rounding modes
    // disagree. One user exchange, same shape as win_lag_lead.
    "win_pct_change" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prev = lag(col("value"), 1).over(w)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          (when(prev.isNotNull && prev =!= 0.0,
            floor(((col("value") - prev) / prev) * 1e6) / 1e6)
            + lit(0.0)).as("pct_change"))
        .orderBy("event_id")
    }),

    // Per-entity STANDARDIZATION (z-score): each event's value relative
    // to its user's mean/stddev — the feature-engineering normalization
    // before any scale-sensitive model. One whole-partition window (no
    // ORDER BY → full-frame aggregates, a single user exchange); the
    // sd = 0 / sd NULL guard returns NULL instead of the ANSI
    // divide-by-zero a constant-valued or single-event user would
    // otherwise trigger (same hazard class as win_time_weighted).
    "win_zscore" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      val mu = avg(col("value")).over(w)
      val sd = stddev_samp(col("value")).over(w)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          // division result → floor spelling (see win_ratio_to_report)
          (when(sd.isNotNull && sd =!= 0.0,
            floor((col("value") - mu) / sd * 1e6 + 0.5) / 1e6)
            + lit(0.0)).as("z"))
        .orderBy("event_id")
    }),

    // TIME-WEIGHTED average (the TWAP mechanism): each observation is
    // weighted by how long it remained current — sum(value·Δt)/sum(Δt)
    // with Δt from lead(ts) — so irregular sampling stops biasing the
    // mean toward burst periods (the flaw of a plain avg over an
    // event stream). The last observation per user carries no duration
    // and is excluded on BOTH engines; so are ZERO-duration rows
    // (same-timestamp bursts) — they contribute 0 to both sums, so the
    // value is unchanged, but keeping them would let a user whose
    // events all share one timestamp drive sum(dur) to 0 and the ANSI
    // division to a runtime error instead of an absent group. One
    // exchange total: the window
    // partitions by user_id and the following groupBy reuses that
    // hash partitioning — Spark plans no second shuffle.
    "win_time_weighted" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("value"),
          (unix_micros(lead(col("ts"), 1).over(w))
            - unix_micros(col("ts"))).as("dur"))
        .filter(col("dur") > 0)
        .groupBy(col("user_id"))
        // division result → floor spelling (see win_ratio_to_report)
        .agg((floor(sum(col("value") * col("dur")) / sum(col("dur"))
          * 1e6 + 0.5) / 1e6 + lit(0.0)).as("twa"))
        .orderBy("user_id")
    }),

    // Moving MEDIAN over a bounded rows-frame (per-user smoothing of the
    // metric stream — the robust twin of a moving average, immune to a
    // single spike). `percentile(·, 0.5)` as a WINDOW aggregate: Spark
    // evaluates the exact interpolated percentile per frame; with a
    // 4-row frame that is O(1) state per row, so the cost is the one
    // per-user partition exchange any per-entity window needs — frame
    // width, not history length, bounds memory at 100 TB. DuckDB's
    // `median` interpolates identically (avg of the two middle values on
    // even counts).
    "win_moving_median" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-3, 0)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          (round(expr("percentile(value, 0.5)").over(w), 6) + lit(0.0))
            .as("mov_med"))
        .orderBy("event_id")
    }),

    // Per-row EWMA over each user's event stream — the online-smoothing
    // feature a monitoring/feature pipeline computes next to the raw
    // value (agg_decay is the AGGREGATED decayed total; this is the
    // per-row series). The recursion y_t = αx_t + (1−α)y_{t−1} is
    // closed-form over a bounded 12-row window: Σ x_i·(1−α)^(n−1−i)
    // · α / (1 − (1−α)^n) — the finite-window normalized EWMA, exactly
    // expressible (and oracle-replayable) with a collected window list +
    // one indexed fold, no recursion. Scale shape: ONE exchange on the
    // entity key, bounded 12-element frame state per row.
    "win_ewma" -> ((s, d) => {
      // α = 0.3, 1−α SPELLED as the literal 0.7 (computing 1.0 − 0.3
      // differs from the parsed 0.7 in the last ulp, and the oracle
      // parses literals)
      val a = lit(0.3)
      val oneMinusA = lit(0.7)
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id")).rowsBetween(-11, 0)
      events(s, d)
        .select(col("event_id"), col("user_id"),
          collect_list(col("value")).over(w).as("win"))
        .select(col("event_id"), col("user_id"),
          // collect_list SKIPS nulls: an all-null frame is EMPTY, and
          // 1 − 0.7⁰ = 0 would divide by zero under ANSI — null out
          // the smoothed value exactly when there is nothing to smooth
          when(size(col("win")) > 0,
            floor(
              aggregate(
                transform(col("win"), (x, i) =>
                  x * pow(oneMinusA, size(col("win")) - 1 - i)),
                lit(0.0), (acc, x) => acc + x)
                * a / (lit(1.0) - pow(oneMinusA, size(col("win"))))
                * 1e6 + 0.5)).as("ewma_ppm"))
        .orderBy("event_id")
    }),

    // Time-series gap filling: densify each user's metric stream onto an
    // hourly grid between that user's first and last active hour, then
    // forward-fill the last observed value across the gaps. The r10 plan
    // is GAP EMISSION, not grid-join: windows (forward-fill + lag, one
    // spec → one exchange + sort) run over the SPARSE per-hour relation,
    // and each observed row then explodes the hours since its
    // predecessor, carrying the predecessor's filled value into the gap
    // — the dense grid is born as a map-side explode that never
    // shuffles. The retired form generated the grid from per-user
    // (lo, hi) bounds and LEFT-JOINED the sparse relation back, which
    // shuffled the DENSE relation twice (join + fill window) — at sf1
    // that is 2×20M rows of exchange for the same output. Grid size
    // stays bounded by each entity's own time span, never the global
    // corpus span, so a 100 TB corpus of short-lived entities stays
    // linear. `observed` marks real hours (null-summed hours count as
    // unobserved, matching the grid-join's `ph.v IS NOT NULL`) so
    // downstream consumers can distinguish carried values.
    "win_gap_fill" -> ((s, d) => {
      // ts.isNotNull: a null-timestamp event would form an h=null group
      // that the grid-join form (and the oracle's grid, built from
      // null-ignoring min/max bounds) silently drops — gap emission
      // would instead emit a spurious (h=null, observed=null) row. The
      // filter pins the drop explicitly AND pushes to the scan.
      val perHour = events(s, d)
        .filter(col("ts").isNotNull)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(round(sum(col("value")), 4).as("v"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      // ff = running last non-null value INCLUDING this hour; prev_ff =
      // the same as of the previous observed hour (stacked windows, same
      // spec — the planner reuses one exchange + sort)
      val sparse = perHour
        .withColumn("ff", last(col("v"), ignoreNulls = true)
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("prev_h", lag(col("h"), 1).over(w))
        .withColumn("prev_ff", lag(col("ff"), 1).over(w))
      sparse
        .select(col("user_id"), col("h"), col("v"), col("ff"),
          col("prev_ff"),
          explode(when(col("prev_h").isNull, array(col("h")))
            .otherwise(sequence(col("prev_h") + expr("interval 1 hour"),
              col("h"), expr("interval 1 hour")))).as("gh"))
        .select(col("user_id"),
          col("gh").as("h"),
          (col("gh") === col("h") && col("v").isNotNull).as("observed"),
          when(col("gh") === col("h"), col("ff")).otherwise(col("prev_ff"))
            .as("v_ff"))
        .orderBy("user_id", "h")
    }),

    // Conditional running total with reset: per user, the value sum since
    // the most recent 'purchase' event (inclusive — the purchase opens its
    // own segment). Two stacked windows: a running conditional count
    // assigns the segment id, then the sum windows over (user, segment).
    // The second window's partition key is a SUPERSET of the first's, so
    // hash(user_id) already satisfies its clustering — one exchange total,
    // the second window adds only a sort (no re-shuffle at any scale).
    "win_cumsum_reset" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val seg = sum(when(col("event_type") === "purchase", 1).otherwise(0))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow))
      val segW = Window.partitionBy(col("user_id"), col("seg"))
        .orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("seg", seg)
        .select(col("event_id"), col("user_id"), col("seg"),
          round(sum(col("value")).over(segW), 4).as("run_since_purchase"))
        .orderBy("event_id")
    }),

    // Batch sessionization: tag every event with its session ORDINAL per
    // user (30-minute inactivity gap) — the per-event twin of
    // stream_session's per-session aggregate, and the id a feature
    // pipeline joins on. Gaps-and-islands: a lag-based new-session flag,
    // then a running sum of flags. Both windows share the user partition
    // key, so it is one exchange + one sort; gap arithmetic in exact
    // integer micros.
    "win_sessionize" -> ((s, d) => {
      val ord = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val prevTs = lag(col("ts"), 1).over(ord)
      val newSess = when(prevTs.isNull
        || unix_micros(col("ts")) - unix_micros(prevTs) > 1800000000L, 1)
        .otherwise(0)
      val run = ord.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)
      events(s, d)
        .withColumn("new_sess", newSess)
        .select(col("event_id"), col("user_id"),
          sum(col("new_sess")).over(run).as("session_no"))
        .orderBy("event_id")
    }),

    // lag/lead: inter-event deltas per user in microseconds (exact integer
    // arithmetic — no float drift between engines).
    "win_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"))
        .orderBy("event_id")
    })
  )

  val oracle: Map[String, String] = Map(
    // Same collected 12-row frame, same indexed fold, same 0.3/0.7
    // literals, same floor(x·1e6 + 0.5) integerization. DuckDB's list()
    // keeps NULLs where Spark's collect_list drops them — the frame is
    // the same 12 ROWS, so collect first, then list_filter the NULLs
    // out (pre-filtering ROWS would change the frame), and null the
    // result on an empty filtered list exactly as the engine does.
    "win_ewma" ->
      """WITH f0 AS (
        |  SELECT event_id, user_id,
        |    list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN 11 PRECEDING AND CURRENT ROW) AS raw
        |  FROM events),
        |f AS (SELECT event_id, user_id,
        |        list_filter(raw, x -> x IS NOT NULL) AS win FROM f0)
        |SELECT event_id, user_id,
        |  CASE WHEN len(win) > 0 THEN CAST(floor(
        |    list_sum([win[i] * pow(0.7, len(win) - i)
        |              for i in range(1, len(win) + 1)])
        |      * 0.3 / (1.0 - pow(0.7, len(win))) * 1e6 + 0.5) AS BIGINT)
        |  ELSE NULL END AS ewma_ppm
        |FROM f ORDER BY event_id""".stripMargin,
    "win_ratio_to_report" ->
      """SELECT event_id, user_id,
        |  CASE WHEN sum(value) OVER (PARTITION BY user_id) = 0 THEN NULL
        |    ELSE floor(value / sum(value) OVER (PARTITION BY user_id)
        |           * 1e6 + 0.5) / 1e6 + 0.0 END AS share
        |FROM events ORDER BY event_id""".stripMargin,
    "win_pct_change" ->
      """WITH s AS (
        |  SELECT event_id, user_id, value,
        |    lag(value) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS prev
        |  FROM events)
        |SELECT event_id, user_id,
        |  CASE WHEN prev IS NULL OR prev = 0 THEN NULL
        |    ELSE floor(((value - prev) / prev) * 1e6) / 1e6 + 0.0
        |    END AS pct_change
        |FROM s ORDER BY event_id""".stripMargin,
    "win_zscore" ->
      """WITH s AS (
        |  SELECT event_id, user_id, value,
        |    avg(value) OVER (PARTITION BY user_id) AS mu,
        |    stddev_samp(value) OVER (PARTITION BY user_id) AS sd
        |  FROM events)
        |SELECT event_id, user_id,
        |  CASE WHEN sd IS NULL OR sd = 0 THEN NULL
        |    ELSE floor((value - mu) / sd * 1e6 + 0.5) / 1e6 + 0.0 END AS z
        |FROM s ORDER BY event_id""".stripMargin,
    "win_time_weighted" ->
      """WITH seq AS (
        |  SELECT user_id, value,
        |    epoch_us(lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id)) - epoch_us(ts) AS dur
        |  FROM events)
        |SELECT user_id,
        |  floor(sum(value * dur) / sum(dur) * 1e6 + 0.5) / 1e6 + 0.0
        |    AS twa
        |FROM seq WHERE dur > 0
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "win_rank" ->
      """SELECT l_returnflag, CAST(rn AS INTEGER) AS rn,
        |  CAST(rnk AS INTEGER) AS rnk, CAST(drnk AS INTEGER) AS drnk,
        |  l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_orderkey, l_linenumber,
        |    rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
        |    row_number() OVER w AS rn
        |  FROM lineitem
        |  WINDOW w AS (PARTITION BY l_returnflag
        |    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber))
        |WHERE rn <= 50 ORDER BY l_returnflag, rn""".stripMargin,
    "win_topk_per_group" ->
      """SELECT o_custkey, CAST(rn AS INTEGER) AS rn, o_orderkey,
        |  o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,
    "win_running" ->
      """SELECT event_id,
        |  round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum,
        |  round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
        |FROM events ORDER BY event_id""".stripMargin,
    "win_range_frame" ->
      """SELECT event_id, user_id,
        |  round(sum(value) OVER w, 4) AS sum_30m,
        |  count(*) OVER w AS n_30m
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |  RANGE BETWEEN INTERVAL '30 minutes' PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
    "win_distribution" ->
      """SELECT o_orderkey, o_orderstatus,
        |  floor(percent_rank() OVER w * 1e6 + 0.5) / 1e6 AS pr,
        |  floor(cume_dist() OVER w * 1e6 + 0.5) / 1e6 AS cd,
        |  CAST(ntile(4) OVER w AS INTEGER) AS quartile
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderstatus
        |  ORDER BY o_totalprice, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin,
    "win_first_last" ->
      """SELECT event_id, user_id,
        |  first_value(event_id) OVER w AS first_ev,
        |  last_value(event_id) OVER w AS last_ev,
        |  nth_value(event_id, 2) OVER w AS second_ev
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY event_id""".stripMargin,
    "win_lag_lead" ->
      """SELECT event_id,
        |  lag(event_id, 1) OVER w AS prev_id,
        |  lead(event_id, 1) OVER w AS next_id,
        |  epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,
    "win_ntile" ->
      """SELECT c_custkey, c_mktsegment,
        |  CAST(ntile(4) OVER (PARTITION BY c_mktsegment
        |    ORDER BY c_acctbal ASC NULLS FIRST, c_custkey)
        |    AS INTEGER) AS bal_quartile
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "win_scd2" ->
      """SELECT o_custkey, o_orderkey,
        |  o_orderdate AS eff_from,
        |  lead(o_orderdate, 1) OVER w AS eff_to,
        |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |  ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, eff_from, o_orderkey""".stripMargin,
    "win_moving_median" ->
      """SELECT event_id, user_id,
        |  round(median(value) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) + 0.0 AS mov_med
        |FROM events ORDER BY event_id""".stripMargin,
    "win_gap_fill" ->
      """WITH ph AS (
        |  SELECT user_id, date_trunc('hour', ts) AS h,
        |    round(sum(value), 4) AS v
        |  FROM events GROUP BY 1, 2),
        |bounds AS (SELECT user_id, min(h) AS lo, max(h) AS hi
        |           FROM ph GROUP BY 1),
        |grid AS (SELECT user_id,
        |           unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
        |         FROM bounds)
        |SELECT g.user_id, g.h, ph.v IS NOT NULL AS observed,
        |  last_value(ph.v IGNORE NULLS) OVER (PARTITION BY g.user_id
        |    ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_ff
        |FROM grid g LEFT JOIN ph ON ph.user_id = g.user_id AND ph.h = g.h
        |ORDER BY g.user_id, g.h""".stripMargin,
    "win_sessionize" ->
      """SELECT event_id, user_id,
        |  CAST(sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_no
        |FROM (
        |  SELECT *, CASE WHEN lag(ts, 1) OVER w IS NULL
        |      OR epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) > 1800000000
        |    THEN 1 ELSE 0 END AS new_sess
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
        |ORDER BY event_id""".stripMargin,
    "win_cumsum_reset" ->
      """SELECT event_id, user_id, seg,
        |  round(sum(value) OVER (PARTITION BY user_id, seg
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
        |    AS run_since_purchase
        |FROM (
        |  SELECT *, CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
        |                          ELSE 0 END) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS seg
        |  FROM events)
        |ORDER BY event_id""".stripMargin
  )
}
