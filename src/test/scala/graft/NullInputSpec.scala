package graft

import org.apache.spark.sql.functions._

/** Null-input robustness sweep: every query must run against tables whose
  * VALUE columns carry nulls (keys stay non-null — a null key is an
  * upstream-contract violation; a null payload/measure is Tuesday).
  *
  * The fixtures are null-free, so operators have never been exercised on
  * the real-world case: text that failed extraction, events without a
  * payload, measures that didn't parse. Each nullable column is nulled on
  * a deterministic ~10% slice. No-throw is the contract under test —
  * null-PROPAGATION semantics per expression live in ExprSpec.
  */
class NullInputSpec extends SparkSpec {

  private lazy val nulledDir: String = {
    val dir = SparkSpec.scratchDir("graft_nulls")
    def copy(name: String, holes: Map[String, String]): Unit = {
      val base = Tables.t(spark, sfDir, name)
      val out = holes.foldLeft(base) { case (df, (c, cond)) =>
        df.withColumn(c, when(expr(cond), lit(null)).otherwise(col(c)))
      }
      out.write.mode("overwrite").parquet(s"$dir/$name.parquet")
    }
    copy("region", Map.empty)
    copy("nation", Map("n_name" -> "n_nationkey % 7 = 3"))
    copy("customer", Map("c_mktsegment" -> "c_custkey % 11 = 3",
      "c_acctbal" -> "c_custkey % 13 = 3"))
    copy("supplier", Map("s_name" -> "s_suppkey % 7 = 3"))
    copy("part", Map("p_name" -> "p_partkey % 7 = 3"))
    copy("orders", Map("o_totalprice" -> "o_orderkey % 11 = 3",
      "o_orderstatus" -> "o_orderkey % 13 = 3"))
    copy("lineitem", Map("l_discount" -> "l_orderkey % 11 = 3",
      "l_quantity" -> "l_orderkey % 13 = 3"))
    copy("events", Map("value" -> "event_id % 11 = 3",
      "props" -> "event_id % 13 = 3",
      "event_type" -> "event_id % 17 = 3"))
    copy("documents", Map("text" -> "doc_id % 11 = 3",
      "lang" -> "doc_id % 13 = 3"))
    copy("embeddings", Map("embedding" -> "vec_id % 11 = 3"))
    dir
  }

  test("every query survives null value columns (no-throw contract)") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try {
          fn(spark, nulledDir).write.format("noop").mode("overwrite").save()
          InternalCaches.unpersistAll()
          None
        } catch {
          case e: Throwable =>
            InternalCaches.unpersistAll()
            Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.next()}")
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries threw on nulled input:\n${failures.mkString("\n")}")
  }

  test("window family: row parity on nulled input (silent-drop net)") {
    // r11 verdict item 5: the no-throw sweep cannot see a silent row
    // drop — exactly the class of the twoPassRank null-group-key bug
    // (a plain equi-join back to per-group offsets drops the NULL
    // partition that Window.partitionBy keeps). Every per-event window
    // annotation query has a structural row-parity contract: ONE output
    // row per input event, no matter what the value/type columns hold.
    // Nulled `value` and `event_type` (the nulled fixture's 10% slices)
    // must not change the count; any mismatch is a dropped (or
    // duplicated) partition in a hand-rolled scale path.
    val nEvents = Tables.events(spark, nulledDir).count()
    val rowPreserving = Seq("win_running", "win_range_frame",
      "win_first_last", "win_ratio_to_report", "win_pct_change",
      "win_zscore", "win_moving_median", "win_ewma", "win_cumsum_reset",
      "win_sessionize", "win_lag_lead")
    val bad = rowPreserving.flatMap { k =>
      val n = SparkEntry.queries(k)(spark, nulledDir).count()
      InternalCaches.unpersistAll()
      if (n == nEvents) None else Some(s"$k: $n rows vs $nEvents events")
    }
    assert(bad.isEmpty,
      s"row-preserving window queries changed cardinality on nulled " +
        s"input:\n${bad.mkString("\n")}")
  }

  test("grouped-agg family: NULL group survives nulled group keys") {
    // Same detector for the groupBy side: when the GROUP column itself
    // is nulled (o_orderstatus, event_type, lang carry the 10% slice),
    // SQL semantics make NULL a real group — output cardinality must
    // equal the distinct count INCLUDING the null group. A two-pass or
    // salted rewrite that equi-joins on the group key silently loses
    // that group; count parity against an independent distinct() sees
    // it where no-throw cannot.
    val cases = Seq(
      ("agg_count_distinct", "orders", "o_orderstatus"),
      ("agg_mode", "orders", "o_orderstatus"),
      ("agg_bitmap_distinct", "events", "event_type"),
      ("agg_arg_extrema", "events", "event_type"),
      ("agg_collect_set", "documents", "lang"))
    val bad = cases.flatMap { case (k, table, groupCol) =>
      val want = Tables.t(spark, nulledDir, table)
        .select(groupCol).distinct().count()
      val got = SparkEntry.queries(k)(spark, nulledDir).count()
      InternalCaches.unpersistAll()
      if (got == want) None
      else Some(s"$k: $got groups vs $want distinct $table.$groupCol")
    }
    assert(bad.isEmpty,
      s"grouped aggs lost/minted groups on nulled group keys:\n" +
        bad.mkString("\n"))
  }

  test("win_gap_fill: null-summed hours fill like gaps (gap emission == grid-join)") {
    // The r10 gap-emission rewrite's one semantic cliff is an hour that
    // HAS events but whose sum is null (every event in it carries a null
    // value): the original grid-join form marks it observed=false and
    // carries the previous fill across it. The shipped fixtures are
    // null-free, so the DuckDB oracle never exercises this edge — plant
    // it: user 1 has an observed hour, a silent gap, a NULL-summed hour,
    // another gap, then an observed hour; user 2 STARTS on a null-summed
    // hour (fill starts null).
    import spark.implicits._
    val dir = SparkSpec.scratchDir("graft_gapfill_nulls")
    def ev(id: Long, u: Long, hour: Int, v: java.lang.Double) =
      (id, java.sql.Timestamp.valueOf(f"2024-01-01 $hour%02d:30:00"),
        u, "view", v, "{}")
    Seq(
      ev(1, 1L, 0, 10.0), ev(2, 1L, 0, 2.5), // observed h0, v=12.5
      ev(3, 1L, 2, null),                    // h2: events, null sum
      ev(4, 1L, 5, 7.0),                     // observed h5
      ev(5, 2L, 1, null),                    // user 2 STARTS null
      ev(6, 2L, 3, 4.0),
      // null TIMESTAMP: the grid-join form (and the oracle) silently
      // drop the h=null group — gap emission must too, not emit a
      // spurious (h=null, observed=null) row
      (7L, null.asInstanceOf[java.sql.Timestamp], 1L, "view",
        java.lang.Double.valueOf(99.0), "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("win_gap_fill")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getBoolean(2), Option(r.get(3)).map(_.toString).orNull))
    // hand-pinned: null-summed hours are unobserved and transparent to
    // the forward fill; a leading null fill stays null until the first
    // real observation
    val want = Array(
      (1L, "2024-01-01 00:00:00.0", true, "12.5"),
      (1L, "2024-01-01 01:00:00.0", false, "12.5"),
      (1L, "2024-01-01 02:00:00.0", false, "12.5"),
      (1L, "2024-01-01 03:00:00.0", false, "12.5"),
      (1L, "2024-01-01 04:00:00.0", false, "12.5"),
      (1L, "2024-01-01 05:00:00.0", true, "7.0"),
      (2L, "2024-01-01 01:00:00.0", false, null),
      (2L, "2024-01-01 02:00:00.0", false, null),
      (2L, "2024-01-01 03:00:00.0", true, "4.0"))
    assert(got.toSeq == want.toSeq,
      s"got:\n${got.mkString("\n")}\nwant:\n${want.mkString("\n")}")
    // and the retired grid-join reference agrees row-for-row on the
    // nulled 10%-slice relation too (regression net wider than the
    // planted rows)
    import org.apache.spark.sql.expressions.Window
    val perHour = Tables.events(spark, nulledDir)
      .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
      .agg(round(sum(col("value")), 4).as("v"))
    val grid = perHour.groupBy("user_id")
      .agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
      .select(col("user_id"),
        explode(sequence(col("lo"), col("hi"), expr("interval 1 hour")))
          .as("h"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ref = grid.join(perHour, Seq("user_id", "h"), "left")
      .select(col("user_id"), col("h"),
        col("v").isNotNull.as("observed"),
        last(col("v"), ignoreNulls = true).over(w).as("v_ff"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getBoolean(2),
        Option(r.get(3)))).toSet
    val gotFull = SparkEntry.queries("win_gap_fill")(spark, nulledDir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getBoolean(2),
        Option(r.get(3)))).toSet
    assert(ref.nonEmpty && gotFull == ref,
      s"gap emission vs grid-join: only-got=${(gotFull -- ref).take(5)} " +
        s"only-ref=${(ref -- gotFull).take(5)}")
  }

  test("twoPassRank keeps NULL group keys (win_distribution/win_ntile row parity)") {
    // ADVICE r10 (high): the two-pass scaffold's offsets join must be
    // null-safe on the group column — groupBy/Window.partitionBy keep
    // NULL as a real partition, a plain equi-join drops it. The nulled
    // fixtures null exactly these group columns (o_orderstatus,
    // c_mktsegment), so row parity with the base relation is the direct
    // detector the no-throw sweep can't see.
    import org.apache.spark.sql.expressions.Window
    val nOrders = Tables.orders(spark, nulledDir).count()
    val dist = SparkEntry.queries("win_distribution")(spark, nulledDir)
    assert(dist.count() == nOrders,
      s"win_distribution dropped rows on nulled group keys: " +
        s"${dist.count()} vs $nOrders")
    // and the values match the retired single-window form row-for-row
    val wD = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val refD = Tables.orders(spark, nulledDir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        (floor(percent_rank().over(wD) * 1e6 + 0.5) / 1e6).as("pr"),
        (floor(cume_dist().over(wD) * 1e6 + 0.5) / 1e6).as("cd"),
        ntile(4).over(wD).as("quartile"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getDouble(2),
        r.getDouble(3), r.getInt(4))).toSet
    val gotD = dist.collect().map(r => (r.getLong(0), Option(r.get(1)),
      r.getDouble(2), r.getDouble(3), r.getInt(4))).toSet
    assert(gotD == refD,
      s"win_distribution vs single-window: only-got=${(gotD -- refD).take(5)} " +
        s"only-ref=${(refD -- gotD).take(5)}")

    val nCust = Tables.customer(spark, nulledDir).count()
    val nt = SparkEntry.queries("win_ntile")(spark, nulledDir)
    assert(nt.count() == nCust,
      s"win_ntile dropped rows on nulled group keys: ${nt.count()} vs $nCust")
    val wN = Window.partitionBy(col("c_mktsegment"))
      .orderBy(asc_nulls_first("c_acctbal"), col("c_custkey"))
    val refN = Tables.customer(spark, nulledDir)
      .select(col("c_custkey"), col("c_mktsegment"),
        ntile(4).over(wN).as("bal_quartile"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), r.getInt(2)))
      .toSet
    val gotN = nt.collect().map(r => (r.getLong(0), Option(r.get(1)),
      r.getInt(2))).toSet
    assert(gotN == refN,
      s"win_ntile vs single-window: only-got=${(gotN -- refN).take(5)} " +
        s"only-ref=${(refN -- gotN).take(5)}")
    InternalCaches.unpersistAll()
  }
}
