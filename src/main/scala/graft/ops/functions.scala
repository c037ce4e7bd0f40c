package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Scalar function battery (SURVEY.md §2.3 `fn_*`).
  *
  * The reference delegates every scalar computation to user Python —
  * `split`/`strip`/`float`/format (`mapper.py:28-31`, `reducer.py:21,36`).
  * Here each family is a codegen'd built-in `Column` expression: no UDFs,
  * no serialization boundary, everything stays inside whole-stage codegen
  * (the "Functions, not UDFs" rule).
  *
  * Scale notes: all queries are narrow map-side transforms — zero shuffles
  * except the final presentation orderBy; at 100 TB they pipeline directly
  * over the scan.
  */
object Fn {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "fn_string" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          upper(col("lang")).as("lang_up"),
          substring(col("text"), 1, 12).as("head12"),
          concat_ws("-", col("source"), col("lang")).as("src_lang"),
          length(col("text")).as("len"),
          trim(col("text")).substr(lit(1), lit(5)).as("head5"),
          regexp_extract(col("text"), "([a-z]+)", 1).as("first_word"),
          col("text").contains("spark").as("has_spark"),
          element_at(split(col("text"), " "), 1).as("tok1"),
          replace(col("source"), lit("src"), lit("origin")).as("origin"))
        .orderBy("doc_id")),

    "fn_date" -> ((s, d) =>
      orders(s, d)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("mon"),
          datediff(to_date(col("o_orderdate")), lit("1995-01-01").cast("date"))
            .as("days_since"),
          quarter(col("o_orderdate")).as("q"))
        .orderBy("o_orderkey")),

    // Bitwise battery over the integral id columns — the hash/partition/
    // flag-field arithmetic every storage layout (the Morton sink, the
    // LSH band keys, bitmap aggregates) builds on. All plain codegen'd
    // scalar ops; bit_count is cast to int on the oracle side (DuckDB
    // returns TINYINT there).
    "fn_bitwise" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          col("event_id").bitwiseAND(col("user_id")).as("b_and"),
          col("event_id").bitwiseOR(col("user_id")).as("b_or"),
          col("event_id").bitwiseXOR(col("user_id")).as("b_xor"),
          shiftleft(col("user_id"), 3).as("b_shl"),
          shiftright(col("event_id"), 2).as("b_shr"),
          bit_count(col("event_id")).as("b_pop"))
        .orderBy("event_id")),

    // Conditional/null battery: CASE, nullif, coalesce, two-sided
    // clamping — the null-discipline verbs a cleaning pipeline leans on.
    "fn_conditional" -> ((s, d) =>
      customer(s, d)
        .select(col("c_custkey"),
          nullif(col("c_mktsegment"), lit("BUILDING")).as("seg_nb"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
            lit("(default)")).as("seg_filled"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 1000, "low")
            .otherwise("ok").as("bal_class"),
          round(greatest(least(col("c_acctbal"), lit(5000.0)), lit(0.0)), 2)
            .as("bal_clamped"))
        .orderBy("c_custkey")),

    // Cryptographic/content hashing: md5 + sha2-256 hex digests — the
    // content-addressing primitive (dedup keys, cache keys, shard-stable
    // ids). Codegen'd, map-only; both engines emit lowercase hex so the
    // digests compare byte-for-byte. (xxhash64 — the engine's internal
    // fingerprint — is Spark-specific and stays out of the oracle set;
    // dedup_incremental pins its behavior against text equality instead.)
    "fn_hash" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"),
          substring(sha2(col("text"), 256), 1, 8).as("shard_key"))
        .orderBy("doc_id")),

    // Regexp battery: extract / count / replace / match — patterns kept
    // inside the RE2-compatible subset (no backrefs or lookaround), so
    // Java-regex Spark and RE2-family DuckDB agree by construction.
    // nullif('') canonicalizes the no-match sentinel on both sides; the
    // replace result is measured by length so the compare doesn't hash
    // whole rewritten documents. All codegen'd string expressions — at
    // 100 TB this is a map-only pass that pipelines with the scan.
    "fn_regex" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          nullif(regexp_extract(col("text"), "([0-9]+)", 1), lit(""))
            .as("first_num"),
          regexp_count(col("text"), lit("[0-9]+")).cast("bigint")
            .as("n_digit_runs"),
          length(regexp_replace(col("text"), "[aeiou]", ""))
            .as("len_novowel"),
          col("text").rlike("[0-9]{3}").as("has_3digits"))
        .orderBy("doc_id")),

    "fn_math" -> ((s, d) =>
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(pow(col("l_discount"), 2), 6).as("disc_sq"),
          round(abs(col("l_tax") - 0.05), 4).as("tax_dev"),
          ceil(col("l_quantity")).as("qty_ceil"),
          floor(col("l_quantity")).as("qty_floor"),
          (col("l_orderkey") % 7).as("key_mod"),
          round(log(col("l_extendedprice") + 1), 6).as("ln_price"),
          greatest(col("l_discount"), col("l_tax")).as("gmax"))
        .orderBy("l_orderkey", "l_linenumber")),

    // tokens materialized once (withColumn boundary) — seven references to
    // an inline split(text) would re-split the string per expression in
    // the interpreted HOF path
    "fn_array" -> ((s, d) =>
      documents(s, d)
        .withColumn("t", split(col("text"), " "))
        .select(col("doc_id"),
          size(col("t")).as("n_tok"),
          size(array_distinct(col("t"))).as("n_uniq"),
          array_contains(col("t"), "spark").as("has_spark"),
          concat_ws("-", slice(array_sort(col("t")), 1, 3)).as("first3"),
          element_at(array_sort(col("t")), size(col("t"))).as("max_tok"),
          aggregate(transform(col("t"), t => length(t).cast("long")),
            lit(0L), (acc, x) => acc + x).as("tot_chars"))
        .orderBy("doc_id")),

    // Map construction + access. The oracle checks the *values* through
    // plain SQL — DuckDB need not build a MAP to verify map semantics.
    "fn_map" -> ((s, d) =>
      events(s, d)
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
              lit("user"), col("user_id").cast("string")).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("etype"),
          element_at(col("m"), "user").as("euser"),
          size(map_keys(col("m"))).as("n_keys"))
        .orderBy("event_id")),

    // Binary/encoding battery: string → bytes (encode), base64 and hex
    // renderings, and the decode(unbase64(base64(...))) roundtrip that
    // pins both directions at once. All map-side scalar work; both
    // engines render hex uppercase and base64 PADDED RFC-4648 standard
    // (both pad; an 'unpadded' consumer contract would mismatch both).
    "fn_encoding" -> ((s, d) =>
      customer(s, d).filter(col("c_custkey") % 37 === 0)
        .select(col("c_custkey"),
          base64(encode(col("c_mktsegment"), "UTF-8")).as("b64"),
          hex(encode(col("c_mktsegment"), "UTF-8")).as("hx"),
          decode(unbase64(base64(encode(col("c_mktsegment"), "UTF-8"))),
            "UTF-8").as("roundtrip"))
        .orderBy("c_custkey")),

    // Higher-order-function battery — the lambda surface over arrays:
    // transform / filter / exists / forall / aggregate / zip_with, each
    // a Catalyst LambdaFunction over a 3-element per-row array (so the
    // demo costs O(1) per row and the whole battery pipelines over the
    // scan). zip_with is demonstrated as a self-dot-product; the oracle
    // computes the same value through list_transform, which is the
    // point — HOF programs are plain expressions with SQL-equivalent
    // semantics, not black-box UDFs.
    "fn_hof" -> ((s, d) => {
      val arr = array(col("l_quantity"), col("l_extendedprice"),
        col("l_discount"))
      lineitem(s, d)
        .filter(col("l_orderkey") % 51 === 0)
        .select(col("l_orderkey"), col("l_linenumber"),
          round(aggregate(arr, lit(0.0), (acc, x) => acc + x), 4)
            .as("arr_sum"),
          size(filter(arr, x => x > 1.0)).as("n_big"),
          exists(arr, x => x === 0.0).as("any_zero"),
          forall(arr, x => x >= 0.0).as("all_pos"),
          round(aggregate(zip_with(arr, arr, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x), 4).as("dot_self"))
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // Struct battery — the nested-record surface: construction
    // (named fields), field access, NESTED access, lexicographic struct
    // comparison (field-wise, ties broken by later fields — the
    // mechanism behind struct-ordered min/max and tie-broken argmin),
    // and structs as array elements. All scalar outputs so the oracle
    // compares values, not engine-specific nested encodings.
    "fn_struct" -> ((s, d) =>
      orders(s, d).filter(col("o_orderkey") % 97 === 0)
        .select(col("o_orderkey"),
          struct(col("o_orderkey").as("k"), col("o_orderstatus").as("s"))
            .getField("s").as("st_status"),
          struct(struct(col("o_totalprice").as("v")).as("outer_"))
            .getField("outer_").getField("v").as("nested_price"),
          (struct(col("o_totalprice"), col("o_orderkey")) <
            struct(lit(1000.0), lit(0L))).as("below_mark"),
          element_at(array(struct(col("o_custkey").as("a")),
              struct(col("o_orderkey").as("a"))), 2)
            .getField("a").as("second_a"))
        .orderBy("o_orderkey")),

    // ONE Jackson parse per row: both outputs derive from a single
    // `from_json` struct materialized in its own projection. Two
    // independent JSON extractors here would each run a full parse per
    // row — measured as the single most expensive line of the whole
    // bench (16-36 s at sf0.1) for a 10-byte payload. JsonToStructs is
    // not CollapseProject-"cheap", so the struct is never inlined into
    // its two consumers. The schema types k as STRING — the raw-scalar
    // extraction `get_json_object`/`json_extract_string` semantics for
    // any payload ("12", 1.5, 12 all round-trip) — and k_typed is an
    // INTEGRAL-regex-gated try_cast, spelled identically in the oracle:
    // the engines' bare string→int casts genuinely disagree off the
    // integral path (review finding r10 — DuckDB ROUNDS '1.5' to 2,
    // Spark nulls it or throws under ANSI), so the gate is made
    // explicit on both sides instead of trusting cast coincidence.
    "fn_json" -> ((s, d) =>
      events(s, d)
        .withColumn("j", from_json(col("props"), lit("k STRING")))
        .select(col("event_id"), col("j").getField("k").as("k_str"))
        .select(col("event_id"),
          // \z (end-of-TEXT) not $: Java regex $ matches before a final
          // line terminator ('12\n' would pass and try_cast trims it)
          // while DuckDB's RE2 $ is end-of-text only — \z means the same
          // thing in both engines, so the gate can't diverge on trailing
          // newlines (ADVICE r10)
          when(col("k_str").rlike("^-?[0-9]+\\z"),
            expr("try_cast(k_str AS INT)")).as("k_typed"),
          col("k_str"))
        .orderBy("event_id")),

    // URL function family: host / path / single-query-param extraction —
    // the provenance fields a crawl-derived corpus filters and groups on.
    // The fixture `source` column is not URL-shaped, so the URL is
    // synthesized deterministically from doc fields (the planted-data
    // pattern text_pii_mask uses — the parsing plumbing is what's under
    // test). parse_url is a native expression evaluated per row with no
    // regex backtracking; the oracle re-derives each part with anchored
    // regexps. Narrow map-side projection: pipelines over the scan.
    "fn_url" -> ((s, d) =>
      documents(s, d)
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.com/"),
            col("lang"), lit("/doc/"), col("doc_id").cast("string"),
            lit("?ref=r"), (col("doc_id") % 7).cast("string")))
        .select(col("doc_id"), col("url"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref_param"))
        .orderBy("doc_id"))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT doc_id, upper(lang) AS lang_up, substr(text, 1, 12) AS head12,
        |  concat_ws('-', source, lang) AS src_lang,
        |  CAST(length(text) AS INTEGER) AS len,
        |  substr(trim(text), 1, 5) AS head5,
        |  regexp_extract(text, '([a-z]+)', 1) AS first_word,
        |  contains(text, 'spark') AS has_spark,
        |  string_split(text, ' ')[1] AS tok1,
        |  replace(source, 'src', 'origin') AS origin
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INTEGER) AS y,
        |  CAST(month(o_orderdate) AS INTEGER) AS m,
        |  CAST(day(o_orderdate) AS INTEGER) AS dom,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
        |  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
        |       AS INTEGER) AS days_since,
        |  CAST(quarter(o_orderdate) AS INTEGER) AS q
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "fn_bitwise" ->
      """SELECT event_id,
        |  event_id & user_id AS b_and,
        |  event_id | user_id AS b_or,
        |  xor(event_id, user_id) AS b_xor,
        |  user_id << 3 AS b_shl,
        |  event_id >> 2 AS b_shr,
        |  CAST(bit_count(event_id) AS INTEGER) AS b_pop
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_conditional" ->
      """SELECT c_custkey,
        |  nullif(c_mktsegment, 'BUILDING') AS seg_nb,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(default)')
        |    AS seg_filled,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 1000 THEN 'low'
        |       ELSE 'ok' END AS bal_class,
        |  round(greatest(least(c_acctbal, 5000.0), 0.0), 2) AS bal_clamped
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "fn_hash" ->
      """SELECT doc_id,
        |  md5(text) AS h_md5,
        |  sha256(text) AS h_sha256,
        |  substring(sha256(text), 1, 8) AS shard_key
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_regex" ->
      """SELECT doc_id,
        |  nullif(regexp_extract(text, '([0-9]+)', 1), '') AS first_num,
        |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
        |    AS n_digit_runs,
        |  CAST(length(regexp_replace(text, '[aeiou]', '', 'g')) AS INTEGER)
        |    AS len_novowel,
        |  regexp_matches(text, '[0-9]{3}') AS has_3digits
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(sqrt(l_extendedprice), 4) AS sqrt_price,
        |  round(pow(l_discount, 2), 6) AS disc_sq,
        |  round(abs(l_tax - 0.05), 4) AS tax_dev,
        |  CAST(ceil(l_quantity) AS BIGINT) AS qty_ceil,
        |  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
        |  l_orderkey % 7 AS key_mod,
        |  round(ln(l_extendedprice + 1), 6) AS ln_price,
        |  greatest(l_discount, l_tax) AS gmax
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_uniq,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  array_to_string(list_sort(string_split(text, ' '))[1:3], '-') AS first3,
        |  list_sort(string_split(text, ' '))[-1] AS max_tok,
        |  CAST(list_sum([CAST(length(t) AS BIGINT) FOR t IN
        |       string_split(text, ' ')]) AS BIGINT) AS tot_chars
        |FROM documents ORDER BY doc_id""".stripMargin,
    "fn_map" ->
      """SELECT event_id, event_type AS etype,
        |  CAST(user_id AS VARCHAR) AS euser, 2 AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_encoding" ->
      """SELECT c_custkey,
        |  to_base64(encode(c_mktsegment)) AS b64,
        |  hex(encode(c_mktsegment)) AS hx,
        |  decode(from_base64(to_base64(encode(c_mktsegment))))
        |    AS roundtrip
        |FROM customer WHERE c_custkey % 37 = 0
        |ORDER BY c_custkey""".stripMargin,
    "fn_hof" ->
      """SELECT l_orderkey, l_linenumber,
        |  round(l_quantity + l_extendedprice + l_discount, 4) AS arr_sum,
        |  CAST(len(list_filter([l_quantity, l_extendedprice, l_discount],
        |    x -> x > 1.0)) AS INTEGER) AS n_big,
        |  len(list_filter([l_quantity, l_extendedprice, l_discount],
        |    x -> x = 0.0)) > 0 AS any_zero,
        |  len(list_filter([l_quantity, l_extendedprice, l_discount],
        |    x -> x < 0.0)) = 0 AS all_pos,
        |  round(l_quantity * l_quantity
        |    + l_extendedprice * l_extendedprice
        |    + l_discount * l_discount, 4) AS dot_self
        |FROM lineitem WHERE l_orderkey % 51 = 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "fn_struct" ->
      """SELECT o_orderkey,
        |  struct_pack(k := o_orderkey, s := o_orderstatus).s AS st_status,
        |  struct_pack(outer_ := struct_pack(v := o_totalprice)).outer_.v
        |    AS nested_price,
        |  (ROW(o_totalprice, o_orderkey) < ROW(1000.0, CAST(0 AS BIGINT)))
        |    AS below_mark,
        |  [struct_pack(a := o_custkey), struct_pack(a := o_orderkey)][2].a
        |    AS second_a
        |FROM orders WHERE o_orderkey % 97 = 0
        |ORDER BY o_orderkey""".stripMargin,
    "fn_json" ->
      """SELECT event_id,
        |  CASE WHEN regexp_matches(json_extract_string(props, '$.k'),
        |              '^-?[0-9]+\z')
        |    THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)
        |  END AS k_typed,
        |  json_extract_string(props, '$.k') AS k_str
        |FROM events ORDER BY event_id""".stripMargin,
    "fn_url" ->
      """SELECT doc_id, url,
        |  regexp_extract(url, 'https://([^/]+)/', 1) AS host,
        |  regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
        |  regexp_extract(url, 'ref=(.*)$', 1) AS ref_param
        |FROM (SELECT doc_id,
        |    'https://' || source || '.example.com/' || lang || '/doc/'
        |      || doc_id || '?ref=r' || (doc_id % 7) AS url
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin
  )
}
