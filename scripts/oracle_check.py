#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the
shipped Scala library does not depend on this).

Usage: oracle_check.py <sfDir> <verifyOutDir> [query ...]

Registers each testdata parquet as a DuckDB view, runs every SQL in
<verifyOutDir>/oracle_sql.json, loads the Spark result parquet for the same
key, sorts columns by name, and compares row-by-row.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Declared ±tolerance sketch keys (r15; tightened r16 per ADVICE): the
# oracle pairs each estimate with DuckDB's own sketch, and ONLY the
# named estimate column(s) legitimately differ across engines (the
# error bound vs exact lives in AccuracySpec). Every OTHER column —
# the deterministic group keys, including agg_sketch_union's 'ALL'
# rollup sentinel — is value-compared row-by-row, so a shape
# regression emitting the right row count with wrong key values fails
# here even though the driver's hash gate records hash=false by
# design.
PARTIAL = {
    "agg_approx_distinct": {"approx_cust"},
    "agg_approx_quantile": {"ap50"},
    "agg_sketch_union": {"est_custs"},
}

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return repr(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        # for PARTIAL keys the estimate columns are excluded from the
        # ROW compare (not the schema compare) BEFORE sorting — sorting
        # tuples that embed engine-divergent estimates would misalign
        # the row pairing and turn a clean key-column compare into noise
        skip = PARTIAL.get(name, set())

        def fetch(rel):
            # reorder columns by sorted name, canonicalize, sort rows
            cols = rel.columns
            idx = [cols.index(c) for c in sorted(cols) if c not in skip]
            rows = [tuple(canon(r[i]) for i in idx) for r in rel.fetchall()]
            return sorted(cols), sorted(rows)
        try:
            want_cols, want_rows = fetch(con.sql(sql))
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        try:
            got_cols, got_rows = fetch(con.sql(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'"))
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_fail += 1
            continue
        if got_cols != want_cols:
            print(f"FAIL {name}: columns {got_cols} != {want_cols}")
            n_fail += 1
            continue
        if len(got_rows) != len(want_rows):
            print(f"FAIL {name}: rows {len(got_rows)} != {len(want_rows)}")
            n_fail += 1
            continue
        bad = None
        for i, (g, w) in enumerate(zip(got_rows, want_rows)):
            if g != w:
                bad = (i, g, w)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: spark={bad[1]} duck={bad[2]}")
            n_fail += 1
        elif skip:
            print(f"PASS {name} (partial: rows+schema+deterministic cols, "
                  f"{len(got_rows)} rows; estimate cols {sorted(skip)} "
                  "not value-compared by design)")
            n_pass += 1
        else:
            print(f"PASS {name} ({len(got_rows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
