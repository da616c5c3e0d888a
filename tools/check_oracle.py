#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB on each
oracle_sql.json entry over the sf parquet tables, compare against the
Spark parquet dumped by graft.Verify (columns sorted by name, rows
sorted, values compared exactly). Usage:
    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    # Mirror the driver: sort columns by name, canonicalize every cell to
    # its string repr (so Decimal('1.10') vs 1.1, int 3 vs float 3.0, and
    # date-vs-timestamp diffs FAIL like they do in the driver's hash),
    # then sort rows.
    df = df.reindex(sorted(df.columns), axis=1)

    def cell(v):
        try:
            import pandas as pd
            if v is None or (not isinstance(v, (list, tuple)) and pd.isna(v)):
                return "∅"
        except (TypeError, ValueError):
            pass
        return str(v)

    df = df.apply(lambda col: col.map(cell) if col.dtype == object
                  else col.astype(str).mask(col.isna(), "∅"))
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        try:
            # pd.read_parquet (pyarrow) — the driver's read path for the
            # Spark side. Reading via DuckDB would normalize decimals and
            # timestamp units and mask dtype-repr mismatches.
            import pandas as pd
            got = pd.read_parquet(spark_files)
            want = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} vs {list(w.columns)}"); n_bad += 1; continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} vs {len(w)}"); n_bad += 1; continue
        mismatch = None
        for c in g.columns:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatch = (c, i, a[i], b[i], int((~eq).sum()))
                break
        if mismatch:
            c, i, av, bv, n = mismatch
            print(f"FAIL {name}: col {c} row {i}: spark={av!r} duckdb={bv!r} ({n} diffs)")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(g)} rows)"); n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
