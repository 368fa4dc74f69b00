#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (driver-side tooling only,
not part of the Spark library): runs each oracle SQL in DuckDB over the
testdata parquet tables and compares against the parquet results dumped by
`graft.Verify`. Columns are sorted by name, rows by all columns, values
compared exactly (bit-exact doubles — the query layer is designed for that).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float) and math.isnan(v):
        return "∅"  # pandas renders SQL NULL in numeric cols as NaN
    return v


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        got = got.reindex(sorted(got.columns), axis=1)
        want = want.reindex(sorted(want.columns), axis=1)
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            n_fail += 1
            continue
        # dtype-family guard (r11 g-family root cause): DuckDB HUGEINT
        # aggregates (SUM over BIGINT) render as float64 in pandas while
        # Spark's parquet stays int64 — value-equality passes (123 ==
        # 123.0) but the driver's hasher formats them differently and
        # hash-fails. Flag any int-vs-float column pair whose float side
        # carries no NaN (a NaN means SQL NULL rendering, which the value
        # compare below catches on its own).
        fam = lambda d: "i" if d.kind in "iu" else ("f" if d.kind == "f" else d.kind)
        dtype_bad = [
            c for c in got.columns
            if {fam(got[c].dtype), fam(want[c].dtype)} == {"i", "f"}
            and not (got[c].isna().any() or want[c].isna().any())]
        if dtype_bad:
            print(f"FAIL {name}: int/float dtype mismatch (driver hasher "
                  f"formats these differently) in columns {dtype_bad}: "
                  f"spark={[str(got[c].dtype) for c in dtype_bad]} "
                  f"oracle={[str(want[c].dtype) for c in dtype_bad]} — "
                  f"CAST the oracle aggregate AS BIGINT or align the types")
            n_fail += 1
            continue
        g = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)],
                   key=repr)
        w = sorted([tuple(norm(v) for v in r) for r in want.itertuples(index=False)],
                   key=repr)
        if g == w:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            diffs = [(a, b) for a, b in zip(g, w) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs (spark, oracle):")
            for a, b in diffs:
                print(f"      {a}\n   != {b}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
