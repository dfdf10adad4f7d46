#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Loads each Verify output parquet, runs the corresponding oracle SQL in
DuckDB over the same testdata parquet tables, and compares: column names,
row counts, and cell values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracle.items()):
        qdir = Path(out_dir) / name
        files = list(qdir.glob("*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        got = con.execute(
            f"SELECT * FROM read_parquet({[str(f) for f in files]!r})").fetchdf()
        try:
            want = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} vs oracle {wc}")
            failures += 1
            continue
        # Dtype gate: the driver hashes typed values, so a DuckDB HUGEINT
        # (object/float64 in pandas) vs Spark BIGINT (int64) fails there even
        # when the %.10g renderings below agree. Catch it locally.
        dtype_bad = [
            (c, str(got[c].dtype), str(want[c].dtype))
            for c in gc if str(got[c].dtype) != str(want[c].dtype)
        ]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} vs oracle {len(want)}")
            failures += 1
            continue
        g = sorted(tuple(norm_cell(v) for v in row) for row in got[gc].itertuples(index=False))
        w = sorted(tuple(norm_cell(v) for v in row) for row in want[wc].itertuples(index=False))
        if g != w:
            bad = next(i for i, (a, b) in enumerate(zip(g, w)) if a != b)
            print(f"FAIL {name}: value mismatch at sorted row {bad}:")
            print(f"  spark : {g[bad]}")
            print(f"  oracle: {w[bad]}")
            failures += 1
            continue
        print(f"OK   {name}: {len(got)} rows")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
