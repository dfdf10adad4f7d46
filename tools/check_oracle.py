#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate.

Loads each Verify output parquet, runs the corresponding oracle SQL in
DuckDB over the same testdata parquet tables, and compares: column names,
value kinds, row counts, and cell values (columns sorted by name, rows
sorted).

The Spark side is read via PYARROW (typed: parquet DECIMAL surfaces as
decimal.Decimal objects, not float) while the oracle side comes from
DuckDB's pandas conversion — the same asymmetry the driver's typed-value
hash sees. A query whose output leaves a bare DECIMAL column therefore
FAILS here (Decimal vs float64) exactly as it fails the driver, even
though a %.10g text rendering of both sides would agree. Rule: cast
DECIMAL output columns to DOUBLE or STRING in BOTH engines.

Usage: python3 tools/check_oracle.py /tmp/verify_out /root/testdata/sf0.01
"""
import decimal, json, math, sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if v is None:
        return "NULL"
    # typed decimal stays typed: a Decimal-vs-float divergence must FAIL
    if isinstance(v, decimal.Decimal):
        return f"decimal:{v}"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return f"{f:.10g}"
    return str(v)


def kind(series):
    """Coarse value kind for the dtype gate: int width and container
    library differences are representation, not value, differences —
    but int-vs-float and decimal-vs-float are what the driver's typed
    hash trips on."""
    dt = str(series.dtype)
    if dt.startswith(("int", "uint")):
        return "int"
    if dt.startswith("float"):
        return "float"
    if dt == "bool":
        return "bool"
    for v in series:
        if v is None:
            continue
        if isinstance(v, decimal.Decimal):
            return "decimal"
        if isinstance(v, (list, tuple, np.ndarray)):
            return "seq"
        if isinstance(v, bytes):
            return "bytes"
        if isinstance(v, (int, np.integer)):
            return "int"
        if isinstance(v, (float, np.floating)):
            return "float"
        return type(v).__name__
    return "null"


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
        files = [str(f) for f in qdir.glob("*.parquet")]
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        # pyarrow read: parquet logical types surface TYPED (the driver's view)
        got = pd.read_parquet(files)
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
        kind_bad = [
            (c, kind(got[c]), kind(want[c]))
            for c in gc if kind(got[c]) != kind(want[c])
            and "null" not in (kind(got[c]), kind(want[c]))
        ]
        if kind_bad:
            print(f"FAIL {name}: value-kind mismatch {kind_bad}")
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
