#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage:  python3 tools/verify_local.py <verify_out_dir> <sf_dir>

Reads each <name>/ parquet result written by graft.Verify plus
oracle_sql.json, runs each oracle SQL in DuckDB over views named after the
parquet tables in <sf_dir>, and compares: column set, row count, and
values (rows sorted, columns sorted by name, floats rounded to 6 sig
figs). Exit 1 on any mismatch.
"""
import sys, os, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == 0:
            return "0"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>"):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def canon(df: pd.DataFrame, ordered: bool):
    """Column order is always normalized; row order is kept when the
    oracle declares ORDER BY (so declared orderings are actually
    verified), sorted otherwise."""
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row)
            for row in df[cols].itertuples(index=False, name=None)]
    return cols, (rows if ordered else sorted(rows))


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    # the heavier replays (qb6/qb7 graph builds at sf0.1) spill; keep
    # the spill off the CWD and bounded so a big oracle cannot flood
    # the workspace (observed: .tmp/ in the repo root hit ENOSPC)
    con.sql("SET temp_directory='/tmp/duckdb_spill'")
    con.sql("SET max_temp_directory_size='20GiB'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    manifest = None
    mpath = os.path.join(out_dir, "queries.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            manifest = set(json.load(f))

    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    failures = []
    for name in names:
        if manifest is not None and name not in manifest:
            failures.append((name, "stale output dir: not in the current "
                                   "query registry (rm -rf the out dir)"))
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            failures.append((name, "no parquet output"))
            continue
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        # the DRIVER's comparator crashes on array/map cells
        # (pandas sort_values: unhashable ndarray — r13 q8h); norm_cell
        # below stringifies them, so without this check the local gate
        # is more lenient than the real one. Fail here instead.
        arr_cols = [c for c in got.columns if len(got) > 0 and any(
            isinstance(v, (list, tuple)) or str(type(v)).endswith("ndarray'>")
            for v in got[c].head(20))]
        if arr_cols:
            failures.append((name, "driver-incomparable array/map column(s): "
                                   + ", ".join(arr_cols)))
            continue
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            if len(got) == 0:
                failures.append((name, "rows-only check: empty result"))
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        ordered = "order by" in oracles[name].lower()
        gc, gr = canon(got, ordered)
        wc, wr = canon(want, ordered)
        if gc != wc:
            failures.append((name, f"schema mismatch: spark={gc} duck={wc}"))
        elif len(gr) != len(wr):
            failures.append((name, f"row count: spark={len(gr)} duck={len(wr)}"))
        elif gr != wr:
            diff = next((i, a, b) for i, (a, b) in enumerate(zip(gr, wr)) if a != b)
            failures.append((name, f"value mismatch at sorted row {diff[0]}: "
                                   f"spark={diff[1]} duck={diff[2]}"))
        else:
            print(f"  [match]     {name}: {len(gr)} rows, {len(gc)} cols")
    print()
    if failures:
        for n, msg in failures:
            print(f"FAIL {n}: {msg}")
        sys.exit(1)
    print(f"ALL {len(names)} queries verified.")


if __name__ == "__main__":
    main()
