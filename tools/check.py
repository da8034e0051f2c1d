#!/usr/bin/env python3
"""Dev-only oracle checker mimicking the driver's t2 gate: for each query
output under OUTDIR, run the matching oracle SQL in DuckDB over the parquet
tables in SFDIR and compare row count, schema, and sorted values.

Usage: tools/check.py SFDIR OUTDIR [query ...]
"""
import json, math, os, sys
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamp-like cols to ns for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            s = df[c]
            if getattr(s.dtype, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        got = pd.read_parquet(path)
        raw_got_dtypes = [str(t) for t in got.reindex(sorted(got.columns), axis=1).dtypes]
        if name not in oracles:
            print(f"{name}: rows-only ({len(got)} rows) {'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        want = con.sql(oracles[name]).df()
        g, w = norm(got), norm(want)
        status = []
        if list(g.columns) != list(w.columns):
            status.append(f"COLS got={list(g.columns)} want={list(w.columns)}")
        if len(g) != len(w):
            status.append(f"ROWS got={len(g)} want={len(w)}")
        if not status:
            # Compare the RAW spark-output dtypes (pre tz-normalization) against
            # the oracle's: the driver's schema gate does not strip timezones,
            # so a tz-aware spark column vs a naive oracle column is a FAIL
            # even when the instants agree (this hid q55's red for 3 rounds).
            raw_want_dtypes = [str(t) for t in want.reindex(sorted(want.columns), axis=1).dtypes]
            if raw_got_dtypes != raw_want_dtypes:
                status.append(f"DTYPES got={raw_got_dtypes} want={raw_want_dtypes}")
            elif [str(t) for t in g.dtypes] != [str(t) for t in w.dtypes]:
                status.append(f"DTYPES got={list(map(str, g.dtypes))} want={list(map(str, w.dtypes))}")
            bad = 0
            for c in g.columns:
                gv, wv = g[c].tolist(), w[c].tolist()
                for i, (x, y) in enumerate(zip(gv, wv)):
                    if not values_equal(x, y):
                        if bad < 3:
                            status.append(f"VAL {c}[{i}]: got={x!r} want={y!r}")
                        bad += 1
            if bad:
                status.append(f"({bad} bad values)")
        if status:
            failures += 1
            print(f"{name}: FAIL  " + "; ".join(status))
        else:
            print(f"{name}: PASS ({len(g)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
