#!/usr/bin/env python3
"""Correctness-at-scale checker: the sf1.0 companion to tools/check.py.

Same oracle compare as the driver's t2 gate, with two scale-specific
differences, both RECORDED per query rather than silently applied:

  - per-oracle TIMEOUT (default 180 s): some oracles are brute-force by
    construction (pairwise self-joins DuckDB runs as nested loops); at
    10x data they are infeasible for the ORACLE, not the engine — those
    queries report status "oracle_timeout" and are excluded from the
    pass/fail verdict (their sf0.01 exact pass still stands). ONLY the
    timeout is excluded: a broken oracle (bad SQL, missing table)
    reports "oracle_error" and FAILS the run — an unverifiable query
    must not read as green.
  - float TOLERANCE fallback (rel 1e-9 against max(|got|,|want|), abs
    1e-12 for near-zero values — ~1000 ulps of headroom over a single
    rounding step): a double sum over 10x rows may differ from DuckDB's
    in the last ulps purely from reduction order. An exact cell-match
    still reports "pass_exact"; a mismatch within tolerance reports
    "pass_approx" with the worst relative error, so fp-ordering drift
    is visible, never hidden. Integer / string / date columns always
    compare exactly.
  - SCALE-ORACLE substitution (tools/scale_oracles.py): a query whose
    full oracle is quadratic can declare an independent scale-feasible
    re-verification — either DECOMPOSED (same semantics, smarter
    algorithm: union-find CC, numpy kNN, window skyline — full-result
    compare) or SAMPLED (a deterministic md5-priority subset applied to
    BOTH sides, the q78/C78 stance). Matches report
    "pass_exact_decomposed" / "pass_exact_sampled" (plus approx variants)
    so a substituted adjudication is never conflated with the original
    oracle's.

Usage: tools/check_scale.py SFDIR OUTDIR RESULT.json [query ...]
"""
import json, math, os, subprocess, sys, tempfile

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
TIMEOUT_S = int(os.environ.get("SCALECHECK_TIMEOUT", "180"))
REL_TOL, ABS_TOL = 1e-9, 1e-12


def run_oracle(sfdir: str, sql: str, out_parquet: str) -> str:
    """Run one oracle in a subprocess (so a timeout can kill it) and dump
    the result to parquet. Returns '' on success, error string otherwise.
    Spark-written tables are DIRECTORIES of part files — glob those; the
    driver's single-file layout reads as-is."""
    def src(t):
        p = f"{sfdir}/{t}.parquet"
        return f"{p}/*.parquet" if os.path.isdir(p) else p
    views = "\n".join(
        f"CREATE VIEW {t} AS SELECT * FROM '{src(t)}';"
        for t in TABLES)
    script = f"""
import duckdb, sys
con = duckdb.connect()
con.execute('''{views}''')
con.sql(sys.argv[1]).df().to_parquet(sys.argv[2])
"""
    try:
        p = subprocess.run(
            [sys.executable, "-c", script, sql, out_parquet],
            timeout=TIMEOUT_S, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        return "timeout"
    if p.returncode != 0:
        return (p.stderr.strip().splitlines() or ["oracle error"])[-1][:300]
    return ""


def main():
    import pandas as pd
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from check import norm, values_equal

    sfdir, outdir, resultpath = sys.argv[1], sys.argv[2], sys.argv[3]
    only = set(sys.argv[4:])
    oracles = json.load(open(f"{outdir}/oracle_sql.json"))
    import scale_oracles
    results, counts = {}, {}

    def record(name, status, detail=""):
        results[name] = {"status": status, **({"detail": detail} if detail else {})}
        counts[status] = counts.get(status, 0) + 1
        print(f"{name}: {status}" + (f"  {detail}" if detail else ""), flush=True)

    for name in sorted(os.listdir(outdir)):
        path = os.path.join(outdir, name)
        if not os.path.isdir(path) or (only and name not in only):
            continue
        got = pd.read_parquet(path)
        substituted = name in scale_oracles.ORACLES
        if name not in oracles and not substituted:
            record(name, "rows_only" if len(got) > 0 else "rows_only_EMPTY",
                   f"{len(got)} rows")
            continue
        mode = scale_oracles.MODES.get(name, "") if substituted else ""
        if substituted:
            # independent scale-feasible re-verification (see
            # scale_oracles.py) run in a subprocess under its own budget
            tools_dir = os.path.dirname(os.path.abspath(__file__))
            # NamedTemporaryFile (not the race-prone mktemp), unlinked in
            # a finally so timeout/error paths don't leak partial parquet
            with tempfile.NamedTemporaryFile(suffix=".parquet",
                                             delete=False) as tf:
                want_path = tf.name
            with tempfile.NamedTemporaryFile(suffix=".parquet",
                                             delete=False) as tf:
                got_path2 = tf.name
            budget = scale_oracles.TIMEOUTS.get(
                name, scale_oracles.DEFAULT_TIMEOUT_S)
            try:
                try:
                    p = subprocess.run(
                        [sys.executable,
                         os.path.join(tools_dir, "scale_oracles.py"),
                         name, sfdir, path, want_path, got_path2],
                        timeout=budget, capture_output=True, text=True)
                except subprocess.TimeoutExpired:
                    record(name, "oracle_timeout",
                           f"scale oracle >{budget}s")
                    continue
                if p.returncode != 0:
                    record(name, "oracle_error",
                           (p.stderr.strip().splitlines() or ["?"])[-1][:300])
                    continue
                want = pd.read_parquet(want_path)
                got = pd.read_parquet(got_path2)
            finally:
                for tp in (want_path, got_path2):
                    try:
                        os.unlink(tp)
                    except OSError:
                        pass
            if len(got) == 0 or len(want) == 0:
                record(name, "FAIL", f"scale oracle produced an EMPTY side "
                       f"(got={len(got)}, want={len(want)}) — not a pass")
                continue
        else:
            with tempfile.NamedTemporaryFile(suffix=".parquet",
                                             delete=False) as tf:
                want_path = tf.name
            err = run_oracle(sfdir, oracles[name], want_path)
            if err == "timeout":
                record(name, "oracle_timeout", f">{TIMEOUT_S}s in DuckDB")
                continue
            if err:
                record(name, "oracle_error", err)
                continue
            want = pd.read_parquet(want_path)
            os.unlink(want_path)
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            record(name, "FAIL", f"cols got={list(g.columns)} want={list(w.columns)}")
            continue
        if len(g) != len(w):
            record(name, "FAIL", f"rows got={len(g)} want={len(w)}")
            continue
        exact, worst_rel, bad = True, 0.0, []
        for c in g.columns:
            gv, wv = g[c].tolist(), w[c].tolist()
            floaty = str(g[c].dtype).startswith("float") or str(w[c].dtype).startswith("float")
            for i, (x, y) in enumerate(zip(gv, wv)):
                if values_equal(x, y):
                    continue
                exact = False
                ok = False
                if floaty and isinstance(x, float) and isinstance(y, float) \
                        and not (math.isnan(x) or math.isnan(y)):
                    d = abs(x - y)
                    denom = max(abs(x), abs(y))
                    # true relative error (no 1.0 floor — sub-unit values
                    # get the documented rel tol, not a hidden abs 1e-9);
                    # the separate ABS_TOL handles the near-zero case
                    rel = d / denom if denom > 0 else 0.0
                    if d <= ABS_TOL or rel <= REL_TOL:
                        ok, worst_rel = True, max(worst_rel, rel)
                if not ok:
                    if len(bad) < 3:
                        bad.append(f"{c}[{i}]: got={x!r} want={y!r}")
        suffix = f"_{mode}" if mode else ""
        if bad:
            record(name, "FAIL", "; ".join(bad))
        elif exact:
            record(name, "pass_exact" + suffix, f"{len(g)} rows")
        else:
            record(name, "pass_approx" + suffix,
                   f"{len(g)} rows, worst_rel={worst_rel:.2e}")

    summary = {"sfdir": sfdir, "timeout_s": TIMEOUT_S,
               "rel_tol": REL_TOL, "abs_tol": ABS_TOL,
               "counts": counts, "queries": results}
    with open(resultpath, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\nsummary: {counts}")
    sys.exit(1 if any(k.startswith("FAIL") or k == "rows_only_EMPTY"
                      or k == "oracle_error"
                      for k in counts) else 0)


if __name__ == "__main__":
    main()
