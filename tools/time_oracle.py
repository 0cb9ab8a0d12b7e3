#!/usr/bin/env python3
"""Per-query DuckDB oracle timings — the denominator of the 2x bench gate.

Usage: python3 tools/time_oracle.py <sfDir> <oracleSqlJson> [outJson]

Registers each TESTDATA parquet as a DuckDB view (same setup as
tools/check.py), then times every oracle SQL with interleaved sweeps
(all queries, then again, x5; per-query min across sweeps) — the same
noise-suppression protocol graft.Bench uses, so the two artifacts are
comparable. Each query is fully materialized via fetchall() so DuckDB
cannot defer work past the timer. 32 threads to mirror local[32].

Writes one JSON object {"total": sec, "queries": {name: sec}, "sf": dir,
"threads": N, "sweeps": S} to outJson (default ORACLE_TIMES.json next to
this script's repo root). Optional 4th arg = sweep count (default 5 —
drop to 2-3 for the sf1 subset floor, where one sweep is minutes);
optional trailing args = query-name subset.
"""
import duckdb, glob, json, pathlib, sys, time

SWEEPS = 5
THREADS = 32


def main() -> int:
    sfdir = sys.argv[1]
    oracle_path = sys.argv[2]
    out = sys.argv[3] if len(sys.argv) > 3 else str(
        pathlib.Path(__file__).resolve().parent.parent / "ORACLE_TIMES.json")
    global SWEEPS
    if len(sys.argv) > 4:
        SWEEPS = int(sys.argv[4])
    only = set(sys.argv[5:])
    con = duckdb.connect()
    con.execute(f"SET threads TO {THREADS}")
    for p in glob.glob(f"{sfdir}/*.parquet"):
        con.execute(f"CREATE VIEW {pathlib.Path(p).stem} AS SELECT * FROM '{p}'")
    oracle = json.load(open(oracle_path))
    names = sorted(n for n in oracle if not only or n in only)
    samples = {n: [] for n in names}
    failed = []
    for _ in range(SWEEPS):
        for name in names:
            if name in failed:
                continue
            t0 = time.perf_counter()
            try:
                con.sql(oracle[name]).fetchall()
            except Exception as e:
                print(f"[oracle] {name} FAILED: {e}", file=sys.stderr)
                failed.append(name)
                continue
            samples[name].append(time.perf_counter() - t0)
    best = {n: min(s) for n, s in samples.items() if s}
    # per-sweep spread beside the min: ratio-movement adjudications need
    # to see whether a floor change is sweep-min luck or a real shift
    # (the r18 verdict's sf1-volatility item — ±10-30% per query at 2
    # sweeps was silently re-pricing adjudications each round)
    def spread(s):
        ss = sorted(s)
        return {"min": ss[0], "median": ss[len(ss) // 2], "max": ss[-1]}
    result = {
        "total": sum(best.values()),
        "queries": {n: best.get(n, -1) for n in names},
        "spreads": {n: spread(s) for n, s in samples.items() if s},
        "sf": sfdir,
        "threads": THREADS,
        "sweeps": SWEEPS,
        "failed": failed,
    }
    with open(out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({"total": result["total"], "n": len(best), "out": out}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
