#!/usr/bin/env python3
"""DuckDB twin timings for graft.Bench.

Usage: python3 tools/bench_duckdb.py <sfDir> <oracleSqlJson> [runsPerQuery]
Times each oracle SQL (best of N, default 2 — the judge's methodology)
against the testdata parquet tables and prints ONE JSON object
{name: seconds}; a query whose oracle errors or exceeds the per-query
time limit reports -1 (excluded from totals) — one pathological oracle
(e.g. a recursive CTE over a large pair join) must not starve every
other twin timing or trip the caller's whole-process watchdog.
Driver-side tooling only — not part of the library.
"""
import sys, json, os, time, threading

import duckdb

from crosscheck import TABLES  # one table list for both gate tools

PER_QUERY_LIMIT_S = 120.0


def main(sf_dir: str, oracle_path: str, runs: int = 2) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(oracle_path))
    out = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(runs):
            fired = []

            def _interrupt():
                fired.append(True)
                con.interrupt()

            timer = threading.Timer(PER_QUERY_LIMIT_S, _interrupt)
            timer.start()
            t0 = time.perf_counter()
            try:
                con.execute(sql).fetchall()
            except Exception:  # includes the interrupt
                # a failed/interrupted SECOND run must not discard a valid
                # first measurement
                if best is None:
                    best = -1.0
                break
            finally:
                timer.cancel()
                if fired:
                    # the timer can fire in the gap after execute() returns;
                    # a pending interrupt flag would poison the NEXT query on
                    # this connection — drain it with a throwaway statement
                    try:
                        con.execute("SELECT 1").fetchall()
                    except Exception:
                        pass
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
            if dt > PER_QUERY_LIMIT_S / 2:
                break  # one timed run is evidence enough near the limit
        out[name] = best
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sf, path = sys.argv[1], sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sys.exit(main(sf, path, runs))
