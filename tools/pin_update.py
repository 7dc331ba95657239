#!/usr/bin/env python3
"""Regenerate the frozen-output pins for the no-oracle gate queries.

Usage: python3 tools/pin_update.py <sfDir> <verifyOutDir>

For every query directory in <verifyOutDir> that has NO entry in
oracle_sql.json (the not-SQL-expressible set: ann_hnsw_topk,
ann_ivfpq_topk, x5_blat_text), computes the
canonical content hash (crosscheck.canonical_hash) of the Spark output
and writes/updates tools/pins.json under the SF-directory name.

The pin asserts DETERMINISM + NON-REGRESSION against an output reviewed
once at pin time — not independent correctness (DuckDB cannot express
these queries; their independent evidence is the ScalaTest recall /
truth-table / determinism specs). Run this ONLY after reviewing an
intended output change. Driver-side tooling, not part of the library.
"""
import sys, json, glob, os
import pandas as pd

from crosscheck import canonical_hash


def main(sf_dir: str, out_dir: str) -> int:
    sf_name = os.path.basename(sf_dir.rstrip("/"))
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    pins_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pins.json")
    pins = json.load(open(pins_path)) if os.path.exists(pins_path) else {}
    entry = pins.setdefault(sf_name, {})
    updated = []
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"SKIP {name}: no output files")
            continue
        df = pd.concat([pd.read_parquet(f) for f in files])
        h = canonical_hash(df)
        old = entry.get(name)
        entry[name] = h
        updated.append(name)
        print(f"PIN  {sf_name}/{name}: {len(df)} rows {h[:16]}"
              + ("" if old in (None, h) else f" (CHANGED from {old[:16]})"))
    json.dump(pins, open(pins_path, "w"), indent=1, sort_keys=True)
    print(f"wrote {pins_path}: {len(updated)} pins under {sf_name}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
