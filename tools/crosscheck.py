#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/crosscheck.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<name>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle in DuckDB against the
testdata parquet tables, and compares (schema column names, row count,
sorted-row value hash). Driver-side tooling only — not part of the library.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the strictness check. The driver's value
    hash is dtype-sensitive, so an int64 Spark column vs a HUGEINT-born
    float64/object DuckDB column fails there even when values are equal
    (the cur_token_budget r7 trap). Classes: int / float / datetime / bool /
    other. int-vs-float (or int-vs-object-numeric) is a hard FAIL here."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if s.dtype == object:
        # HUGEINT can surface as object of Python ints/floats. Either way
        # it is NOT the int64 column Spark wrote — the driver's
        # dtype-sensitive hash fails on it — so classify object-numeric
        # into the DRIFT class ("float") rather than "int"; anything else
        # would make this check laxer than the driver's.
        non_null = s.dropna()
        if len(non_null) and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                                 for v in non_null.head(100)):
            return "float"
    return "other"


def dtype_strict_fail(name: str, got: pd.DataFrame, want: pd.DataFrame) -> bool:
    """True (and prints FAIL) if any shared column drifts between the
    int and float classes across Spark vs DuckDB. Must stay strictly
    HARSHER than the driver's gate, never laxer."""
    bad = False
    for c in sorted(set(got.columns) & set(want.columns)):
        gk, wk = dtype_class(got[c]), dtype_class(want[c])
        if gk != wk and {gk, wk} <= {"int", "float"}:
            print(f"FAIL {name}: col {c} dtype drift: spark={got[c].dtype} ({gk}) "
                  f"vs duckdb={want[c].dtype} ({wk}) — cast the oracle "
                  f"(HUGEINT from SUM/COUNT windows is the known trap)")
            bad = True
    return bad


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonicalize dtypes for value-compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def canonical_hash(df: pd.DataFrame) -> str:
    """Stable content hash for the frozen-output pins of the not-SQL-
    expressible queries: canonical column order / dtypes / row order via
    norm(), then CSV with %.17g floats (bit-exact round-trip for binary64
    — these queries are deterministic, spec-asserted) hashed with sha256.
    """
    import hashlib
    body = norm(df).to_csv(index=False, float_format="%.17g", na_rep="\\N")
    return hashlib.sha256(body.encode("utf-8")).hexdigest()


def load_pins() -> dict:
    """tools/pins.json: {sf_name: {query: sha256}} frozen-output pins for
    the no-oracle queries (ann_hnsw_topk, ann_ivfpq_topk, x5_blat_text). The pin asserts DETERMINISM + NON-REGRESSION
    against an output reviewed once at pin time — not independent
    correctness (DuckDB cannot express these); independent evidence lives
    in the ScalaTest recall/truth-table/determinism specs. Regenerate
    deliberately with tools/pin_update.py after a reviewed change.
    """
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), "pins.json")
    if os.path.exists(p):
        return json.load(open(p))
    return {}


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = 0
    for name, sql in sorted(oracle.items()):
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            fails += 1
            continue
        got = pd.concat([pd.read_parquet(f) for f in spark_files])
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            fails += 1
            continue
        if dtype_strict_fail(name, got, want):
            fails += 1
            continue
        g, w = norm(got), norm(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: cols {list(g.columns)} != {list(w.columns)}")
            fails += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            fails += 1
            continue
        ok = True
        for c in g.columns:
            a, b = g[c].values, w[c].values
            if pd.api.types.is_float_dtype(g[c]):
                eq = np.array_equal(a, b, equal_nan=True)
            else:
                eq = (pd.Series(a).fillna("\x00") == pd.Series(b).fillna("\x00")).all()
            if not eq:
                mism = None
                for i in range(len(a)):
                    av, bv = a[i], b[i]
                    same = (av == bv) or (pd.isna(av) and pd.isna(bv))
                    if not same:
                        mism = (i, av, bv)
                        break
                print(f"FAIL {name}: col {c} differs, first at row {mism[0]}: spark={mism[1]!r} duck={mism[2]!r}")
                ok = False
                fails += 1
                break
        if ok:
            print(f"OK   {name}: {len(g)} rows")
    # no-oracle queries: frozen-output pin when one exists for this SF
    # (determinism + non-regression — see load_pins), rows-only otherwise
    pins = load_pins().get(os.path.basename(sf_dir.rstrip("/")), {})
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name not in oracle:
            files = glob.glob(f"{d}/*.parquet")
            if not files:
                print(f"WARN {name}: rows-only, 0 rows")
                continue
            df = pd.concat([pd.read_parquet(f) for f in files])
            if name in pins:
                h = canonical_hash(df)
                if h == pins[name]:
                    print(f"OK   {name}: pinned output, {len(df)} rows, hash match")
                else:
                    print(f"FAIL {name}: pinned-output hash mismatch "
                          f"({h[:12]} != {pins[name][:12]}) — output changed; "
                          "review + tools/pin_update.py if intended")
                    fails += 1
            else:
                print(f"{'OK  ' if len(df) > 0 else 'WARN'} {name}: rows-only, {len(df)} rows")
    print(f"\n{'ALL GREEN' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
