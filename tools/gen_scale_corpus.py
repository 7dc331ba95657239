#!/usr/bin/env python3
"""Regenerable 10x scale corpora for the memory-envelope and regime-bracket
probes (EnvelopeProbe / DupHeavyProbe / PpjoinProbe). The round-10 envelope
run originally used a throwaway /tmp corpus; this script makes those
measurements reproducible. Driver-side tooling only — not part of the
library. Seeded, so every run writes byte-identical logical content.

Usage:
  python3 tools/gen_scale_corpus.py sf1    /tmp/sf1      # 50.5k docs (49.5k
        synthetic in the sf0.1 31-word vocabulary + a planted 1000-doc
        identical class), 20k x 64-dim embeddings
  python3 tools/gen_scale_corpus.py sf1dup /tmp/sf1dup   # duplicate-heavy:
        100 identical classes x 400 docs + 10k uniques (50k docs)
"""
import sys
import numpy as np
import pandas as pd

# r19 (optimization guide §6, file layout): pandas' default writes ONE
# ~1M-row row group per call — /tmp/sf10dup documents landed as a SINGLE
# row group (scan parallelism 1 on a 32-core box) and sf100 embeddings as
# two ~282 MB row groups (2-way scans + ~270 MB vectored-read buffers per
# task, the 8 GB-heap OOM in HnswIndexMaintenanceProbe's post-insert
# batch). 32k rows/group keeps every corpus splittable to >= 15 tasks at
# the smallest envelope scale while staying well above the tiny-group
# overhead regime; logical content is unchanged (same seeds, same rows).
ROW_GROUP = 32768

VOCAB = ["a", "agg", "batch", "big", "column", "customer", "data", "dup",
         "fast", "filter", "group", "hash", "join", "key", "line", "merge",
         "order", "part", "query", "row", "scan", "slow", "small", "sort",
         "spark", "stream", "table", "the", "value", "vector", "window"]
LANGS = ["en", "en", "zh", "es", "fr", "de"]  # en twice ~ sf0.1 mix


def doc_text(rng, lo=8, hi=90):
    n = rng.integers(lo, hi + 1)
    return " ".join(rng.choice(VOCAB, size=n))


def docs_frame(texts, start_id):
    rng = np.random.default_rng(7)
    n = len(texts)
    return pd.DataFrame({
        "doc_id": np.arange(start_id, start_id + n, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(LANGS, size=n),
        "source": [f"src{int(i)}" for i in rng.integers(0, 20, size=n)],
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_sf1(out):
    rng = np.random.default_rng(42)
    uniques = [doc_text(rng) for _ in range(49_500)]
    planted = [uniques[0]] * 1000  # the identical boilerplate class
    df = docs_frame(uniques + planted, 0)
    df.to_parquet(f"{out}/documents.parquet", index=False, row_group_size=ROW_GROUP)
    erng = np.random.default_rng(43)
    n_emb, dim = 20_000, 64
    emb = erng.standard_normal((n_emb, dim)).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(emb),
        "label": erng.integers(0, 10, size=n_emb).astype(np.int32),
    }).to_parquet(f"{out}/embeddings.parquet", index=False, row_group_size=ROW_GROUP)
    # r14: 10x relational tables (keys + quantities only — exactly the
    # columns the j1/j8 interval-join envelope rows read) so the custom
    # IntervalStabJoin physical join gets an sf1 trend line beside the
    # dedup rows. Orderkeys are TPC-H-sparse (~4x the row count) so the
    # [o, o+9] interval fan-out matches the sf0.1 shape.
    rrng = np.random.default_rng(45)
    n_ord = 1_500_000
    okeys = np.sort(rrng.choice(
        np.arange(1, 4 * n_ord, dtype=np.int64), size=n_ord, replace=False))
    pd.DataFrame({"o_orderkey": okeys}).to_parquet(
        f"{out}/orders.parquet", index=False, row_group_size=ROW_GROUP)
    lines = rrng.integers(1, 8, size=n_ord)  # 1-7 lines/order, ~6M rows
    l_ok = np.repeat(okeys, lines)
    l_ln = np.concatenate([np.arange(1, n + 1, dtype=np.int64) for n in lines])
    pd.DataFrame({
        "l_orderkey": l_ok,
        "l_linenumber": l_ln,
        "l_quantity": rrng.integers(1, 51, size=len(l_ok)).astype(np.float64),
    }).to_parquet(f"{out}/lineitem.parquet", index=False, row_group_size=ROW_GROUP)
    print(f"sf1 -> {out}: {len(df)} docs, {n_emb}x{dim} embeddings, "
          f"{n_ord} orders, {len(l_ok)} lineitems")


def gen_sf10(out):
    """r15 (verdict ask #4): the 100x bracket — one decade past the sf1
    envelope. Docs/orders/lineitem at 10x sf1 with the same planted
    shapes, so the routed dedup path, the auto-router's decision, and the
    IntervalStabJoin sweep get a trend POINT beyond 10x (505k docs, 15M
    orders, ~60M lineitems). Embeddings stay at sf1 scale on purpose: the
    sf10 envelope's target families are dedup + interval joins.
    """
    rng = np.random.default_rng(52)
    uniques = [doc_text(rng) for _ in range(495_000)]
    planted = [uniques[0]] * 10_000
    df = docs_frame(uniques + planted, 0)
    df.to_parquet(f"{out}/documents.parquet", index=False, row_group_size=ROW_GROUP)
    erng = np.random.default_rng(53)
    n_emb, dim = 20_000, 64
    emb = erng.standard_normal((n_emb, dim)).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(emb),
        "label": erng.integers(0, 10, size=n_emb).astype(np.int32),
    }).to_parquet(f"{out}/embeddings.parquet", index=False, row_group_size=ROW_GROUP)
    rrng = np.random.default_rng(55)
    n_ord = 15_000_000
    okeys = np.sort(rrng.choice(
        np.arange(1, 4 * n_ord, dtype=np.int64), size=n_ord, replace=False))
    pd.DataFrame({"o_orderkey": okeys}).to_parquet(
        f"{out}/orders.parquet", index=False, row_group_size=ROW_GROUP)
    lines = rrng.integers(1, 8, size=n_ord)
    l_ok = np.repeat(okeys, lines)
    l_ln = np.concatenate([np.arange(1, n + 1, dtype=np.int64) for n in lines])
    pd.DataFrame({
        "l_orderkey": l_ok,
        "l_linenumber": l_ln,
        "l_quantity": rrng.integers(1, 51, size=len(l_ok)).astype(np.float64),
    }).to_parquet(f"{out}/lineitem.parquet", index=False, row_group_size=ROW_GROUP)
    print(f"sf10 -> {out}: {len(df)} docs, {n_emb}x{dim} embeddings, "
          f"{n_ord} orders, {len(l_ok)} lineitems")


def gen_sf10dup(out):
    """r16 (verdict ask #3): the sf10 corpus's dup_ratio is 0.0, so the
    auto-router's exact arm and the dup-heavy regime were unexercised at
    10x. This variant is the opposite bracket: 1000 identical classes x
    400 docs + 100k uniques (500k docs, dup_ratio ~0.8), plus 200k x 64
    embeddings (10x sf1's 20k) so one ANN family gets a true 10x point.
    Documents + embeddings only: the relational tables' 10x story lives in
    the plain sf10 corpus.
    """
    rng = np.random.default_rng(46)
    classes = [doc_text(rng) for _ in range(1000)]
    texts = [t for t in classes for _ in range(400)]
    texts += [doc_text(rng) for _ in range(100_000)]
    df = docs_frame(texts, 0)
    df.to_parquet(f"{out}/documents.parquet", index=False, row_group_size=ROW_GROUP)
    erng = np.random.default_rng(47)
    n_emb, dim = 200_000, 64
    emb = erng.standard_normal((n_emb, dim)).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(emb),
        "label": erng.integers(0, 10, size=n_emb).astype(np.int32),
    }).to_parquet(f"{out}/embeddings.parquet", index=False, row_group_size=ROW_GROUP)
    print(f"sf10dup -> {out}: {len(df)} docs (1000x400 identical + 100k "
          f"uniques), {n_emb}x{dim} embeddings")


def gen_sf100(out):
    """r17 (verdict ask #2): the 100x bracket - 5M docs at dup_ratio ~0.8
    (10k planted classes x 400 + 1M uniques) + 2M x 64 embeddings (10x
    sf10dup's 200k), for the routed dedup / production ANN / batch BM25
    arms. Same shape as sf10dup, one decade up; relational tables stay
    in sf10 (their 100x story is the interval join's, measured there).
    """
    rng = np.random.default_rng(48)
    classes = [doc_text(rng) for _ in range(10_000)]
    texts = [t for t in classes for _ in range(400)]
    texts += [doc_text(rng) for _ in range(1_000_000)]
    df = docs_frame(texts, 0)
    df.to_parquet(f"{out}/documents.parquet", index=False, row_group_size=ROW_GROUP)
    erng = np.random.default_rng(49)
    n_emb, dim = 2_000_000, 64
    emb = erng.standard_normal((n_emb, dim)).astype(np.float32)
    pd.DataFrame({
        "vec_id": np.arange(n_emb, dtype=np.int64),
        "embedding": list(emb),
        "label": erng.integers(0, 10, size=n_emb).astype(np.int32),
    }).to_parquet(f"{out}/embeddings.parquet", index=False, row_group_size=ROW_GROUP)
    print(f"sf100 -> {out}: {len(df)} docs (10000x400 identical + 1M "
          f"uniques), {n_emb}x{dim} embeddings")


def gen_sf1dup(out):
    rng = np.random.default_rng(44)
    classes = [doc_text(rng) for _ in range(100)]
    texts = [t for t in classes for _ in range(400)]
    texts += [doc_text(rng) for _ in range(10_000)]
    df = docs_frame(texts, 0)
    df.to_parquet(f"{out}/documents.parquet", index=False, row_group_size=ROW_GROUP)
    print(f"sf1dup -> {out}: {len(df)} docs (100x400 identical + 10k uniques)")


if __name__ == "__main__":
    kind, out = sys.argv[1], sys.argv[2]
    import os
    os.makedirs(out, exist_ok=True)
    {"sf1": gen_sf1, "sf10": gen_sf10, "sf1dup": gen_sf1dup,
     "sf10dup": gen_sf10dup, "sf100": gen_sf100}[kind](out)
