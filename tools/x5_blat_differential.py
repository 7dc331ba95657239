#!/usr/bin/env python3
"""Adversarial differential for the SHIPPED x5 blat oracle SQL (r15 ADVICE).

The in-suite X5OracleDerivationSpec pins the scalar DERIVATION against the
kernel; this script closes the remaining gap — the SQL TEXT itself — by
feeding the exact string the gate ships (via `graft.PrintOracle`, so a
copy can never drift) through DuckDB over the adversarial corpus families
the oracle was built with (uniform / a-heavy / boundary-length / g-run /
t-heavy, plus planted and mutated hits), and comparing per-doc
(n_hits, first_end) against an independent implementation of the blat
kernel (transliterated from graft.bio.SimilarityKernels.blatSimilarity,
the truth-table-pinned semantics).

Usage (driver-side python has duckdb + pyarrow):
    sbt -batch --error "runMain graft.PrintOracle x5_blat_text target/x5_oracle.sql"
    python3 tools/x5_blat_differential.py [target/x5_oracle.sql]

Exit 0 = zero diffs across every corpus; nonzero prints the first diffs.
"""
import random
import sys

import duckdb

GENE = "gattacca"
MID, ENDL = 10, 2


# ---------------------------------------------------------------- kernel
def base_matches(g, d):
    return d == g or (g == "c" and d == "t")


def blat_similarity(gene, db, offset, mid=MID, endl=ENDL):
    """(matched?, end-exclusive or None) — SimilarityKernels.blatSimilarity."""

    def search(pos_gene, pos_data, insert_data):
        if pos_gene < 4:
            matched_len, cond = 1, False
            while pos_gene < 4 and pos_data < len(db):
                while not base_matches(gene[pos_gene], db[pos_data]):
                    matched_len = 0
                    insert_data += 1
                    pos_data += 1
                    if insert_data > mid or pos_data >= len(db):
                        return (False, None)
                if matched_len > 0:
                    cond = True
                matched_len += 1
                pos_gene += 1
                pos_data += 1
            if not cond:
                return (False, None)
            return search(4, pos_data + 1, 0)
        if pos_gene == 4:
            if insert_data > mid or pos_data >= len(db):
                return (False, None)
            while not base_matches(gene[pos_gene], db[pos_data]):
                pos_data += 1
                insert_data += 1
                if pos_data >= len(db) or insert_data > mid:
                    return (False, None)
            ok, end = search(5, pos_data + 1, 0)
            if ok:
                return (ok, end)
            return search(4, pos_data + 1, insert_data + 1)
        matched_len, cond = 1, False
        while pos_gene < 8 and pos_data < len(db):
            while not base_matches(gene[pos_gene], db[pos_data]):
                matched_len = 0
                insert_data += 1
                pos_data += 1
                if insert_data > endl or pos_data >= len(db):
                    return (False, None)
            if matched_len > 0:
                cond = True
            matched_len += 1
            pos_gene += 1
            pos_data += 1
        return (cond, pos_data)

    if not base_matches(gene[0], db[offset]):
        return (False, None)
    return search(1, offset + 1, 0)


def blat_sweep(gene, dna, mid=MID, endl=ENDL):
    hits, first_end = 0, -1
    last = len(dna) - len(gene) - mid - endl - 2
    for o in range(0, last + 1):
        ok, end = blat_similarity(gene, dna, o, mid, endl)
        if ok:
            hits += 1
            if first_end < 0:
                first_end = end if end is not None else -1
    return hits, first_end


# ------------------------------------------------------------- corpora
# the gate maps text -> dna via 'acgt'[ascii(c) % 4]; pick printable
# letters per residue so the TEXT column (what the SQL actually reads)
# exercises the same mapping the gate's UDF applies
BY_RESIDUE = {
    "a": "dhlptx",  # ascii % 4 == 0
    "c": "aeimquy",  # % 4 == 1
    "g": "bfjnrvz",  # % 4 == 2
    "t": "cgkosw",  # % 4 == 3
}


def text_for(dna, rnd):
    return "".join(rnd.choice(BY_RESIDUE[ch]) for ch in dna)


def to_dna(text):
    return "".join("acgt"[ord(c) % 4] for c in text)


def rand_dna(rnd, n, wa, wc, wg, wt):
    return "".join(
        rnd.choices("acgt", weights=[wa, wc, wg, wt], k=n))


def corpora():
    rnd = random.Random(2026)
    fams = {}
    fams["uniform"] = [rand_dna(rnd, rnd.randint(30, 150), 1, 1, 1, 1)
                       for _ in range(800)]
    fams["a_heavy"] = [rand_dna(rnd, rnd.randint(30, 150), 7, 1, 1, 1)
                       for _ in range(800)]
    fams["g_run"] = [rand_dna(rnd, rnd.randint(30, 150), 1.5, 1, 6.5, 1)
                     for _ in range(800)]
    fams["t_heavy"] = [rand_dna(rnd, rnd.randint(30, 150), 1, 1, 1, 7)
                       for _ in range(800)]
    fams["boundary"] = [rand_dna(rnd, ln, *w)
                        for ln in range(20, 41)
                        for w in [(1, 1, 1, 1), (5, 1.5, 2, 1.5), (2, 1.5, 5, 1.5)]
                        for _ in range(30)]
    planted = []
    for filler in ("c" * 16, "t" * 16, "g" * 16):
        for pre in range(4):
            planted.append(filler[:pre] + GENE + filler)
            planted.append(filler[: 14 - pre] + filler[:pre] + GENE)
    for _ in range(1200):
        s = list("cccccc" + GENE + GENE + "cccccc")
        s[rnd.randrange(len(s))] = rnd.choice("acgt")
        planted.append("".join(s))
    fams["planted_mutated"] = planted
    return rnd, fams


# ------------------------------------------------------------------ main
def main():
    sql_path = sys.argv[1] if len(sys.argv) > 1 else "target/x5_oracle.sql"
    try:
        sql = open(sql_path).read()
    except FileNotFoundError:
        sys.exit(
            f"{sql_path} not found — dump the shipped SQL first:\n"
            '  sbt -batch --error "runMain graft.PrintOracle '
            f'x5_blat_text {sql_path}"')

    rnd, fams = corpora()
    total, bad = 0, 0
    for fam, dnas in fams.items():
        rows = []
        for i, dna in enumerate(dnas):
            text = text_for(dna, rnd)
            assert to_dna(text) == dna, "residue mapping broken"
            rows.append((i, text))
        con = duckdb.connect()
        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
        con.close()
        fam_bad = 0
        for i, dna in enumerate(dnas):
            want = blat_sweep(GENE, dna)
            if got.get(i) != want:
                fam_bad += 1
                if bad + fam_bad <= 10:
                    print(f"DIFF {fam}#{i}: sql={got.get(i)} kernel={want} "
                          f"dna={dna[:60]}{'...' if len(dna) > 60 else ''}")
        n_hits = sum(1 for i, d in enumerate(dnas) if got.get(i, (0,))[0] > 0)
        print(f"{fam}: {len(dnas)} docs, {n_hits} with hits, {fam_bad} diffs")
        total += len(dnas)
        bad += fam_bad
    print(f"TOTAL: {total} docs, {bad} diffs")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
