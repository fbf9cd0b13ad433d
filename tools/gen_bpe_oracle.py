"""Generate the precomputed-expectation oracle for text_bpe_merges.

INDEPENDENT of the Spark implementation end-to-end: word frequencies come
from DuckDB (same tokenization contract as functions/text.words — the
SQL_WORDS twin used by every text oracle), and the 16 merges come from a
pure-Python classic BPE (same algorithm as tests/test_ops7._ref_bpe).
Prints the VALUES-oracle SQL to embed in the register() call.

Usage: python tools/gen_bpe_oracle.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import sys

import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 16

con = duckdb.connect()
wf = con.execute(
    rf"""
    SELECT word, count(*) AS n FROM (
        SELECT unnest(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                                  x -> x != '')) AS word
        FROM read_parquet('{sf_dir}/documents.parquet')
    ) GROUP BY word
    """
).fetchall()


def ref_bpe(word_counts, k):
    vocab = [(list(w) + ["</w>"], n) for w, n in word_counts]
    merges = []
    for rank in range(k):
        pc: dict = {}
        for syms, n in vocab:
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, l + r, cnt))
        nv = []
        for syms, n in vocab:
            out: list = []
            for s in syms:
                if out and out[-1] == l and s == r:
                    out[-1] = l + r
                else:
                    out.append(s)
            nv.append((out, n))
        vocab = nv
    return merges


def q(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


rows = ",\n        ".join(
    f"({rank}, {q(l)}, {q(r)}, {q(m)}, {cnt})"
    for rank, l, r, m, cnt in ref_bpe(wf, n_merges)
)
print(
    f"""    SELECT CAST(merge_rank AS INTEGER) AS merge_rank,
           "left", "right", merged,
           CAST(pair_n AS BIGINT) AS pair_n
    FROM (VALUES
        {rows}
    ) AS t(merge_rank, "left", "right", merged, pair_n)"""
)
