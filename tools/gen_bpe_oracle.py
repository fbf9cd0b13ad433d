"""Generate the precomputed-expectation oracle for text_bpe_merges.

INDEPENDENT of the Spark implementation end-to-end: word frequencies come
from DuckDB (same tokenization contract as functions/text.words — the
SQL_WORDS twin used by every text oracle), and the 16 merges come from a
pure-Python classic BPE (same algorithm as tests/test_ops7._ref_bpe).
Prints the VALUES-oracle SQL to embed in the register() call.

With ``--tokenize``: instead of the merge table, derive PER-DOCUMENT
token statistics (tokenize every word with the trained merges, roll up
per doc) and write the VALUES oracle to
etl_s3_to_redshift_spark/oracles/text_bpe_tokenize.sql.

With ``--report``: derive the PER-(lang, source) tokenizer-evaluation
report (doc/word/token/char totals, fertility = tokens/word,
chars/token) the same independent way and write it to
etl_s3_to_redshift_spark/oracles/text_tokenizer_report.sql.

Usage: python tools/gen_bpe_oracle.py [sf_dir] [n_merges] [--tokenize|--report]
"""

from __future__ import annotations

import os
import sys

import duckdb

args = [a for a in sys.argv[1:] if a not in ("--tokenize", "--report")]
tokenize_mode = "--tokenize" in sys.argv[1:]
report_mode = "--report" in sys.argv[1:]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
n_merges = int(args[1]) if len(args) > 1 else 16

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


def tokenize_word(w: str, merges: list[tuple[str, str]]) -> list[str]:
    syms = list(w) + ["</w>"]
    for l, r in merges:
        out: list[str] = []
        for s in syms:
            if out and out[-1] == l and s == r:
                out[-1] = l + r
            else:
                out.append(s)
        syms = out
    return syms


if report_mode:
    merges = [(l, r) for _, l, r, _, _ in ref_bpe(wf, n_merges)]
    cache: dict[str, list[str]] = {}
    docs = con.execute(
        rf"""
        SELECT doc_id, lang, source,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x != '') AS ws
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id
        """
    ).fetchall()
    groups: dict = {}
    for _doc_id, lang, source, ws in docs:
        g = groups.setdefault((lang, source), [0, 0, 0, 0])
        g[0] += 1
        g[1] += len(ws)
        for w in ws:
            if w not in cache:
                cache[w] = tokenize_word(w, merges)
            g[2] += len(cache[w])
            g[3] += len(w)
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x: float):
        # Spark F.round is HALF_UP on the double's shortest decimal
        # repr; Python round() is banker's — they differ exactly on
        # representable halves (703/640 = 1.0984375 -> 1.098438 vs
        # 1.098437). Replay Spark's rule.
        return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                               rounding=ROUND_HALF_UP))

    rows = []
    for (lang, source), (nd, nw, nt, nc) in sorted(groups.items()):
        fert = r6(nt / nw) if nw else None
        cpt = r6(nc / nt) if nt else None
        rows.append((lang, source, nd, nw, nt, nc, fert, cpt))

    def dlit(v):
        return f"CAST('{v!r}' AS DOUBLE)" if v is not None else "NULL"

    vals = ",\n        ".join(
        f"({q(l)}, {q(s)}, {nd}, {nw}, {nt}, {nc}, {dlit(fe)}, {dlit(cp)})"
        for l, s, nd, nw, nt, nc, fe, cp in rows
    )
    sql = f"""    SELECT lang, source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_words AS BIGINT) AS n_words,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           fertility, chars_per_token
    FROM (VALUES
        {vals}
    ) AS t(lang, source, n_docs, n_words, n_tokens, n_chars,
           fertility, chars_per_token)"""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "etl_s3_to_redshift_spark", "oracles", "text_tokenizer_report.sql",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(sql + "\n")
    print(f"wrote {out_path} ({len(rows)} rows)")
elif tokenize_mode:
    merges = [(l, r) for _, l, r, _, _ in ref_bpe(wf, n_merges)]
    cache: dict[str, list[str]] = {}
    docs = con.execute(
        rf"""
        SELECT doc_id,
               list_filter(string_split_regex(trim(lower(text)), '\s+'),
                           x -> x != '') AS ws
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id
        """
    ).fetchall()
    rows = []
    for doc_id, ws in docs:
        toks: list[str] = []
        for w in ws:
            if w not in cache:
                cache[w] = tokenize_word(w, merges)
            toks.extend(cache[w])
        rows.append((doc_id, len(toks), len(set(toks)),
                     toks[0] if toks else None, toks[-1] if toks else None))
    vals = ",\n        ".join(
        "({}, {}, {}, {}, {})".format(
            d, n, u, q(f) if f is not None else "NULL",
            q(t) if t is not None else "NULL")
        for d, n, u, f, t in rows
    )
    sql = f"""    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_tokens AS INTEGER) AS n_tokens,
           CAST(n_unique AS INTEGER) AS n_unique,
           first_token, last_token
    FROM (VALUES
        {vals}
    ) AS t(doc_id, n_tokens, n_unique, first_token, last_token)"""
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "etl_s3_to_redshift_spark", "oracles", "text_bpe_tokenize.sql",
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(sql + "\n")
    print(f"wrote {out_path} ({len(rows)} rows)")
else:
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
