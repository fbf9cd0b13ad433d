"""Generate a Zipf-distributed synthetic text corpus with a REAL
vocabulary (~100k distinct words) — the driver testdata's documents table
has only 31 distinct words at sf0.1 (VERDICT r5 item 2), so the
vocab-bound text machinery (distributed BPE past local_vocab_max,
apply_bpe_vocab's vocabulary join past auto-broadcast, TF-IDF / Zipf at
real vocabulary) is never stressed by it.

Output: .localdata/vocab/documents.parquet (gitignored derived data,
same schema as the driver lake's documents table). Deterministic
(seeded); regenerate with `python tools/gen_vocab_corpus.py`.

Shape (defaults): 25k docs × ~160 words ≈ 4M tokens drawn from a
120k-word vocabulary with Zipf(s=1.07) frequencies — English-like rank
curve; ~90k+ distinct words actually observed. Words are deterministic
letter strings with frequent words shorter (realistic length/rank
correlation, and it gives BPE real subword structure to learn).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "vocab"
)

VOCAB = 120_000
N_DOCS = 25_000
MEAN_WORDS = 160
ZIPF_S = 1.07
SEED = 42

_CONS = list("bcdfghjklmnpqrstvwz")
_VOW = list("aeiou")


def _word(rank: int, rng: np.random.Generator) -> str:
    """Deterministic pseudo-word for a vocab rank: alternating
    consonant/vowel syllables, length growing with rank (frequent words
    are short, like real language)."""
    n_syll = 1 + (rank > 50) + (rank > 1_000) + (rank > 20_000) + (rank > 80_000)
    r = np.random.default_rng(SEED * 1_000_003 + rank)
    out = []
    for _ in range(n_syll):
        out.append(_CONS[int(r.integers(len(_CONS)))])
        out.append(_VOW[int(r.integers(len(_VOW)))])
        if r.random() < 0.4:
            out.append(_CONS[int(r.integers(len(_CONS)))])
    return "".join(out)


def main() -> None:
    rng = np.random.default_rng(SEED)
    print(f"building {VOCAB}-word vocabulary ...", flush=True)
    vocab = np.array([_word(i, rng) for i in range(VOCAB)])
    # Zipf probabilities over ranks
    p = 1.0 / np.power(np.arange(1, VOCAB + 1, dtype=np.float64), ZIPF_S)
    p /= p.sum()

    print(f"sampling {N_DOCS} docs ...", flush=True)
    lengths = np.maximum(
        5, rng.lognormal(mean=np.log(MEAN_WORDS), sigma=0.5, size=N_DOCS)
    ).astype(np.int64)
    total = int(lengths.sum())
    draws = rng.choice(VOCAB, size=total, p=p)
    distinct = np.unique(draws).size
    print(f"  total tokens={total}  distinct words observed={distinct}")

    texts = []
    off = 0
    for n in lengths:
        texts.append(" ".join(vocab[draws[off : off + int(n)]]))
        off += int(n)

    table = pa.table(
        {
            "doc_id": pa.array(np.arange(N_DOCS, dtype=np.int64)),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(["en"] * N_DOCS, type=pa.string()),
            "source": pa.array(["zipf_synth"] * N_DOCS, type=pa.string()),
            "n_chars": pa.array(
                np.array([len(t) for t in texts], dtype=np.int64)
            ),
        }
    )
    os.makedirs(OUT_DIR, exist_ok=True)
    pq.write_table(table, os.path.join(OUT_DIR, "documents.parquet"))
    print(f"wrote {OUT_DIR}/documents.parquet ({table.nbytes/1e6:.0f} MB in memory)")


if __name__ == "__main__":
    sys.exit(main())
