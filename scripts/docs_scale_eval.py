#!/usr/bin/env python
"""Measure how the document/dedup operator family scales with corpus
size (SCALE.md 'documents 10x' section).

Generates two synthetic corpora from the SAME generator (5k and 50k
docs — zipf-ish vocabulary, lognormal lengths, 5% planted near-dups of
earlier docs) so the comparison is apples-to-apples, then times the
headline dedup/curation queries on each (warm = min of 2 post-codegen
runs). The interesting number is the scaling EXPONENT per query: a
df-capped inverted index should grow ~linearly in docs, not
quadratically in pairs.
"""

from __future__ import annotations

import os
import string
import sys
import tempfile
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES_TO_TIME = [
    "dedup_exact",
    "ngram_jaccard_pairs",
    "ngram_jaccard_prefix",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "curate_corpus",
    "doc_stats",
    "quality_score",
    "tfidf_top_terms",
    "segment_dedup",
    "ngram_containment_pairs",
    "bigram_logprob_score",
    "corpus_shuffle_shards",
    "segment_neardup",
    "curriculum_order",
]


def gen_corpus(n_docs: int, out_dir: str, seed: int = 7) -> str:
    rng = np.random.default_rng(seed)
    letters = np.array(list(string.ascii_lowercase))
    vocab = [
        "".join(rng.choice(letters, size=rng.integers(3, 10)))
        for _ in range(5000)
    ]
    # zipf-ish rank weights
    w = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    w /= w.sum()
    texts: list[str] = []
    for i in range(n_docs):
        if i > 100 and rng.random() < 0.05:
            # near-dup: perturb ~10% of an earlier doc's words
            src = texts[rng.integers(0, i - 1)].split()
            idx = rng.random(len(src)) < 0.1
            for j in np.flatnonzero(idx):
                src[j] = vocab[rng.choice(len(vocab), p=w)]
            texts.append(" ".join(src))
        else:
            n = max(12, int(rng.lognormal(4.0, 0.6)))
            ids = rng.choice(len(vocab), size=n, p=w)
            texts.append(" ".join(vocab[k] for k in ids))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n_docs), type=pa.int64()),
            "text": texts,
            "lang": ["en"] * n_docs,
            "source": [f"src_{i % 7}" for i in range(n_docs)],
            "n_chars": [len(t) for t in texts],
        }
    )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    pq.write_table(tbl, path)
    return out_dir


def main() -> None:
    from pandas_etl_spark.catalog import QUERIES
    from pandas_etl_spark.session import get_spark

    # override via env: DOCS_SCALE_SIZES="50000,500000" DOCS_SCALE_QUERIES="a,b"
    sizes = [
        int(x) for x in os.environ.get("DOCS_SCALE_SIZES", "5000,50000").split(",")
    ]
    queries = (
        os.environ["DOCS_SCALE_QUERIES"].split(",")
        if "DOCS_SCALE_QUERIES" in os.environ
        else QUERIES_TO_TIME
    )
    if len(sizes) < 2:
        raise SystemExit(
            "DOCS_SCALE_SIZES needs >= 2 comma-separated sizes to form a "
            "scaling ratio (review r5b #8)"
        )
    spark = get_spark("docs-scale")
    base = tempfile.mkdtemp(prefix="docs_scale_")
    dirs = [
        gen_corpus(n, os.path.join(base, f"n{n}")) for n in sizes
    ]

    header = f"{'query':22s}" + "".join(f" {n:>8d}w" for n in sizes)
    header += "".join(f" {'r' + str(i):>6s}" for i in range(1, len(sizes)))
    print(header, flush=True)
    for name in queries:
        row = []
        for sf_dir in dirs:
            samples = []
            for run in range(3):
                t0 = time.perf_counter()
                QUERIES[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                samples.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            row.append(min(samples[1:]))  # warm
        line = f"{name:22s}" + "".join(f" {t:>8.2f}" for t in row)
        line += "".join(
            f" {row[i] / row[i - 1]:>5.1f}x" for i in range(1, len(row))
        )
        print(line, flush=True)


if __name__ == "__main__":
    main()
