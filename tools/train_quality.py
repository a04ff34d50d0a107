#!/usr/bin/env python
"""Train the in-repo text-quality classifier.

The distillation technique real pretraining pipelines use (GPT-3's
WebText-similarity classifier, LLaMA's wiki-reference classifier):
take a label you can only compute rule-wise (here the deterministic
quality_score rule at the strict all-four-rules threshold (1.0; 62/38 class balance on this corpus — 0.75 is degenerate at 99.8% positive) — replicated below in plain
Python), and distill it into a SMOOTH hashed-unigram logistic
regression whose probability works as a sampling weight, not just a
hard gate. Features are token counts hashed into DIM buckets
(hashing trick, md5-derived — engine-reproducible), normalized by
token count; the label rule sees character-level structure the
features don't, so held-out accuracy measures genuine generalization,
not a table lookup.

Weights quantize to integer MICRO-units: the scoring fold is exact
long addition (partition-order-free) and runs ENTIRELY in Catalyst
expressions — no UDF of any kind (functions/text.py
quality_model_score); the DuckDB oracle replays the identical fold.

Run: python tools/train_quality.py  (deterministic; commit the JSON)
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import numpy as np

DIM = 256
THRESHOLD = 1.0
SEED = 13
STOPWORDS_EN = [
    "the", "and", "of", "to", "in", "is", "that", "it", "for", "with",
    "a", "an", "as", "at", "by", "on", "or", "be",
]
_STOP_RE = re.compile(r"\b(" + "|".join(STOPWORDS_EN) + r")\b")


def h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_quality(text: str) -> float:
    """Plain-Python replica of functions/text.py quality_score."""
    n_chars = len(text)
    toks = [t for t in re.split(r"\s+", text) if t]
    n_tokens = max(len(toks), 1)
    alpha = len(re.sub(r"[^A-Za-z]", "", text)) / max(n_chars, 1)
    stop = len(_STOP_RE.findall(text.lower())) / n_tokens
    mean_word = n_chars / n_tokens
    q = 0.0
    q += 0.25 if 50 <= n_chars <= 20000 else 0.0
    q += 0.25 if alpha >= 0.6 else 0.0
    q += 0.25 if stop >= 0.05 else 0.0
    q += 0.25 if 3 <= mean_word <= 12 else 0.0
    return q


def featurize(text: str) -> np.ndarray:
    x = np.zeros(DIM)
    toks = [t.lower() for t in re.split(r"\s+", text) if t]
    for t in toks:
        x[h60(t) % DIM] += 1.0
    return x / max(len(toks), 1)


def main() -> None:
    import duckdb

    rows = duckdb.sql(
        "SELECT doc_id, text FROM '/root/testdata/sf0.01/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    X = np.stack([featurize(t) for _, t in rows])
    y = np.array([1.0 if py_quality(t) >= THRESHOLD else 0.0 for _, t in rows])
    rng = np.random.default_rng(SEED)
    idx = rng.permutation(len(y))
    cut = int(0.8 * len(y))
    tr, ho = idx[:cut], idx[cut:]

    w = np.zeros(DIM)
    b = 0.0
    lr, l2 = 2.0, 1e-4
    for _ in range(4000):
        z = X[tr] @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y[tr]
        w -= lr * (X[tr].T @ g / len(tr) + l2 * w)
        b -= lr * g.mean()

    def acc(ix):
        return float((((X[ix] @ w + b) > 0) == (y[ix] > 0.5)).mean())

    a_tr, a_ho = acc(tr), acc(ho)
    print(f"train acc {a_tr:.3f}  holdout acc {a_ho:.3f}  pos rate {y.mean():.3f}")
    assert a_ho >= 0.70, "holdout accuracy too low — refusing to ship the artifact"

    model = {
        "dim": DIM,
        "threshold": THRESHOLD,
        "weights_micro": [int(round(x * 1_000_000)) for x in w],
        "bias_micro": int(round(b * 1_000_000)),
        "train_acc": round(a_tr, 4),
        "holdout_acc": round(a_ho, 4),
        "trained_on": "sf0.01 documents, label = quality_score >= 1.0",
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "logprep_spark", "operators", "quality_model.json",
    )
    with open(out, "w") as f:
        json.dump(model, f)
    print("wrote", out)


if __name__ == "__main__":
    main()
