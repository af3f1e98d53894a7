"""Unigram language-model quality scoring (CCNet-style, Wenzek et al.
2020: rank web text by LM score and filter the tail).

Training a real KenLM is out of scope for this container; the unigram
LM is the honest distributed version of the same pipeline shape:

1. TRAIN — corpus word counts via the word_counts bucket exchange
   (distributed, one shuffle of (word, n) partials), total token count
   as a native Dataset sum, then the distributed global top-V heavy
   hitters. Only the top-V table (bounded: V rows, independent of
   corpus size) is collected and broadcast with ray.put — the full
   vocabulary never lands on one machine.
2. SCORE — map-only pass: every doc's mean token log-probability
   under add-one smoothing over the top-V model; out-of-vocabulary
   tokens take the smoothed zero-count probability. No shuffle over
   the corpus side.

p(w) = (cnt_topV(w) + 1) / (total_tokens + V + 1), score(doc) =
mean(ln p(w)); higher = more "in-distribution". The whole model is
rational arithmetic + ln, so a DuckDB oracle re-derives it exactly
(scores rounded to 6 decimals on both sides — summation order and
last-ulp libm differences sit ~10 orders below that).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from .sketches import word_counts
from .ranking import global_top_n


def train_unigram_lm(
    ds, *, text_col: str = "text", top_v: int = 1024, num_buckets: int = 32
):
    """(model_ref, total_tokens): model is a dict {"counts": word ->
    count over the top-V heavy hitters, "total": total corpus tokens,
    "v": the smoothing V}, broadcast once via ray.put. V travels INSIDE
    the model so scoring can never use a mismatched smoothing
    denominator (ADVICE r2: top_v repeated at score time was a silent
    wrong-score trap). total_tokens is also returned separately for
    convenience/back-compat."""
    counts = word_counts(ds, text_col=text_col, num_buckets=num_buckets)
    total = int(counts.sum("n") or 0)
    top = global_top_n(counts, order_col="n", n=top_v, tie_col="word")
    tt = top.to_arrow_refs()
    tabs = [t for t in ray.get(tt) if t is not None and len(t)]
    wordcounts = {}
    if tabs:
        t = pa.concat_tables(tabs)
        wordcounts = dict(zip(t["word"].to_pylist(), t["n"].to_pylist()))
    model = {"counts": wordcounts, "total": total, "v": top_v}
    return ray.put(model), total


def unigram_lm_score(
    ds,
    model_ref,
    total_tokens: int = None,  # deprecated: read from the model object
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 6,
):
    """Map-only scoring pass: (id, n_tokens, lm_score). Empty docs
    score 0.0 (no tokens to average). total/V come from the broadcast
    model object itself — callers cannot desynchronize them."""

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        model = m["counts"]
        denom = float(m["total"] + m["v"] + 1)
        n_out = np.zeros(len(batch), dtype=np.int64)
        s_out = np.zeros(len(batch), dtype=np.float64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            words = (text or "").lower().split()
            if not words:
                continue
            cnts = np.fromiter(
                (model.get(w, 0) for w in words), dtype=np.float64,
                count=len(words),
            )
            n_out[i] = len(words)
            s_out[i] = round(
                float(np.mean(np.log((cnts + 1.0) / denom))), ndigits
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_out),
                "lm_score": pa.array(s_out),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
