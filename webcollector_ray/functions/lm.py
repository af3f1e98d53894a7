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
import pandas as pd
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


def dsir_weights(
    ds,
    target_model_ref,
    raw_model_ref,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    ndigits: int = 6,
):
    """DSIR-style importance weights (Xie et al. 2023, Data Selection
    via Importance Resampling): rank raw docs by how much more likely
    their tokens are under a TARGET-domain LM than under the RAW-corpus
    LM. weight(doc) = mean over tokens of [ln p_target(w) -
    ln p_raw(w)], both unigram models from train_unigram_lm (top-V +
    add-one smoothing, V and total carried inside each model), rounded
    to `ndigits` so the DuckDB oracle — the same rational-arithmetic +
    ln recipe as unigram_lm_score — reproduces the value exactly.

    Map-only over the corpus; both models are bounded top-V broadcasts.
    Selection composes with ranking.global_top_n (weight desc, id
    tie-break) — top-m importance resampling without a global sort.
    Returns (id, n_tokens, dsir_weight); empty docs weigh 0.0."""

    def score(batch: pa.Table) -> pa.Table:
        mt = ray.get(target_model_ref)
        mr = ray.get(raw_model_ref)
        ct, dent = mt["counts"], float(mt["total"] + mt["v"] + 1)
        cr, denr = mr["counts"], float(mr["total"] + mr["v"] + 1)
        n_out = np.zeros(len(batch), dtype=np.int64)
        w_out = np.zeros(len(batch), dtype=np.float64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            words = (text or "").lower().split()
            if not words:
                continue
            nt = np.fromiter(
                (ct.get(w, 0) for w in words), dtype=np.float64,
                count=len(words),
            )
            nr = np.fromiter(
                (cr.get(w, 0) for w in words), dtype=np.float64,
                count=len(words),
            )
            n_out[i] = len(words)
            w_out[i] = round(
                float(np.mean(
                    np.log((nt + 1.0) / dent) - np.log((nr + 1.0) / denr)
                )),
                ndigits,
            )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_out),
                "dsir_weight": pa.array(w_out),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def source_kl_divergence(
    ds,
    corpus_model_ref,
    *,
    text_col: str = "text",
    source_col: str = "source",
    ndigits: int = 6,
    num_buckets: int = 16,
):
    """Per-source distribution drift: KL(P_source || P_corpus) over the
    corpus top-V vocabulary with add-one smoothing on both sides —
    the mix-analysis census that tells a data curator which source's
    word distribution departs furthest from the blend.

    KL(s) = sum over the model's V words of p_s(w) ln(p_s(w)/p_c(w)),
    p_s(w) = (c_s(w)+1)/(T_s+V+1), p_c(w) = (c(w)+1)/(T+V+1), with
    T_s = ALL tokens of source s (not just in-vocab ones). Rounded to
    `ndigits` (the lm.py float recipe), so DuckDB re-derives it
    bit-equal.

    Shape: per-batch Counter partials restricted to the broadcast
    top-V vocab plus one total-tokens row per source, ONE source-hash
    exchange, and a V-term numpy reduce per source — per-task state is
    O(V + sources), never the vocabulary. Returns (source, n_tokens,
    kl)."""
    from collections import Counter

    from .joins import exchange_reduce

    def partial(batch: pa.Table) -> pa.Table:
        model = ray.get(corpus_model_ref)
        vocab = model["counts"]
        srcs, words, ns = [], [], []
        df = pd.DataFrame(
            {
                source_col: batch[source_col].to_pylist(),
                text_col: batch[text_col].to_pylist(),
            }
        )
        for src, g in df.groupby(source_col, sort=False):
            c: Counter = Counter()
            total = 0
            for t in g[text_col]:
                ws = (t or "").lower().split()
                total += len(ws)
                c.update(w for w in ws if w in vocab)
            for w, n in c.items():
                srcs.append(src)
                words.append(w)
                ns.append(n)
            srcs.append(src)
            words.append("")  # the per-source total-token marker row
            ns.append(total)
        h = pd.util.hash_array(
            np.asarray(srcs, dtype=object), categorize=False
        )
        return pa.table(
            {
                source_col: pa.array(srcs, pa.string()),
                "w": pa.array(words, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "__bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    empty = pa.table(
        {
            source_col: pa.array([], pa.string()),
            "n_tokens": pa.array([], pa.int64()),
            "kl": pa.array([], pa.float64()),
        }
    )

    def reduce_fn(t: pa.Table) -> pa.Table:
        model = ray.get(corpus_model_ref)
        vocab = model["counts"]
        vlist = sorted(vocab)
        cvec = np.fromiter(
            (vocab[w] for w in vlist), dtype=np.float64, count=len(vlist)
        )
        pc_vec = (cvec + 1.0) / float(model["total"] + model["v"] + 1)
        widx = {w: i for i, w in enumerate(vlist)}
        df = t.select([source_col, "w", "n"]).to_pandas()
        if not len(df):
            return empty
        out_s, out_n, out_kl = [], [], []
        for src, g in df.groupby(source_col, sort=True):
            totals = g[g["w"] == ""]["n"].sum()
            svec = np.zeros(len(vlist), dtype=np.float64)
            gg = g[g["w"] != ""]
            agg = gg.groupby("w", sort=False)["n"].sum()
            for w, n in agg.items():
                svec[widx[w]] = n
            ps = (svec + 1.0) / float(totals + model["v"] + 1)
            kl = round(float(np.sum(ps * np.log(ps / pc_vec))), ndigits)
            out_s.append(src)
            out_n.append(int(totals))
            out_kl.append(kl)
        return pa.table(
            {
                source_col: pa.array(out_s, pa.string()),
                "n_tokens": pa.array(out_n, pa.int64()),
                "kl": pa.array(out_kl, pa.float64()),
            }
        )

    return exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        reduce_fn, empty, num_buckets,
    )


def train_bigram_lm(
    ds, *, text_col: str = "text", top_b: int = 4096, top_v: int = 1024,
    num_buckets: int = 32, lam: float = 0.7,
):
    """Interpolated bigram LM (Jelinek-Mercer smoothing: p = lam *
    p_bi + (1-lam) * p_uni — Chen & Goodman 1999's simplest mixture),
    the next quality-scoring rung above the unigram model.

    Bounded-state shape: ONE word-pair-hash exchange carries BOTH the
    bigram census and the per-first-word prefix census (each bigram
    occurrence also increments a "w1\\x1f" marker key, so no second
    corpus pass or prefix shuffle exists). Only the top-B bigrams and
    the prefix counts of the top-V unigram vocabulary are broadcast —
    model size is B + 2V rows regardless of corpus size; an OOV
    prefix takes count 0 exactly like an OOV unigram.

    p_bi(w2|w1) = (c_topB(w1,w2) + 1) / (c_prefix_topV(w1) + V + 1),
    p_uni as in train_unigram_lm; everything rational + ln so the
    DuckDB oracle re-derives scores bit-equal at 6 digits."""
    from collections import Counter

    from .joins import exchange_reduce
    from .ranking import global_top_n

    uni_ref, _total = train_unigram_lm(
        ds, text_col=text_col, top_v=top_v, num_buckets=num_buckets
    )

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            words = (t or "").lower().split()
            for w1, w2 in zip(words, words[1:]):
                c[w1 + "\x1f" + w2] += 1
                c[w1 + "\x1f"] += 1
        keys = list(c.keys())
        b = (
            pd.util.hash_array(
                np.asarray(keys, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32) if keys else np.zeros(0, dtype=np.int32)
        return pa.table(
            {
                "bg": pa.array(keys, pa.string()),
                "n": pa.array([c[k] for k in keys], pa.int64()),
                "__bucket": pa.array(b),
            }
        )

    empty = pa.table(
        {"bg": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def bucket_sum(t: pa.Table) -> pa.Table:
        df = t.select(["bg", "n"]).to_pandas()
        g = df.groupby("bg", sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        bucket_sum, empty, num_buckets,
    ).materialize()

    import pyarrow.compute as pc

    def only_bigrams(batch: pa.Table) -> pa.Table:
        return batch.filter(
            pc.invert(pc.ends_with(batch["bg"], pattern="\x1f"))
        )

    bigrams = counts.map_batches(only_bigrams, batch_format="pyarrow")
    top = global_top_n(bigrams, order_col="n", n=top_b, tie_col="bg")
    tabs = [t for t in ray.get(top.to_arrow_refs()) if t is not None and len(t)]
    bi = {}
    if tabs:
        t = pa.concat_tables(tabs)
        bi = dict(zip(t["bg"].to_pylist(), t["n"].to_pylist()))

    uni = ray.get(uni_ref)
    vocab = uni["counts"]
    marker_set = pa.array([w + "\x1f" for w in vocab], pa.string())

    def pref_filter(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_in(batch["bg"], value_set=marker_set))

    pref_tabs = [
        t for t in ray.get(
            counts.map_batches(
                pref_filter, batch_format="pyarrow"
            ).to_arrow_refs()
        )
        if t is not None and len(t)
    ]
    pref = {}
    if pref_tabs:
        t = pa.concat_tables(pref_tabs)
        pref = {
            bg[:-1]: n
            for bg, n in zip(t["bg"].to_pylist(), t["n"].to_pylist())
        }

    model = {
        "uni": uni["counts"], "total": uni["total"], "v": uni["v"],
        "bi": bi, "pref": pref, "lam": lam,
    }
    return ray.put(model)


def bigram_lm_score(
    ds, model_ref, *, text_col: str = "text", id_col: str = "doc_id",
    ndigits: int = 6,
):
    """Map-only interpolated-bigram scoring: (id, n_bigrams,
    bilm_score) = mean over bigram positions of ln(lam * p_bi +
    (1-lam) * p_uni(w2)). Docs with < 2 words score 0.0 over 0
    bigrams (nothing to average) — the same empty convention as
    unigram_lm_score."""

    def score(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        uni, bi, pref = m["uni"], m["bi"], m["pref"]
        lam = m["lam"]
        denom_u = float(m["total"] + m["v"] + 1)
        vp1 = float(m["v"] + 1)
        n_out = np.zeros(len(batch), dtype=np.int64)
        s_out = np.zeros(len(batch), dtype=np.float64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            words = (text or "").lower().split()
            if len(words) < 2:
                continue
            w1s = words[:-1]
            w2s = words[1:]
            cb = np.fromiter(
                (bi.get(a + "\x1f" + b, 0) for a, b in zip(w1s, w2s)),
                dtype=np.float64, count=len(w2s),
            )
            cp = np.fromiter(
                (pref.get(a, 0) for a in w1s),
                dtype=np.float64, count=len(w1s),
            )
            cu = np.fromiter(
                (uni.get(b, 0) for b in w2s),
                dtype=np.float64, count=len(w2s),
            )
            p = (
                lam * (cb + 1.0) / (cp + vp1)
                + (1.0 - lam) * (cu + 1.0) / denom_u
            )
            n_out[i] = len(w2s)
            s_out[i] = round(float(np.mean(np.log(p))), ndigits)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_bigrams": pa.array(n_out),
                "bilm_score": pa.array(s_out),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")
