"""Text analysis operators for large-scale training-data pipelines.

Beyond the reference's operator set (SURVEY.md §2.7 is per-page scalar
extraction); these are the corpus-level text ops a 100 TB pipeline
needs: token counting, quality scoring, language ID, fingerprinting.
All hot paths are vectorized pyarrow.compute kernels; language ID is a
stateful stage (profiles built once per actor).
"""

from __future__ import annotations

import hashlib
import re
from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

# ---------------------------------------------------------------- tokens


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count, Python str.split() semantics (empty ->
    0). Vectorized: trim + split on whitespace runs."""
    text = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    n = pc.list_value_length(pc.split_pattern_regex(trimmed, r"\s+"))
    n = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()), pc.cast(n, pa.int32()))
    return batch.append_column("n_tokens", pc.cast(n, pa.int64()))


def length_bucket_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """log2 token-length bucket per doc (the histogram axis every
    packing/batching design starts from): bucket = floor(log2(n_tokens)),
    -1 for empty docs. Exact integer bucketing via frexp (no libm log
    rounding at power-of-two edges), fully vectorized."""
    t = token_count_batch(batch, text_col)
    n = t["n_tokens"].to_numpy(zero_copy_only=False)
    # frexp: n = m * 2**e with m in [0.5, 1) -> floor(log2(n)) == e - 1
    _, e = np.frexp(n.astype(np.float64))
    bucket = np.where(n > 0, e.astype(np.int64) - 1, np.int64(-1))
    return t.append_column("len_bucket", pa.array(bucket, pa.int64()))


def length_histogram(ds, text_col: str = "text"):
    """Corpus token-length histogram: per-block partial counts inside
    map_batches, then one tiny groupby over <=64 distinct buckets —
    the pre-aggregated COUNT/SUM shape (never a full-row exchange)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = length_bucket_batch(batch, text_col)
        df = t.select(["len_bucket", "n_tokens"]).to_pandas()
        g = df.groupby("len_bucket", as_index=False).agg(
            n_docs=("n_tokens", "size"), sum_tokens=("n_tokens", "sum")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return parts.groupby("len_bucket").aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_tokens", alias_name="sum_tokens"),
    )


_BPE_ISH = r"[A-Za-z]+|[0-9]{1,3}|[^\sA-Za-z0-9]"


def bpe_ish_token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """BPE-ish sub-token count: alpha runs + short digit groups + single
    punctuation, via one vectorized regex count."""
    n = pc.count_substring_regex(batch[text_col], _BPE_ISH)
    return batch.append_column("n_subtokens", pc.cast(n, pa.int64()))


# ---------------------------------------------------------------- quality


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring features: n_chars, n_tokens, avg token length,
    punctuation ratio, alpha ratio. Pure Arrow kernels."""
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    batch = token_count_batch(batch, text_col)
    n_tokens = batch["n_tokens"]
    non_space = pc.cast(
        pc.count_substring_regex(text, r"\S"), pa.int64()
    )
    avg_tok = pc.if_else(
        pc.greater(n_tokens, 0),
        pc.divide(pc.cast(non_space, pa.float64()), pc.cast(n_tokens, pa.float64())),
        pa.scalar(0.0),
    )
    n_punct = pc.cast(pc.count_substring_regex(text, r"[.,!?;:]"), pa.int64())
    punct_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(n_punct, pa.float64()), pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0),
    )
    n_alpha = pc.cast(pc.count_substring_regex(text, r"[A-Za-z]"), pa.int64())
    alpha_ratio = pc.if_else(
        pc.greater(n_chars, 0),
        pc.divide(pc.cast(n_alpha, pa.float64()), pc.cast(n_chars, pa.float64())),
        pa.scalar(0.0),
    )
    for name, col in [
        ("n_chars", n_chars),
        ("avg_token_len", avg_tok),
        ("punct_ratio", punct_ratio),
        ("alpha_ratio", alpha_ratio),
    ]:
        batch = batch.append_column(name, col)
    return batch


# ---------------------------------------------------------------- lang id

_PROFILES = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "was",
           "with", "are", "this", "have", "not"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "den", "von", "sich", "dass"},
    "fr": {"le", "la", "les", "des", "est", "une", "dans", "que", "pour",
           "sur", "avec", "pas", "qui", "nous", "vous"},
    "es": {"el", "la", "los", "las", "es", "una", "en", "que", "por", "para",
           "con", "del", "se", "su", "como"},
    "it": {"il", "la", "di", "che", "è", "per", "una", "sono", "con", "non",
           "del", "gli", "più", "questo", "della"},
}

_WORD_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


class LangIdStage:
    """n-gram/stopword heuristic language ID — callable class for an
    actor pool (profiles compiled once per actor, ST-style)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: frozenset(v) for k, v in _PROFILES.items()}

    def classify(self, text: Optional[str]) -> str:
        if not text:
            return "und"
        n = len(text)
        cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
        if cjk / min(n, 2000) > 0.1:
            return "zh"
        kana = sum(1 for ch in text[:2000] if "぀" <= ch <= "ヿ")
        if kana / min(n, 2000) > 0.05:
            return "ja"
        cyr = sum(1 for ch in text[:2000] if "Ѐ" <= ch <= "ӿ")
        if cyr / min(n, 2000) > 0.3:
            return "ru"
        words = [w.lower() for w in _WORD_RE.findall(text[:4000])]
        if not words:
            return "und"
        best_lang, best_score = "und", 0.0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in words if w in stops) / len(words)
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang if best_score > 0.02 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self.classify(t) for t in batch[self.text_col].to_pylist()]
        return batch.append_column("lang_pred", pa.array(preds, pa.string()))


_LANG_STAGE_CACHE: dict = {}


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Stateless-task form of LangIdStage with a per-worker-process
    cache — scales to the whole pool with no actor-pool sizing (a
    fixed-size pool can starve downstream ops on small clusters)."""
    stage = _LANG_STAGE_CACHE.get(text_col)
    if stage is None:
        stage = LangIdStage(text_col)
        _LANG_STAGE_CACHE[text_col] = stage
    return stage(batch)


# -------------------------------------------------------- normalization


def normalize_corpus(ds, *, text_col: str = "text",
                     id_col: str = "doc_id"):
    """Pre-tokenization text cleanup — the standard first pass of a
    training-data pipeline: Unicode NFC composition, C0/DEL control
    stripping, ASCII-whitespace run collapse, edge trim. Returns
    (id, n_chars_norm, norm_fp, changed) with norm_fp = md5 hex of
    the normalized text and changed = (normalized != input).

    Map-only, no shuffle. The control-strip / collapse / trim steps
    are Arrow RE2 kernels over the zero-copy batch, with EXPLICIT
    ASCII character classes (never \\s, whose meaning differs between
    RE2 and Python) that run verbatim in the DuckDB oracle. NFC runs
    per-row via unicodedata — pyarrow's utf8_normalize does NOT
    canonically compose (combining marks survive its "NFC"), so it
    cannot match DuckDB's nfc_normalize — gated by str.isascii()
    (ASCII is NFC-invariant), and folded into the md5 loop the
    fingerprint needed anyway. The ASCII-only regex steps commute
    with NFC (composition never creates or destroys ASCII controls
    or whitespace), so running them first keeps the Python loop to
    the already-shortened strings."""
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        orig = batch[text_col]
        t = pc.replace_substring_regex(
            orig, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", ""
        )
        t = pc.replace_substring_regex(t, "[ \t\r\n\f\v]+", " ")
        t = pc.utf8_trim(t, " ")
        orig_l = orig.to_pylist()
        fps, lens, changed = [], [], []
        for s, o in zip(t.to_pylist(), orig_l):
            s = s or ""
            if not s.isascii():
                s = unicodedata.normalize("NFC", s)
            fps.append(hashlib.md5(s.encode("utf-8")).hexdigest())
            lens.append(len(s))
            changed.append(s != (o or ""))
        return pa.table(
            {
                id_col: batch[id_col],
                "n_chars_norm": pa.array(lens, pa.int64()),
                "norm_fp": pa.array(fps, pa.string()),
                "changed": pa.array(changed, pa.bool_()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


def bpe_pair_counts(ds, *, text_col: str = "text", n: int = 50,
                    num_buckets: int = 32):
    """First iteration of BPE tokenizer training at corpus scale:
    counts of adjacent CHARACTER pairs within words, weighted by word
    frequency — the argmax of this table is the first BPE merge
    (Sennrich et al. 2016). Returns the top-n (pair, n), ties
    pair-ascending (vocab_top_words schema).

    Shape: composes word_counts (ONE word-hash exchange — the corpus
    collapses to its vocabulary BEFORE any pair work, so the pair
    explosion runs over vocab-sized, not corpus-sized, data) with a
    pair-hash exchange summing per-vocab-entry partials and a
    local-top-n global reduce. The per-word character loop is Python
    over the vocabulary table only; per-task state is one Counter of
    the pairs seen in that block's words."""
    from collections import Counter

    from .joins import exchange_reduce
    from .ranking import global_top_n
    from .sketches import word_counts

    wc = word_counts(ds, text_col=text_col, num_buckets=num_buckets)

    def pair_partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for w, cnt in zip(
            batch["word"].to_pylist(), batch["n"].to_pylist()
        ):
            for i in range(len(w) - 1):
                c[w[i:i + 2]] += cnt
        pairs = list(c.keys())
        h = pd.util.hash_array(
            np.asarray(pairs, dtype=object), categorize=False
        )
        return pa.table(
            {
                "pair": pa.array(pairs, pa.string()),
                "n": pa.array([c[p] for p in pairs], pa.int64()),
                "__bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    empty = pa.table(
        {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
    )

    def sum_bucket(t: pa.Table) -> pa.Table:
        df = t.select(["pair", "n"]).to_pandas()
        g = df.groupby("pair", sort=False, as_index=False)["n"].sum()
        return pa.table(
            {
                "pair": pa.array(g["pair"], pa.string()),
                "n": pa.array(g["n"].to_numpy(np.int64)),
            }
        )

    summed = exchange_reduce(
        wc.map_batches(pair_partial, batch_format="pyarrow"),
        sum_bucket, empty, num_buckets,
    )
    return global_top_n(summed, order_col="n", n=n, tie_col="pair")


_BPE_SEP = "\x1f"  # unit separator: joins symbols; never appears in words


@ray.remote(num_cpus=1, num_returns=2)
def _bpe_step(tbl: pa.Table, pat, repl, sep: str):
    """One BPE-training wave over one vocab block: apply the
    previously selected merge (pat=None on the first wave) and count
    the block's symbol pairs. Returns (updated vocab block, small
    (pair, n) partial table) — the vocab stays in the object store
    between iterations, never re-planned through a Dataset."""
    from collections import Counter

    pair_schema = pa.schema([("pair", pa.string()), ("n", pa.int64())])
    if tbl.num_rows == 0 or "tok" not in tbl.schema.names:
        # empty exchange buckets pass through map_batches with the
        # upstream (word, n) schema — nothing to merge or count
        return (
            pa.table({"tok": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64())}),
            pair_schema.empty_table(),
        )
    toks = tbl["tok"].to_pylist()
    if pat is not None:
        toks = [t.replace(pat, repl) for t in toks]
    c: Counter = Counter()
    for tok, cnt in zip(toks, tbl["n"].to_pylist()):
        syms = tok.strip(sep).split(sep)
        for a, b in zip(syms, syms[1:]):
            c[a + " " + b] += cnt
    pairs = list(c.keys())
    new_tbl = pa.table(
        {"tok": pa.array(toks, pa.string()), "n": tbl["n"]}
    )
    pair_tbl = pa.table(
        {"pair": pa.array(pairs, pa.string()),
         "n": pa.array([c[p] for p in pairs], pa.int64())}
    )
    return new_tbl, pair_tbl


@ray.remote(num_cpus=1)
def _bpe_argmax(*pair_tbls):
    """Fold the per-block pair partials and pick the merge: max count,
    ties pair-ascending (global_top_n's order). Pair space is
    symbol-alphabet-bounded, so this single reduce task sees a small
    table regardless of corpus size."""
    t = pa.concat_tables(pair_tbls)
    if t.num_rows == 0:
        return None
    g = t.to_pandas().groupby("pair", sort=False, as_index=False)[
        "n"
    ].sum()
    best_n = g["n"].max()
    return (g[g["n"] == best_n]["pair"].min(), int(best_n))


def bpe_train(ds, *, text_col: str = "text", merges: int = 6,
              num_buckets: int = 32, wc=None):
    """Iterative BPE tokenizer training (Sennrich et al. 2016): learn
    the first `merges` merge rules over the corpus. Returns a small
    pa.Table (step, pair, n) where pair is 'left right' and n its
    count at selection time; ties break pair-ascending.

    Scale shape: the corpus collapses to its VOCABULARY through one
    word-hash exchange (word_counts — pass a pre-materialized `wc`
    to share that pass with the encode half), and every iteration
    after that is exactly ONE raw task wave over the bucketed vocab
    blocks (graph.py's pagerank precedent): each task applies the
    previous merge and counts its block's pairs in the same pass,
    and one small reduce task picks the argmax. No per-iteration
    Dataset plans or materializations — the old
    exchange+top-1+materialize loop cost 3 plan executions per merge
    and dominated wall time with fixed scheduling cost.
    Merge application is single-pass left-to-right non-overlapping
    (Python str.replace == SQL replace), on the separator-bounded
    symbol string so a symbol can never match a substring of a
    neighbor."""
    from .sketches import word_counts

    sep = _BPE_SEP
    if wc is None:
        wc = word_counts(ds, text_col=text_col, num_buckets=num_buckets)

    def to_symbols(batch: pa.Table) -> pa.Table:
        toks, ns = [], []
        for w, cnt in zip(batch["word"].to_pylist(),
                          batch["n"].to_pylist()):
            if sep in w:
                continue
            toks.append(sep + sep.join(w) + sep)
            ns.append(cnt)
        return pa.table(
            {"tok": pa.array(toks, pa.string()),
             "n": pa.array(ns, pa.int64())}
        )

    refs = list(
        wc.map_batches(to_symbols, batch_format="pyarrow")
        .materialize()
        .to_arrow_refs()
    )

    out_steps, out_pairs, out_ns = [], [], []
    pat = repl = None
    for step in range(1, merges + 1):
        waves = [_bpe_step.remote(r, pat, repl, sep) for r in refs]
        refs = [w[0] for w in waves]
        best = ray.get(_bpe_argmax.remote(*[w[1] for w in waves]))
        if best is None:
            break
        pair, n = best
        out_steps.append(step)
        out_pairs.append(pair)
        out_ns.append(n)
        left, right = pair.split(" ", 1)
        pat = sep + left + sep + right + sep
        repl = sep + left + right + sep

    return pa.table(
        {
            "step": pa.array(out_steps, pa.int64()),
            "pair": pa.array(out_pairs, pa.string()),
            "n": pa.array(out_ns, pa.int64()),
        }
    )


# ------------------------------------------------------------ fingerprint


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Content fingerprint = md5 hex of the raw text (same definition as
    DuckDB md5(text), so it is oracle-checkable)."""
    fps = [
        hashlib.md5((t or "").encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("fp", pa.array(fps, pa.string()))


def rolling_fingerprint(text: str, window: int = 8, keep: int = 4) -> int:
    """Winnowing-style document fingerprint (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003): 64-bit mix of the `keep` smallest rolling word-window
    hashes — robust to local edits."""
    words = (text or "").split()
    if not words:
        return 0
    hs = []
    for i in range(max(1, len(words) - window + 1)):
        chunk = " ".join(words[i : i + window])
        hs.append(
            int.from_bytes(hashlib.md5(chunk.encode()).digest()[:8], "big")
        )
    hs.sort()
    out = 0
    for h in hs[:keep]:
        out = (out * 1000003 + h) & ((1 << 64) - 1)
    return out


def rolling_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    fps = [rolling_fingerprint(t) for t in batch[text_col].to_pylist()]
    return batch.append_column(
        "rolling_fp", pa.array(np.array(fps, dtype=np.uint64))
    )


# ------------------------------------------------------------------ tfidf


def tfidf_top_terms(
    ds,
    *,
    n_docs: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
    num_buckets: int = 32,
):
    """Per-document top-k TF-IDF terms — the classic featurization
    stage of a training-data pipeline, distributed as: per-batch term
    frequencies (postings rows), ONE word-hash bucket exchange (all
    postings of a word land in one bucket, so document frequency is
    exact within the bucket with no second shuffle), then the bucketed
    grouped top-k by doc.

    idf is the LINEAR variant score = tf * n_docs / df: mul/div are
    exactly-rounded IEEE ops, so the driver value-hash is libm-
    independent, while the ranking is the same monotone order any
    idf = f(n_docs/df) with monotone f would produce per term-df.
    Tokenization is the repo-wide lower().split() (token-count /
    vocab oracles use the same).
    """
    from collections import Counter

    from .joins import exchange_reduce
    from .ranking import top_n_per_group

    def postings(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for w, f in Counter((t or "").lower().split()).items():
                ids.append(i)
                words.append(w)
                tfs.append(f)
        b = (
            pd.util.hash_array(
                np.asarray(words, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32) if words else np.zeros(0, dtype=np.int32)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "word": pa.array(words, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
                "__bucket": pa.array(b),
            }
        )

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "word": pa.array([], pa.string()),
            "tf": pa.array([], pa.int64()),
            "df": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )

    def bucket_score(t: pa.Table) -> pa.Table:
        df = t.select([id_col, "word", "tf"]).to_pandas()
        # each (doc, word) appears exactly once -> df = postings per word
        df["df"] = df.groupby("word", sort=False)["word"].transform(
            "size"
        ).astype("int64")
        df["score"] = (
            df["tf"].to_numpy(np.float64) * float(n_docs)
        ) / df["df"].to_numpy(np.float64)
        return pa.Table.from_pandas(df, preserve_index=False)

    scored = exchange_reduce(
        ds.map_batches(postings, batch_format="pyarrow"),
        bucket_score, empty, num_buckets,
    )
    return top_n_per_group(
        scored, key_col=id_col, order_col="score", n=top_k, tie_col="word"
    )


# ------------------------------------------------------------- repetition


def repetition_stats_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Gopher-style within-document repetition features (Rae et al.
    2021, arXiv:2112.11446 §A1.1): fraction of duplicate word 2-grams /
    3-grams and the most-frequent-word fraction. Map-only (no shuffle);
    vectorized across the whole batch — per-doc distinct counts come
    from ONE lexsort over (doc, ngram-hash) pairs + boundary flags,
    not a Python set per doc. N-grams are compared by the repo's
    64-bit shingle hash (md5-64 words + position mix): a cross-n-gram
    collision would perturb a fraction with probability ~2^-64 per
    pair — negligible, and the same hash the minhash oracle already
    re-derives in SQL exactly.

    Fractions are exactly-rounded IEEE divisions, so the driver
    value-hash is reproducible in DuckDB.
    """
    from .dedup import _gram_hashes_from_word_hashes, _word_hash64

    texts = batch[text_col].to_pylist()
    n_docs = len(texts)
    word_lists = [(t or "").lower().split() for t in texts]
    n_words = np.array([len(w) for w in word_lists], dtype=np.int64)
    # hash every word ONCE; 1/2/3-gram stats all derive from this pass
    wh_lists = [
        np.array([_word_hash64(w) for w in words], dtype=np.uint64)
        for words in word_lists
    ]

    def _dup_frac(k: int) -> np.ndarray:
        """1 - distinct/total over word k-grams, 0.0 when no k-gram."""
        hs, doc_of = [], []
        for d, wh in enumerate(wh_lists):
            if len(wh) < k:
                continue
            h = _gram_hashes_from_word_hashes(wh, k)
            hs.append(h)
            doc_of.append(np.full(len(h), d, dtype=np.int64))
        out = np.zeros(n_docs, dtype=np.float64)
        if not hs:
            return out
        h = np.concatenate(hs)
        d = np.concatenate(doc_of)
        order = np.lexsort((h, d))
        hd, dd = h[order], d[order]
        new_grp = np.empty(len(hd), dtype=bool)
        new_grp[0] = True
        new_grp[1:] = (hd[1:] != hd[:-1]) | (dd[1:] != dd[:-1])
        distinct = np.bincount(d[order][new_grp], minlength=n_docs)
        total = np.bincount(d, minlength=n_docs)
        nz = total > 0
        out[nz] = 1.0 - distinct[nz].astype(np.float64) / total[nz]
        return out

    # most-frequent-word fraction via the same lexsort trick
    top_frac = np.zeros(n_docs, dtype=np.float64)
    whs, wdoc = [], []
    for di, wh in enumerate(wh_lists):
        if not len(wh):
            continue
        whs.append(wh)
        wdoc.append(np.full(len(wh), di, dtype=np.int64))
    if whs:
        h = np.concatenate(whs)
        d = np.concatenate(wdoc)
        order = np.lexsort((h, d))
        hd, dd = h[order], d[order]
        bounds = np.flatnonzero(
            np.concatenate(
                ([True], (hd[1:] != hd[:-1]) | (dd[1:] != dd[:-1]), [True])
            )
        )
        runs = np.diff(bounds)
        run_doc = dd[bounds[:-1]]
        max_run = np.zeros(n_docs, dtype=np.int64)
        np.maximum.at(max_run, run_doc, runs)
        nz = n_words > 0
        top_frac[nz] = max_run[nz].astype(np.float64) / n_words[nz]

    return pa.table(
        {
            id_col: batch[id_col],
            "n_words": pa.array(n_words),
            "dup_2gram_frac": pa.array(_dup_frac(2)),
            "dup_3gram_frac": pa.array(_dup_frac(3)),
            "top_word_frac": pa.array(top_frac),
        }
    )


# ------------------------------------------------------------- chunking


def chunk_documents_batch(
    batch: pa.Table,
    *,
    chunk_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> pa.Table:
    """Sequence chunking for training-data packing: split each doc's
    whitespace tokens into consecutive windows of `chunk_tokens` (last
    window ragged) and emit (id, chunk_id, n_tokens, chunk_fp) where
    chunk_fp = md5 of the space-joined window — the downstream identity
    for chunk-level dedup and shard routing. 1 -> many flat transform,
    map-only; whitespace runs collapse to single spaces in the
    fingerprint (the oracle joins the same token array)."""
    ids_out, cid_out, n_out, fp_out = [], [], [], []
    for i, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
        words = (t or "").split()
        for c in range(0, len(words), chunk_tokens):
            w = words[c : c + chunk_tokens]
            ids_out.append(i)
            cid_out.append(c // chunk_tokens)
            n_out.append(len(w))
            fp_out.append(hashlib.md5(" ".join(w).encode()).hexdigest())
    return pa.table(
        {
            id_col: pa.array(ids_out, batch[id_col].type),
            "chunk_id": pa.array(cid_out, pa.int64()),
            "n_tokens": pa.array(n_out, pa.int64()),
            "chunk_fp": pa.array(fp_out, pa.string()),
        }
    )


def lang_length_band(ds, *, lo_pct: int = 5, hi_pct: int = 95,
                     lang_col: str = "lang", text_col: str = "text",
                     id_col: str = "doc_id"):
    """Per-language token-length band filter (the CCNet/RedPajama
    length-outlier cut, computed per language because length norms
    differ across scripts): keep every doc whose token count lies in
    [lo, hi], where lo/hi are the language's EXACT lo_pct/hi_pct
    percentile values. Returns (id_col, lang_col, n_tokens).

    Exact percentiles without a sort: token counts live in a bounded
    value universe (a doc has at most ~millions of tokens), so the
    per-(lang, n_tokens) histogram is bounded by #langs x #distinct
    lengths regardless of corpus size. Per-block partial counts -> one
    tiny multi-key groupby reduce -> cutoffs from the cumulative
    histogram on the driver -> per-lang (lo, hi) broadcast via ray.put
    into a map-only filter. The percentile rank is pure integer
    arithmetic (rank = ceil(pct * n / 100) via (pct*n + 99) // 100;
    cutoff = smallest length whose cumulative count reaches the rank),
    so engines agree bit-for-bit — no float interpolation."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, text_col)
        df = t.select([lang_col, "n_tokens"]).to_pandas()
        g = df.groupby([lang_col, "n_tokens"], as_index=False).agg(
            c=("n_tokens", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    hist = ds.map_batches(partial, batch_format="pyarrow").groupby(
        [lang_col, "n_tokens"]
    ).aggregate(Sum("c", alias_name="c")).to_pandas()
    # bounded: one row per (lang, distinct length)
    cuts: dict = {}
    for lang, g in hist.groupby(lang_col):
        g = g.sort_values("n_tokens")
        cum = g["c"].to_numpy(np.int64).cumsum()
        n = int(cum[-1])
        lens = g["n_tokens"].to_numpy(np.int64)
        r_lo = (lo_pct * n + 99) // 100
        r_hi = (hi_pct * n + 99) // 100
        lo = int(lens[np.searchsorted(cum, r_lo)])
        hi = int(lens[np.searchsorted(cum, r_hi)])
        cuts[lang] = (lo, hi)
    cuts_ref = _ray.put(cuts)

    def band(batch: pa.Table) -> pa.Table:
        c = _ray.get(cuts_ref)  # local-store fetch
        keys = list(c.keys())
        lo_arr = np.array([c[k][0] for k in keys], np.int64)
        hi_arr = np.array([c[k][1] for k in keys], np.int64)
        t = token_count_batch(batch, text_col)
        langs = t[lang_col].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        codes = pd.Categorical(langs, categories=keys).codes
        known = codes >= 0
        safe = np.where(known, codes, 0)
        keep = known & (n >= lo_arr[safe]) & (n <= hi_arr[safe])
        return t.select([id_col, lang_col, "n_tokens"]).filter(
            pa.array(keep)
        )

    return ds.map_batches(band, batch_format="pyarrow")


def source_quality_gate(ds, *, min_avg_tokens: float,
                        group_col: str = "source",
                        text_col: str = "text", id_col: str = "doc_id"):
    """Host/source-level quality gating (the RefinedWeb/C4 curation
    step where whole domains are kept or dropped on an aggregate
    signal, not per-doc): keep every doc whose `group_col`'s MEAN
    token count >= min_avg_tokens. Returns (id_col, group_col).

    Scale shape: per-block integer partials (sum_tokens, n_docs per
    group) -> a #groups-sized groupby reduce -> the passing-group set
    (bounded by the domain universe, never by corpus size) broadcasts
    via ray.put into a map-only filter over the full corpus — the
    100-TB side never shuffles. The gate's division is one exactly
    rounded double op on exact integer sums, so the cut is
    cross-engine deterministic (no summation-order float drift)."""
    import ray as _ray
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch, text_col)
        df = t.select([group_col, "n_tokens"]).to_pandas()
        g = df.groupby(group_col, as_index=False).agg(
            sum_tokens=("n_tokens", "sum"), n_docs=("n_tokens", "size")
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    means = ds.map_batches(partial, batch_format="pyarrow").groupby(
        group_col
    ).aggregate(
        Sum("sum_tokens", alias_name="sum_tokens"),
        Sum("n_docs", alias_name="n_docs"),
    ).to_pandas()  # bounded: one row per source/domain
    ok = frozenset(
        means.loc[
            means["sum_tokens"].to_numpy(np.int64).astype(np.float64)
            / means["n_docs"].to_numpy(np.int64) >= min_avg_tokens,
            group_col,
        ]
    )
    ok_ref = _ray.put(pa.array(sorted(ok), pa.string()))

    def gate(batch: pa.Table) -> pa.Table:
        keep = _ray.get(ok_ref)  # local-store fetch, zero-copy
        mask = pc.is_in(batch[group_col], value_set=keep)
        return batch.filter(mask).select([id_col, group_col])

    return ds.map_batches(gate, batch_format="pyarrow")


def winnowing_fingerprints_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> pa.Table:
    """Positional winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003,
    §4 robust winnowing): over the doc's rolling k-word-window md5-64
    hashes (same hash stream as rolling_fingerprint), slide a window
    of w consecutive hashes and select the MINIMUM of each, breaking
    ties by the RIGHTMOST position; docs with fewer than w hashes use
    one window over all of them. The distinct selected hashes are the
    doc's fingerprint set — the MOSS index property: any shared run of
    >= k+w-1 words between two docs is guaranteed to share a selected
    fingerprint, which the bottom-k sketch above cannot promise.
    Map-only; emits (id_col, fp) rows, fp as a 16-hex string so both
    engines compare it textually."""
    ids_out: list = []
    fps_out: list = []
    for d, t in zip(
        batch[id_col].to_pylist(), batch[text_col].to_pylist()
    ):
        words = (t or "").split()
        if not words:
            continue
        n = max(1, len(words) - k + 1)
        hs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.md5(
                        " ".join(words[i:i + k]).encode()
                    ).digest()[:8], "big"
                )
                for i in range(n)
            ),
            dtype=np.uint64, count=n,
        )
        if n <= w:
            sel = hs[[n - 1 - int(np.argmin(hs[::-1]))]]
        else:
            sw = np.lib.stride_tricks.sliding_window_view(hs, w)
            # argmin over the reversed window = rightmost minimum
            jr = np.argmin(sw[:, ::-1], axis=1)
            pos = np.arange(w - 1, n) - jr
            sel = hs[np.unique(pos)]
        for v in np.unique(sel):
            ids_out.append(d)
            fps_out.append(f"{int(v):016x}")
    return pa.table(
        {
            id_col: pa.array(ids_out, pa.int64()),
            "fp": pa.array(fps_out, pa.string()),
        }
    )


# ------------------------------------------------------------------- bm25


def bm25_scores(
    ds,
    *,
    query_terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
):
    """BM25 relevance of every document against a fixed query-term
    tuple (Robertson & Walker 1994) — the standard lexical-relevance
    feature for retrieval-augmented corpus curation.

    Two passes over the input: (1) corpus statistics — doc count,
    token count and per-term document frequency — reduced from one
    len(terms)+2-int64 row per block (a Sum aggregate; state is
    bounded by #terms regardless of corpus size); (2) map-only
    scoring, embarrassingly parallel.

    Floats follow the repo's libm-free convention (tfidf_top_terms
    precedent): idf is the LINEAR variant ((N - df) + 0.5) /
    (df + 0.5) — no log — and the whole per-term expression
        idf * (tf * (k1+1)) / (tf + k1 * ((1-b) + b * (dl/avgdl)))
    is mul/div/add only, evaluated in the same tree shape as the SQL
    oracle, so the double value-hash is cross-engine exact. The
    ranking is order-equivalent to Robertson idf for df < N/2.
    """
    from ray.data.aggregate import Sum

    terms = tuple(query_terms)

    def partials(batch: pa.Table) -> pa.Table:
        toks = [
            (t or "").lower().split() for t in batch[text_col].to_pylist()
        ]
        row = {
            "__docs": [len(toks)],
            "__toks": [sum(len(w) for w in toks)],
        }
        for j, q in enumerate(terms):
            row[f"__df{j}"] = [sum(1 for w in toks if q in w)]
        return pa.table(row)

    aggs = [Sum("__docs", alias_name="docs"), Sum("__toks", alias_name="toks")]
    aggs += [Sum(f"__df{j}", alias_name=f"df{j}") for j in range(len(terms))]
    stats = ds.map_batches(partials, batch_format="pyarrow").aggregate(*aggs)
    n_docs = int(stats["docs"] or 0)
    # float()-then-divide (not int/int) so the value equals the SQL
    # toks::DOUBLE / n::DOUBLE even past 2^53 tokens
    avgdl = float(stats["toks"] or 0) / float(max(1, n_docs))
    idfs = tuple(
        ((n_docs - int(stats[f"df{j}"] or 0)) + 0.5)
        / (int(stats[f"df{j}"] or 0) + 0.5)
        for j in range(len(terms))
    )
    k1p1 = k1 + 1.0
    b1 = 1.0 - b

    def score(batch: pa.Table) -> pa.Table:
        toks = [
            (t or "").lower().split() for t in batch[text_col].to_pylist()
        ]
        dl = np.array([len(w) for w in toks], dtype=np.float64)
        dlt = k1 * (b1 + b * (dl / avgdl))
        s = np.zeros(len(toks), dtype=np.float64)
        for j, q in enumerate(terms):
            tf = np.array([w.count(q) for w in toks], dtype=np.float64)
            s = s + idfs[j] * (tf * k1p1) / (tf + dlt)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(dl.astype(np.int64)),
                "score": pa.array(s),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


# ------------------------------------------------------------------- pmi
def pmi_bigrams(
    ds,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_n: int = 200,
    num_buckets: int = 32,
):
    """Top collocations by pointwise mutual information over adjacent
    token pairs — the classic phrase-mining signal (word2vec phrase
    pass, Mikolov et al. 2013).

    Distribution shape — two exchanges, frequencies attach IN-BUCKET
    (never a broadcast of the unbounded vocabulary, never a separate
    join shuffle): ONE tokenize pass emits unigram partials keyed by
    hash(word) and bigram partials keyed by hash(w1); wave 1 sums
    both kinds per bucket and attaches c1 to each bigram from the
    co-bucketed unigram counts; wave 2 re-keys bigrams by hash(w2),
    attaches c2 the same way, applies the min-count filter and emits
    a per-bucket bigram subtotal row — the driver folds only #buckets
    ints into the PMI total. Final ranking is global_top_n (local
    top per block + one tiny reduce), so nothing ever sorts the full
    bigram table.

    Score is the libm-free LINEAR PMI variant (monotone in PMI):
        (c * T) / (c1 * c2)
    with every mul/div mirrored by the oracle's expression tree —
    cross-engine exact doubles (tfidf precedent).
    """
    from collections import Counter

    import ray
    import ray.data as rd

    from .joins import exchange_reduce
    from .ranking import global_top_n

    cols = ["kind", "key", "w1", "w2", "c", "c1", "c2"]
    types = {
        "kind": pa.string(), "key": pa.string(), "w1": pa.string(),
        "w2": pa.string(), "c": pa.int64(), "c1": pa.int64(),
        "c2": pa.int64(),
    }
    empty = pa.table({c: pa.array([], types[c]) for c in cols})

    def _hash_bucket(keys):
        if not len(keys):
            return np.zeros(0, dtype=np.int32)
        return (
            pd.util.hash_array(
                np.asarray(keys, dtype=object), categorize=False
            ) % np.uint64(num_buckets)
        ).astype(np.int32)

    def partial(batch: pa.Table) -> pa.Table:
        # ONE tokenize pass produces both count kinds — at corpus
        # scale the scan+tokenize dominates, so it must not run twice
        cb: Counter = Counter()
        cu: Counter = Counter()
        for t in batch[text_col].to_pylist():
            words = (t or "").lower().split()
            cu.update(words)
            cb.update(zip(words, words[1:]))
        pairs = list(cb.keys())
        uwords = list(cu.keys())
        n_b, n_u = len(pairs), len(uwords)
        t = pa.table(
            {
                "kind": pa.array(["B"] * n_b + ["U"] * n_u, pa.string()),
                "key": pa.array(
                    [f"{a} {b_}" for a, b_ in pairs] + uwords, pa.string()
                ),
                "w1": pa.array([p[0] for p in pairs] + uwords, pa.string()),
                "w2": pa.array(
                    [p[1] for p in pairs] + [None] * n_u, pa.string()
                ),
                "c": pa.array(
                    [cb[p] for p in pairs] + [cu[w] for w in uwords],
                    pa.int64(),
                ),
                "c1": pa.nulls(n_b + n_u, pa.int64()),
                "c2": pa.nulls(n_b + n_u, pa.int64()),
            }
        )
        # wave-1 key: unigrams by their word, bigrams by w1 — so each
        # bigram lands with exactly the unigram counts it needs
        return t.append_column(
            "__bucket", pa.array(_hash_bucket(t["w1"].to_pylist()))
        )

    def attach_c1(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        u = df[df["kind"] == "U"].groupby("key", sort=False)["c"].sum()
        b = df[df["kind"] == "B"]
        if len(b):
            b = b.groupby(["key", "w1", "w2"], sort=False, as_index=False)[
                "c"
            ].sum()
            b["c1"] = b["w1"].map(u).astype("int64")
            b["kind"] = "B"
        urows = pd.DataFrame(
            {"kind": "U", "key": u.index, "c": u.to_numpy()}
        )
        out = pd.concat([b, urows], ignore_index=True) if len(b) else urows
        return pa.table(
            {
                c: pa.array(
                    out[c] if c in out.columns else [None] * len(out),
                    types[c],
                )
                for c in cols
            }
        )

    w1 = exchange_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        attach_c1, empty, num_buckets,
    )

    def retag_w2(t: pa.Table) -> pa.Table:
        # unigrams re-key by word (same bucket), bigrams by w2
        key2 = [
            (w2 if k == "B" else w)
            for k, w, w2 in zip(
                t["kind"].to_pylist(), t["key"].to_pylist(),
                t["w2"].to_pylist(),
            )
        ]
        return t.append_column("__bucket", pa.array(_hash_bucket(key2)))

    def attach_c2(t: pa.Table) -> pa.Table:
        df = t.select(cols).to_pandas()
        u = df[df["kind"] == "U"].set_index("key")["c"]
        b = df[df["kind"] == "B"]
        sub = int(b["c"].sum()) if len(b) else 0
        b = b[b["c"] >= min_count].copy()
        if len(b):
            b["c2"] = b["w2"].map(u).astype("int64")
        trow = pd.DataFrame({"kind": ["T"], "c": [sub]})
        out = pd.concat([b, trow], ignore_index=True) if len(b) else trow
        return pa.table(
            {
                c: pa.array(
                    out[c] if c in out.columns else [None] * len(out),
                    types[c],
                )
                for c in cols
            }
        )

    w2 = exchange_reduce(
        w1.map_batches(retag_w2, batch_format="pyarrow"),
        attach_c2, empty, num_buckets,
    )
    refs = list(w2.to_arrow_refs())
    total = sum(ray.get([_pmi_block_subtotal.remote(r) for r in refs]))
    tot_f = float(total)

    def score(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["kind"], "B"))
        c = t["c"].to_numpy().astype(np.float64)
        c1 = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t["c2"].to_numpy(zero_copy_only=False).astype(np.float64)
        s = (c * tot_f) / (c1 * c2)
        return pa.table(
            {
                "bigram": t["key"],
                "c": t["c"],
                "c1": t["c1"],
                "c2": t["c2"],
                "score": pa.array(s, pa.float64()),
            }
        )

    scored = rd.from_arrow_refs(refs).map_batches(
        score, batch_format="pyarrow"
    )
    return global_top_n(scored, order_col="score", n=top_n, tie_col="bigram")


import ray as _ray_mod


@_ray_mod.remote
def _pmi_block_subtotal(t: pa.Table) -> int:
    f = t.filter(pc.equal(t["kind"], "T"))
    return int(pc.sum(f["c"]).as_py() or 0)


# ------------------------------------------------------------- percentile


def length_percentile(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Global percentile rank of every doc by token length — the
    distributed-rank-WITHOUT-a-sort pattern: ranking against a global
    order needs only a value HISTOGRAM (bounded by the distinct-length
    count, not the corpus size), never a full shuffle.

    Pass 1 reduces per-batch (n_tokens -> count) partials into one
    histogram; the driver folds it into a cumulative strictly-below
    map (state bounded by distinct lengths) and broadcasts it via
    ray.put. Pass 2 is a map-only lookup: n_below and
    pct = n_below::DOUBLE / N::DOUBLE (exactly-rounded div — oracle
    mirrors the expression)."""
    import ray

    from .joins import exchange_reduce

    def hist_partial(batch: pa.Table) -> pa.Table:
        t = token_count_batch(batch.select([text_col]), text_col)
        h = pd.Series(
            t["n_tokens"].to_numpy(zero_copy_only=False)
        ).value_counts()
        n = len(h)
        return pa.table(
            {
                "v": pa.array(h.index.to_numpy(np.int64)),
                "c": pa.array(h.to_numpy(np.int64)),
                "__bucket": pa.array(np.zeros(n, dtype=np.int32)),
            }
        )

    empty = pa.table(
        {"v": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
    )

    def fold(t: pa.Table) -> pa.Table:
        df = t.select(["v", "c"]).to_pandas().groupby("v", as_index=False)[
            "c"
        ].sum()
        return pa.Table.from_pandas(
            df.sort_values("v"), preserve_index=False
        )

    from .joins import df_or_empty

    hist = df_or_empty(
        exchange_reduce(
            ds.map_batches(hist_partial, batch_format="pyarrow"),
            fold, empty, num_buckets=1,
        ),
        empty,
    )
    total = int(hist["c"].sum())
    below = dict(
        zip(
            hist["v"].tolist(),
            np.concatenate([[0], hist["c"].to_numpy().cumsum()[:-1]])
            .astype(np.int64).tolist(),
        )
    )
    below_ref = ray.put(below)
    total_f = float(max(1, total))

    def rank(batch: pa.Table) -> pa.Table:
        bmap = ray.get(below_ref)
        t = token_count_batch(batch.select([id_col, text_col]), text_col)
        n_tok = t["n_tokens"].to_numpy(zero_copy_only=False)
        nb = np.array([bmap[int(v)] for v in n_tok], dtype=np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_tokens": pa.array(n_tok, pa.int64()),
                "n_below": pa.array(nb),
                "pct": pa.array(nb.astype(np.float64) / total_f),
            }
        )

    return ds.map_batches(rank, batch_format="pyarrow")


def trigram_diversity_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-doc lexical diversity: distinct word-trigram ratio — the
    self-repetition signal generation-quality filters threshold on
    (low ratio = templated/looping text). Map-only.

    ratio = n_distinct::DOUBLE / n_trigrams::DOUBLE (exactly-rounded
    div, oracle mirrors; 0.0 when the doc has < 3 tokens)."""
    ids = batch[id_col]
    nt_out, nd_out = [], []
    for t in batch[text_col].to_pylist():
        words = (t or "").lower().split()
        n = max(0, len(words) - 2)
        if n == 0:
            nt_out.append(0)
            nd_out.append(0)
            continue
        trigs = {
            (words[i], words[i + 1], words[i + 2]) for i in range(n)
        }
        nt_out.append(n)
        nd_out.append(len(trigs))
    nt = np.array(nt_out, dtype=np.int64)
    nd = np.array(nd_out, dtype=np.int64)
    ratio = np.where(
        nt > 0, nd.astype(np.float64) / nt.astype(np.float64), 0.0
    )
    return pa.table(
        {
            id_col: ids,
            "n_trigrams": pa.array(nt),
            "n_distinct": pa.array(nd),
            "ratio": pa.array(ratio, pa.float64()),
        }
    )


# ------------------------------------------------------------- C4 cleanup


def c4_clean(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 3,
):
    """C4-style line-level corpus cleanup (Raffel et al. 2020,
    "Exploring the Limits of Transfer Learning", §2.2 — the public
    heuristics behind the C4 corpus): drop whole documents containing
    'lorem ipsum' or a '{'; within surviving docs keep only lines that
    end in a terminal punctuation mark ('.', '!', '?', '"'), carry at
    least `min_words` whitespace words, and don't mention 'javascript';
    drop documents with fewer than `min_lines` surviving lines.

    Map-only (the scale shape: no shuffle, no state). Fully
    vectorized: doc gates are substring kernels; lines explode through
    split_pattern -> list_flatten with list_parent_indices, per-line
    predicates run on the flat array, and surviving lines reassemble
    per doc via offsets rebuilt from a bincount + one binary_join —
    no per-row Python anywhere.

    Output: (id_col, clean_text, n_lines_kept), one row per surviving
    document.
    """

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "clean_text": pa.array([], pa.string()),
            "n_lines_kept": pa.array([], pa.int64()),
        }
    )

    def clean(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        low = pc.utf8_lower(text)
        doc_ok = pc.and_(
            pc.invert(pc.match_substring(low, "lorem ipsum")),
            pc.invert(pc.match_substring(text, "{")),
        )
        batch = batch.filter(doc_ok)
        if len(batch) == 0:
            return empty
        text = batch[text_col].combine_chunks()
        lines = pc.split_pattern(text, "\n")
        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        flat = pc.list_flatten(lines)
        parents = pc.list_parent_indices(lines).to_numpy(
            zero_copy_only=False
        )
        ends = pc.match_substring_regex(flat, r'[.!?"]$')
        nw = pc.count_substring_regex(flat, r"\S+")
        noj = pc.invert(
            pc.match_substring(pc.utf8_lower(flat), "javascript")
        )
        keep = pc.and_(
            pc.and_(ends, pc.greater_equal(nw, min_words)), noj
        )
        keep_np = keep.to_numpy(zero_copy_only=False)
        kept_flat = flat.filter(keep)
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        counts = np.bincount(
            parents[keep_np], minlength=len(batch)
        ).astype(np.int64)
        # flat order is preserved by filter, so cumulative counts are
        # exactly the per-doc list offsets of the surviving lines
        offsets = np.concatenate(([0], np.cumsum(counts)))
        joined = pc.binary_join(
            pa.ListArray.from_arrays(
                pa.array(offsets, pa.int32()), kept_flat
            ),
            "\n",
        )
        out = pa.table(
            {
                id_col: batch[id_col],
                "clean_text": joined,
                "n_lines_kept": pa.array(counts),
            }
        )
        return out.filter(
            pc.greater_equal(out["n_lines_kept"], min_lines)
        )

    return ds.map_batches(clean, batch_format="pyarrow")


# ------------------------------------------------- linear quality model

# fastText/DCLM-style linear quality filter: fixed published-style
# weights over cheap text features. Bias chosen so the synthetic corpus
# splits roughly 60/40 (both classes exercised).
DEFAULT_LR_WEIGHTS = {
    "alpha_ratio": 2.0,
    "stop_ratio": 3.0,
    "punct_ratio": -10.0,
    "avg_token_len": 0.05,
    "bias": -2.0,
}

_LR_STOP_RE = r"\b(the|and|of|to|in|is|that|it|for|was|a)\b"


class LinearQualityScorer:
    """Batched linear-model inference — the quality-classifier stage of
    a fastText/DCLM-style corpus filter, in the actor-pool model-serving
    shape: the weight vector is fetched ONCE per actor in __init__
    (ray.get of a ray.put ref — never re-shipped per batch), and
    __call__ scores whole batches with vectorized Arrow feature kernels
    plus one fused float64 dot product.

    score = w_alpha*alpha_ratio + w_stop*stop_ratio
          + w_punct*punct_ratio + w_avg*avg_token_len + bias,
    evaluated in that FIXED left-to-right order so the float64 result
    is bit-identical to the oracle's same-order SQL expression, then
    rounded to 6dp (repo float convention). kept = score > threshold.
    """

    def __init__(
        self,
        weights_ref=None,
        *,
        text_col: str = "text",
        id_col: str = "doc_id",
        threshold: float = 0.0,
    ):
        if weights_ref is None:
            w = DEFAULT_LR_WEIGHTS
        elif isinstance(weights_ref, dict):
            w = weights_ref
        else:
            import ray

            w = ray.get(weights_ref)
        self.w = w
        self.text_col = text_col
        self.id_col = id_col
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch[self.text_col]
        n_chars = pc.cast(pc.utf8_length(text), pa.int64()).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_alpha = pc.count_substring_regex(text, r"[A-Za-z]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_punct = pc.count_substring_regex(text, r"[.,!?;:]").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_nonspace = pc.count_substring_regex(text, r"\S").to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        n_stop = pc.count_substring_regex(text, _LR_STOP_RE).to_numpy(
            zero_copy_only=False
        ).astype(np.float64)
        trimmed = pc.utf8_trim_whitespace(text)
        nt = pc.list_value_length(
            pc.split_pattern_regex(trimmed, r"\s+")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        nt = np.where(
            pc.equal(trimmed, "").to_numpy(zero_copy_only=False), 0, nt
        ).astype(np.float64)
        has_c = n_chars > 0
        has_t = nt > 0
        alpha = np.where(has_c, n_alpha / np.where(has_c, n_chars, 1), 0.0)
        punct = np.where(has_c, n_punct / np.where(has_c, n_chars, 1), 0.0)
        avg_tok = np.where(has_t, n_nonspace / np.where(has_t, nt, 1), 0.0)
        stop = np.where(has_t, n_stop / np.where(has_t, nt, 1), 0.0)
        w = self.w
        score = (
            w["alpha_ratio"] * alpha
            + w["stop_ratio"] * stop
            + w["punct_ratio"] * punct
            + w["avg_token_len"] * avg_tok
            + w["bias"]
        )
        return pa.table(
            {
                self.id_col: batch[self.id_col],
                "lr_score": pa.array(np.round(score, 6), pa.float64()),
                "kept": pa.array(score > self.threshold),
            }
        )


def bpe_apply_merges(word: str, merge_pairs, sep: str = _BPE_SEP) -> int:
    """Encode one word with an ordered BPE merge list and return its
    token count: the word becomes a separator-bounded symbol string and
    every learned merge is applied as the SAME single-pass left-to-
    right non-overlapping replace used at training time (bpe_train),
    so encode(train_corpus) reproduces the training-time vocabulary."""
    if not word or sep in word:
        return 0
    t = sep + sep.join(word) + sep
    for left, right in merge_pairs:
        t = t.replace(sep + left + sep + right + sep,
                      sep + left + right + sep)
    return len(t.strip(sep).split(sep))


def bpe_encode_token_counts(ds, merges_tbl, *, text_col: str = "text",
                            id_col: str = "doc_id",
                            num_buckets: int = 32, wc=None):
    """Apply learned BPE merges to the corpus and count tokens per
    document — the encode half of the tokenizer (bpe_train is the
    learn half), the stage that prices a corpus in tokens for budget
    planning.

    Scale shape: the merge list is O(merges) and rides into every
    task by closure; the corpus collapses to its VOCABULARY through
    one word-hash exchange and each distinct word is encoded exactly
    once (the per-word merge loop runs over vocab-sized data); a
    word-hash hash_join attaches per-word token counts to per-doc
    term frequencies and one doc-hash exchange sums tf * k per doc.
    Words that are empty or contain the separator byte are excluded
    on BOTH the vocab and tf sides (the training-time rule)."""
    from collections import Counter

    from .joins import exchange_reduce, hash_join
    from .sketches import word_counts

    sep = _BPE_SEP
    mdf = merges_tbl.to_pandas() if not isinstance(
        merges_tbl, pd.DataFrame
    ) else merges_tbl
    merge_pairs = [
        tuple(p.split(" ", 1))
        for p in mdf.sort_values("step")["pair"].tolist()
    ]

    def encode_vocab(batch: pa.Table) -> pa.Table:
        words = [
            w for w in batch["word"].to_pylist() if w and sep not in w
        ]
        ks = [bpe_apply_merges(w, merge_pairs) for w in words]
        return pa.table(
            {"word": pa.array(words, pa.string()),
             "k": pa.array(ks, pa.int64())}
        )

    if wc is None:
        wc = word_counts(ds, text_col=text_col, num_buckets=num_buckets)
    wtok = wc.map_batches(encode_vocab, batch_format="pyarrow")

    def tf_rows(batch: pa.Table) -> pa.Table:
        ids, words, tfs = [], [], []
        for i, t in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            for w, f in Counter((t or "").lower().split()).items():
                if not w or sep in w:
                    continue
                ids.append(i)
                words.append(w)
                tfs.append(f)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "word": pa.array(words, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf = ds.map_batches(tf_rows, batch_format="pyarrow")
    j = hash_join(tf, wtok, on="word", num_buckets=num_buckets)

    empty = pa.table(
        {id_col: pa.array([], pa.int64()),
         "n_tokens": pa.array([], pa.int64())}
    )

    def doc_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
                "n_tokens": batch["tf"].to_numpy(zero_copy_only=False)
                * batch["k"].to_numpy(zero_copy_only=False),
            }
        ).groupby(id_col, sort=False, as_index=False)["n_tokens"].sum()
        ids = df[id_col].to_numpy(np.int64)
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15))
        return pa.table(
            {
                id_col: pa.array(ids),
                "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64)),
                "__bucket": pa.array(
                    (h % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def doc_sum(t: pa.Table) -> pa.Table:
        df = t.select([id_col, "n_tokens"]).to_pandas()
        g = df.groupby(id_col, sort=False, as_index=False)[
            "n_tokens"
        ].sum()
        return pa.table(
            {
                id_col: pa.array(g[id_col].to_numpy(np.int64)),
                "n_tokens": pa.array(g["n_tokens"].to_numpy(np.int64)),
            }
        )

    return exchange_reduce(
        j.map_batches(doc_partial, batch_format="pyarrow"),
        doc_sum, empty, num_buckets,
    )


def cooccurrence_edges(
    ds, *, window: int = 2, text_col: str = "text",
    num_buckets: int = 32,
):
    """Distinct unweighted word co-occurrence edges within a
    +-`window` token span, both directions, no self-loops — the
    TextRank graph (Mihalcea & Tarau 2004). Per-batch pair emission
    with a local dedupe, then ONE pair-hash exchange for the global
    distinct; output columns (src, dst) feed graph.pagerank_fixed
    unchanged."""
    import pyarrow as _pa

    from .joins import exchange_reduce

    def edge_rows(batch: _pa.Table) -> _pa.Table:
        src, dst = [], []
        for t in batch[text_col].to_pylist():
            toks = (t or "").lower().split()
            for i in range(len(toks)):
                for j in range(i + 1, min(i + 1 + window, len(toks))):
                    if toks[i] != toks[j]:
                        src.append(toks[i]); dst.append(toks[j])
                        src.append(toks[j]); dst.append(toks[i])
        df = pd.DataFrame({"src": src, "dst": dst}).drop_duplicates()
        key = (df["src"] + "\x1f" + df["dst"]).to_numpy(object)
        b = (
            pd.util.hash_array(key, categorize=False)
            % np.uint64(num_buckets)
        ).astype(np.int32) if len(df) else np.zeros(0, np.int32)
        return _pa.Table.from_pandas(
            df.assign(__bucket=b), preserve_index=False
        )

    e_empty = _pa.table(
        {"src": _pa.array([], _pa.string()),
         "dst": _pa.array([], _pa.string())}
    )

    def dedupe(t: _pa.Table) -> _pa.Table:
        df = t.select(["src", "dst"]).to_pandas().drop_duplicates()
        return _pa.Table.from_pandas(df, preserve_index=False)

    return exchange_reduce(
        ds.map_batches(edge_rows, batch_format="pyarrow"),
        dedupe, e_empty, num_buckets,
    )
