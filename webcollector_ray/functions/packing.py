"""Sequence packing (concat-and-split) via a distributed prefix scan.

Pretraining consumes fixed-length token sequences: all chunk tokens
are conceptually concatenated in corpus order and split every
`seq_tokens` tokens. The global token offset of each row is a classic
PREFIX SCAN, which Ray Data has no primitive for; the distributed
shape is the textbook two-pass scan:

1. one tiny task per block computes its token sum (parallel);
2. the driver folds the per-block sums into exclusive block offsets —
   num_blocks scalars, never rows;
3. one task per block stamps its rows with block_offset + the local
   exclusive cumsum (parallel).

Rows never move between blocks and no shuffle happens — the scan cost
is two O(blocks) task waves. ORDER CONTRACT: the input Dataset's rows
must already be in the desired global order (block order x in-block
order); the callers feed parquet-file order, which the synth tables
keep sorted by (doc_id, chunk_id).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data as rd


@ray.remote
def _block_token_sum(token_col: str, order_cols, block: pa.Table):
    """(token_sum, first_key, last_key) — first_key orders the blocks
    on the driver: streaming execution may hand back blocks out of
    order, but each block is a contiguous slice of the globally-ordered
    input, so block key ranges are disjoint and sorting by first key
    restores the global order; last_key lets the driver VERIFY that
    disjointness instead of silently mis-packing."""
    import pyarrow.compute as pc

    if block is None or len(block) == 0:
        return 0, None, None
    first = tuple(block[c][0].as_py() for c in order_cols)
    last = tuple(block[c][-1].as_py() for c in order_cols)
    return int(pc.sum(block[token_col]).as_py() or 0), first, last


@ray.remote
def _stamp_sequences(
    token_col: str, seq_tokens: int, block_offset: int, block: pa.Table
) -> pa.Table:
    n = block[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
    off = block_offset + np.concatenate(([0], np.cumsum(n)[:-1]))
    out = block.append_column(
        "seq_id", pa.array(off // seq_tokens, pa.int64())
    )
    return out.append_column("seq_pos", pa.array(off % seq_tokens, pa.int64()))


def packed_sequences(chunks_ds, *, seq_tokens: int = 1024,
                     token_col: str = "n_tokens",
                     order_cols=("doc_id", "chunk_id")):
    """chunks (in-block ordered, block key ranges disjoint; see module
    docstring) -> same rows + (seq_id, seq_pos): the training sequence
    each chunk starts in and its token offset inside it. A chunk whose
    tokens straddle a boundary is assigned to the sequence its FIRST
    token falls in (callers that need hard splits choose seq_tokens a
    multiple of the chunk size)."""
    def _empty_with_seq_schema():
        # empty input still must carry the declared output schema —
        # downstream select_columns([... seq_id, seq_pos]) would raise
        # otherwise (ADVICE r2)
        schema = chunks_ds.schema()
        base = pa.schema(
            list(zip(schema.names, schema.types))
            if not isinstance(schema, pa.Schema) else schema
        )
        out = pa.schema(
            [f for f in base]
            + [pa.field("seq_id", pa.int64()), pa.field("seq_pos", pa.int64())]
        )
        return rd.from_arrow(out.empty_table())

    blocks = list(chunks_ds.to_arrow_refs())
    if not blocks:
        return _empty_with_seq_schema()
    stats = ray.get(
        [_block_token_sum.remote(token_col, order_cols, b) for b in blocks]
    )
    keyed = sorted(
        (
            (first, last, s, b)
            for (s, first, last), b in zip(stats, blocks)
            if first is not None
        ),
        key=lambda t: t[0],
    )
    if not keyed:
        return _empty_with_seq_schema()
    for (_, prev_last, _, _), (cur_first, _, _, _) in zip(keyed, keyed[1:]):
        if cur_first <= prev_last:
            raise ValueError(
                "packed_sequences: block key ranges overlap on "
                f"{order_cols} ({cur_first!r} <= {prev_last!r}) — the "
                "input is not globally ordered (e.g. it came out of a "
                "hash exchange); sort by the order columns first"
            )
    sums = np.array([s for _, _, s, _ in keyed], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    return rd.from_arrow_refs(
        [
            _stamp_sequences.remote(token_col, seq_tokens, int(off), b)
            for off, (_, _, _, b) in zip(offsets, keyed)
        ]
    )


# ------------------------------------------- token-budget corpus head


@ray.remote
def _budget_filter(
    token_col: str, block_offset: int, budget: int, block: pa.Table
) -> pa.Table:
    n = block[token_col].to_numpy(zero_copy_only=False).astype(np.int64)
    cum = block_offset + np.cumsum(n)  # INCLUSIVE running sum
    block = block.append_column("cum_tokens", pa.array(cum, pa.int64()))
    return block.filter(pa.array(cum <= budget))


def token_budget_head(
    ds,
    *,
    budget: int,
    token_col: str = "n_tokens",
    order_cols=("doc_id",),
):
    """Deterministic token-budget corpus subsetting: keep the ordered
    prefix of rows whose INCLUSIVE running token sum stays within
    `budget` ("the first B tokens of the corpus by doc order") and
    stamp each kept row with its cum_tokens. The standard move for
    sizing a training mix to a token target without materializing or
    sorting anything.

    Same distributed prefix-scan shape as packed_sequences: per-block
    sums (parallel) -> driver folds num_blocks scalars -> per-block
    vectorized cumsum + filter (parallel). Blocks whose offset already
    exceeds the budget emit nothing. ORDER CONTRACT as packed_sequences
    (disjoint block key ranges, verified, e.g. parquet read of an
    id-ordered table)."""
    def _empty():
        schema = ds.schema()
        base = pa.schema(list(zip(schema.names, schema.types)))
        return rd.from_arrow(
            pa.schema(
                [f for f in base] + [pa.field("cum_tokens", pa.int64())]
            ).empty_table()
        )

    blocks = list(ds.to_arrow_refs())
    if not blocks:
        return _empty()
    stats = ray.get(
        [_block_token_sum.remote(token_col, order_cols, b) for b in blocks]
    )
    keyed = sorted(
        (
            (first, last, s, b)
            for (s, first, last), b in zip(stats, blocks)
            if first is not None
        ),
        key=lambda t: t[0],
    )
    if not keyed:
        return _empty()
    for (_, prev_last, _, _), (cur_first, _, _, _) in zip(keyed, keyed[1:]):
        if cur_first <= prev_last:
            raise ValueError(
                "token_budget_head: block key ranges overlap on "
                f"{order_cols} ({cur_first!r} <= {prev_last!r}) — sort "
                "by the order columns first"
            )
    sums = np.array([s for _, _, s, _ in keyed], dtype=np.int64)
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))
    out = [
        _budget_filter.remote(token_col, int(off), int(budget), b)
        for off, (_, _, _, b) in zip(offsets, keyed)
        if off < budget  # blocks past the budget can't contribute
    ]
    if not out:
        return _empty()
    return rd.from_arrow_refs(out)
