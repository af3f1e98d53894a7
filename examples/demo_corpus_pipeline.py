"""End-to-end training-corpus pipeline over the test documents table:

    PII scrub -> quality gate -> exact dedup -> eval decontamination
    -> unigram-LM p25 tail cut -> sequence chunking -> chunk dedup
    -> prefix-scan sequence packing

Every stage is map-only or a single bucket exchange; membership
filters ride the bucketed semi-join (never a driver-side id set), and
the only driver scalars are the corpus size, the LM threshold (one
quantile row) and the per-block token sums of the final scan. Run:

    python examples/demo_corpus_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def main(sf_dir: str = "/root/testdata/sf0.001") -> None:
    from webcollector_ray.functions.decontam import (
        build_eval_gram_set,
        contamination_flags,
    )
    from webcollector_ray.functions.dedup import exact_dedup
    from webcollector_ray.functions.joins import hash_join
    from webcollector_ray.functions.lm import (
        train_unigram_lm,
        unigram_lm_score,
    )
    from webcollector_ray.functions.packing import packed_sequences
    from webcollector_ray.functions.pii import pii_scrub_batch
    from webcollector_ray.functions.sketches import quantiles_by_key
    from webcollector_ray.functions.textstats import (
        chunk_documents_batch,
        quality_batch,
    )

    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    # 1. PII scrub (in place on the text column)
    docs = docs.map_batches(
        lambda b: pii_scrub_batch(b).select(["doc_id", "text"]),
        batch_format="pyarrow",
    )

    # 2. quality gate + 3. exact dedup
    def keep(b: pa.Table) -> pa.Table:
        q = quality_batch(b)
        return b.filter(
            pc.and_(
                pc.greater_equal(q["n_tokens"], 10),
                pc.greater_equal(q["alpha_ratio"], 0.5),
            )
        )

    kept = exact_dedup(docs.map_batches(keep, batch_format="pyarrow"))

    # 4. decontaminate against a small "benchmark" slice (ids % 17 == 3)
    def split(b: pa.Table, want: bool) -> pa.Table:
        ids = b["doc_id"].to_numpy(zero_copy_only=False)
        m = (ids % 17) == 3
        return b.filter(pa.array(m if want else ~m))

    ev = kept.map_batches(lambda b: split(b, True), batch_format="pyarrow")
    train = kept.map_batches(lambda b: split(b, False), batch_format="pyarrow")
    flags = contamination_flags(train, build_eval_gram_set(ev, k=8), k=8)
    contaminated = flags.map_batches(
        lambda b: b.filter(pc.greater(b["n_hits"], 0)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    train = hash_join(train, contaminated, on="doc_id", how="anti",
                      num_buckets=16)

    # 5. LM tail cut at the corpus p25 (threshold = one driver scalar)
    model, total = train_unigram_lm(train)
    scored = unigram_lm_score(train, model).materialize()
    keyed = scored.map_batches(
        lambda b: b.append_column("k", pa.array([0] * len(b), pa.int64())),
        batch_format="pyarrow",
    )
    thr = float(
        quantiles_by_key(keyed, key_col="k", value_col="lm_score",
                         qs=(0.25,)).to_pandas()["p25"].iloc[0]
    )
    low = scored.map_batches(
        lambda b: b.filter(pc.less(b["lm_score"], thr)).select(["doc_id"]),
        batch_format="pyarrow",
    )
    train = hash_join(train, low, on="doc_id", how="anti", num_buckets=16)

    # 6. chunk -> 7. passage dedup -> 8. pack
    chunks = train.map_batches(
        lambda b: chunk_documents_batch(b, chunk_tokens=32),
        batch_format="pyarrow",
    )
    uniq = exact_dedup(
        chunks, text_col="chunk_fp", id_col="doc_id", tie_cols=("chunk_id",)
    )
    # the fp-hash dedup scrambles row order; packing's scan contract
    # needs globally ordered, range-disjoint blocks — restore with the
    # pipeline's one legitimate global sort
    uniq = uniq.sort(["doc_id", "chunk_id"])
    packed = packed_sequences(uniq, seq_tokens=1024)
    df = packed.to_pandas()
    print(
        f"docs->sequences: {df['doc_id'].nunique()} docs, "
        f"{len(df)} unique chunks, {df['seq_id'].nunique()} sequences"
    )


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
    ray.shutdown()
