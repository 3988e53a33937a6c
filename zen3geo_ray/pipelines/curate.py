"""End-to-end training-data curation — the flagship composition of the
dedup/text suites (the pipeline a 100-TB corpus actually runs):

  docs → MinHash-LSH dup groups (full connected components)
       → keep one representative per group (doc_id == component min,
         which subsumes exact dedup: byte-identical texts share every
         band)
       → token-count floor filter
       → language id
       → per-language corpus stats

Every stage is the scale-shaped operator from its home module; the whole
chain is value-checked by the ``curate`` oracle (one WITH RECURSIVE
DuckDB query composing the minhash-CC and lang CTE chains).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import text as textfn
from ..stages import dedup
from ..stages.hashjoin import bucketed_join


def curate_corpus(docs_ds, docs_ds_again, *, id_col: str = "doc_id",
                  text_col: str = "text", min_tokens: int = 20,
                  num_perm: int = 64, bands: int = 16, shingle_k: int = 3):
    """Returns ``(kept_ds, stats_ds)``: surviving (id, text, n_tok,
    lang_pred) rows and the per-language (n, n_tok_sum) aggregate.

    ``docs_ds_again`` is a second lazy instance of the same source (the
    banding pass consumes one; the representative join consumes the
    other — re-reading beats materializing the full corpus).
    """
    from ..stages.zonal import zonal_aggregate

    groups = dedup.minhash_lsh_groups(
        docs_ds, id_col=id_col, text_col=text_col,
        num_perm=num_perm, bands=bands, k=shingle_k,
    )
    reps = groups.map_batches(
        lambda b: pa.table({
            id_col: b.column(id_col).filter(
                pa.compute.equal(b.column(id_col), b.column("dup_group"))
            )
        }),
        batch_format="pyarrow",
    )
    kept = bucketed_join(docs_ds_again, reps, [id_col], n_buckets=32)

    def features(b: pa.Table) -> pa.Table:
        n_tok = textfn.token_count(b.column(text_col))
        lang = textfn.detect_lang(b.column(text_col))
        out = pa.table({
            id_col: b.column(id_col),
            text_col: b.column(text_col),
            "n_tok": pa.array(n_tok, pa.int64()),
            "lang_pred": pa.array(lang, pa.string()),
        })
        return out.filter(pa.array(n_tok >= min_tokens))

    kept = kept.map_batches(features, batch_format="pyarrow")
    stats = zonal_aggregate(
        kept.map_batches(
            lambda b: b.select(["lang_pred", "n_tok"]), batch_format="pyarrow"
        ),
        ["lang_pred"],
        {"n_tok": ["sum"]},
    )
    return kept, stats
