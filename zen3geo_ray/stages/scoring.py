"""Batched model-inference stage — the GPU-shaped scoring pipeline.

The canonical shape for "run a model over 100 TB of rows": a callable
CLASS passed to ``map_batches(Cls, concurrency=N, batch_size=B,
num_gpus=g)`` — the checkpoint loads ONCE per actor in ``__init__``
(never per batch), inference is one vectorized matmul per batch, and the
actor pool's ``concurrency x num_gpus`` is sized to the cluster's
accelerators while every other stage stays on CPUs.  No GPU exists in
this sandbox, so the "model" is a deterministic integer linear head —
but the stage shape (resource sizing, per-actor state, batch-level
vectorization, typed output schema) is exactly what a real
torch/ONNX scorer drops into.

The integer head is also ORACLE-EXACT: embeddings quantize to int64
milliunits, logits are int64 dot products (order-independent exact
sums), argmax ties break to the lowest class — every step restates in
DuckDB SQL, so the driver value-checks the whole inference pipeline
(query ``score_docs``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def make_linear_model(n_classes: int = 4, dim: int = 64) -> dict:
    """Deterministic integer linear head: W[c, d] = ((c*131 + d*17) % 19) - 9.

    Stands in for loading a checkpoint; the arithmetic is restated by the
    SQL oracle so scores verify bit-exactly."""
    c = np.arange(n_classes, dtype=np.int64)[:, None]
    d = np.arange(dim, dtype=np.int64)[None, :]
    w = ((c * 131 + d * 17) % 19) - 9
    return {"W": w, "n_classes": n_classes, "dim": dim}


class BatchScorer:
    """Actor-pool map_batches fn: embedding rows -> (id, cls, logit).

    Model blob fetched once per actor (``ray.put`` the model, pass the
    ref); scoring is one int64 matmul per batch.  quant=1000 quantizes
    float embeddings to milliunits so sums are exact in any order."""

    def __init__(self, model_ref_or_blob, id_col: str = "vec_id",
                 vec_col: str = "embedding", quant: int = 1000):
        blob = model_ref_or_blob
        try:
            import ray

            if isinstance(blob, ray.ObjectRef):
                blob = ray.get(blob)
        except (ImportError, TypeError):
            pass
        self.W = np.asarray(blob["W"], dtype=np.int64)  # (C, D)
        self.id_col = id_col
        self.vec_col = vec_col
        self.quant = quant

    def __call__(self, batch: pa.Table) -> pa.Table:
        arr = batch.column(self.vec_col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        m = flat.reshape(len(arr), -1)
        qx = np.rint(m * self.quant).astype(np.int64)       # (n, D)
        logits = qx @ self.W.T                              # (n, C) int64
        cls = np.argmax(logits, axis=1)                     # ties -> lowest c
        best = logits[np.arange(len(logits)), cls]
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "cls": pa.array(cls.astype(np.int64), pa.int64()),
                "logit": pa.array(best, pa.int64()),
            }
        )


def make_scorer_fn(model_ref, id_col: str = "vec_id",
                   vec_col: str = "embedding"):
    """Task-form scorer with a per-worker-process memoized model — the
    stateless twin of ``score_embeddings`` (same output, no actor-pool
    reservation: tasks share CPUs elastically with the read; right for
    small/CPU models, while the actor pool + num_gpus form is right when
    the model load is heavy or needs an accelerator)."""
    import uuid

    from .join import _PROCESS_CACHE

    # cache key: the ObjectRef hex for ray.put models; a fresh uuid per
    # factory call for raw blobs (str(blob) would be numpy's TRUNCATED
    # repr — two different large models could silently share a key)
    try:
        import ray

        is_ref = isinstance(model_ref, ray.ObjectRef)
    except ImportError:
        is_ref = False
    tag = str(model_ref) if is_ref else f"blob-{uuid.uuid4().hex}"
    key = ("scorer", tag, id_col, vec_col)

    def score_batch(batch: pa.Table) -> pa.Table:
        s = _PROCESS_CACHE.get(key)
        if s is None:
            s = BatchScorer(model_ref, id_col=id_col, vec_col=vec_col)
            _PROCESS_CACHE[key] = s
        return s(batch)

    return score_batch


def score_embeddings(ds, model_blob_or_ref, *, id_col: str = "vec_id",
                     vec_col: str = "embedding", batch_size: int = 1024,
                     concurrency=2, num_gpus: float = 0):
    """The inference stage, sized like a real model run: actor pool of
    ``concurrency`` scorers, each holding the model; ``num_gpus`` > 0
    reserves accelerator slices per actor on a GPU cluster (0 here —
    the sandbox has none; the resource plumbing is what transfers)."""
    kwargs = dict(
        fn_constructor_args=(model_blob_or_ref, id_col, vec_col),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
    if num_gpus:
        kwargs["num_gpus"] = num_gpus
    return ds.map_batches(BatchScorer, **kwargs)
