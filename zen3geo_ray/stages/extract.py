"""Pages → points: extraction, geocoding, cell indexing (build-plan §7.1).

The minimum end-to-end slice: ``read_parquet(pages) → map_batches(
TextExtractor [actor pool]) → map_batches(geocode_batch) →
write_parquet(points)``.  The html column is dropped immediately after
extraction (SURVEY §7.4 wide-rows: MB-scale binary payloads must not
travel further than necessary).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.geocode import geocode_url
from ..functions.text import extract_text_array
from ..geom import cells


class TextExtractor:
    """Actor-pool stage: html -> text (regexes compiled once per actor at
    import; the actor form exists so heavier extractors — models,
    tokenizers — have a warm-init home).  Verifies/produces the per-url
    byte-identity contract.

    drop_html=True removes the heavy binary column from the stream.
    check=True asserts extracted == existing ``text`` column (parity
    mode); otherwise writes/overwrites ``text``.
    """

    def __init__(self, drop_html: bool = True, check: bool = False):
        self.drop_html = drop_html
        self.check = check

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = extract_text_array(batch.column("html").to_pylist())
        if self.check and "text" in batch.column_names:
            existing = batch.column("text").to_pylist()
            if texts != existing:
                bad = next(i for i, (a, b) in enumerate(zip(texts, existing)) if a != b)
                url = batch.column("url")[bad].as_py()
                raise AssertionError(f"text mismatch for url={url!r}")
        arr = pa.array(texts, pa.large_string())
        if "text" in batch.column_names:
            batch = batch.set_column(
                batch.column_names.index("text"), "text", arr
            )
        else:
            batch = batch.append_column("text", arr)
        if self.drop_html:
            batch = batch.drop_columns(["html"])
        return batch


def geocode_batch(batch: pa.Table, res: int = 12) -> pa.Table:
    """Stateless map_batches fn: url+lang -> lon/lat/cell columns."""
    urls = batch.column("url").to_pylist()
    langs = batch.column("lang").to_pylist()
    lon, lat = geocode_url(urls, langs)
    cell = cells.cell_of(lon, lat, res)
    return (
        batch.append_column("lon", pa.array(lon, pa.float64()))
        .append_column("lat", pa.array(lat, pa.float64()))
        .append_column("cell", pa.array(cell, pa.int64()))
    )


def extract_batch(batch: pa.Table, drop_html: bool = True,
                  check: bool = False) -> pa.Table:
    """Stateless task form of the extractor (regexes are module-level).

    Preferred in pipelines: task-based stages share CPUs elastically with
    the parquet read instead of reserving a fixed actor pool (a pool
    sized to the node starves the read and serializes the pipeline).
    Use the ``TextExtractor`` actor class when the extractor carries real
    per-worker state (a model, a tokenizer).
    """
    return TextExtractor(drop_html=drop_html, check=check)(batch)


def pages_to_points(pages_ds, res: int = 12, check_identity: bool = False,
                    concurrency=None, batch_size: int = 1024):
    """The flagship slice as one lazy plan (streaming end to end).

    concurrency=None (default) -> stateless tasks, fully elastic;
    concurrency=N or (lo, hi) -> actor pool (for stateful extractors).
    """
    if concurrency:
        pts = pages_ds.map_batches(
            TextExtractor,
            fn_constructor_kwargs={"drop_html": True, "check": check_identity},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
        )
    else:
        pts = pages_ds.map_batches(
            lambda b: extract_batch(b, check=check_identity),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return pts.map_batches(
        lambda b: geocode_batch(b, res=res), batch_format="pyarrow"
    )
