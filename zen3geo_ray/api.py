"""Functional chaining API — the reference's composition surface, recast.

zen3geo registers every operator as a chainable functional datapipe
(``@functional_datapipe``, e.g. ``rioxarray.py:12``) so users write
``dp.read_from_rioxarray().slice_with_xbatcher(...)``.  The Ray-native
equivalent is a tiny ``Pipe`` wrapper over a Dataset: each reference
operator name maps to the engine stage with the same semantics, and
``.then(fn, **kw)`` is the user-extension hook (any Dataset -> Dataset
function composes — the ``@functional_datapipe`` analog).

    from zen3geo_ray import api
    pts = (api.read_pages(path, columns=[...])
              .extract_text()
              .geocode(res=12)
              .join_polygons(polygons, how="inner")
              .assign_tiles(nx=64, ny=32)
              .ds)
"""

from __future__ import annotations

import pyarrow as pa

from .sources import readers
from .stages import chips as chips_mod
from .stages import rasterize as rz
from .stages.extract import TextExtractor, geocode_batch
from .stages.join import BoxClipJoin, PointInPolygonJoin, polygons_to_blob


def _put(blob):
    import ray

    return ray.put(blob) if ray.is_initialized() else blob


class Pipe:
    """Thin chainable wrapper over a ray.data.Dataset."""

    def __init__(self, ds):
        self.ds = ds

    # --- user extension hook (the @functional_datapipe analog) ----------
    def then(self, fn, *args, **kwargs) -> "Pipe":
        """Apply any Dataset -> Dataset function."""
        return Pipe(fn(self.ds, *args, **kwargs))

    def map_batches(self, fn, **kwargs) -> "Pipe":
        kwargs.setdefault("batch_format", "pyarrow")
        return Pipe(self.ds.map_batches(fn, **kwargs))

    # --- reference-named operators ---------------------------------------
    def extract_text(self, check: bool = False, concurrency=2,
                     batch_size: int = 1024) -> "Pipe":
        return Pipe(
            self.ds.map_batches(
                TextExtractor,
                fn_constructor_kwargs={"drop_html": True, "check": check},
                batch_format="pyarrow",
                batch_size=batch_size,
                concurrency=concurrency,
            )
        )

    def geocode(self, res: int = 12) -> "Pipe":
        return self.map_batches(lambda b: geocode_batch(b, res=res))

    def join_polygons(self, polygons: pa.Table, how: str = "inner",
                      concurrency=2) -> "Pipe":
        """clip_vector_with_rectangle / PIP join analog (broadcast)."""
        ref = _put(polygons_to_blob(polygons))
        return Pipe(
            self.ds.map_batches(
                PointInPolygonJoin,
                fn_constructor_args=(ref,),
                fn_constructor_kwargs={"how": how},
                batch_format="pyarrow",
                concurrency=concurrency,
            )
        )

    def clip_vector_with_rectangle(self, polygons: pa.Table,
                                   concurrency=2) -> "Pipe":
        """Reference op #11: box rows x broadcast geometries with clip."""
        ref = _put(polygons_to_blob(polygons))
        return Pipe(
            self.ds.map_batches(
                BoxClipJoin,
                fn_constructor_args=(ref,),
                batch_format="pyarrow",
                concurrency=concurrency,
            )
        )

    def slice_with_chips(self, input_dims: dict, input_overlap: dict | None = None
                         ) -> "Pipe":
        """Reference op #12 (slice_with_xbatcher): input_dims={'y':H,'x':W}."""
        ov = input_overlap or {}
        return self.map_batches(
            lambda b: chips_mod.enumerate_chips(
                b,
                chip_h=input_dims["y"],
                chip_w=input_dims["x"],
                overlap_h=ov.get("y", 0),
                overlap_w=ov.get("x", 0),
            )
        )

    def canvas_from_raster(self) -> "Pipe":
        """Reference op #9 (canvas_from_xarray): grid-spec projection."""
        return self.map_batches(rz.canvas_from_raster)

    def assign_tiles(self, nx: int, ny: int, lon0=-180.0, lat0=-90.0,
                     lon1=180.0, lat1=90.0) -> "Pipe":
        return self.map_batches(
            lambda b: rz.assign_tiles(
                b, lon0=lon0, lat0=lat0, lon1=lon1, lat1=lat1, nx=nx, ny=ny
            )
        )

    def burn_geometries(self, wkb_blobs: list, agg: str | None = None,
                        concurrency: int | None = None) -> "Pipe":
        """Reference op #10, geometry form: burn a broadcast vector layer
        (WKB blobs, ray.put once) into each canvas row's grid — actor
        pool decodes the layer once per actor, bbox-prefilters per tile,
        then runs the exact point/line/polygon kernels."""
        import ray

        blobs = list(wkb_blobs)
        ref = ray.put(blobs) if ray.is_initialized() else blobs
        return Pipe(
            self.ds.map_batches(
                rz.GeomBurner,
                fn_constructor_args=(ref, agg),
                batch_format="pyarrow",
                concurrency=concurrency or 2,
            )
        )

    def rasterize_tiles(self, tile_specs: pa.Table, agg: str = "count",
                        value_col: str | None = None,
                        small_grid: bool = False) -> "Pipe":
        """Reference op #10 (rasterize_with_datashader), per-tile shape.

        agg='count' and agg='sum' (with ``value_col``) route through the
        SCALE path: ``partial_histogram`` / ``partial_weighted_histogram``
        pre-bin inside map_batches so the shuffle moves touched-pixel
        partials, never raw points, and the assemblers densify per tile.
        ``small_grid=True`` (or min/max aggs) uses the per-tile
        ``TileRasterizer`` map_groups — O(#tiles) Python calls, fine for
        dozens of tiles, wrong for thousands.
        """
        if not small_grid and agg in ("count", "sum", "mean", "var", "std"):
            spec_lookup = {int(r["tile_id"]): r for r in tile_specs.to_pylist()}
            if agg == "count":
                sparse = self.ds.map_batches(
                    lambda b: rz.partial_histogram(b, tile_specs=spec_lookup),
                    batch_format="pyarrow",
                )
                return Pipe(rz.assemble_rasters(sparse, tile_specs))
            if not value_col:
                raise ValueError(f"agg={agg!r} needs value_col")
            if agg in ("mean", "var", "std"):
                from ray.data.aggregate import Sum

                sparse = self.ds.map_batches(
                    lambda b: rz.partial_moment_histogram(
                        b, tile_specs=spec_lookup, value_col=value_col
                    ),
                    batch_format="pyarrow",
                )
                summed = sparse.groupby(["tile_id", "py", "px"]).aggregate(
                    Sum("n", alias_name="n"), Sum("s", alias_name="s"),
                    Sum("ss", alias_name="ss"),
                )
                return Pipe(rz.assemble_moment_rasters(summed, tile_specs,
                                                       stat=agg))
            sparse = self.ds.map_batches(
                lambda b: rz.partial_weighted_histogram(
                    b, tile_specs=spec_lookup, value_col=value_col
                ),
                batch_format="pyarrow",
            )
            return Pipe(rz.assemble_weighted_rasters(sparse, tile_specs))
        rasterizer = rz.TileRasterizer(tile_specs=tile_specs, agg=agg,
                                       value_col=value_col)

        def group_fn(g: pa.Table) -> pa.Table:
            return rasterizer(g)

        return Pipe(self.ds.groupby("tile_id").map_groups(group_fn,
                                                          batch_format="pyarrow"))

    # --- multimodal / inference -------------------------------------------
    def decode_images(self, mode: str = "real", concurrency=2,
                      **kwargs) -> "Pipe":
        """binary ``payload`` -> uint8 tensor column (real PNG/TIFF/JPEG
        codecs or the deterministic fake)."""
        from .stages.multimodal import ImageDecoder

        return Pipe(self.ds.map_batches(
            ImageDecoder, fn_constructor_kwargs={"mode": mode, **kwargs},
            batch_format="pyarrow", concurrency=concurrency,
        ))

    def decode_audio(self, mode: str = "real", concurrency=2) -> "Pipe":
        """binary WAV ``payload`` -> int16 sample column + metadata."""
        from .stages.multimodal import AudioDecoder

        return Pipe(self.ds.map_batches(
            AudioDecoder, fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow", concurrency=concurrency,
        ))

    def extract_frames(self, mode: str = "real", concurrency=2) -> "Pipe":
        """MJPEG-AVI ``payload`` -> one row per frame (JPEG payloads) —
        compose with frame_sample + decode_images."""
        from .stages.multimodal import VideoFrameExtractor

        return Pipe(self.ds.map_batches(
            VideoFrameExtractor, fn_constructor_kwargs={"mode": mode},
            batch_format="pyarrow", concurrency=concurrency,
        ))

    def score(self, model_blob_or_ref, **kwargs) -> "Pipe":
        """Batched model inference over the embedding column (actor pool,
        model loaded once per actor; ``num_gpus=`` for accelerators)."""
        from .stages.scoring import score_embeddings

        return Pipe(score_embeddings(self.ds, model_blob_or_ref, **kwargs))

    # --- corpus prep / data mixing -----------------------------------------
    def chunk(self, size: int, overlap: int = 0, id_col: str = "doc_id",
              text_col: str = "text") -> "Pipe":
        """Overlapping token-window chunking (doc -> training samples)."""
        from .stages.corpus import chunk_documents

        return Pipe(chunk_documents(self.ds, id_col=id_col,
                                    text_col=text_col, size=size,
                                    overlap=overlap))

    def invert_index(self, id_col: str = "doc_id",
                     text_col: str = "text") -> "Pipe":
        """token -> (df, tf, sorted postings) inverted index."""
        from .stages.corpus import postings

        return Pipe(postings(self.ds, id_col=id_col, text_col=text_col))

    def sample_temperature(self, key_col: str, id_col: str,
                           alpha: float = 0.5) -> "Pipe":
        """Per-source temperature mixture sampling (n_s^alpha quota)."""
        from .stages.partition import temperature_sample

        return Pipe(temperature_sample(self.ds, key_col, id_col, alpha=alpha))

    def sample_weighted(self, id_col: str, weight_col: str,
                        denom_log2: int = 10) -> "Pipe":
        """Exact-integer weighted Bernoulli row sampling (p ∝ weight)."""
        from .stages.partition import weighted_bernoulli

        return Pipe(weighted_bernoulli(self.ds, id_col, weight_col,
                                       denom_log2=denom_log2))

    def split(self, id_col: str = "doc_id", **kwargs) -> "Pipe":
        """Deterministic 80/10/10 train/val/test assignment by hash."""
        from .stages.partition import assign_split

        return Pipe(assign_split(self.ds, id_col, **kwargs))

    # --- graph ops (the pipe holds an edge table: src/dst columns) --------
    def pagerank(self, **kwargs) -> "Pipe":
        """Exact fixed-point integer PageRank over an edge pipe."""
        from .stages.graph import pagerank

        return Pipe(pagerank(self.ds, **kwargs))

    def incremental_pagerank(self, store_dir: str, **kwargs) -> "Pipe":
        """Warm-started PageRank over a cross-run edge-log store."""
        from .stages.graph import incremental_pagerank

        return Pipe(incremental_pagerank(self.ds, store_dir, **kwargs))

    def connected_components(self, **kwargs) -> "Pipe":
        """(node, comp) weakly-connected component labels of an edge pipe."""
        from .stages.graph import connected_components

        return Pipe(connected_components(self.ds, **kwargs))

    def bfs_hops(self, seeds, **kwargs) -> "Pipe":
        """Bounded-hop multi-source BFS distances from a seed Dataset."""
        from .stages.graph import bfs_hops

        return Pipe(bfs_hops(self.ds, seeds, **kwargs))

    def triangle_count(self, **kwargs) -> "Pipe":
        """One-row exact triangle count of an edge pipe."""
        from .stages.graph import triangle_count

        return Pipe(triangle_count(self.ds, **kwargs))

    def kcore(self, k: int, rounds: int, **kwargs) -> "Pipe":
        """Synchronous k-core peeling survivors of an edge pipe."""
        from .stages.graph import kcore

        return Pipe(kcore(self.ds, k=k, rounds=rounds, **kwargs))

    def common_neighbors(self, **kwargs) -> "Pipe":
        """(u, v, n_common) link-prediction counts of an edge pipe."""
        from .stages.graph import common_neighbors

        return Pipe(common_neighbors(self.ds, **kwargs))

    def ktruss(self, k: int, rounds: int, **kwargs) -> "Pipe":
        """Synchronous k-truss support peeling of an edge pipe."""
        from .stages.graph import ktruss

        return Pipe(ktruss(self.ds, k=k, rounds=rounds, **kwargs))

    def dup_spans(self, L: int = 30, **kwargs) -> "Pipe":
        """Maximal exact duplicated substring spans per doc."""
        from .stages.substring import dup_spans

        return Pipe(dup_spans(self.ds, L=L, **kwargs))

    def strip_dup_spans(self, L: int = 30, **kwargs) -> "Pipe":
        """Remove every duplicated substring span from every doc."""
        from .stages.substring import strip_dup_spans

        return Pipe(strip_dup_spans(self.ds, L=L, **kwargs))

    def winnowed_dup_spans(self, L: int = 30, w: int = 8,
                           **kwargs) -> "Pipe":
        """Scale-path duplicated spans (winnowed fingerprints + exact
        verify/extend; guaranteed for runs >= L + w - 1)."""
        from .stages.substring import winnowed_dup_spans

        return Pipe(winnowed_dup_spans(self.ds, L=L, w=w, **kwargs))

    def winnow_dup_spans_exact(self, L: int = 30, w: int = 8,
                               **kwargs) -> "Pipe":
        """dup_spans-exact output at winnowed cost (candidate-doc
        restriction is lossless by the SWA guarantee)."""
        from .stages.substring import winnow_restrict_dup_spans

        return Pipe(winnow_restrict_dup_spans(self.ds, L=L, w=w, **kwargs))

    def dedup_blocks(self, size: int = 4, **kwargs) -> "Pipe":
        """Paragraph/block-level exact dedup with doc reassembly."""
        from .stages.corpus import block_dedup

        return Pipe(block_dedup(self.ds, size=size, **kwargs))

    def lm_score(self, top_v: int = 24, **kwargs) -> "Pipe":
        """Unigram-LM quality scores (broadcast top-V vocabulary)."""
        from .stages.scoring import unigram_lm_scores

        return Pipe(unigram_lm_scores(self.ds, top_v=top_v, **kwargs))

    def bigram_lm_score(self, top_v: int = 24, **kwargs) -> "Pipe":
        """Bigram-LM quality scores (order-sensitive upgrade of
        lm_score; broadcast top-V bigram table)."""
        from .stages.scoring import bigram_lm_scores

        return Pipe(bigram_lm_scores(self.ds, top_v=top_v, **kwargs))

    def dsir_weights(self, n_buckets: int = 64, target_mod: int = 13,
                     target_rem: int = 7, **kwargs) -> "Pipe":
        """DSIR-style importance weights (hashed-unigram features,
        target subset by id residue) for data selection."""
        from .stages.scoring import dsir_weights

        return Pipe(dsir_weights(self.ds, n_buckets=n_buckets,
                                 target_mod=target_mod,
                                 target_rem=target_rem, **kwargs))

    def pack_spans(self, order_col: str, token_col: str,
                   budget: int) -> "Pipe":
        """GPT-style concat-and-split packing index (doc->chunk
        incidence rows with slice offsets)."""
        from .stages.scan import pack_span_index

        return Pipe(pack_span_index(self.ds, order_col, token_col,
                                    budget))

    def bm25(self, terms: list[str], k: int = 20, **kwargs) -> "Pipe":
        """BM25 top-k retrieval for a fixed query-term list."""
        from .stages.tfidf import bm25_topk

        return Pipe(bm25_topk(self.ds, terms, k=k, **kwargs))

    def keep_best(self, meta, **kwargs) -> "Pipe":
        """Canonical (highest-quality) member per dup cluster; ``meta``
        is an (id, quality) Dataset or Pipe."""
        from .stages.dedup import select_canonical

        m = meta.ds if isinstance(meta, Pipe) else meta
        return Pipe(select_canonical(self.ds, m, **kwargs))

    def label_propagation(self, rounds: int, **kwargs) -> "Pipe":
        """Fixed-round synchronous LPA community labels of an edge pipe."""
        from .stages.graph import label_propagation

        return Pipe(label_propagation(self.ds, rounds=rounds, **kwargs))

    def cdc_chunks(self, k: int = 8, divisor: int = 64,
                   **kwargs) -> "Pipe":
        """Content-defined chunking (rolling-hash cut rule)."""
        from .stages.substring import cdc_chunks

        return Pipe(cdc_chunks(self.ds, k=k, divisor=divisor, **kwargs))

    def cdc_dedup_stats(self, k: int = 8, divisor: int = 64,
                        **kwargs) -> "Pipe":
        """One-row CDC storage-dedup accounting."""
        from .stages.substring import cdc_dedup_stats

        return Pipe(cdc_dedup_stats(self.ds, k=k, divisor=divisor,
                                    **kwargs))

    def bpe_learn(self, rounds: int = 3, **kwargs) -> "Pipe":
        """Train BPE merges over the corpus (merge table)."""
        from .stages.corpus import bpe_learn

        return Pipe(bpe_learn(self.ds, rounds=rounds, **kwargs))

    def bpe_token_counts(self, rounds: int = 3, **kwargs) -> "Pipe":
        """Per-doc token counts under the trained BPE tokenizer."""
        from .stages.corpus import bpe_token_counts

        return Pipe(bpe_token_counts(self.ds, rounds=rounds, **kwargs))

    def sim_join(self, **kwargs) -> "Pipe":
        """Exact Jaccard similarity self-join (complete, prefix-filtered)."""
        from .stages.dedup import jaccard_sim_join

        return Pipe(jaccard_sim_join(self.ds, **kwargs))

    def hull(self, group_col: str, x_col: str, y_col: str,
             **kwargs) -> "Pipe":
        """Per-group convex-hull boundary points (exact integers)."""
        from .stages.hull import hull_boundary

        return Pipe(hull_boundary(self.ds, group_col=group_col,
                                  x_col=x_col, y_col=y_col, **kwargs))

    def diameter(self, group_col: str, x_col: str, y_col: str,
                 **kwargs) -> "Pipe":
        """Per-group exact squared diameter via hull pruning."""
        from .stages.hull import group_diameter

        return Pipe(group_diameter(self.ds, group_col=group_col,
                                   x_col=x_col, y_col=y_col, **kwargs))

    def kendall(self, group_col: str, x_col: str, y_col: str,
                **kwargs) -> "Pipe":
        """Per-group Kendall concordant/discordant pair counts."""
        from .stages.zonal import kendall_counts

        return Pipe(kendall_counts(self.ds, group_col, x_col, y_col,
                                   **kwargs))

    def token_entropy(self, **kwargs) -> "Pipe":
        """Per-group Shannon entropy of the token distribution."""
        from .stages.tfidf import token_entropy

        return Pipe(token_entropy(self.ds, **kwargs))

    def twap(self, key_col: str, ts_col: str, value_col: str,
             uid_col: str, **kwargs) -> "Pipe":
        """Per-key time-weighted average value."""
        from .stages.sequence import twap_per_key

        return Pipe(twap_per_key(self.ds, key_col, ts_col, value_col,
                                 uid_col, **kwargs))

    def ohlc(self, key_col: str, bucket_col: str, ts_col: str,
             value_col: str, uid_col: str, **kwargs) -> "Pipe":
        """OHLC candle bars per (key, time bucket)."""
        from .stages.sequence import ohlc_bars

        return Pipe(ohlc_bars(self.ds, key_col, bucket_col, ts_col,
                              value_col, uid_col, **kwargs))

    def rle(self, key_col: str, type_col: str, ts_col: str,
            uid_col: str, **kwargs) -> "Pipe":
        """Run-length encode each key's ordered type sequence."""
        from .stages.sequence import rle_runs

        return Pipe(rle_runs(self.ds, key_col, type_col, ts_col,
                             uid_col, **kwargs))

    def sssp(self, seeds, **kwargs) -> "Pipe":
        """Bounded-round weighted shortest paths of an edge pipe."""
        from .stages.graph import sssp_bounded

        s = seeds.ds if isinstance(seeds, Pipe) else seeds
        return Pipe(sssp_bounded(self.ds, s, **kwargs))

    def norm_dedup(self, **kwargs) -> "Pipe":
        """Exact dedup on ASCII-canonicalized text."""
        from .stages.dedup import normalized_dedup

        return Pipe(normalized_dedup(self.ds, **kwargs))

    def t5_spans(self, **kwargs) -> "Pipe":
        """Deterministic span-corruption masking index."""
        from .stages.corpus import span_corruption_index

        return Pipe(span_corruption_index(self.ds, **kwargs))

    def kl_by_group(self, **kwargs) -> "Pipe":
        """Per-group KL divergence from the corpus token distribution."""
        from .stages.tfidf import kl_divergence_by_group

        return Pipe(kl_divergence_by_group(self.ds, **kwargs))

    def label_centroids(self, **kwargs) -> "Pipe":
        """Per-label embedding centroids (quantized exact sums)."""
        from .stages.cluster import label_centroids

        return Pipe(label_centroids(self.ds, **kwargs))

    def union_area(self, **kwargs) -> "Pipe":
        """Exact per-group union area of integer rectangles (Klee)."""
        from .stages.zonal import rect_union_area

        return Pipe(rect_union_area(self.ds, **kwargs))

    def temporal_reach(self, seeds, **kwargs) -> "Pipe":
        """Time-respecting earliest arrival over timestamped edges."""
        from .stages.graph import temporal_reachability

        s = seeds.ds if isinstance(seeds, Pipe) else seeds
        return Pipe(temporal_reachability(self.ds, s, **kwargs))

    def weighted_median(self, key_cols: list, value_col: str,
                        weight_col: str, **kwargs) -> "Pipe":
        """Exact per-group lower weighted median."""
        from .stages.zonal import grouped_weighted_median

        return Pipe(grouped_weighted_median(self.ds, key_cols,
                                            value_col, weight_col,
                                            **kwargs))

    def drawdown(self, key_col: str, ts_col: str, value_col: str,
                 uid_col: str, **kwargs) -> "Pipe":
        """Per-key maximum drawdown of an integer value series."""
        from .stages.sequence import max_drawdown

        return Pipe(max_drawdown(self.ds, key_col, ts_col, value_col,
                                 uid_col, **kwargs))

    def interp_grid(self, key_col: str, ts_col: str, value_col: str,
                    uid_col: str, **kwargs) -> "Pipe":
        """Per-key linear interpolation onto a fixed hourly grid."""
        from .stages.sequence import linear_interp_grid

        return Pipe(linear_interp_grid(self.ds, key_col, ts_col,
                                       value_col, uid_col, **kwargs))

    def sim_join_incremental(self, store_dir: str, **kwargs) -> "Pipe":
        """Cross-run exact similarity join against a persistent store."""
        from .stages.dedup import incremental_sim_join

        return Pipe(incremental_sim_join(self.ds, store_dir, **kwargs))

    def regrid(self, src: dict, dst: dict, **kwargs) -> "Pipe":
        """Nearest-neighbor warp/regrid of a sparse raster pipe onto a
        new grid (optionally cross-CRS via ``inv_transform=``)."""
        from .stages.rasterize import regrid_nearest

        return Pipe(regrid_nearest(self.ds, src=src, dst=dst, **kwargs))

    def regrid_bilinear(self, src: dict, dst: dict, **kwargs) -> "Pipe":
        """Bilinear warp/regrid of a sparse raster pipe (4-neighbor
        center interpolation, sparse neighbors contribute 0)."""
        from .stages.rasterize import regrid_bilinear

        return Pipe(regrid_bilinear(self.ds, src=src, dst=dst, **kwargs))

    def regrid_average(self, src: dict, dst: dict, **kwargs) -> "Pipe":
        """Area-average (anti-aliased) downsample of a sparse raster
        pipe — the join-free fast regrid path."""
        from .stages.rasterize import regrid_average

        return Pipe(regrid_average(self.ds, src=src, dst=dst, **kwargs))

    def split_sentences(self, pattern: str = r"[.!?]+[\t\n\f\r ]+",
                        **kwargs) -> "Pipe":
        """Regex record/sentence splitting with 1-based part indices."""
        from .stages.corpus import split_records

        return Pipe(split_records(self.ds, pattern, **kwargs))

    # --- terminals --------------------------------------------------------
    def mmr(self, qvec, k: int = 8, **kwargs) -> "Pipe":
        """Maximal-marginal-relevance diverse top-k over an embedding
        pipe (integer-exact greedy; pool-bounded finale)."""
        from .stages.ann import mmr_topk

        import ray.data as rd

        return Pipe(rd.from_arrow(mmr_topk(self.ds, qvec, k=k, **kwargs)))

    def hilbert_partition(self, num_partitions: int, **kwargs) -> "Pipe":
        """Hilbert-range spatial partition ids (adds hkey + partition)."""
        from .stages.partition import range_partition_by_hilbert

        return Pipe(range_partition_by_hilbert(
            self.ds, num_partitions, **kwargs))

    def approx_distinct(self, key_cols: list[str], value_col: str,
                        **kwargs) -> "Pipe":
        """HyperLogLog distinct counts per key (hasher=mulrot64 for the
        oracle-mirrorable variant)."""
        from .stages.sketch import approx_distinct

        return Pipe(approx_distinct(self.ds, key_cols, value_col,
                                    **kwargs))

    def morans_i(self, res: int, **kwargs) -> pa.Table:
        """Global Moran's I + Geary's C over the cell column (terminal:
        returns the one-row Arrow table)."""
        from .stages.spatial_stats import morans_i

        return morans_i(self.ds, res=res, **kwargs)

    def hotspots(self, res: int, **kwargs) -> pa.Table:
        """Per-cell Getis-Ord Gi* z-scores (terminal)."""
        from .stages.spatial_stats import getis_ord_g

        return getis_ord_g(self.ds, res=res, **kwargs)

    def semivariogram(self, res: int, **kwargs) -> pa.Table:
        """Empirical semivariogram over cell-ring lags (terminal)."""
        from .stages.spatial_stats import semivariogram

        return semivariogram(self.ds, res=res, **kwargs)

    def dissolve(self, res: int, group_col: str, **kwargs) -> pa.Table:
        """Per-group dissolved cell-region shape stats (terminal)."""
        from .stages.spatial_stats import dissolve_stats

        return dissolve_stats(self.ds, res=res, group_col=group_col,
                              **kwargs)

    def idw_fill(self, res: int, **kwargs) -> pa.Table:
        """IDW interpolation of empty cells (terminal)."""
        from .stages.spatial_stats import idw_fill

        return idw_fill(self.ds, res=res, **kwargs)

    def local_clustering(self, **kwargs) -> "Pipe":
        """Per-node triangle counts + clustering coefficient over
        (src, dst) edges."""
        from .stages.graph import local_clustering

        return Pipe(local_clustering(self.ds, **kwargs))

    def anova(self, group_col: str, value_col: str) -> pa.Table:
        """One-way ANOVA F across groups (terminal)."""
        from .stages.zonal import oneway_anova

        return oneway_anova(self.ds, group_col, value_col)

    def gram(self, **kwargs) -> "Pipe":
        """Exact integer Gram matrix of the embedding column."""
        from .stages.cluster import gram_matrix

        return Pipe(gram_matrix(self.ds, **kwargs))

    def lisa(self, res: int, **kwargs) -> pa.Table:
        """Per-cell local Moran's I (terminal)."""
        from .stages.spatial_stats import local_moran

        return local_moran(self.ds, res=res, **kwargs)

    def temporal_hotspots(self, **kwargs) -> pa.Table:
        """1-D Gi* burst detection over time bins (terminal)."""
        from .stages.spatial_stats import temporal_gi

        return temporal_gi(self.ds, **kwargs)

    def emerging_hotspots(self, store_dir: str, res: int,
                          **kwargs) -> pa.Table:
        """Cross-run Gi* monitoring against a persistent cell-count
        store (terminal)."""
        from .stages.spatial_stats import emerging_hotspots

        return emerging_hotspots(self.ds, store_dir, res=res, **kwargs)

    def voronoi_assign(self, res: int, **kwargs) -> pa.Table:
        """Nearest-occupied-cell assignment for empty cells
        (terminal)."""
        from .stages.spatial_stats import proximity_label

        return proximity_label(self.ds, res=res, **kwargs)

    def pca_top(self, **kwargs) -> pa.Table:
        """Top principal component of the embedding column via integer
        power iteration on the distributed Gram (terminal)."""
        from .stages.cluster import gram_power_iteration

        return gram_power_iteration(self.ds, **kwargs)

    def rich_club(self, ks: list, **kwargs) -> pa.Table:
        """Rich-club coefficient curve over (src, dst) edges
        (terminal)."""
        from .stages.graph import rich_club

        return rich_club(self.ds, ks=ks, **kwargs)

    def diameter_lb(self, **kwargs) -> pa.Table:
        """Double-sweep diameter lower bound (terminal)."""
        from .stages.graph import diameter_double_sweep

        return diameter_double_sweep(self.ds, **kwargs)

    def zipf(self, **kwargs) -> pa.Table:
        """Zipf rank-frequency slope over the text column
        (terminal)."""
        from .stages.ngrams import zipf_fit

        return zipf_fit(self.ds, **kwargs)

    def join_counts(self, res: int, **kwargs) -> pa.Table:
        """Cliff-Ord binary join-count statistics over the cell column
        (terminal)."""
        from .stages.spatial_stats import join_count_stats

        return join_count_stats(self.ds, res=res, **kwargs)

    def eb_rates(self, res: int, value_col: str, **kwargs) -> pa.Table:
        """Empirical-Bayes smoothed per-cell rates (terminal)."""
        from .stages.spatial_stats import eb_rates

        return eb_rates(self.ds, res=res, value_col=value_col, **kwargs)

    def mann_kendall(self, **kwargs) -> "Pipe":
        """Per-cell Mann-Kendall trend test over (cell, bin) rows."""
        from .stages.spatial_stats import mann_kendall

        return Pipe(mann_kendall(self.ds, **kwargs))

    def knox(self, res: int, tau_us: int, **kwargs) -> pa.Table:
        """Knox space-time interaction test over (cell, tu, eid) rows
        (terminal)."""
        from .stages.spatial_stats import knox_test

        return knox_test(self.ds, res=res, tau_us=tau_us, **kwargs)

    def od_matrix(self, *, key_col: str, ts_col: str, id_col: str,
                  **kwargs) -> "Pipe":
        """Origin-destination flow counts from per-key event
        sequences."""
        from .stages.sequence import od_counts

        return Pipe(od_counts(self.ds, key_col=key_col, ts_col=ts_col,
                              id_col=id_col, **kwargs))

    def hexbin(self, size_q: int, lon_col: str = "lon",
               lat_col: str = "lat") -> "Pipe":
        """Append fixed-point axial hex ids (hq, hr) for the lon/lat
        columns."""
        from .geom.cells import hex_axial_of

        def fn(b: pa.Table) -> pa.Table:
            hq, hr = hex_axial_of(
                b.column(lon_col).to_numpy(zero_copy_only=False),
                b.column(lat_col).to_numpy(zero_copy_only=False), size_q)
            return b.append_column("hq", pa.array(hq)).append_column(
                "hr", pa.array(hr))

        return Pipe(self.ds.map_batches(fn, batch_format="pyarrow"))

    def kmv_distinct(self, key_cols: list, value_col: str,
                     **kwargs) -> "Pipe":
        """KMV distinct-count sketch per key."""
        from .stages.sketch import kmv_distinct

        return Pipe(kmv_distinct(self.ds, key_cols, value_col, **kwargs))

    def benford(self, value_col: str, **kwargs) -> pa.Table:
        """Benford first-digit audit of a positive integer column
        (terminal)."""
        from .stages.profile import benford_profile

        return benford_profile(self.ds, value_col, **kwargs)

    def harmonic_centrality(self, **kwargs) -> "Pipe":
        """Bounded-hop harmonic centrality over (src, dst) edges."""
        from .stages.graph import harmonic_centrality

        return Pipe(harmonic_centrality(self.ds, **kwargs))

    def butterfly_count(self, **kwargs) -> "Pipe":
        """Bipartite butterfly census over (src, dst) edges."""
        from .stages.graph import butterfly_count

        return Pipe(butterfly_count(self.ds, **kwargs))

    def maximal_independent_set(self, **kwargs) -> "Pipe":
        """Deterministic Luby MIS over symmetric (src, dst) edges."""
        from .stages.graph import maximal_independent_set

        return Pipe(maximal_independent_set(self.ds, **kwargs))

    def minimum_spanning_forest(self, **kwargs) -> "Pipe":
        """Boruvka minimum spanning forest over weighted edges."""
        from .stages.graph import minimum_spanning_forest

        return Pipe(minimum_spanning_forest(self.ds, **kwargs))

    def closeness_centrality(self, **kwargs) -> "Pipe":
        """Bounded-hop closeness centrality over (src, dst) edges."""
        from .stages.graph import closeness_centrality

        return Pipe(closeness_centrality(self.ds, **kwargs))

    def flow_reciprocity(self, **kwargs) -> "Pipe":
        """Weighted + binary dyad reciprocity of an OD flow matrix."""
        from .stages.sequence import flow_reciprocity

        return Pipe(flow_reciprocity(self.ds, **kwargs))

    def theil_sen(self, **kwargs) -> "Pipe":
        """Per-cell Theil-Sen trend slope over (cell, bin) rows."""
        from .stages.spatial_stats import theil_sen

        return Pipe(theil_sen(self.ds, **kwargs))

    def kaplan_meier(self, *, key_col: str, ts_col: str,
                     **kwargs) -> pa.Table:
        """Kaplan-Meier survival curve of per-key lifetimes
        (terminal)."""
        from .stages.sequence import kaplan_meier

        return kaplan_meier(self.ds, key_col=key_col, ts_col=ts_col,
                            **kwargs)

    def watershed(self, res: int, **kwargs) -> "Pipe":
        """D8 drainage-basin labels over the cell column."""
        from .stages.spatial_stats import watershed_label

        return Pipe(watershed_label(self.ds, res=res, **kwargs))

    def jsd_pairs(self, **kwargs) -> "Pipe":
        """Pairwise Jensen-Shannon divergence between group token
        distributions."""
        from .stages.tfidf import jsd_source_pairs

        return Pipe(jsd_source_pairs(self.ds, **kwargs))

    def edit_join(self, *, id_col: str, text_col: str, block_col: str,
                  **kwargs) -> "Pipe":
        """Blocked Levenshtein similarity self-join."""
        from .stages.fuzzy import edit_distance_join

        return Pipe(edit_distance_join(self.ds, id_col=id_col,
                                       text_col=text_col,
                                       block_col=block_col, **kwargs))

    def uniformity_chi2(self, **kwargs) -> "Pipe":
        """Per-cell k-category chi-square uniformity test over
        (cell, cat) rows."""
        from .stages.spatial_stats import uniformity_chi2

        return Pipe(uniformity_chi2(self.ds, **kwargs))

    def haar_energy(self, **kwargs) -> "Pipe":
        """Per-cell Haar wavelet energy spectrum over (cell, bin)
        rows."""
        from .stages.spatial_stats import haar_energy

        return Pipe(haar_energy(self.ds, **kwargs))

    def clark_evans(self, res: int, **kwargs) -> pa.Table:
        """Clark-Evans nearest-neighbor index over the cell column
        (terminal)."""
        from .stages.spatial_stats import clark_evans

        return clark_evans(self.ds, res=res, **kwargs)

    def ruggedness(self, res: int, **kwargs) -> "Pipe":
        """Terrain ruggedness index over the cell column."""
        from .stages.spatial_stats import ruggedness_index

        return Pipe(ruggedness_index(self.ds, res=res, **kwargs))

    def kruskal_wallis(self, group_col: str, value_col: str,
                       groups: list, **kwargs) -> pa.Table:
        """Kruskal-Wallis H across a closed group set (terminal)."""
        from .stages.zonal import kruskal_wallis

        return kruskal_wallis(self.ds, group_col, value_col, groups,
                              **kwargs)

    def quantile_normalize(self, **kwargs) -> "Pipe":
        """Per-group score calibration onto the pooled distribution."""
        from .stages.scan import quantile_normalize

        return Pipe(quantile_normalize(self.ds, **kwargs))

    def naive_bayes_confusion(self, **kwargs) -> "Pipe":
        """Train/test NB source classifier -> confusion matrix."""
        from .stages.scoring import naive_bayes_confusion

        return Pipe(naive_bayes_confusion(self.ds, **kwargs))

    def silhouette(self, **kwargs) -> "Pipe":
        """Simplified silhouette of the k-means clustering."""
        from .stages.cluster import silhouette_score

        return Pipe(silhouette_score(self.ds, **kwargs))

    def funnel_depth(self, *, key_col: str, ts_col: str, id_col: str,
                     type_col: str, steps: list, **kwargs) -> "Pipe":
        """k-step ordered funnel depth histogram."""
        from .stages.sequence import funnel_depth

        return Pipe(funnel_depth(self.ds, key_col=key_col,
                                 ts_col=ts_col, id_col=id_col,
                                 type_col=type_col, steps=steps,
                                 **kwargs))

    def vocab_drift(self, store_dir: str, **kwargs) -> pa.Table:
        """Cross-run vocabulary-drift row; appends this run's counts
        (terminal)."""
        from .stages.tfidf import vocab_drift

        return vocab_drift(self.ds, store_dir, **kwargs)

    def average_precision(self, label_col: str, score_col: str,
                          pos_label, neg_label, **kwargs) -> pa.Table:
        """Quantized step-wise PR-AUC of an integer score (terminal)."""
        from .stages.zonal import average_precision

        return average_precision(self.ds, label_col, score_col,
                                 pos_label, neg_label, **kwargs)

    def decile_gains(self, label_col: str, score_col: str,
                     pos_label, neg_label, **kwargs) -> pa.Table:
        """Descending-rank gains/lift bins with per-bin positive rate
        (terminal)."""
        from .stages.zonal import decile_gains

        return decile_gains(self.ds, label_col, score_col,
                            pos_label, neg_label, **kwargs)

    def attribution(self, **kwargs) -> "Pipe":
        """Last-touch attribution per channel (conversions +
        credited value)."""
        from .stages.sequence import last_touch_attribution

        return Pipe(last_touch_attribution(self.ds, **kwargs))

    def ewma(self, **kwargs) -> "Pipe":
        """Per-key dyadic EWMA of the last k integer values."""
        from .stages.sequence import ewma_last_k

        return Pipe(ewma_last_k(self.ds, **kwargs))

    def fd_check(self, det_col: str, dep_col: str, **kwargs) -> pa.Table:
        """Functional-dependency profile row (terminal)."""
        from .stages.profile import fd_check

        return fd_check(self.ds, det_col, dep_col, **kwargs)

    def hausdorff(self, *, res: int, max_dist: int, group_a, group_b,
                  **kwargs) -> pa.Table:
        """Grid Hausdorff distance between two occupancy patterns
        (terminal)."""
        from .stages.spatial_stats import hausdorff_cells

        return hausdorff_cells(self.ds, res=res, max_dist=max_dist,
                               group_a=group_a, group_b=group_b,
                               **kwargs)

    def scc(self, **kwargs) -> "Pipe":
        """Strongly-connected components of a directed edge dataset."""
        from .stages.graph import strongly_connected_components

        return Pipe(strongly_connected_components(self.ds, **kwargs))

    def bowtie(self, **kwargs) -> pa.Table:
        """Bow-tie macro-structure (giant SCC / IN / OUT / other) of a
        directed edge dataset (terminal)."""
        from .stages.graph import bowtie_decomposition

        return bowtie_decomposition(self.ds, **kwargs)

    def k_anonymity(self, qi_cols: list[str], k: int,
                    **kwargs) -> pa.Table:
        """k-anonymity audit over quasi-identifier columns
        (terminal)."""
        from .stages.profile import k_anonymity

        return k_anonymity(self.ds, qi_cols, k, **kwargs)

    def neg_sample(self, k: int, **kwargs) -> "Pipe":
        """Deterministic negative-edge sampling (link-pred prep)."""
        from .stages.graph import negative_edge_sample

        return Pipe(negative_edge_sample(self.ds, k=k, **kwargs))

    def coverage(self, *, res: int, max_dist: int, **kwargs) -> pa.Table:
        """Accessibility coverage curve by ring distance (terminal)."""
        from .stages.spatial_stats import coverage_by_ring

        return coverage_by_ring(self.ds, res=res, max_dist=max_dist,
                                **kwargs)

    def dtw_pairs(self, **kwargs) -> "Pipe":
        """Pairwise DTW of per-key daily-total series."""
        from .stages.sequence import dtw_pairs

        return Pipe(dtw_pairs(self.ds, **kwargs))

    def snap_to_segments(self, segs, *, radius: int, **kwargs) -> "Pipe":
        """Nearest-segment snap within a radius (map-matching step);
        ``segs`` is a Dataset or Pipe of (sid, x0, y0, x1, y1)."""
        from .stages.join import snap_points_to_segments

        s = segs.ds if isinstance(segs, Pipe) else segs
        return Pipe(snap_points_to_segments(self.ds, s, radius=radius,
                                            **kwargs))

    def psi(self, group_col: str, value_col: str, group_a, group_b,
            *, bin_width: int, **kwargs) -> pa.Table:
        """Population stability index between two groups (terminal)."""
        from .stages.zonal import psi_two_groups

        return psi_two_groups(self.ds, group_col, value_col, group_a,
                              group_b, bin_width=bin_width, **kwargs)

    def ols2(self, y_col: str, x1_col: str, x2_col: str,
             **kwargs) -> pa.Table:
        """Two-regressor exact-integer OLS (terminal)."""
        from .stages.zonal import ols2

        return ols2(self.ds, y_col, x1_col, x2_col, **kwargs)

    def upsert(self, store_dir: str, *, key_cols: list[str],
               order_cols: list[str], **kwargs) -> "Pipe":
        """SCD-1 keyed upsert into a parquet store; returns the merged
        current view."""
        from .state.lineage import upsert_store

        return Pipe(upsert_store(self.ds, store_dir, key_cols=key_cols,
                                 order_cols=order_cols, **kwargs))

    def pyramid(self, *, res: int, deltas: list[int],
                **kwargs) -> "Pipe":
        """Multi-resolution density pyramid over the cell column."""
        from .stages.spatial_stats import pyramid_counts

        return Pipe(pyramid_counts(self.ds, res=res, deltas=deltas,
                                   **kwargs))

    def densify(self, *, k: int, **kwargs) -> "Pipe":
        """k+1 exact-lattice points along each integer segment."""
        from .stages.join import densify_segments

        return Pipe(densify_segments(self.ds, k=k, **kwargs))

    def lpm(self, table, *, x_col: str, **kwargs) -> "Pipe":
        """Longest-prefix-match broadcast lookup (CIDR shape)."""
        from .stages.rangejoin import lpm_lookup

        return Pipe(lpm_lookup(self.ds, table, x_col=x_col, **kwargs))

    def trimmed_mean(self, key_cols: list[str], value_col: str,
                     **kwargs) -> "Pipe":
        """Per-group trimmed mean from the value histogram."""
        from .stages.zonal import grouped_trimmed_mean

        return Pipe(grouped_trimmed_mean(self.ds, key_cols, value_col,
                                         **kwargs))

    def theil(self, key_cols: list[str], value_col: str,
              **kwargs) -> "Pipe":
        """Per-group Theil T inequality index (quantized-ln)."""
        from .stages.zonal import grouped_theil

        return Pipe(grouped_theil(self.ds, key_cols, value_col,
                                  **kwargs))

    def interarrival(self, *, key_col: str, ts_col: str, id_col: str,
                     bucket_us: int, max_bucket: int,
                     **kwargs) -> "Pipe":
        """Inter-arrival-time histogram of per-key event streams."""
        from .stages.sequence import interarrival_hist

        return Pipe(interarrival_hist(
            self.ds, key_col=key_col, ts_col=ts_col, id_col=id_col,
            bucket_us=bucket_us, max_bucket=max_bucket, **kwargs))

    def seed_harmonic(self, seeds, *, max_hops: int = 3,
                      **kwargs) -> "Pipe":
        """Bounded-hop harmonic centrality from a seed set."""
        from .stages.graph import seed_harmonic_centrality

        return Pipe(seed_harmonic_centrality(self.ds, seeds,
                                             max_hops=max_hops,
                                             **kwargs))

    def write_density_tiles(self, out_dir: str, *, res: int,
                            deltas: list[int], **kwargs) -> "Pipe":
        """Slippy-map PNG density-tile pyramid sink (manifest out)."""
        from .stages.rasterize import write_density_tiles

        return Pipe(write_density_tiles(self.ds, out_dir, res=res,
                                        deltas=deltas, **kwargs))

    def write_tar_shards(self, out_dir: str, **kwargs) -> list:
        """WebDataset tar-shard sink (terminal; returns shard
        paths)."""
        from .sources.tarshards import write_tar_shards

        return write_tar_shards(self.ds, out_dir, **kwargs)

    def write_parquet(self, path: str, **kwargs):
        return self.ds.write_parquet(path, **kwargs)

    def to_pandas(self):
        return self.ds.to_pandas()

    def count(self) -> int:
        return self.ds.count()


def read_pages(path: str, columns: list[str] | None = None, **kwargs) -> Pipe:
    return Pipe(readers.read_pages(path, columns=columns, **kwargs))


def from_arrow(table: pa.Table) -> Pipe:
    import ray.data as rd

    return Pipe(rd.from_arrow(table))
