"""Per-operator profiling of the bench headline (measure, don't guess).

Usage: python tools/profile_headline.py [ncpus] — prints wall + each
operator's active duration and UDF totals from ds.stats().
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

NCPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_DOCS = int(os.environ.get("GRAFT_BENCH_DOCS", "600000"))


def main():
    import ray

    ray.init(address="local", num_cpus=NCPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import ray.data as rd

    from zen3geo_ray.sources.fixtures import admin_grid
    from zen3geo_ray.stages import rasterize as rz
    from zen3geo_ray.stages.extract import pages_to_points
    from zen3geo_ray.stages.join import make_pip_join_fn, polygons_to_blob

    corpus = f"/tmp/zen3geo_bench/pages_{N_DOCS}"
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        print(f"corpus missing at {corpus}; run bench.py first")
        return
    blob_ref = ray.put(polygons_to_blob(admin_grid(nx=48, ny=24)))
    specs = rz.tile_grid_table(-180, -90, 180, 90, 64, 32, 64, 64)
    lookup = {int(r["tile_id"]): r for r in specs.to_pylist()}

    def build():
        pages = rd.read_parquet(corpus, override_num_blocks=2 * NCPUS)
        points = pages_to_points(pages, res=12, batch_size=4096)
        pts = points.map_batches(
            lambda b: b.select(["lon", "lat", "cell"]), batch_format="pyarrow"
        )
        joined = pts.map_batches(
            make_pip_join_fn(blob_ref), batch_format="pyarrow", batch_size=16384
        )
        tiled = joined.map_batches(
            lambda b: rz.assign_tiles(
                b, lon0=-180, lat0=-90, lon1=180, lat1=90, nx=64, ny=32
            ),
            batch_format="pyarrow",
        )
        sparse = tiled.map_batches(
            lambda b: rz.partial_histogram(b, tile_specs=lookup),
            batch_format="pyarrow",
        )
        return rz.assemble_rasters(sparse, specs)

    rd.read_parquet(corpus, override_num_blocks=2 * NCPUS).count()
    build().materialize()  # warm workers
    t0 = time.monotonic()
    out = build().materialize()
    print(f"wall: {time.monotonic() - t0:.2f}s  ncpus={NCPUS} docs={N_DOCS}")
    for line in out.stats().splitlines():
        if line.startswith("Operator") or "UDF time" in line or "executed in" in line:
            print(line.strip()[:150])
    ray.shutdown()


if __name__ == "__main__":
    main()
