"""GeomBurner (broadcast vector burn) and split_by_time tests."""

import numpy as np
import pyarrow as pa

from zen3geo_ray.geom import wkb
from zen3geo_ray.stages import stack
from zen3geo_ray.stages.rasterize import GeomBurner


def test_geom_burner_golden_canvas():
    # the reference golden canvas as a tile row; pentagon burn -> sum 15
    pent = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    tiles = pa.table(
        {
            "tile_id": [0, 1],
            "width": pa.array([14, 14], pa.int32()),
            "height": pa.array([10, 10], pa.int32()),
            "xmin": [1.0, 100.0],
            "ymin": [0.0, 100.0],
            "xmax": [8.0, 107.0],
            "ymax": [5.0, 105.0],
        }
    )
    burner = GeomBurner([wkb.dumps(pent)])
    out = burner(tiles).to_pylist()
    by_tile = {r["tile_id"]: r for r in out}
    assert sum(by_tile[0]["data"]) == 15
    assert by_tile[0]["agg"] == "any"
    # tile 1 is disjoint from the geometry -> all zeros
    assert sum(by_tile[1]["data"]) == 0


def test_geom_burner_lines_and_points():
    line = wkb.linestring([(3, 5), (5, 3), (3, 2), (5, 0)])
    mp = wkb.multipoint([(4.5, 4.5), (3.5, 1), (6, 3.5)])
    tiles = pa.table(
        {
            "tile_id": [0],
            "width": pa.array([14], pa.int32()),
            "height": pa.array([10], pa.int32()),
            "xmin": [1.0],
            "ymin": [0.0],
            "xmax": [8.0],
            "ymax": [5.0],
        }
    )
    assert sum(GeomBurner([wkb.dumps(line)])(tiles).to_pylist()[0]["data"]) == 13
    out = GeomBurner([wkb.dumps(mp)])(tiles).to_pylist()[0]
    assert sum(out["data"]) == 3
    assert out["agg"] == "count"


def test_split_by_time(ray_session):
    import ray.data as rd

    tbl = pa.table(
        {
            "ts": np.array(
                ["2024-01-01", "2024-06-01", "2024-12-01"], dtype="datetime64[us]"
            ),
            "v": [1.0, 2.0, 3.0],
        }
    )
    out = stack.split_by_time(
        rd.from_arrow(tbl), "ts", np.datetime64("2024-07-01", "us")
    ).to_pandas()
    assert out.sort_values("v")["phase"].tolist() == ["pre", "pre", "post"]


def test_geom_burner_missing_crs_errors():
    # reference parity: canvas without crs -> AttributeError
    # (test_datapipes_datashader.py:107-122)
    import pytest

    pent = wkb.polygon([(6, 5), (3.5, 2.5), (6, 0), (6, 2.5), (5, 2.5)])
    tiles = pa.table(
        {
            "tile_id": [0],
            "width": pa.array([14], pa.int32()),
            "height": pa.array([10], pa.int32()),
            "xmin": [1.0],
            "ymin": [0.0],
            "xmax": [8.0],
            "ymax": [5.0],
            "crs": pa.array([None], pa.string()),
        }
    )
    with pytest.raises(AttributeError, match="Missing crs information"):
        GeomBurner([wkb.dumps(pent)])(tiles)
