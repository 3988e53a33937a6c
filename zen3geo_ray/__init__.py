"""zen3geo_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch engine with the query/data-processing capabilities of
``weiji14/zen3geo`` (reference, read-only at /root/reference), re-expressed
Ray-Data-first: every operator is a transform over ``ray.data.Dataset``
blocks of zero-copy Arrow, stateful stages run on actor pools, wide steps
use groupby/aggregate with explicit keys and salted shuffles.

The reference is a thin streaming-composition layer over torchdata
IterDataPipes (``zen3geo/datapipes/__init__.py:5-26``); this engine keeps
its *semantics* (spatial joins, rasterization, chip slicing, stack/mosaic)
but replaces positional, single-process iteration with keyed, distributed
dataflow.

No geospatial libraries are assumed: geometry (WKB, STRtree,
point-in-polygon, clipping), CRS math (web-mercator, UTM) and the
hierarchical cell index are implemented here in vectorized numpy.
"""

__version__ = "0.1.0"
