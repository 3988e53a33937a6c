"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship geospatial pipeline on sf0.001;
``queries()`` exposes one callable per implemented operator from
SURVEY.md §2 (+ the training-data extensions); ``oracle_sql()`` gives the
DuckDB-equivalent SQL for every SQL-expressible query (same column names,
mirrored arithmetic).  Ray is initialised by the driver BEFORE this
module is imported — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: documents -> geocode -> broadcast admin PIP join
    -> per-cell zonal stats (count + n_chars sum)."""
    from zen3geo_ray.pipelines import queries as q
    from zen3geo_ray.stages import zonal

    joined = q.q_pip_admin(SF_SMOKE)
    # zonal reduce over the join output: docs per admin polygon
    return zonal.zonal_aggregate(joined, ["poly_id"], {})


def queries() -> dict[str, Callable[[str], Any]]:
    from zen3geo_ray.pipelines import queries as q

    return q.build_queries()


def oracle_sql() -> dict[str, str]:
    from zen3geo_ray.pipelines import queries as q

    return q.build_oracles()
