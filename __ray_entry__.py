"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library it calls) invokes ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship quality-filter pipeline on sf0.001.
- ``queries()``    — operator battery (see cleanlab_ray/queries.py).
- ``oracle_sql()`` — DuckDB equivalents for the SQL-expressible entries.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; driver checks rows>=0."""
    from cleanlab_ray.queries import q_flagship_quality_filter

    return q_flagship_quality_filter("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from cleanlab_ray.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from cleanlab_ray.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
