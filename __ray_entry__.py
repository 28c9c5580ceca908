"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the DRIVER before this module is imported: nothing
here (or in the library code these callables use) calls ``ray.init`` /
``ray.shutdown``.

- ``entry()``  — flagship pipeline on /root/testdata/sf0.001: build the
  transcript table from lineitem, run real maintenance (ingest as small
  files → compact → Z-order) on a scratch table, return the
  post-maintenance scan.
- ``queries()`` — one callable per implemented operator/pipeline from
  SURVEY.md §2 (see ``open_finance_lakehouse_ray/pipelines/queries.py``).
- ``oracle_sql()`` — matching DuckDB SQL per query (same column names).
  As of round 2 EVERY query is oracle-paired: the language-ID vote is a
  CASE over summed regexp counts, and SimHash signatures are rebuilt in
  SQL bit arithmetic from DuckDB's own ``hash()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    from open_finance_lakehouse_ray.pipelines.queries import q_tx_maintenance_roundtrip

    return q_tx_maintenance_roundtrip("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from open_finance_lakehouse_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from open_finance_lakehouse_ray.pipelines.queries import ORACLES

    return dict(ORACLES)
