"""Referential integrity via anti-join, strategy chosen by table stats (N3).

No reference analog (datachecker checks one table at a time); mandated
by BASELINE.json north_star: "referential checks repo→commit via
broadcast or sort-merge join chosen by table stats".

Scale design: the child side is first reduced to distinct keys
(``groupBy`` with map-side combine — at 10^12 files the distinct
(repo,commit) set is orders of magnitude smaller than the row count),
then anti-joined against the parent. The broadcast-vs-shuffle choice is
explicit: parents under the row threshold are broadcast (no shuffle of
the child at all); larger parents fall back to Catalyst's sort-merge /
shuffled-hash with AQE skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_keys(
    child: DataFrame,
    parent: DataFrame,
    on: list[str],
    parent_rows: int | None = None,
    broadcast_threshold_rows: int = 5_000_000,
) -> DataFrame:
    """Distinct child keys with no matching parent row (must be empty).

    ``parent_rows``: caller-provided stats estimate (catalog stats /
    Iceberg snapshot summary in production). When provided, the
    broadcast-vs-shuffle choice is made from it explicitly. When None,
    NO extra count job runs — the join is left to AQE, which re-plans
    a sort-merge join into a broadcast join at runtime from the actual
    shuffle sizes (the same "chosen by table stats" decision, using
    runtime stats instead of catalog stats, with zero extra passes over
    the data).
    """
    child_keys = child.select(*on).distinct()
    parent_keys = parent.select(*on).distinct()
    if parent_rows is not None and parent_rows <= broadcast_threshold_rows:
        parent_keys = F.broadcast(parent_keys)
    return child_keys.join(parent_keys, on, "left_anti")
