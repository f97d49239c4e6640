"""Sequence packing for training-data assembly.

No reference analog; this is the concat-and-chunk packing every LLM
training pipeline runs between dedup/filter and the tokenizer: order
documents deterministically, concatenate, and split into fixed
token-budget packs. The deterministic "sequential fill" variant here —
pack_id = floor(running_token_count_before_doc / budget) — is the
standard scheme (docs may straddle a boundary; the tokenizer-side
chunker handles intra-doc splits), and crucially it is pure Catalyst:
a windowed cumulative sum, no UDF, no driver loop.

Scale shape: packing is per-shard (``by`` cols, e.g. the hash-split ×
bucket) so the window partitions are bounded; within a shard the
cumsum is one sort-based window — at 10^12 docs shards stay ~corpus /
(#splits × #buckets) and the whole operator is a single shuffle.
Determinism: ordering is ``id_col`` within the shard — stable under
repartitioning and engine-portable, so a DuckDB windowed-sum replay is
byte-exact (token counts are integers). ``id_col`` must therefore be
UNIQUE per shard (a primary key, or a composite/tiebroken column built
by the caller): duplicate ids leave the window order — and with it
pack_id/pack_offset — engine- and run-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_count_col: str,
    budget: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Assign each document a pack id under a token budget.

    Output: input keys + ``pack_id`` (0-based within the shard),
    ``pack_offset`` (token offset of this doc inside the concatenated
    stream, i.e. the cumsum BEFORE the doc). ``by`` columns shard the
    packing (each shard packs independently from pack 0).

    ALWAYS pass ``by`` at scale: without it the cumulative sum is one
    global window — a single-task sort of the whole corpus (Spark
    warns "No Partition Defined for Window operation"). The unsharded
    form exists for small data and tests only.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = by or []
    w = Window.partitionBy(*shard).orderBy(F.col(id_col)) if shard else (
        Window.orderBy(F.col(id_col))
    )
    cum_before = F.coalesce(
        F.sum(F.col(token_count_col)).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return df.select(
        *shard,
        id_col,
        F.col(token_count_col).alias("n_tokens"),
        cum_before.alias("pack_offset"),
        F.floor(cum_before / F.lit(budget)).cast("int").alias("pack_id"),
    )


def pack_stats(packed: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Per-pack fill statistics: (shard..., pack_id, n_docs, n_tokens).
    The fill ratio n_tokens/budget audits packing efficiency (the last
    pack per shard is legitimately under-full)."""
    shard = (by or []) + ["pack_id"]
    return packed.groupBy(*shard).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
    )
