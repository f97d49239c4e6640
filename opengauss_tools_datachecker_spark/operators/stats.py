"""Per-partition column statistics (N1) + run metrics aggregation (A1-A3).

Generalizes two reference behaviors:
- the NULL-sentinel handling of canonicalization (SURVEY.md §1.4) →
  measured per-partition null rates;
- driver-side StatAggregation (count/sum/max/min/avg/TPS ring buffer,
  /root/reference src/main/java/com/gauss/common/stats/
  StatAggregation.java:45-126) → one groupBy().agg() over the data
  itself.

One Spark job computes every column's stats for every bucket: a single
wide groupBy (map-side partial agg, one shuffle keyed by bucket) then an
unpivot to long form. Distinct counts use HyperLogLog
(approx_count_distinct) — mergeable sketches, no second shuffle, the
only sane choice at 10^12 rows (BASELINE.json north_star names HLL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def column_stats(
    df: DataFrame,
    group_col: str = "bucket",
    cols: list[str] | None = None,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Long-form stats: (bucket, column, n_rows, n_null, null_rate, min, max, approx_distinct)."""
    cols = cols or [c for c in df.columns if c != group_col]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}__nn"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"{c}__ad"),
        ]
    wide = df.groupBy(group_col).agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nn, {c}__min, {c}__max, {c}__ad" for c in cols
    )
    long = wide.selectExpr(
        group_col,
        "__n as n_rows",
        f"stack({len(cols)}, {stack_args}) as (column, n_null, min, max, approx_distinct)",
    )
    return long.select(
        group_col,
        "column",
        "n_rows",
        "n_null",
        (F.col("n_null") / F.col("n_rows")).alias("null_rate"),
        "min",
        "max",
        "approx_distinct",
    )


def metric_summary(metrics: DataFrame, value_col: str, by: list[str] | None = None) -> DataFrame:
    """count/min/max/avg/sum — the StatAggregation analog as one agg."""
    g = metrics.groupBy(*by) if by else metrics.groupBy()
    return g.agg(
        F.count(value_col).alias("n"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
        F.avg(value_col).alias("avg_v"),
        F.sum(value_col).alias("sum_v"),
    )


def embedding_quality(
    df: DataFrame,
    expected_dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Row-level embedding validation: ``(id, issue, observed)`` for every
    vector that is NULL, has the wrong dimension, contains non-finite
    values, or has an exactly-zero norm.

    The embedding-table analog of the sha256 content rule: ML pipelines
    silently produce NaN/truncated/zeroed vectors (failed encoder
    batches), and every downstream cosine/ANN result is poisoned by
    them. Issues: ``null_vector`` | ``wrong_dim`` | ``nonfinite`` |
    ``zero_norm``; ``observed`` is the offending count rendered as a
    string (all-integer semantics — no float parity risk cross-engine).

    Scale: map-only (no shuffle). The kernel is Arrow-batched and fully
    vectorized even over ragged rows — one ``np.concatenate`` over the
    batch plus offset-sliced ``np.add.reduceat`` — because the per-row
    checks (isfinite count, squared sum) distribute over a flat view.
    Per-element Spark HOFs (``exists``/``aggregate``) would run
    interpreted at ~10µs/element — the kernel is the 100 TB path.
    """
    from typing import Iterator

    import numpy as np
    import pandas as pd

    id_type = dict(df.dtypes)[id_col]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            vecs = pdf[vec_col]
            isnull = vecs.isna().to_numpy()
            out_id, out_issue, out_obs = [], [], []
            for i in np.flatnonzero(isnull):
                out_id.append(ids[i]); out_issue.append("null_vector"); out_obs.append("0")
            live = np.flatnonzero(~isnull)
            if live.size:
                arrs = [np.asarray(vecs.iloc[i], dtype=np.float64) for i in live]
                lens = np.fromiter((a.size for a in arrs), dtype=np.int64, count=len(arrs))
                flat = np.concatenate(arrs) if arrs else np.empty(0)
                offsets = np.zeros(len(arrs), dtype=np.int64)
                np.cumsum(lens[:-1], out=offsets[1:])
                finite = np.isfinite(flat)
                n_bad = np.add.reduceat(
                    (~finite).astype(np.int64), offsets
                ) if flat.size else np.zeros(0, dtype=np.int64)
                sq = np.where(finite, flat, 0.0) ** 2
                norms = np.add.reduceat(sq, offsets) if flat.size else np.zeros(0)
                live_ids = ids[live]
                for j in np.flatnonzero(lens != expected_dim):
                    out_id.append(live_ids[j]); out_issue.append("wrong_dim")
                    out_obs.append(str(int(lens[j])))
                for j in np.flatnonzero(n_bad > 0):
                    out_id.append(live_ids[j]); out_issue.append("nonfinite")
                    out_obs.append(str(int(n_bad[j])))
                for j in np.flatnonzero((n_bad == 0) & (lens > 0) & (norms == 0.0)):
                    out_id.append(live_ids[j]); out_issue.append("zero_norm")
                    out_obs.append("0")
            yield pd.DataFrame({id_col: out_id, "issue": out_issue, "observed": out_obs})

    return df.select(id_col, vec_col).mapInPandas(
        kernel, schema=f"{id_col} {id_type}, issue string, observed string"
    )


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Character-unigram Shannon entropy per document — the cheap
    perplexity proxy for corpus quality filtering (low entropy = repeated
    characters / boilerplate / padding; natural text sits ~4-4.5 bits).

    Output: (id, n_chars_obs, n_distinct, entropy_bits). NULL/empty text
    rows are kept with integer zeros (NULL-free frame).

    Scale shape: map-only Arrow kernel — the per-doc character histogram
    never leaves the batch, so there is no explode of 10^12 x doc_len
    char rows and no shuffle at all. ``+ 0.0`` normalizes IEEE -0.0
    (single-repeated-char docs) so the bytes match a SQL replay.
    """
    import numpy as np
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()

    def kernel(batches):
        for pdf in batches:
            n_obs, n_dist, ent = [], [], []
            for text in pdf["_text"]:
                if text is None or len(text) == 0:
                    n_obs.append(0)
                    n_dist.append(0)
                    ent.append(0.0)
                    continue
                _, counts = np.unique(list(text), return_counts=True)
                p = counts / counts.sum()
                h = float(-(p * np.log2(p)).sum())
                n_obs.append(len(text))
                n_dist.append(len(counts))
                ent.append(round(h, 6) + 0.0)
            yield pd.DataFrame(
                {
                    id_col: pdf["_id"],
                    "n_chars_obs": n_obs,
                    "n_distinct": n_dist,
                    "entropy_bits": ent,
                }
            )

    return df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text")).mapInPandas(
        kernel,
        schema=f"{id_col} {id_type}, n_chars_obs long, n_distinct long, entropy_bits double",
    )
