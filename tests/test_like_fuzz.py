"""Property test: like_to_regex matches DuckDB's LIKE semantics.

The reference compiles SQL-LIKE white/black lists to regex
(LikeUtil.java:47-113); our like_to_regex must agree with a real SQL
engine's LIKE on arbitrary patterns — including literal %/_ escapes —
since table selection decides WHAT gets validated at all.
"""

from __future__ import annotations

import duckdb
import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from opengauss_tools_datachecker_spark.sources.catalog import like_to_regex  # noqa: E402

# identifier-ish alphabet plus the LIKE metacharacters and escape
ALPHA = "abcXY_%\\01."
con = duckdb.connect()


def duck_like(text: str, pattern: str) -> bool:
    # ILIKE: like_to_regex is case-insensitive by design (LikeUtil analog)
    return con.execute(
        "SELECT ? ILIKE ? ESCAPE '\\'", [text, pattern]
    ).fetchone()[0]


@settings(max_examples=300, deadline=None)
@given(
    text=st.text(alphabet=ALPHA.replace("\\", "").replace("%", "").replace("_", "x"),
                 min_size=0, max_size=12),
    pattern=st.text(alphabet=ALPHA, min_size=0, max_size=12),
)
def test_like_to_regex_agrees_with_duckdb(text, pattern):
    # a trailing backslash is an incomplete escape — engines differ; skip
    if pattern.count("\\") and pattern.rstrip("\\") != pattern:
        return
    # our dialect only escapes % and _ ; other escaped chars differ
    for i, ch in enumerate(pattern):
        if ch == "\\" and (i + 1 >= len(pattern) or pattern[i + 1] not in "%_"):
            return
    got = bool(like_to_regex(pattern).match(text))
    want = bool(duck_like(text, pattern))
    assert got == want, f"text={text!r} pattern={pattern!r} ours={got} duckdb={want}"


@settings(max_examples=100, deadline=None)
@given(
    fracs=st.lists(st.integers(min_value=1, max_value=100), min_size=2, max_size=6)
)
def test_split_thresholds_partition_the_hash_space(fracs):
    """Property: for any valid split spec, the cumulative hex bounds are
    monotonic, the last bound covers the whole space, and every 8-hex
    prefix lands in exactly one split (no gaps, no overlaps)."""
    from opengauss_tools_datachecker_spark.operators.contamination import (
        split_thresholds,
    )

    total = sum(fracs)
    splits = {f"s{i}": f / total for i, f in enumerate(fracs)}
    # fix float-sum drift so the spec is valid
    drift = 1.0 - sum(splits.values())
    splits[f"s{len(fracs) - 1}"] += drift
    bounds = split_thresholds(splits)
    hexes = [b for _, b in bounds]
    assert hexes == sorted(hexes)
    assert hexes[-1] == f"{16**8:09x}"
    # a few probe prefixes, including the extremes
    for p in ("000000000", "0ffffffff", "080000000", f"{16**8 - 1:09x}"):
        owners = [name for (name, b), prev in zip(bounds, ["0" * 9] + hexes[:-1])
                  if prev <= p < b]
        assert len(owners) == 1, (p, bounds)
