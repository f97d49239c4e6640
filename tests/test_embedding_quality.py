"""Row-level embedding validation (operators/stats.embedding_quality)."""

from __future__ import annotations

import math

from opengauss_tools_datachecker_spark.operators.stats import embedding_quality


def test_embedding_quality_flags_each_issue(spark):
    nan = float("nan")
    rows = [
        (1, [1.0, 2.0, 3.0]),          # clean
        (2, None),                      # null_vector
        (3, [1.0, 2.0]),                # wrong_dim
        (4, [nan, 2.0, 3.0]),           # nonfinite (count 1)
        (5, [0.0, 0.0, 0.0]),           # zero_norm
        (6, [nan, math.inf, 3.0]),      # nonfinite (count 2)
        (7, [0.0, 0.0]),                # wrong_dim AND zero_norm
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sorted(
        (r["vec_id"], r["issue"], r["observed"])
        for r in embedding_quality(df, expected_dim=3).collect()
    )
    assert out == [
        (2, "null_vector", "0"),
        (3, "wrong_dim", "2"),
        (4, "nonfinite", "1"),
        (5, "zero_norm", "0"),
        (6, "nonfinite", "2"),
        (7, "wrong_dim", "2"),
        (7, "zero_norm", "0"),
    ]


def test_embedding_quality_clean_table_is_empty(spark):
    df = spark.createDataFrame(
        [(i, [float(i + 1), 1.0]) for i in range(50)], "vec_id long, embedding array<double>"
    )
    assert embedding_quality(df, expected_dim=2).count() == 0
    # map-only: no Exchange in the plan
    plan = embedding_quality(df, expected_dim=2)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_char_entropy_matches_independent_replay(spark):
    """Kernel vs a from-scratch Python replay over adversarial inputs:
    NULL, empty, single-repeated-char (the -0.0 case), unicode,
    whitespace, and seeded random strings."""
    import math
    import random
    from collections import Counter

    from opengauss_tools_datachecker_spark.operators.stats import char_entropy

    rng = random.Random(11)
    alphabet = "ab \t\né中\U0001f600xyz0123"
    rows = [
        (0, None),
        (1, ""),
        (2, "aaaaaaa"),          # entropy 0, IEEE -0.0 must normalize
        (3, "ab"),               # exactly 1 bit
        (4, "café café"),
    ] + [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 200))))
        for i in range(5, 60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_chars_obs, r.n_distinct, r.entropy_bits)
           for r in char_entropy(df, "doc_id", "text").collect()}

    for doc_id, text in rows:
        if text is None or len(text) == 0:
            assert got[doc_id] == (0, 0, 0.0)
            continue
        counts = Counter(text)
        n = sum(counts.values())
        h = -sum((c / n) * math.log2(c / n) for c in counts.values())
        n_obs, n_dist, ent = got[doc_id]
        assert (n_obs, n_dist) == (n, len(counts))
        assert abs(ent - h) < 1e-6
        assert math.copysign(1.0, ent) == 1.0  # never -0.0
    assert got[3][2] == 1.0
