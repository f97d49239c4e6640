"""Model-based test of the band-index lifecycle state machine.

The index's maintenance surface — index_batch / delete_batch /
reindex_batch / compact_index (operators/dedup.py) — forms a state
machine whose interleavings the scenario tests in
test_dedup_index_cli.py exercise one named path at a time. This test
drives RANDOM seeded interleavings against a pure-Python model of the
documented contract and, after every operation, checks that

- ``read_band_index`` returns exactly the model's live+folded row
  multiset (tombstoned batches excluded),
- ``read_band_stats`` returns exactly the per-band counts of that
  multiset (the stats==recount invariant, across every fold/delete/
  tombstone/generation combination the sequence wanders through), and
- every accept/no-op/raise decision (changed-batch signature mismatch,
  tombstone resurrection, unknown-id delete) matches the model.

The model is deliberately independent of the implementation: per-batch
rowsets keyed by batch id, a manifest dict standing in for both the
folded-id list and the physically-folded src_batch rowsets, and a
tombstone set — ~40 lines that restate the docstrings of dedup.py
rather than its code, so a divergence is a real contract violation.
"""

from __future__ import annotations

import random
import re
from collections import Counter

import pytest

from opengauss_tools_datachecker_spark.operators import dedup

COMPACT_ID = "compacted"
_GEN = re.compile(r"\.g(\d+)$")
VOCAB = [f"bk{i}" for i in range(10)]


class IndexModel:
    """Pure-Python restatement of the lifecycle contract."""

    def __init__(self) -> None:
        # id -> frozenset[(doc_id, band_key)] for live per-batch partitions
        self.live: dict[str, frozenset] = {}
        # folded id -> its rows inside the compacted base (empty set is
        # the (0, 0) manifest entry of a zero-row / tombstoned-away batch)
        self.manifest: dict[str, frozenset] = {}
        self.tombstones: set[str] = set()
        self.base_exists = False

    # --- expected read results -----------------------------------------
    def expected_rows(self) -> Counter:
        c: Counter = Counter()
        for rows in self.live.values():
            c.update(rows)
        for b, rows in self.manifest.items():
            if b not in self.tombstones:
                c.update(rows)
        return c

    def expected_stats(self) -> Counter:
        c: Counter = Counter()
        for (_id, band_key), n in self.expected_rows().items():
            c[band_key] += n
        return c

    # --- operations ------------------------------------------------------
    def index(self, batch_id: str, rows: frozenset) -> bool | type:
        """Returns True/False like index_batch, or ValueError to mean
        'the real call must raise'."""
        if batch_id in self.tombstones:
            return ValueError
        if batch_id in self.manifest:
            return False if self.manifest[batch_id] == rows else ValueError
        self.live[batch_id] = rows  # overwrite of a live id is in-place
        return True

    def delete(self, batch_id: str) -> bool | type:
        removed = batch_id in self.live
        if removed:
            del self.live[batch_id]
        folded = batch_id in self.manifest
        if folded:
            self.tombstones.add(batch_id)
        if not removed and not folded:
            return ValueError
        return True

    def reindex(self, base: str, rows: frozenset) -> str:
        known = set(self.manifest) | set(self.live)
        gens = sorted(
            b
            for b in known
            if b == base or (_GEN.search(b) and b[: _GEN.search(b).start()] == base)
        )
        if not any(g in self.manifest for g in gens):
            self.live[base] = rows
            return base
        tombs0 = set(self.tombstones)
        for g in gens:
            if g in self.live or (g in self.manifest and g not in tombs0):
                self.delete(g)
        next_n = 1 + max(
            (int(m.group(1)) for g in gens if (m := _GEN.search(g))), default=0
        )
        effective = f"{base}.g{next_n}"
        self.live[effective] = rows
        return effective

    def compact(self) -> None:
        n_parts = len(self.live) + (1 if self.base_exists else 0)
        if n_parts == 0 or (n_parts == 1 and not self.tombstones):
            return
        combined = {**self.manifest, **self.live}  # keys disjoint by contract
        self.manifest = {
            b: (frozenset() if b in self.tombstones else rows)
            for b, rows in combined.items()
        }
        self.live.clear()
        self.tombstones.clear()
        self.base_exists = True


def _bands_df(spark, rows: frozenset):
    data = sorted((int(i), k) for i, k in rows)
    return spark.createDataFrame(data, "doc_id long, band_key string")


def _gen_rows(rng: random.Random, next_doc: list[int]) -> frozenset:
    rows = set()
    for _ in range(rng.randint(3, 6)):
        doc = next_doc[0]
        next_doc[0] += 1
        for k in rng.sample(VOCAB, rng.randint(2, 3)):
            rows.add((doc, k))
    return frozenset(rows)


def _check(spark, idx: str, model: IndexModel) -> None:
    got_rows = Counter(
        (int(r["doc_id"]), r["band_key"])
        for r in dedup.read_band_index(spark, idx).collect()
    )
    assert got_rows == model.expected_rows()
    got_stats = Counter(
        {r["band_key"]: int(r["bsz"]) for r in dedup.read_band_stats(spark, idx).collect()}
    )
    assert got_stats == model.expected_stats()


@pytest.mark.parametrize("seed", [7, 23, 41, 101])
def test_lifecycle_random_interleavings_match_model(spark, tmp_path, seed):
    rng = random.Random(seed)
    idx = str(tmp_path / "idx")
    model = IndexModel()
    next_doc = [0]
    next_batch = [0]

    def new_id() -> str:
        next_batch[0] += 1
        return f"b{next_batch[0]}"

    # two seed batches so reads never hit the empty-index bootstrap
    for _ in range(2):
        bid, rows = new_id(), _gen_rows(rng, next_doc)
        assert dedup.index_batch(_bands_df(spark, rows), idx, bid) is True
        assert model.index(bid, rows) is True
    _check(spark, idx, model)

    last_rows: dict[str, frozenset] = dict(model.live)
    for _ in range(14):
        known = sorted(set(model.manifest) | set(model.live))
        op = rng.choices(
            ["new", "replay", "changed", "delete", "reindex", "compact"],
            weights=[30, 12, 12, 16, 15, 15],
        )[0]
        if op == "new":
            bid, rows = new_id(), _gen_rows(rng, next_doc)
            last_rows[bid] = rows
            expect = model.index(bid, rows)
            assert dedup.index_batch(_bands_df(spark, rows), idx, bid) is expect
        elif op in ("replay", "changed") and known:
            bid = rng.choice(known)
            rows = (
                last_rows.get(bid, _gen_rows(rng, next_doc))
                if op == "replay"
                else _gen_rows(rng, next_doc)
            )
            expect = model.index(bid, rows)
            if expect is ValueError:
                with pytest.raises(ValueError):
                    dedup.index_batch(_bands_df(spark, rows), idx, bid)
            else:
                if expect is True:
                    last_rows[bid] = rows
                assert dedup.index_batch(_bands_df(spark, rows), idx, bid) is expect
        elif op == "delete" and known:
            # occasionally aim at an unknown id to hit the raise path
            bid = rng.choice(known + ["never-indexed"])
            expect = model.delete(bid)
            if expect is ValueError:
                with pytest.raises(ValueError):
                    dedup.delete_batch(spark, idx, bid)
            else:
                dedup.delete_batch(spark, idx, bid)
        elif op == "reindex" and known:
            # reindex takes BASE ids only (it assigns generations itself)
            bases = sorted({_GEN.sub("", b) for b in known if b != COMPACT_ID})
            if not bases:
                continue
            base, rows = rng.choice(bases), _gen_rows(rng, next_doc)
            effective = model.reindex(base, rows)
            got = dedup.reindex_batch(_bands_df(spark, rows), idx, base)
            assert got == effective
            last_rows[effective] = rows
        elif op == "compact":
            model.compact()
            dedup.compact_index(spark, idx)
        else:
            continue
        _check(spark, idx, model)

    # end every sequence with a fold so the terminal state is the
    # compacted steady state daily ingest converges to
    model.compact()
    dedup.compact_index(spark, idx)
    _check(spark, idx, model)
