"""Out-of-order ingest / durability golden, transliterated from the
reference's itest/test_buffer.py: its exact deterministic batch
recipe (per-series batch counts from the name's byte sum, backward
AND forward timestamp steps, multi-point batches) inserted through a
store-backed engine, with full point-for-point equality checked
after every wave and across engine reopen cycles (the single-node
analogue of the reference's buffer-path/size restarts)."""

import pytest

from siridb_server_spark import SiriEngine


class _Recipe:
    """The reference's _add_points generator (test_buffer.py:27-40),
    deterministic and engine-independent."""

    def __init__(self):
        self.ts = 1500000000
        self.total: dict = {}

    def wave(self):
        batches_out = []
        for series_name in ["iris", "db", "ligo", "sasha"]:
            self.total.setdefault(series_name, [])
            batches = sum(ord(c) for c in series_name) % 100
            for i in range(batches):
                npoints = []
                n = int(i ** 0.5 * 10000 % 5) + 1
                for p in range(n):
                    self.ts += (n + 5000) if i % 2 else (n - 5000)
                    npoints.append([self.ts, i * 1000 + p])
                self.total[series_name].extend(npoints)
                self.total[series_name].sort()
                batches_out.append({series_name: npoints})
        return batches_out


def _assert_equal(eng, total):
    for series_name, points in total.items():
        res = eng.query(f'select * from "{series_name}"')[series_name]
        assert len(points) == len(res), series_name
        assert points == res, series_name


def _merged(batches):
    """Concatenate one wave's batches into a single insert payload —
    point order (and therefore equal-ts seq order) is preserved, so
    the equality semantics are identical to per-batch inserts."""
    out: dict = {}
    for b in batches:
        for name, pts in b.items():
            out.setdefault(name, []).extend(pts)
    return out


def test_buffer_recipe_equality_across_reopen(spark, tmp_path):
    recipe = _Recipe()
    eng = SiriEngine.open(spark, str(tmp_path / "bufdb"),
                          precision="s")
    eng.insert(_merged(recipe.wave()))
    _assert_equal(eng, recipe.total)
    # restart-equivalent of the reference's buffer reconfigs:
    # reopen from disk, equality must survive
    eng = SiriEngine.open(spark, str(tmp_path / "bufdb"),
                          precision="s")
    _assert_equal(eng, recipe.total)
    eng.insert(_merged(recipe.wave()))
    _assert_equal(eng, recipe.total)


@pytest.mark.stress
@pytest.mark.parametrize("backend", ["memory", "store"])
def test_buffer_recipe_per_batch_inserts(spark, tmp_path, backend):
    """The faithful variant: every reference insert() call is one
    engine insert() call (~186 appends per wave) — exercises the
    store's many-small-appends path end to end. Stress-marked for
    runtime (~4 min/backend)."""
    recipe = _Recipe()
    if backend == "store":
        eng = SiriEngine.open(spark, str(tmp_path / "bufdb"),
                              precision="s")
    else:
        eng = SiriEngine(spark, precision="s")
    for batch in recipe.wave():
        eng.insert(batch)
    _assert_equal(eng, recipe.total)
    if backend == "store":
        eng = SiriEngine.open(spark, str(tmp_path / "bufdb"),
                              precision="s")
        _assert_equal(eng, recipe.total)
    for batch in recipe.wave():
        eng.insert(batch)
    _assert_equal(eng, recipe.total)
