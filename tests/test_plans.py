"""Physical-plan guards: the scale properties that make the engine
viable at 100 TB, pinned as tests so a refactor can't silently lose
them.

- time-range predicates reach the parquet scan (row-group pruning)
  AND the shard-id partition column (partition pruning) — the Spark
  equivalent of the reference's per-series block index scan
  (series.c:927-938) and shard selection (shards.c:273-340);
- hot-path select pipelines contain no Python evaluation nodes
  (everything stays in Tungsten);
- a bucketed aggregate is ONE shuffle (Catalyst partial+final hash
  aggregation = the reference's per-pool pre-aggregation,
  help/help_select.md:84-96).
"""

import random

import pytest

from siridb_server_spark import SiriEngine

PY_NODES = ("BatchEvalPython", "ArrowEvalPython",
            "FlatMapGroupsInPandas", "MapInPandas")


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def store_eng(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("plandb")
    eng = SiriEngine.open(spark, str(d / "db"), precision="s")
    rng = random.Random(7)
    eng.insert({
        f"s{i}": [[1_470_000_000 + j * 60 + rng.randint(0, 5),
                   rng.random()] for j in range(200)]
        for i in range(10)})
    return eng


def test_time_range_pushdown_and_partition_pruning(store_eng):
    df = store_eng.select_df(
        "select mean(1h) from /.*/ "
        "between 1470100000 and 1470200000")
    plan = physical(df)
    assert "GreaterThanOrEqual(ts,1470100000)" in plan, plan
    assert "LessThan(ts,1470200000)" in plan
    # shard-id partition pruning (store layout sid=<bucket>)
    assert "PartitionFilters" in plan
    assert "sid" in plan.split("PartitionFilters", 1)[1][:200]


def test_no_python_nodes_in_select_pipeline(store_eng):
    for q in (
        "select sum(1h) from /.*/",
        "select difference() => filter(> 0) from /.*/",
        "select limit(20, mean) from /.*/",
        "select median(1h) from /.*/ merge as 'm' using max(1d)",
        "select count(1h) => offset(17) from /.*/",
    ):
        plan = physical(store_eng.select_df(q))
        hits = [n for n in PY_NODES if n in plan]
        assert not hits, (q, hits)


def test_bucket_agg_single_shuffle(store_eng):
    df = store_eng.select_df("select sum(1h) from /.*/")
    plan = physical(df)
    assert plan.count("Exchange") == 1, plan
    # partial before the exchange, final after: map-side combine
    assert "partial_sum" in plan


def test_tpch_join_broadcasts(spark):
    import __spark_entry__ as entry

    df = entry.queries()["tpch_join_revenue"](
        spark, "/root/testdata/sf0.001")
    plan = physical(df)
    assert "BroadcastHashJoin" in plan, plan


def test_select_df_never_collects_series_names(store_eng, monkeypatch):
    """select_df (the distributed API) must not ship O(|series|) rows
    to the driver — the type set and points bound come from a 1-row
    aggregation. query() may collect names (its result dict is keyed
    per series, inherently driver-sized)."""
    from pyspark.sql import DataFrame

    sizes = []
    orig = DataFrame.collect

    def spy(self):
        rows = orig(self)
        sizes.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", spy)
    df = store_eng.select_df("select mean(1000) from /.*/")
    assert all(s <= 1 for s in sizes), sizes
    # the plan still materializes correctly without any seed collect
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert df.count() > 0
