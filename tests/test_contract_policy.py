"""Hashed-oracle contract policy guard (ARCHITECTURE.md "Hashed
oracle contract policy").

Driver rounds 4-7 proved that ANY engine-recomputed transcendental
(ln/exp/pow — not required to be correctly rounded by IEEE-754, so
libms legitimately differ) in a hashed oracle column eventually goes
hash-red on a different DuckDB/libm build, even when quantized to a
1e-6 grid at birth (the r7 LM entries went green→red AFTER the
quantized-integer migration; mix_weights was red four rounds
running). The policy:

- hashed columns carry only exact integer, rational-over-integer, or
  CORRECTLY-ROUNDED IEEE-op lineage (+, -, x, /, sqrt, floor,
  least/greatest, comparisons) — those produce bit-identical doubles
  on every conforming engine, so quantizations of them can never
  diverge;
- transcendental scores (LM cross-entropy, DSIR λ, tf-idf/BM25,
  sigmoids) are verified in pytest against Python oracles with
  tolerance, never hashed.

This test walks every oracle_sql() string and fails on transcendental
tokens, so the class cannot be reintroduced by a future entry.
"""

import re

import pytest

import __spark_entry__ as E

#: transcendental SQL functions whose results differ across libms.
#: sqrt/cbrt are NOT here: IEEE-754 requires sqrt correctly rounded
#: (cbrt intentionally still banned — it is not required-correct).
_BANNED = re.compile(
    r"(?<![a-z_])(ln|log|log2|log10|log1p|exp|exp2|pow|power|cbrt|"
    r"sin|cos|tan|asin|acos|atan|atan2|sinh|cosh|tanh|gamma|"
    r"lgamma)\s*\(", re.IGNORECASE)


def test_no_transcendentals_in_hashed_oracle_surface():
    offenders = {}
    for name, sql in E.oracle_sql().items():
        hits = sorted({m.group(1).lower()
                       for m in _BANNED.finditer(sql)})
        if hits:
            offenders[name] = hits
    assert not offenders, (
        "transcendental functions in hashed oracle SQL (move the "
        "score to a pytest tolerance check and hash exact "
        f"integer/rational sufficient statistics instead): "
        f"{offenders}")


def test_no_not_in_subqueries_in_oracles():
    """NOT IN (SELECT ...) returns ZERO rows whenever the subquery
    yields a single NULL — the silent failure class the driver
    flagged on corpus_integrity in r8. The Spark sides all use
    left_anti joins / NOT EXISTS semantics (NULL-robust), so every
    oracle must be NOT EXISTS by construction, not NULL-free by
    corpus luck. Literal IN-lists (`NOT IN ('a','b')`) stay legal:
    their NULL behavior is visible at the call site."""
    not_in_subq = re.compile(r"NOT\s+IN\s*\(\s*SELECT", re.IGNORECASE)
    offenders = [name for name, sql in E.oracle_sql().items()
                 if not_in_subq.search(sql)]
    assert not offenders, (
        "NOT IN (SELECT ...) in oracle SQL — rewrite as NOT EXISTS "
        f"(NULL-robust by construction): {offenders}")


#: entries whose fn() runs EAGER fixture work per call (index
#: train/save/load audits, the staged curation pipeline, collected
#: sketch/DTW fixtures) and then returns a driver-local or tiny
#: audit frame. Calling them costs 3-30 s EACH at sf0.001 (measured;
#: they were ~115 s of the 210 s default-suite sweep) while the plan
#: the test would inspect is the post-eager local relation — near
#: zero policy surface. The default per-verify sweep skips them;
#: the stress-marked full sweep (below) still covers every entry.
_EAGER_AUDIT_ENTRIES = frozenset({
    "sim_pq_knn_join", "sim_pq_ann", "sim_pq_index_append",
    "sim_pq_index_drift", "sim_ivf_kmeans", "sim_sq_index_rebuild",
    "sim_sq_index", "sim_sq_index_append", "sim_sq_index_drift",
    "curation_pipeline_report", "ts_dtw_knn_join",
    "ts_dtw_prefilter", "ts_dtw_topk",
})


def _sweep_spark_plans_for_transcendentals(skip=frozenset()):
    import os

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[2]")
             .config("spark.sql.shuffle.partitions", "2")
             .config("spark.ui.enabled", "false").getOrCreate())
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TINY",
                        "/root/testdata/sf0.001")
    bad = {}
    for name, fn in E.queries().items():
        if name in skip:
            continue
        try:
            # the OPTIMIZED plan: entries keep operators' float
            # scores in the analyzed plan but select them away, and
            # Catalyst column pruning must actually remove the
            # transcendental expression from what executes
            plan = fn(spark, sf)._jdf.queryExecution() \
                .optimizedPlan().toString()
        except Exception:
            continue    # entries needing fixtures absent at tiny sf
        hits = sorted({m.group(1).upper() for m in re.finditer(
            r"\b(LOG|EXP|POWER)\s*\(", plan)})
        if hits:
            bad[name] = hits
    assert not bad, (
        "transcendental expressions reach a queries() result plan "
        f"(select them away; verify in pytest instead): {bad}")


def test_no_transcendentals_feed_hashed_spark_columns():
    """The Spark twin of the SQL guard: queries() plans must not
    contain LOG/EXP/POWER expressions either (they would only be
    there to produce a hashed column — operators keep their float
    scores, but entries select them away, so a compiled plan that
    still carries one means an entry forgot to). Skips the eager
    audit entries (see _EAGER_AUDIT_ENTRIES) so the per-verify
    sweep stays inside the budget; the stress variant sweeps all."""
    _sweep_spark_plans_for_transcendentals(_EAGER_AUDIT_ENTRIES)


@pytest.mark.stress
def test_no_transcendentals_full_sweep():
    """Full-inventory variant incl. the eager audit entries (run
    with ``-m stress``, alongside the per-round full oracle gate)."""
    _sweep_spark_plans_for_transcendentals()
