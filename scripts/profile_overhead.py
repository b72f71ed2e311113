"""Round-9 diagnostic: where does the ~0.2 s/query bench floor come
from, and does it grow as the session ages? Times a constant-work
fixture query (multimodal_jpeg_decode: 8 tiny rows through the Arrow
decode path) in a fresh session, then ages the session by running N
diverse bench queries, then times the fixture again. Splits each
sample into plan-build (fn call) vs execute (noop write).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def sample(fn, spark, n=6):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        out.append((round(t1 - t0, 3), round(t2 - t1, 3)))
    return out


def main():
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("overhead-probe")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    import __spark_entry__ as entry
    qs = entry.queries()

    # warmup parity with bench.py
    from siridb_server_spark.operators import dedup as D
    from siridb_server_spark.sources.testdata import load as _load
    for t in ("events", "documents", "embeddings", "lineitem"):
        spark.read.parquet(f"{SF_DIR}/{t}.parquet").count()
    qs["siri_count_to_one"](spark, SF_DIR).write \
        .format("noop").mode("overwrite").save()
    D.simhash(_load(spark, SF_DIR, "documents").limit(64)).write \
        .format("noop").mode("overwrite").save()

    fx = qs["multimodal_jpeg_decode"]
    print("fresh  :", sample(fx, spark))

    aging = ["siri_sum_bucket", "siri_mean_bucket", "dedup_exact",
             "text_quality", "ts_ewma", "tpch_q1ish", "tpch_q6ish",
             "sim_bruteforce_topk", "events_flow", "text_tfidf_sources",
             "dedup_contamination", "ts_asof_join", "curation_dsir",
             "text_fingerprint", "ts_mad", "tpch_q5ish",
             "events_cohorts", "sim_knn_join", "ts_acf",
             "text_boilerplate"] * 2
    t0 = time.perf_counter()
    for name in aging:
        qs[name](spark, SF_DIR).write.format("noop") \
            .mode("overwrite").save()
    print(f"aged by {len(aging)} queries in "
          f"{time.perf_counter() - t0:.1f}s")
    print("aged   :", sample(fx, spark))
    print("tables :", len(spark.catalog.listTables()))
    print("cached :", len([1 for (_, r) in
          spark.sparkContext._jsc.getPersistentRDDs().items()]))
    spark.stop()


if __name__ == "__main__":
    main()
