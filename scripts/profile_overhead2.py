"""What does 0.5 s of a constant-work fixture query consist of?
Times progressively richer variants of the same tiny job."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def t(label, thunk, n=5):
    out = []
    for _ in range(n):
        t0 = time.perf_counter()
        thunk()
        out.append(round(time.perf_counter() - t0, 3))
    print(f"{label:34s}", out)


def main():
    from pyspark.sql import SparkSession
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("overhead-probe2")
        .config("spark.sql.shuffle.partitions", str(CPUS))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from siridb_server_spark.operators import multimodal as MM
    import numpy as np

    flat = np.full((8, 8), 100, np.uint8)
    rows = [(i, "image", MM.encode_jpeg_baseline(flat), "image/jpeg")
            for i in range(8)]

    def mk():
        return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)

    # warmups
    spark.range(10).write.format("noop").mode("overwrite").save()
    MM.decode_jpeg_meta(mk()).write.format("noop") \
        .mode("overwrite").save()

    print("input partitions:", mk().rdd.getNumPartitions())
    t("range(8) noop", lambda: spark.range(8).write
      .format("noop").mode("overwrite").save())
    t("createDF only", lambda: mk().write
      .format("noop").mode("overwrite").save())
    t("createDF coalesce(1)", lambda: mk().coalesce(1).write
      .format("noop").mode("overwrite").save())
    t("decode_jpeg", lambda: MM.decode_jpeg_meta(mk()).write
      .format("noop").mode("overwrite").save())
    t("decode_jpeg coalesce(1)", lambda: MM.decode_jpeg_meta(
        mk().coalesce(1)).write.format("noop")
        .mode("overwrite").save())
    one = mk().coalesce(1)
    t("decode_jpeg prebuilt-input", lambda: MM.decode_jpeg_meta(one)
      .write.format("noop").mode("overwrite").save())
    spark.stop()


if __name__ == "__main__":
    main()
