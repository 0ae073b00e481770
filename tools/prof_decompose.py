"""Decompose scaling: time (a) pure decode UDF job, (b) scheduler-only round
loop (decode off), at the given SPARK_GRAFT_CPUS."""
from __future__ import annotations

import json
import os
import shutil
import tempfile
import time

from pyspark.sql import functions as F


def main():
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from artemis_spark.session import get_spark
    from artemis_spark.datagen import generate
    from artemis_spark.functions.images import decode_validate_image

    spark = get_spark("prof_decomp")
    tier = "bench"
    web_dir = os.path.join(tempfile.gettempdir(), f"artemis_bench_web_{tier}")
    if not os.path.exists(os.path.join(web_dir, "_DONE")):
        generate(tier, web_dir)
        open(os.path.join(web_dir, "_DONE"), "w").close()

    payloads = spark.read.parquet(f"{web_dir}/payloads.parquet").repartition(cpus * 4)
    payloads.count()  # warm FS cache

    t0 = time.monotonic()
    n = payloads.select(decode_validate_image(F.col("bytes")).alias("d")).filter(
        F.col("d.ok")
    ).count()
    t_decode = time.monotonic() - t0

    # replicate 4x for a bigger sample
    big = payloads.union(payloads).union(payloads).union(payloads)
    t0 = time.monotonic()
    n4 = big.select(decode_validate_image(F.col("bytes")).alias("d")).filter(
        F.col("d.ok")
    ).count()
    t_decode4 = time.monotonic() - t0

    # scheduler-only crawl rounds
    from artemis_spark.plans.crawl import CrawlConfig, CrawlEngine

    state_dir = os.path.join(tempfile.gettempdir(), f"artemis_decomp_{os.getpid()}")
    shutil.rmtree(state_dir, ignore_errors=True)
    cfg = CrawlConfig(
        politeness_budget=int(os.environ.get("ARTEMIS_BENCH_BUDGET", "512")),
        num_partitions=cpus,
        bloom_shards=cpus * 2,
        decode_payloads=False,
    )
    import bench as B
    seeds_path = B._dense_seeds(web_dir, tier, 64)
    eng = CrawlEngine(spark, web_dir, state_dir, cfg, seeds_path=seeds_path)
    t0 = time.monotonic()
    stats = eng.run(4)
    t_sched = time.monotonic() - t0
    urls = sum(s.get("scheduled", 0) for s in stats) * 2
    shutil.rmtree(state_dir, ignore_errors=True)
    print(json.dumps({
        "cpus": cpus,
        "decode_60k_sec": round(t_decode, 2),
        "decode_240k_sec": round(t_decode4, 2),
        "decoded": n, "decoded4": n4,
        "sched_only_wall": round(t_sched, 2),
        "sched_urls": urls,
        "sched_urls_per_sec": round(urls / t_sched, 1),
        "per_round": [s.get("round_wall_ms") for s in stats],
    }))


if __name__ == "__main__":
    main()
