"""Round-5 bench triage (VERDICT r4 tasks 2-3): rerun the three flagged
metrics 4x back-to-back under recorded ambient load.

- pipeline_write_docs_per_sec: 128,199 (r3) -> 54,546 (r4)  [2.35x]
- emb_kmeans_cells:            2.78 s (r3)  -> 7.28 s (r4)  [2.62x]
- events_zorder_stats:         0.53 s (r3)  -> 1.00 s (r4)  [1.87x]

Usage: python scripts/triage_bench_r5.py  (local[32], sf0.1)
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_CONF, _ensure_pages  # noqa: E402
from shovel_spark.session import get_spark  # noqa: E402


def load() -> float:
    return os.getloadavg()[0]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus, extra_conf=BENCH_CONF)
    pages_path = _ensure_pages(spark, 2_000_000)
    spark.read.parquet(f"{sf_dir}/events.parquet").groupBy("event_type").count().collect()

    from shovel_spark.demo_queries import SPARK_QUERIES
    from shovel_spark.pipeline import JobConfig, run_resumable
    from shovel_spark.synth import default_domain_rules, default_lang_map

    out: dict[str, list] = {"ambient_load_start": load()}

    # -- full resumable write, 4 passes ------------------------------------
    pages = spark.read.parquet(pages_path)
    lm, dr = default_lang_map(spark), default_domain_rules(spark)
    runs = []
    for i in range(4):
        od = "/tmp/triage_write_out"
        shutil.rmtree(od, ignore_errors=True)
        res = run_resumable(spark, pages, lm, dr, JobConfig(out_dir=od, n_buckets=64))
        runs.append({"sec": round(res["elapsed_sec"], 2),
                     "docs_per_sec": round(2_000_000 / res["elapsed_sec"]),
                     "load": round(load(), 1)})
    out["pipeline_full_write_2m"] = runs

    # -- the two flagged queries, 4 passes each ----------------------------
    for q in ("emb_kmeans_cells", "events_zorder_stats"):
        runs = []
        for i in range(4):
            t0 = time.time()
            SPARK_QUERIES[q](spark, sf_dir).collect()
            runs.append({"sec": round(time.time() - t0, 2), "load": round(load(), 1)})
        out[q] = runs

    out["ambient_load_end"] = load()
    spark.stop()
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
