"""Per-query isolation bench (guide §1.4) — NOT the driver contract.

``bench.py`` is the frozen driver-facing harness. This file exists for the
optimization loop: time individual demo queries in isolation with the noop
sink, count the Spark jobs each one launches, and dump
``.explain("formatted")`` plans for the plan-diff record in ``plans/r07/``.

Usage::

    python bench_extra.py q1 q2 ...          # time the named queries
    python bench_extra.py --all              # time every registered query
    python bench_extra.py --plans q1 q2 ...  # write plans/r07/<q>_<tag>.txt
    python bench_extra.py --repeat 3 q1      # repeats (default 2, keep min)

Timing methodology: same session shape as bench.py (local[$SPARK_GRAFT_CPUS],
shuffle_partitions=cpus, 32 MB maxPartitionBytes), one warm-up collect of an
unrelated table, then each query is timed with ``.collect()`` exactly as the
frozen harness times it (most queries return tiny aggregates, so collect ==
compute; the write-path queries do their own writes internally).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from shovel_spark.session import get_spark  # noqa: E402

BENCH_CONF = {"spark.sql.files.maxPartitionBytes": str(32 * 1024 * 1024)}


def _extra_conf() -> dict:
    """Optional conf overrides for A/B experiments: SPARK_EXTRA_CONF='{"k":"v"}'."""
    import json as _json

    raw = os.environ.get("SPARK_EXTRA_CONF")
    conf = dict(BENCH_CONF)
    if raw:
        conf.update(_json.loads(raw))
    return conf


def _job_count(sc) -> int:
    """Total jobs submitted so far (AppStatusStore-backed)."""
    try:
        return sc._jsc.sc().statusStore().jobsList(None).size()
    except Exception:
        return -1


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_all = "--all" in sys.argv
    do_plans = "--plans" in sys.argv
    repeat = 2
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
        args = [a for a in args if a != str(repeat)]
    tag = os.environ.get("PLAN_TAG", "before")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        master=f"local[{cpus}]", shuffle_partitions=cpus, extra_conf=_extra_conf()
    )
    sc = spark.sparkContext
    # warm-up: JIT + parquet footer caches on an unrelated scan
    spark.read.parquet(f"{sf_dir}/events.parquet").groupBy("event_type").count().collect()

    from shovel_spark.demo_queries import SPARK_QUERIES

    names = list(SPARK_QUERIES) if do_all else args
    out: dict[str, dict] = {}
    for name in names:
        fn = SPARK_QUERIES[name]
        if do_plans:
            os.makedirs("plans/r07", exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(f"plans/r07/{name}_{tag}.txt", "w") as fh:
                fh.write(plan)
            print(f"wrote plans/r07/{name}_{tag}.txt")
            continue
        times = []
        jobs0 = _job_count(sc)
        for _ in range(repeat):
            sc.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).collect()
            times.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        jobs = _job_count(sc) - jobs0
        out[name] = {
            "min": min(times),
            "times": times,
            "jobs_total": jobs,
            "jobs_per_run": round(jobs / max(repeat, 1), 1),
        }
        print(json.dumps({name: out[name]}))
    if not do_plans:
        print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
