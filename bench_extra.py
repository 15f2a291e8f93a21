"""Round-6 optimization measurement harness (guide §1.4 noop-sink
isolation). NOT the driver bench — bench.py stays frozen.

Usage:
  python bench_extra.py [--reps N] [--plans DIR] [--suffix before|after] q1 q2 ...

Times each named queries() entry with the noop sink (best-of-N) and,
when --plans is given, writes `.explain("formatted")` output to
<DIR>/<query>_<suffix>.txt.

Env (same contract as bench.py): SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plans", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as entrymod
    from go_htmldate_spark.session import get_spark

    spark = get_spark(app_name="bench_extra", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qmap = entrymod.queries()

    timings: dict[str, list[float]] = {}
    for name in args.queries:
        fn = qmap[name]
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(os.path.join(
                    args.plans, f"{name}_{args.suffix}.txt"), "w") as f:
                f.write(plan)
        samples = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        timings[name] = samples

    out = {name: {"min": min(s), "samples": s} for name, s in timings.items()}
    print(json.dumps({"sf": sf, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
