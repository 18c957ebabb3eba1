#!/usr/bin/env python
"""Round-8 optimization harness — per-query noop-sink isolation + plans.

NOT the frozen driver bench (bench.py is untouched); this file exists so
optimization work can time individual queries at any SF with the §1.4
noop-sink methodology and dump `.explain("formatted")` for the plan
evidence in plans/r08/.

Usage:
  python bench_extra.py q1 q2 ...            # time named queries (reps=3)
  python bench_extra.py --plans q1 q2 ...    # also write plans/r08/<q>_<tag>.txt
  env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BE_REPS, BE_TAG (plan suffix)

`flagship` is accepted as a pseudo-query name (the bench.py steady-state
flagship plan). Prints one JSON line: {"sf":..., "queries": {name: [runs...]}}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

for _v in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_v, "1")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_plans = "--plans" in sys.argv
    reps = int(os.environ.get("BE_REPS", "3"))
    tag = os.environ.get("BE_TAG", "after")

    from tiff_enrichment_pipeline_spark.queries import QUERIES
    from tiff_enrichment_pipeline_spark.session import get_spark

    spark = get_spark(f"bench-extra-{CPUS}", master=f"local[{CPUS}]")

    def build(name):
        if name == "flagship":
            import bench

            return bench.flagship(spark, SF_DIR)
        return QUERIES[name](spark, SF_DIR)

    out: dict[str, list[float]] = {}
    plan_dir = REPO / "plans" / "r08"
    plan_dir.mkdir(parents=True, exist_ok=True)
    for name in args:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        runs = []
        for r in range(reps):
            df = build(name)  # fresh plan each rep (cold, like bench.py)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        if do_plans:
            df = build(name)
            p = plan_dir / f"{name}_{tag}.txt"
            p.write_text(_explain(df))
        print(json.dumps({"query": name, "runs": runs}), flush=True)
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "queries": out}))
    spark.stop()


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


if __name__ == "__main__":
    main()
