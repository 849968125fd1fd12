"""Capture `.explain("formatted")` for headline queries into plans/<tag>/.

Optimization-round evidence harness: writes one
``plans/<tag>/<query>_<suffix>.txt`` per headline query so that plan-shape
claims in OPTIMIZATION_*.md are checkable without running Spark.

    python examples/capture_plans.py --tag r13 --suffix before [--names a,b]

Plans are captured at the bench's own scale (sf0.1 by default) because join
selection is size-dependent; planning only, nothing is executed.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r13")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--names", default="")
    args = ap.parse_args()

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark import get_spark
    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.plans import QUERIES

    import bench

    names = [n for n in args.names.split(",") if n] or list(bench.HEADLINE)
    out_dir = os.path.join(REPO, "plans", args.tag)
    os.makedirs(out_dir, exist_ok=True)

    from map_reduced_approach_for_vietnamese_long_document_summarization_spark.operators._ckpt import (
        persistent_rdd_ids,
        release_rdds,
    )

    spark = get_spark(app_name="vlds-capture-plans")
    failed = []
    for name in names:
        try:
            # a previous query's persist() registrations would otherwise be
            # substituted into THIS query's plan (the cache manager matches
            # canonicalized subtrees across queries), printing
            # InMemoryRelation nodes the bench's cleared-cache runs never see
            spark.catalog.clearCache()
            release_rdds(spark.sparkContext, persistent_rdd_ids(spark.sparkContext), blocking=True)
            df = QUERIES[name](spark, args.sf_dir)
            # _sc.explainString mirrors explain("formatted") without stdout capture
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 - record and continue
            failed.append(name)
            plan = f"ERROR: {exc}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# {name} -> {path}", file=sys.stderr)
    if failed:
        print(f"FAILED: {failed}")
        sys.exit(1)
    print(f"captured {len(names)} plans into {out_dir}")


if __name__ == "__main__":
    main()
