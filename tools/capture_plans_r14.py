"""Capture executed (AQE-final) formatted plans for every headline
query into plans/r14/<query>_<tag>.txt.

    python tools/capture_plans_r14.py before
    python tools/capture_plans_r14.py after

Same methodology as tools/capture_plans_r13.py: build the query at
sf0.1, collect() once so AQE finalizes and memoized subtrees warm,
then explain("formatted") on a fresh build.  Pass query names as extra
argv to restrict the capture (default: all headline queries).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harness_aws_etl_pipeline_spark.plans.catalog import CATALOG  # noqa: E402
from harness_aws_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14"
)


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2:])
    spark = get_spark("capture-plans")
    for spec in CATALOG.values():
        if not spec.headline:
            continue
        if only and spec.name not in only:
            continue
        df = spec.builder(spark, SF_DIR)
        df.collect()
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(OUT_DIR, f"{spec.name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()


