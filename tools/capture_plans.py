"""Capture ``explain("formatted")`` for named queries into text files.

Usage: python tools/capture_plans.py <outdir> <suffix> <query> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` — the before/after plan evidence
the optimization rounds commit under ``plans/r12/``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from queue_system_simulator_spark.plans import QUERIES  # noqa: E402
from queue_system_simulator_spark.session import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(
        "capture_plans", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    for name in names:
        df = QUERIES[name].build(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
