"""Capture .explain("formatted") for catalog queries into plans/r12/.

Usage: python tools/capture_plan_r12.py <suffix> <query> [<query> ...]

Writes plans/r12/<query>_<suffix>.txt for each query (suffix = before /
after). Uses the same session factory as bench.py so the plans reflect
the bench execution environment. explain() output is captured via the
internal _sc explain string (the public API prints to stdout).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from economic_data_etl_spark.plans import REGISTRY
    from economic_data_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-capture-r12")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    import contextlib
    import io

    for name in names:
        df = REGISTRY[name].spark(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
