"""Dump .explain("formatted") + schema for named queries to plans/r10/.

Usage: python tools/dump_before_after.py before|after name [name ...]
Writes plans/r10/<name>_<tag>.txt with the formatted plan; prints the
output schema (simpleString) for each name to stdout.
"""
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dmi_ingestor_spark.registry import load_all  # noqa: E402
from dmi_ingestor_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    registry = load_all()
    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    out_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = registry[name].builder(spark, sf_dir)
        plan = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        print(f"{name}\t{df.schema.simpleString()}")


if __name__ == "__main__":
    main()
