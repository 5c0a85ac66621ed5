"""CBO / ANALYZE TABLE experiment (SURVEY.md §4.2 "join reordering",
round-1 verdict #8).

Spark's cost-based optimizer only uses stats from catalog tables (temp
views over parquet paths carry no stats), so this script:

1. creates a throwaway derby metastore + warehouse under .cache/,
2. registers the sf tables as EXTERNAL parquet catalog tables,
3. ANALYZE TABLE ... COMPUTE STATISTICS [FOR ALL COLUMNS],
4. runs a 5-way star join written in a deliberately bad textual order
   (fact table joined last) twice — CBO+joinReorder ON vs OFF —
   and reports plan shape (join order / broadcast choices) and wall time.

Conclusion is recorded in BASELINE.md §CBO. Run:
    python tools/cbo_experiment.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = """
SELECT n.n_name, count(*) AS n_items, sum(l.l_extendedprice) AS rev
FROM nation n
JOIN region r ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


def run(cbo: bool, sf_dir: str) -> tuple[float, str]:
    from pyspark.sql import SparkSession

    tmp = tempfile.mkdtemp(prefix="cbo_")
    b = (
        SparkSession.builder.master("local[8]")
        .appName(f"cbo-{cbo}")
        .config("spark.sql.warehouse.dir", os.path.join(tmp, "wh"))
        .config(
            "spark.driver.extraJavaOptions", f"-Dderby.system.home={tmp}"
        )
        .config("spark.sql.cbo.enabled", str(cbo).lower())
        .config("spark.sql.cbo.joinReorder.enabled", str(cbo).lower())
        .config("spark.ui.enabled", "false")
    )
    spark = b.getOrCreate()
    try:
        for t in ("region", "nation", "customer", "orders", "lineitem"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            spark.sql(
                f"CREATE TABLE {t} USING PARQUET LOCATION "
                f"'{os.path.join(sf_dir, t + '.parquet')}'"
            )
            spark.sql(f"ANALYZE TABLE {t} COMPUTE STATISTICS FOR ALL COLUMNS")
        df = spark.sql(Q)
        plan = df._jdf.queryExecution().executedPlan().toString()
        df.count()  # warm
        t0 = time.perf_counter()
        df.count()
        dt = time.perf_counter() - t0
        return dt, plan
    finally:
        spark.stop()
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    t_on, plan_on = run(True, sf_dir)
    t_off, plan_off = run(False, sf_dir)

    def joins(p: str) -> list[str]:
        return [
            ln.strip().split("(")[0].strip("*+- ")
            for ln in p.splitlines()
            if "Join" in ln
        ]

    print("CBO+stats ON :", round(t_on, 3), "s | joins:", joins(plan_on))
    print("CBO       OFF:", round(t_off, 3), "s | joins:", joins(plan_off))
    print("plans identical:", joins(plan_on) == joins(plan_off))


if __name__ == "__main__":
    main()
