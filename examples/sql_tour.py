"""SQL tour: the complete TPC-H family through ariadne_spark.sql.

Runs all 22 TPC-H-family queries from the driver contract against
/root/testdata/sf0.001, printing row counts and — for queries that
touch index views — what the pruning rewriter did (prune_report).

Run from the repo root:  python examples/sql_tour.py
(writes only under /tmp)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

import ariadne_spark

SF_DIR = "/root/testdata/sf0.001"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .appName("ariadne-sql-tour")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entry

qs = entry.queries()
tpch = sorted(
    (name for name in qs if name.startswith("sql_tpch_q")),
    key=lambda n: int(n.rsplit("q", 1)[-1]),
)
print(f"{len(tpch)} TPC-H queries registered: {', '.join(tpch)}\n")

total = 0.0
for name in tpch:
    t0 = time.time()
    n = qs[name](spark, SF_DIR).count()
    el = time.time() - t0
    total += el
    report = ariadne_spark.prune_report(spark).collect()
    pruned = "; ".join(
        f"{r['view']}: {r['files_selected']}/{r['files_total']} files"
        for r in report
    )
    print(f"{name:16s} {n:6d} rows  {el:5.2f}s  {pruned or '(no index view pruned)'}")

print(f"\ntotal: {total:.1f}s at sf0.001")
spark.stop()
