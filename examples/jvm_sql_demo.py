"""Zero-code-change SQL demo: the JVM extension pruning a query that
never touches the Python rewriter.

Phase 1 (plain PySpark + ariadne_spark) builds an index over orders
split into several files — the state any engine user already has.

Phase 2 simulates a foreign SQL client (JDBC/Thrift/Scala): a session
whose ONLY ariadne surface is `--jars ariadne-spark-ext.jar` plus
`spark.sql.extensions=ariadnespark.ext.AriadneExtensions`. It runs
`SELECT ... FROM ariadne.orders_demo WHERE o_custkey = K` and shows
(a) results identical to a plain full read, (b) the scan reading only
the files the index says can match.

Run: python examples/jvm_sql_demo.py
"""
from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
WORK = "/tmp/ariadne_jvm_demo"
JAR = os.path.join(REPO, "jvm", "ariadne-spark-ext.jar")

PHASE2 = r"""
import json, sys
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.jars", sys.argv[1])
    .config("spark.sql.extensions", "ariadnespark.ext.AriadneExtensions")
    .config("spark.ariadne.storagePath", sys.argv[2] + "/store")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
# NOTE: no ariadne_spark import anywhere in this session — SQL only.
df = spark.sql(
    "SELECT o_orderkey, o_custkey, o_totalprice "
    "FROM ariadne.orders_demo WHERE o_custkey = 7"
)
rows = sorted((r.o_orderkey, r.o_custkey) for r in df.collect())
scanned = df.inputFiles()
plain = spark.read.parquet(*__import__("glob").glob(sys.argv[2] + "/orders/p*/*.parquet"))
expect = sorted(
    (r.o_orderkey, r.o_custkey)
    for r in plain.where("o_custkey = 7")
    .select("o_orderkey", "o_custkey").collect()
)
total = len(plain.inputFiles())
print(json.dumps({
    "rows_match": rows == expect,
    "n_rows": len(rows),
    "files_scanned": len(scanned),
    "files_total": total,
}))
spark.stop()
"""


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)

    from pyspark.sql import SparkSession, functions as F

    from ariadne_spark import Index

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.conf.set("spark.ariadne.storagePath", f"{WORK}/store")
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    hi = orders.agg(F.max("o_custkey")).first()[0]
    step = hi // 6 + 1
    for i in range(6):
        orders.where(
            (F.col("o_custkey") >= i * step) & (F.col("o_custkey") < (i + 1) * step)
        ).coalesce(1).write.parquet(f"{WORK}/orders/p{i}")
    files = glob.glob(f"{WORK}/orders/p*/*.parquet")
    idx = Index.for_name(
        "orders_demo", spark=spark, format="parquet", schema=orders.schema
    )
    idx.add_index("o_custkey")
    idx.add_files(files)
    idx.update()
    # temporal index with cross-file versions: p1 supersedes a key
    # subset of p0 (+1000 days) — the beeline demo joins on the
    # temporal key and must scan only the latest-version file
    base = orders.limit(200)
    base.coalesce(1).write.parquet(f"{WORK}/versions/p0")
    keys = [
        r[0] for r in base.select("o_custkey").distinct().limit(10).collect()
    ]
    (
        base.where(F.col("o_custkey").isin(keys))
        .withColumn(
            "o_orderdate", F.col("o_orderdate") + F.expr("INTERVAL 1000 DAYS")
        )
        .withColumn("o_orderkey", F.col("o_orderkey") + F.lit(10_000_000))
        .coalesce(1)
        .write.parquet(f"{WORK}/versions/p1")
    )
    vfiles = sorted(glob.glob(f"{WORK}/versions/p*/*.parquet"))
    tidx = Index.for_name(
        "orders_versions", spark=spark, format="parquet", schema=orders.schema
    )
    tidx.add_temporal_index("o_custkey", "o_orderdate")
    tidx.add_files(vfiles)
    tidx.update()
    with open(f"{WORK}/demo_keys.txt", "w") as fh:
        fh.write(",".join(str(k) for k in keys[:5]))
    spark.stop()
    print(f"index built over {len(files)} files (+ temporal over {len(vfiles)})")

    script = os.path.join(WORK, "phase2.py")
    with open(script, "w") as fh:
        fh.write(PHASE2)
    out = subprocess.run(
        [sys.executable, script, JAR, WORK],
        capture_output=True, text=True, timeout=300,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(out.stdout)
        print(out.stderr[-4000:])
        raise SystemExit("phase 2 produced no result")
    print("SQL-only session:", line[-1])


if __name__ == "__main__":
    main()
