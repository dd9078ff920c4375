"""Quickstart: the four ways to query an ariadne-spark index.

Run from the repo root:  python examples/quickstart.py
(uses /root/testdata/sf0.001; writes only under /tmp)
"""

import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

import ariadne_spark
from ariadne_spark import Index

WORK = "/tmp/ariadne_quickstart"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .appName("ariadne-quickstart")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")
shutil.rmtree(WORK, ignore_errors=True)
spark.conf.set("spark.ariadne.storagePath", f"{WORK}/store")

# -- a small "lake": orders split into 4 files by order-key range -----
orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
lo, hi = orders.agg(F.min("o_orderkey"), F.max("o_orderkey")).collect()[0]
width = (hi - lo) // 4 + 1
files = []
for i in range(4):
    part = orders.where(
        (F.col("o_orderkey") >= lo + i * width)
        & (F.col("o_orderkey") < lo + (i + 1) * width)
    )
    part.coalesce(1).write.mode("overwrite").parquet(f"{WORK}/orders/p{i}")
    files += glob.glob(f"{WORK}/orders/p{i}/*.parquet")

# -- build an index ---------------------------------------------------
idx = Index.for_name("orders", schema=orders.schema, format="parquet")
idx.add_index("o_custkey")                        # distinct values per file
idx.add_range_index("o_orderkey")                 # min/max per file
idx.add_computed_index("order_year", "cast(year(o_orderdate) as bigint)")
idx.add_files(files).update()

# 1) programmatic pruned join ----------------------------------------
customers = (
    spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    .where("c_mktsegment = 'BUILDING'")
    .select(F.col("c_custkey").alias("o_custkey"), "c_name")
)
joined = idx.join(customers, on=["o_custkey"])
print("1) pruned join:", joined.count(), "rows;", idx._last_metrics)

# 2) pruned filtered read --------------------------------------------
print("2) orders from 1996:", idx.read_matching({"order_year": [1996]}).count())

# 3) SQL surface with transparent rewrite ----------------------------
customers.createOrReplaceTempView("building_customers")
res = ariadne_spark.sql(
    "SELECT o.o_orderkey, b.c_name FROM orders o "
    "JOIN building_customers b ON o.o_custkey = b.o_custkey"
)
print("3) SQL surface:", res.count(), "rows")

# 4) native data source ----------------------------------------------
ariadne_spark.register_data_source(spark)
ds = (
    spark.read.format("ariadne")
    .option("name", "orders")
    .option("storagePath", f"{WORK}/store")
    .load()
)
print("4) data source:", ds.where("o_orderkey between 5 and 20").count(), "rows")

spark.stop()
