#!/usr/bin/env python3
"""Dev-only scale probe: count q227_temporal_reach's EDGE relation at each
generated scale factor. The temporal interaction graph (events self-joined
within a 10-minute window on the same props-key) gets DENSER as the corpus
grows — rows per (k, cell) bucket grow linearly with sf, so candidate pairs
per bucket grow quadratically. This probe measures that growth so q227's
time-vs-sf slope can be read against its true input size (the edge list),
not the raw event count. NOT part of the Scala library — measurement only,
like check_oracle.py.

Usage: python3 tools/probe_temporal_edges.py /tmp/graft-sf1 /tmp/graft-sf3 ...
"""
import sys
from pyspark.sql import SparkSession, functions as F

spark = (SparkSession.builder.master("local[16]")
         .config("spark.driver.memory", "24g")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

for sf in sys.argv[1:]:
    e = (spark.read.parquet(sf + "/events.parquet")
         .select("user_id", F.col("ts").cast("long").alias("sec"),
                 F.get_json_object("props", "$.k").cast("long").alias("k")))
    probe = (e.withColumn("dc", F.explode(F.array(F.lit(0), F.lit(1))))
             .select(F.col("user_id").alias("src"), F.col("sec").alias("a_sec"),
                     "k", (F.floor(F.col("a_sec") / 600) + F.col("dc")).alias("cell")))
    build = e.select(F.col("user_id").alias("dst"), F.col("sec").alias("b_sec"),
                     "k", F.floor(F.col("sec") / 600).alias("cell"))
    edges = (probe.join(build, ["k", "cell"])
             .filter("src != dst AND b_sec >= a_sec AND b_sec - a_sec <= 600")
             .select("src", "dst", F.col("b_sec").alias("ets"))
             .dropDuplicates(["src", "dst", "ets"]))
    print(f"EDGES {sf} events={e.count()} edges={edges.count()}")
