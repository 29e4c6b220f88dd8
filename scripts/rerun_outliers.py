"""Isolated re-run of bench outliers flagged in bench_r5_close3_epoch1
(dedup_containment 56.6 s, curate_packed 40.1 s) plus calibrator gates
with known clean walls, per the re-run-don't-re-architect policy.
Writes JSONL to BENCH/rerun_outliers_r5close.jsonl."""
import time, json
import sys; sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
import __spark_entry__ as e

OUT = "BENCH/rerun_outliers_r5close.jsonl"
GATES = ["dedup_exact", "minhash_lsh", "dedup_containment_banded",
         "knn_graph", "dedup_containment", "curate_packed"]

b = (SparkSession.builder.master("local[32]")
     .config("spark.sql.shuffle.partitions", "32")
     .config("spark.sql.files.maxPartitionBytes", str(8*1024*1024))
     .config("spark.sql.files.openCostInBytes", str(256*1024))
     .config("spark.ui.showConsoleProgress", "false")
     .config("spark.driver.memory", "48g"))
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
qs = e.queries()
with open(OUT, "a") as f:
    for name in GATES:
        for trial in range(2):
            t0 = time.time()
            n = qs[name](spark, "/root/testdata/sf0.1").count()
            dt = time.time() - t0
            rec = {"gate": name, "trial": trial, "rows": n,
                   "sec": round(dt, 2), "ts": round(t0, 1)}
            f.write(json.dumps(rec) + "\n"); f.flush()
spark.stop()
