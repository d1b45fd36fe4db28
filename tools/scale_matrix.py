import os, sys, time, json
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tools")
CPUS = int(os.environ.get("SM_CPUS", "32"))
from pyspark.sql import SparkSession
from replay_spark.session import default_session_conf
b = SparkSession.builder.master(f"local[{CPUS}]")
for k, v in default_session_conf(CPUS).items():
    b = b.config(k, v)
spark = b.config("spark.ui.enabled", "false").config("spark.driver.memory", "16g").appName("scale").getOrCreate()
spark.sparkContext.setLogLevel("ERROR")
from make_scale_replica import ensure_replica
sf1 = ensure_replica()
import glob
for tbl in sorted(glob.glob(os.path.join(sf1, "*.parquet"))):
    try:
        spark.read.parquet(tbl).foreach(lambda _r: None)
    except Exception:
        pass
import __spark_entry__ as entrymod
qs = entrymod.queries()
LEGS = ["q_lake_stream_source", "q_dedup_clusters", "q_contamination_report",
        "q_ivf_ann", "q_lake_stats", "q_materialized_agg", "q_ann_incremental",
        "q_minhash_candidates_md5", "q_ngram_jaccard_capped", "q_pq_ann",
        "q_ivfpq_ann", "q_textrank"]
out = {}
for name in LEGS:
    q = qs[name]
    spark.catalog.clearCache()
    t0 = time.time(); q(spark, sf1).count(); cold = round(time.time()-t0, 3)
    warms = []
    for _ in range(3):
        t0 = time.time(); q(spark, sf1).count(); warms.append(round(time.time()-t0, 3))
    out[name] = {"cold": cold, "min": min(warms), "med": sorted(warms)[1]}
    print(f"# cpus={CPUS} {name}: cold={cold} warms={warms}", flush=True)
print(json.dumps({"cpus": CPUS, "legs": out}))
