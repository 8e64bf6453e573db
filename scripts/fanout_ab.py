import os, time, json
from dsacord_spark.session import get_spark
from dsacord_spark.plans.catalog import specs

SF = "/root/testdata/sf0.1"
spark = get_spark(app_name="fanout-ab-all", master="local[32]", shuffle_partitions=32)
reg = specs()
names = sorted(reg)
for mode in ("0", "1"):
    os.environ["SPARK_GRAFT_SCAN_FANOUT"] = mode
    reg["pricing_summary"].fn(spark, SF).count()
res = {n: {"0": [], "1": []} for n in names}
t_start = time.time()
for rep in range(2):
    order = ("0", "1") if rep % 2 == 0 else ("1", "0")
    for n in names:
        for mode in order:
            os.environ["SPARK_GRAFT_SCAN_FANOUT"] = mode
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            try:
                reg[n].fn(spark, SF).count()
                res[n][mode].append(time.perf_counter() - t0)
            except Exception as e:
                res[n][mode].append(-1.0)
                print("FAIL", n, mode, str(e)[:120], flush=True)
    print(f"rep {rep} done at {time.time()-t_start:.0f}s", flush=True)
out = {}
for n in names:
    a = min(res[n]["0"]); b = min(res[n]["1"])
    out[n] = {"off": round(a, 3), "on": round(b, 3),
              "ratio": round(b / a, 3) if a > 0 else None}
with open("/tmp/fanout_ab_all.json", "w") as fh:
    json.dump(out, fh, indent=1, sort_keys=True)
print("WROTE /tmp/fanout_ab_all.json")
