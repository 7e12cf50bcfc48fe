import sys, time, json
sys.path.insert(0, "/root/repo")
from nemsis_xml_parser_spark.plans import QUERIES
from nemsis_xml_parser_spark.session import get_spark

NAMES = sys.argv[1].split(",")
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
spark = get_spark("work-meas")
out = {}
for name in NAMES:
    for sf, d in [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/root/repo/.benchdata/sf1")]:
        samples = []
        for _ in range(REPS):
            t0 = time.time()
            QUERIES[name].spark(spark, d).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
        out.setdefault(name, {})[sf] = samples
    r = round(min(out[name]["sf1"]) / min(out[name]["sf0.1"]), 2)
    out[name]["ratio"] = r
    print(name, out[name], flush=True)
print(json.dumps(out))
