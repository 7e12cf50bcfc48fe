"""3 warm reps of one registered query in THIS fresh JVM; prints one JSON
line.  The DRIFT_REPS discipline: run once per (query, sf) on an idle
machine (check ps first — NOTES gotcha 14) and record the rep lists.
Usage: python tools/measure_query_reps.py <query> <sf_dir>"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
from nemsis_xml_parser_spark.plans import QUERIES
from nemsis_xml_parser_spark.session import get_spark

name, sf_dir = sys.argv[1], sys.argv[2]
spark = get_spark("measure-" + name)
q = QUERIES[name]
q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
reps = []
for _ in range(3):
    t0 = time.time()
    q.spark(spark, sf_dir).write.format("noop").mode("overwrite").save()
    reps.append(round(time.time() - t0, 2))
print(json.dumps({"query": name, "sf_dir": sf_dir, "reps": reps}))
