import sys, time
sys.path.insert(0, "/root/repo")
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.plans import QUERIES
spark = get_spark("cdc-time")
fn = QUERIES["dedup_cdc_chunks"].spark
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
for _ in range(2):
    t0=time.time()
    fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
    print("warm", round(time.time()-t0,2), flush=True)
