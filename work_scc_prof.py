import sys, time
sys.path.insert(0, "/root/repo")
import nemsis_xml_parser_spark.operators.lineage as L
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.plans import QUERIES

calls = []
orig = L.cut_lineage
def counted(df):
    t0 = time.time()
    r = orig(df)
    calls.append(round(time.time()-t0, 3))
    return r
L.cut_lineage = counted
import nemsis_xml_parser_spark.operators.scc as S
S.cut_lineage = counted

spark = get_spark("scc-prof")
QUERIES["graph_scc_peeling"].spark(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
t0=time.time(); calls.clear()
QUERIES["graph_scc_peeling"].spark(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print("warm wall", round(time.time()-t0,1))
print("cut calls", len(calls), "cut time total", round(sum(calls),1))
print("cuts", calls)
