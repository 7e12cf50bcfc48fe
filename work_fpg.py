import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.plans.registry import table
from nemsis_xml_parser_spark.operators.fpgrowth import fpgrowth_itemsets

spark = get_spark("fpg-prof")
d = "/root/repo/.benchdata/sf1"
li = table(spark, d, "lineitem").select("l_orderkey", "l_partkey")
MINSUP = 4  # match FPG_MINSUP
from nemsis_xml_parser_spark.plans.round6b import FPG_MINSUP, FPG_MAX_LEN
print("minsup", FPG_MINSUP, "maxlen", FPG_MAX_LEN)

def t(fn):
    t0=time.time(); fn(); return round(time.time()-t0,2)

# stage A: distinct+flist+txns+prefixes only
from pyspark.sql import functions as F2
def prefixes_only():
    distinct = li.select(F.col("l_orderkey").alias("__k"), F.col("l_partkey").cast("bigint").alias("__it")).distinct()
    flist = distinct.groupBy("__it").agg(F.count(F.lit(1)).alias("sup")).where(F.col("sup")>=FPG_MINSUP)
    ranked = distinct.join(F.broadcast(flist), "__it")
    txns = ranked.groupBy("__k").agg(F.transform(F.array_sort(F.collect_list(F.struct((-F.col("sup")).alias("nsup"),"__it"))), lambda s: s["__it"]).alias("arr"))
    pref = txns.select(F.posexplode("arr").alias("pos","grp"), F.col("arr")).select("grp", F.slice("arr",1,F.col("pos")+1).alias("prefix"))
    pref.write.format("noop").mode("overwrite").save()

for _ in range(2):
    print("prefixes_only", t(prefixes_only), flush=True)

for ng in (64, 128, 256):
    def full():
        fpgrowth_itemsets(li, "l_orderkey", "l_partkey", FPG_MINSUP, max_len=FPG_MAX_LEN, n_groups=ng).write.format("noop").mode("overwrite").save()
    print("full ng", ng, [t(full) for _ in range(2)], flush=True)
