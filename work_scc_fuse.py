import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Observation
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.operators.lineage import cut_lineage
from nemsis_xml_parser_spark.operators import scc as S

spark = get_spark("scc-fuse")

def fused_fixpoint(edges, nodes, max_iter, fuse):
    de = (edges.select(F.lit(0).alias("dir"), "u", "v")
          .unionByName(edges.select(F.lit(1).alias("dir"), F.col("v").alias("u"), F.col("u").alias("v")))
          .transform(cut_lineage))
    probe = F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = (nodes.select("node", F.explode(F.array(F.lit(0), F.lit(1))).alias("dir"))
              .withColumn("lbl", F.col("node")).observe(obs0, probe).transform(cut_lineage))
    prev = obs0.get["s"]
    it = 0
    while it < max_iter:
        cur_labels = labels
        for _ in range(fuse):
            msgs = de.join(cur_labels.withColumnRenamed("node","u"), ["dir","u"]).select("dir", F.col("v").alias("node"), "lbl")
            new = cur_labels.unionByName(msgs).groupBy("dir","node").agg(F.min("lbl").alias("lbl"))
            jump = new.select("dir", F.col("node").alias("lbl"), F.col("lbl").alias("lbl_jump"))
            cur_labels = new.join(jump, ["dir","lbl"], "left").select(
                "dir","node", F.least(F.col("lbl"), F.coalesce(F.col("lbl_jump"), F.col("lbl"))).alias("lbl"))
            it += 1
        obs = Observation()
        labels = cur_labels.observe(obs, probe).transform(cut_lineage)
        cur = obs.get["s"]
        if cur == prev:
            return labels, it
        prev = cur
    raise RuntimeError("no convergence")

# build the same demo core the query uses
from nemsis_xml_parser_spark.plans import QUERIES
import nemsis_xml_parser_spark.plans.round7 as R7
# replicate edges: easier — grab from the plan function? Use scc's caller? Just rebuild via SQL on spark:
from nemsis_xml_parser_spark.plans.registry import table
sf="/root/testdata/sf0.1"
# reconstruct: mirror _SCC_EDGES_SQL via the plan module's spark builder
import inspect
src = inspect.getsource(R7)
# find the spark-side edge builder used by graph_scc_peeling
fn = QUERIES["graph_scc_peeling"].spark
# instead of rebuilding edges, monkeypatch the fixpoint and time the whole query
for FUSE in (1, 2, 3):
    def patched(e, n, m, _f=FUSE):
        lab, iters = fused_fixpoint(e, n, m, _f)
        patched.iters.append(iters)
        return lab.groupBy("node").agg(
            F.min(F.when(F.col("dir")==0, F.col("lbl"))).alias("lbl"),
            F.min(F.when(F.col("dir")==1, F.col("lbl"))).alias("blbl"))
    patched.iters = []
    S._dual_min_label_fixpoint = patched
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    t0=time.time()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    print("fuse", FUSE, "warm", round(time.time()-t0,1), "iters/round", patched.iters, flush=True)
