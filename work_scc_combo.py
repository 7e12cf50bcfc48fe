import sys, time
sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from pyspark.sql import Observation
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.operators.lineage import cut_lineage
from nemsis_xml_parser_spark.operators import scc as S
from nemsis_xml_parser_spark.plans import QUERIES

spark = get_spark("scc-combo")
FUSE = int(sys.argv[1]) if len(sys.argv) > 1 else 2

def fixpoint(edges, nodes, max_iter):
    de = (edges.select(F.lit(0).alias("dir"), "u", "v")
          .unionByName(edges.select(F.lit(1).alias("dir"), F.col("v").alias("u"), F.col("u").alias("v")))
          .transform(cut_lineage))
    probe = F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = (nodes.select("node", F.explode(F.array(F.lit(0), F.lit(1))).alias("dir"))
              .withColumn("lbl", F.col("node"))
              .observe(obs0, probe, F.count(F.lit(1)).alias("n"))
              .transform(cut_lineage))
    prev = obs0.get["s"]
    small = (obs0.get["n"] or 0) <= 4_000_000
    B = F.broadcast if small else (lambda d: d)
    it = 0
    while it < max_iter:
        cur = labels
        for _ in range(FUSE):
            msgs = de.join(B(cur.withColumnRenamed("node","u")), ["dir","u"]).select("dir", F.col("v").alias("node"), "lbl")
            new = cur.unionByName(msgs).groupBy("dir","node").agg(F.min("lbl").alias("lbl"))
            jump = new.select("dir", F.col("node").alias("lbl"), F.col("lbl").alias("lbl_jump"))
            cur = new.join(jump, ["dir","lbl"], "left").select(
                "dir","node", F.least(F.col("lbl"), F.coalesce(F.col("lbl_jump"), F.col("lbl"))).alias("lbl"))
            it += 1
        obs = Observation()
        labels = cur.observe(obs, probe).transform(cut_lineage)
        c = obs.get["s"]
        if c == prev:
            return labels
        prev = c
    raise RuntimeError("no convergence")

def patched(e, n, m):
    lab = fixpoint(e, n, m)
    return lab.groupBy("node").agg(
        F.min(F.when(F.col("dir")==0, F.col("lbl"))).alias("lbl"),
        F.min(F.when(F.col("dir")==1, F.col("lbl"))).alias("blbl"))
S._dual_min_label_fixpoint = patched
fn = QUERIES["graph_scc_peeling"].spark
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
t0=time.time()
fn(spark, "/root/testdata/sf0.1").write.format("noop").mode("overwrite").save()
print("combo fuse", FUSE, "warm", round(time.time()-t0,1), flush=True)
