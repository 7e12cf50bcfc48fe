"""One fresh-JVM rep of the three history-index stream pipelines; prints
one JSON line.  Mirrors tools/bench_stream.py staging exactly — the
STREAM_REPS_r11.json evidence generator (run N times on an idle machine)."""
import json
import sys
import tempfile
import time
import shutil
from pathlib import Path

sys.path.insert(0, "/root/repo")
import pyspark.sql.functions as F
from nemsis_xml_parser_spark.plans.registry import table
from nemsis_xml_parser_spark.session import get_spark
from nemsis_xml_parser_spark.streaming.dedup_index import start_dedup_index_stream
from nemsis_xml_parser_spark.streaming.winnow_index import start_winnow_index_stream
from nemsis_xml_parser_spark.streaming.cdc_index import start_cdc_index_stream

sf_dir = "/root/testdata/sf0.1"
spark = get_spark("stream-trio-rep")
work = Path(tempfile.mkdtemp(prefix="trio_"))
doc_dir = str(work / "docs")
n_docs = table(spark, sf_dir, "documents").count()
(table(spark, sf_dir, "documents")
 .crossJoin(spark.range(10).select(F.col("id").alias("__copy")))
 .select((F.col("doc_id") + F.col("__copy") * n_docs).alias("doc_id"),
         F.concat_ws(" ", F.col("text"),
                     F.concat(F.lit("copyvariant"), F.col("__copy"))).alias("text"))
 .repartition(16).write.parquet(doc_dir))
schema = spark.read.parquet(doc_dir).schema
rows = spark.read.parquet(doc_dir).count()


def source():
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2).parquet(doc_dir))


out = {}
for name, starter in (("dedup_history_index", start_dedup_index_stream),
                      ("winnow_history_index", start_winnow_index_stream),
                      ("cdc_history_index", start_cdc_index_stream)):
    q = starter(source(), str(work / f"{name}_idx"),
                str(work / f"{name}_out"), str(work / f"{name}_cp"))
    t0 = time.time()
    q.awaitTermination()
    out[name] = round(rows / (time.time() - t0), 1)
print(json.dumps(out))
shutil.rmtree(work, ignore_errors=True)
