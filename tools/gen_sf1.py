"""Generate an sf1-scale dataset as a deterministic 10× scale-up of
/root/testdata/sf0.1 (no network in the container, so DuckDB's tpch
generator is unavailable; this is the offline alternative).

Construction: every fact table is replicated REP times with per-replica
key OFFSETS applied consistently across all foreign-key domains
(orderkey/custkey/suppkey/partkey/event_id/user_id/doc_id/vec_id), so
join fan-outs, group cardinalities per key, and value distributions are
preserved while key-domain cardinality scales 10×.  nation/region stay
fixed (25/5 rows — dimension cardinality does not scale with volume).
Documents get every 7th token tagged per replica so cross-replica pairs
fall below the J=0.5 near-dup threshold — the corpus scales as 10
independent dup-family populations, not as 10 exact copies of each
document (which would explode pair joins unrealistically).  Embeddings
perturb dim 0 by 0.001·replica for the same reason.

Output: /root/repo/.benchdata/sf1/*.parquet (gitignored).
Usage: python tools/gen_sf1.py [src_sf_dir] [out_dir] [REP]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from nemsis_xml_parser_spark.plans.registry import table  # noqa: E402
from nemsis_xml_parser_spark.session import get_spark  # noqa: E402

KEYED = {
    # table -> {column: key_domain}
    "customer": {"c_custkey": "custkey", "c_nationkey": None},
    "supplier": {"s_suppkey": "suppkey", "s_nationkey": None},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event_id", "user_id": "user_id"},
    "documents": {"doc_id": "doc_id"},
    "embeddings": {"vec_id": "vec_id"},
}


def main() -> None:
    args = sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.1"
    out = args[1] if len(args) > 1 else "/root/repo/.benchdata/sf1"
    rep = int(args[2]) if len(args) > 2 else 10
    spark = get_spark("gen_sf1")
    os.makedirs(out, exist_ok=True)

    # key-domain strides: max+1 per domain, shared across tables
    stride: dict[str, int] = {}
    frames = {t: table(spark, src, t) for t in KEYED}
    for t, cols in KEYED.items():
        for col, dom in cols.items():
            if dom is None:
                continue
            mx = frames[t].agg(F.max(col)).collect()[0][0]
            stride[dom] = max(stride.get(dom, 0), int(mx) + 1)
    print("strides:", stride)

    for t, cols in KEYED.items():
        df = frames[t]
        reps = []
        for r in range(rep):
            d = df
            for col, dom in cols.items():
                if dom is None:
                    continue
                d = d.withColumn(
                    col, (F.col(col) + F.lit(r * stride[dom])).cast("bigint")
                )
            if t == "documents" and r > 0:
                # tag every 7th token so cross-replica twins fall under
                # the near-dup threshold (independent dup populations)
                toks = F.split(F.col("text"), r"\s+")
                tagged = F.array_join(
                    F.zip_with(
                        toks,
                        F.sequence(F.lit(0), F.size(toks) - 1),
                        lambda w, i: F.when(
                            i % 7 == 0, F.concat(w, F.lit(f"_r{r}"))
                        ).otherwise(w),
                    ),
                    " ",
                )
                d = d.withColumn("text", tagged)
            if t == "embeddings" and r > 0:
                d = d.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x, i: F.when(
                            i == 0, x + F.lit(0.001 * r).cast("float")
                        ).otherwise(x),
                    ),
                )
            reps.append(d)
        outdf = reps[0]
        for d in reps[1:]:
            outdf = outdf.unionByName(d)
        path = os.path.join(out, f"{t}.parquet")
        outdf.repartition(32).write.mode("overwrite").parquet(path)
        print(f"wrote {path}")

    for t in ("nation", "region"):
        table(spark, src, t).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
        print(f"wrote {out}/{t}.parquet (dimension, unscaled)")
    spark.stop()


if __name__ == "__main__":
    main()
