"""Vector math over ARRAY<FLOAT/DOUBLE> columns — all built-in higher-order
functions (``zip_with`` / ``aggregate``), JVM-side, no UDFs.  Backbone of
the similarity-search operators (SURVEY §2.I north-star extensions).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def to_double_array(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) with 0 for zero-norm inputs (deterministic, oracle-matchable
    via list_dot_product/sqrt in DuckDB)."""
    denom = norm(a) * norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def l2_distance(a: Column, b: Column) -> Column:
    diff = F.zip_with(a, b, lambda x, y: (x - y) * (x - y))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))


def random_projection_bucket(a: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit i = sign(a·plane_i).  ``planes`` are fixed
    (seeded) hyperplanes broadcast as literals — deterministic across runs,
    so bucket joins are reproducible.  Scale path for ANN: group candidates
    by bucket, compare only within buckets."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(dot(a, plane_col) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket + (bit * F.lit(2**i).cast("long"))
    return bucket


# ---------------------------------------------------------------------------
# SQL-string twins for constant-plane expressions.
#
# Building a hyperplane battery through the Column API costs one py4j
# round-trip per literal: 8 tables x 6 planes x 64 components x 2 sides
# is ~7,000 driver<->JVM calls — measured at ~7 s of pure plan
# CONSTRUCTION for ann_lsh_multitable_topk, dwarfing its ~1.3 s of
# execution.  Emitting the same expression as ONE SQL string parsed by
# a single F.expr call moves that work into the JVM parser (ms).  The
# generated tree is operator-for-operator identical to the Column form
# (same zip_with/aggregate fold, same casts), so results are
# bit-identical — pinned by tests/test_similarity.py::test_bucket_sql_parity.
# ---------------------------------------------------------------------------


def double_lit_sql(v: float) -> str:
    """Exact DOUBLE literal: string-cast round-trips repr() precisely and
    never parses as DECIMAL (Spark fractional literals are DECIMALs —
    NOTES gotcha 13)."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def array_lit_sql(vals: list[float]) -> str:
    return "array(" + ", ".join(double_lit_sql(v) for v in vals) + ")"


def to_double_array_sql(vec_sql: str) -> str:
    """SQL twin of :func:`to_double_array`."""
    return f"transform({vec_sql}, x -> CAST(x AS DOUBLE))"


def dot_sql(a_sql: str, b_sql: str) -> str:
    """SQL twin of :func:`dot` — same zip_with/aggregate left fold."""
    return (
        f"aggregate(zip_with({a_sql}, {b_sql}, (x, y) -> x * y), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def random_projection_bucket_sql(vec_sql: str, planes: list[list[float]]) -> str:
    """SQL twin of :func:`random_projection_bucket` (same bit/sum shape)."""
    terms = ["CAST(0 AS BIGINT)"]
    for i, plane in enumerate(planes):
        bit = (
            f"(CASE WHEN {dot_sql(vec_sql, array_lit_sql(plane))} >= 0 "
            "THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        )
        terms.append(f"({bit} * CAST({2 ** i} AS BIGINT))")
    return "(" + " + ".join(terms) + ")"


def random_projection_buckets_sql(
    vec_sql: str, plane_sets: list[list[list[float]]]
) -> str:
    """array(bucket_for_plane_set_0, ...) as one SQL string."""
    return (
        "array("
        + ", ".join(
            random_projection_bucket_sql(vec_sql, p) for p in plane_sets
        )
        + ")"
    )


def cosine_similarity_pandas():
    """Vectorized scalar ``@pandas_udf`` twin of ``cosine_similarity`` —
    Arrow-batched numpy, the escape hatch when an expression outgrows
    built-ins (here it hasn't; the JVM composition stays the default and
    tests assert the two agree).  Returned from a factory so importing this
    module never touches pandas/numpy or a SparkSession."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def cos(a, b):
        try:
            # uniform-length fast path (embedding columns): one stacked
            # einsum for the whole Arrow batch instead of a Python loop
            av = np.stack(a.to_numpy()).astype(np.float64)
            bv = np.stack(b.to_numpy()).astype(np.float64)
            num = np.einsum("ij,ij->i", av, bv)
            den = np.sqrt(np.einsum("ij,ij->i", av, av)) * np.sqrt(
                np.einsum("ij,ij->i", bv, bv)
            )
            out = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
            return pd.Series(out)
        except ValueError:  # ragged lengths: per-row fallback
            pass

        def one(x, y):
            xv = np.asarray(x, dtype=np.float64)
            yv = np.asarray(y, dtype=np.float64)
            denom = np.sqrt(xv @ xv) * np.sqrt(yv @ yv)
            return float(xv @ yv / denom) if denom > 0 else 0.0

        return pd.Series([one(x, y) for x, y in zip(a, b)])

    # annotations set explicitly (not inline) because pd is factory-local
    # and pyspark resolves type hints from the function's globals
    cos.__annotations__ = {"a": pd.Series, "b": pd.Series, "return": pd.Series}
    return pandas_udf(cos, "double")


def cosine_pairs_indexed_pandas(qids, qvecs, nids, nvecs):
    """Scalar ``@pandas_udf`` ``(query_id, node_id) -> cosine`` with BOTH
    vector sides carried in the closure — the Arrow payload per scored
    pair is 16 bytes of ids instead of two embedding copies (~30x less
    at 32 dims).  Sound only when both sides are BOUNDED: the query
    side by the trigger/caller, the node side by the candidate set the
    caller gathered (for NSW beams that is hub-budget-bounded —
    nlist x NAV_MAX x degree^hops — never corpus-bounded).  Math is the
    same per-row float64 einsum/sqrt/where sequence as
    :func:`cosine_similarity_pandas`."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def build(ids, vecs):
        idx = {int(q): i for i, q in enumerate(ids)}
        mat = (
            np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            if len(vecs)
            else np.zeros((0, 1), dtype=np.float64)
        )
        return idx, mat, np.sqrt(np.einsum("ij,ij->i", mat, mat))

    qindex, qmat, qnorm = build(qids, qvecs)
    nindex, nmat, nnorm = build(nids, nvecs)

    def cospair(qid, nid):
        qi = np.fromiter(
            (qindex[int(q)] for q in qid), dtype=np.int64, count=len(qid)
        )
        ni = np.fromiter(
            (nindex[int(n)] for n in nid), dtype=np.int64, count=len(nid)
        )
        num = np.einsum("ij,ij->i", qmat[qi], nmat[ni])
        den = qnorm[qi] * nnorm[ni]
        out = np.where(den > 0, num / np.where(den == 0, 1.0, den), 0.0)
        return pd.Series(out)

    cospair.__annotations__ = {
        "qid": pd.Series, "nid": pd.Series, "return": pd.Series
    }
    return pandas_udf(cospair, "double")
