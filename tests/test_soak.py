"""Fast skew-soak regression gate (pytest -m soak, < 60 s at sf0.01).

Miniature of tools/scale_soak.py's adversarial tier: the same corpus
builders (10-replica near-dup fan-out; hot variant gives 20% of docs a
shared boilerplate template) at sf0.01 (500 base docs → 5 000), with the
blowup measured on DETERMINISTIC quantities — candidate-pair counts and
cluster sizes — rather than wall-clock, so the gate cannot flake on host
noise.  Guards the round-4 lesson: an uncapped hot-template corpus blew
the band-bucket expansion to 12.5 M pairs / 30.6× uniform wall at sf0.1;
star-mode capping (minhash_lsh_pairs(max_bucket=...)) held it at 1.13×.

Measured calibration at this scale (fast=True, threshold=0.5, cap=256):
uniform-capped 32 954 candidates, hot-capped 26 395 (0.80×), hot-uncapped
446 381 (16.9× the capped run); capped-hot largest cluster 332 vs 918
uncapped; families broken 139 capped vs 82 uncapped (the star-cap
refinement trade, Δ = 11.4 % — most breakage is 16-hash LSH recall, not
capping).  Assertions leave ~2-3× headroom over those measurements.
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from nemsis_xml_parser_spark.operators import components as C
from nemsis_xml_parser_spark.operators import dedup as D
from tools.scale_soak import hot_replicas, uniform_replicas

SF_DIR = "/root/testdata/sf0.01"
CAP = 256


@pytest.fixture(scope="module")
def corpora(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n = docs.count()
    uni = uniform_replicas(docs, n).localCheckpoint(eager=True)
    hot = hot_replicas(docs, n).localCheckpoint(eager=True)
    return n, uni, hot


def _candidates(df, cap):
    return D.minhash_lsh_pairs(
        df, threshold=0.5, fast=True, max_bucket=cap, candidates_only=True
    ).count()


@pytest.mark.soak
def test_star_cap_bounds_hot_candidate_blowup(corpora):
    _, uni, hot = corpora
    uni_capped = _candidates(uni, CAP)
    hot_capped = _candidates(hot, CAP)
    hot_uncapped = _candidates(hot, None)
    # the guard: with the cap, template skew must stay in the uniform
    # candidate regime (quadratic flip would be 10x+)
    assert hot_capped <= 3 * uni_capped, (
        f"hot/uniform candidate ratio {hot_capped / uni_capped:.1f}x — "
        "the star cap is no longer absorbing template skew"
    )
    # teeth: the uncapped path must still exhibit the blowup the cap
    # exists for, else this gate is measuring nothing
    assert hot_uncapped >= 5 * hot_capped, (
        "uncapped hot corpus no longer blows up — recalibrate this gate"
    )


@pytest.mark.soak
def test_star_cap_cluster_properties(corpora):
    n, _, hot = corpora
    capped = C.dedup_clusters(
        D.minhash_lsh_pairs(hot, threshold=0.5, fast=True, max_bucket=CAP),
        nodes=hot.select("doc_id"),
    ).localCheckpoint(eager=True)
    uncapped = C.dedup_clusters(
        D.minhash_lsh_pairs(hot, threshold=0.5, fast=True),
        nodes=hot.select("doc_id"),
    ).localCheckpoint(eager=True)

    # no template giant under the cap: largest capped cluster stays at
    # family scale (hundreds), not corpus-fraction scale
    largest_capped = capped.agg(F.max("cluster_size")).collect()[0][0]
    largest_uncapped = uncapped.agg(F.max("cluster_size")).collect()[0][0]
    assert largest_capped <= 500
    assert largest_capped <= largest_uncapped  # refinement direction

    # the quantified star-cap trade: capping may break near-dup families
    # (10-replica groups) ONLY modestly beyond the LSH-recall baseline —
    # members linked through non-representative edges of hot buckets
    def broken(cl):
        return (
            cl.withColumn("family", F.col("doc_id") % n)
            .groupBy("family")
            .agg(F.countDistinct("cluster_id").alias("k"))
            .where(F.col("k") > 1)
            .count()
        )

    delta = broken(capped) - broken(uncapped)
    assert delta <= 0.2 * n, (
        f"star capping broke {delta} families beyond the LSH-recall "
        "baseline (> 20% of corpus) — the refinement trade has regressed"
    )
