"""Late round-6 additions: grid-bounded kNN join, chi-square
independence, gaps-and-islands streaks, Adamic-Adar link prediction,
multi-source BFS hop distances.

Registered after round6 so the rotation fronts them as never-recorded
queries.  Oracle discipline per plans/registry.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .registry import register, table

# ---------------------------------------------------------------------------
# Grid-bounded k-nearest-neighbor self-join
# ---------------------------------------------------------------------------

KNN_EPS = 0.5
KNN_K = 3


@register(
    "join_spatial_grid_knn",
    family="join",
    doc="Radius-bounded kNN self-join via GRID BUCKETING — the kNN "
    "generalization of join_spatial_grid_epsilon: purchases become "
    "points (value, hour-of-day), each QUERY point replicates into its "
    "3x3 neighborhood of eps-sized cells and equi-joins candidate "
    "points in their HOME cell, then a per-query-point row_number over "
    "(L-inf distance, neighbor id) keeps the k=3 nearest WITHIN eps — "
    "the bounded-radius kNN every grid/LSH ANN system answers (points "
    "with fewer than k in-radius neighbors return what they have; the "
    "unbounded exact tier is knn_cosine_topk).  The join is a pure "
    "equi-join on cell id, candidates bounded by cell occupancy, and "
    "the rank window partitions by query point (per-point cardinality "
    "is cell-bounded, never global).  The oracle is the naive "
    "all-pairs theta join + ROW_NUMBER — equality proves the grid "
    "candidate set is lossless.  Output: per neighbor rank, how many "
    "points have one and the exact mean distance at that rank "
    "(per-pair distance rounded then DECIMAL-summed).",
    oracle=f"""
WITH p AS (
  SELECT event_id, value AS x,
         EXTRACT(hour FROM ts) + EXTRACT(minute FROM ts) / 60.0 AS y
  FROM events WHERE event_type = 'purchase'
),
cand AS (
  SELECT a.event_id AS id_q, b.event_id AS id_n,
         GREATEST(ABS(a.x - b.x), ABS(a.y - b.y)) AS linf
  FROM p a JOIN p b ON a.event_id <> b.event_id
  WHERE ABS(a.x - b.x) < {KNN_EPS} AND ABS(a.y - b.y) < {KNN_EPS}
),
ranked AS (
  SELECT id_q, id_n, linf,
         ROW_NUMBER() OVER (PARTITION BY id_q ORDER BY linf ASC, id_n ASC)
           AS rank
  FROM cand
)
SELECT CAST(rank AS INT) AS rank,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(CAST(ROUND(linf, 6) AS DECIMAL(18,6))) AS DOUBLE)
         / COUNT(*) AS mean_dist
FROM ranked WHERE rank <= {KNN_K}
GROUP BY rank
""",
)
def join_spatial_grid_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        F.col("value").alias("x"),
        (F.hour("ts") + F.minute("ts") / F.lit(60.0)).alias("y"),
    )
    cx, cy = F.floor(F.col("x") / KNN_EPS), F.floor(F.col("y") / KNN_EPS)
    q = p.select(
        F.col("event_id").alias("id_q"),
        F.col("x").alias("xq"),
        F.col("y").alias("yq"),
        F.explode(
            F.array(
                *[
                    F.struct((cx + dx).alias("gx"), (cy + dy).alias("gy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select(
        "id_q", "xq", "yq", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy")
    )
    n = p.select(
        F.col("event_id").alias("id_n"),
        F.col("x").alias("xn"),
        F.col("y").alias("yn"),
        cx.alias("gx"),
        cy.alias("gy"),
    )
    cand = (
        q.join(n, ["gx", "gy"])
        .where(F.col("id_q") != F.col("id_n"))
        .where(
            (F.abs(F.col("xq") - F.col("xn")) < KNN_EPS)
            & (F.abs(F.col("yq") - F.col("yn")) < KNN_EPS)
        )
        .select(
            "id_q",
            "id_n",
            F.greatest(
                F.abs(F.col("xq") - F.col("xn")), F.abs(F.col("yq") - F.col("yn"))
            ).alias("linf"),
        )
    )
    w = Window.partitionBy("id_q").orderBy(F.col("linf").asc(), F.col("id_n").asc())
    ranked = cand.select("id_q", "linf", F.row_number().over(w).alias("rank")).where(
        F.col("rank") <= KNN_K
    )
    return ranked.groupBy(F.col("rank").cast("int").alias("rank")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
        (
            F.sum(F.round("linf", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mean_dist"),
    )


# ---------------------------------------------------------------------------
# Chi-square test of independence + Cramer's V
# ---------------------------------------------------------------------------


@register(
    "quality_chi_square_independence",
    family="drift",
    doc="Chi-square test of independence between event_type and ISO "
    "day-of-week (the classic categorical-drift / segment-balance "
    "audit): observed contingency counts, expected counts "
    "row_total*col_total/N from two broadcast-joined marginal "
    "aggregates, chi2 = sum (O-E)^2/E with each cell's term rounded "
    "then DECIMAL-summed (deterministic across engines regardless of "
    "cell order), degrees of freedom (r-1)(c-1), and Cramer's V = "
    "sqrt(chi2 / (N * min(r-1, c-1))) — effect size alongside the "
    "statistic.  Shape: one scan -> one contingency aggregate (|types| "
    "x 7 cells, tiny) -> marginals derived FROM the contingency table "
    "(no second scan) and broadcast back.  isodow = Spark weekday()+1 "
    "== DuckDB isodow.",
    oracle="""
WITH obs AS (
  SELECT event_type, isodow(CAST(ts AS DATE)) AS dow,
         CAST(COUNT(*) AS BIGINT) AS o
  FROM events GROUP BY event_type, dow
),
rowm AS (SELECT event_type, SUM(o) AS rt FROM obs GROUP BY event_type),
colm AS (SELECT dow, SUM(o) AS ct FROM obs GROUP BY dow),
tot AS (SELECT SUM(o) AS n FROM obs),
cells AS (
  SELECT obs.o, rowm.rt * colm.ct / tot.n AS e
  FROM obs JOIN rowm USING (event_type) JOIN colm USING (dow) CROSS JOIN tot
),
chi AS (
  SELECT CAST(SUM(CAST(ROUND((o - e) * (o - e) / e, 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS chi2
  FROM cells
),
dims AS (
  SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
         CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
  FROM obs
)
SELECT CAST(tot.n AS BIGINT) AS n,
       dims.r, dims.c,
       CAST((dims.r - 1) * (dims.c - 1) AS BIGINT) AS dof,
       ROUND(chi.chi2, 6) AS chi2,
       ROUND(SQRT(chi.chi2 / (tot.n * LEAST(dims.r - 1, dims.c - 1))), 6)
         AS cramers_v
FROM tot, dims, chi
""",
)
def quality_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    obs = (
        ev.select("event_type", (F.weekday(F.to_date("ts")) + 1).alias("dow"))
        .groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("o"))
        .localCheckpoint()  # contingency table is tiny; reused 4x below
    )
    rowm = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    colm = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rowm), "event_type")
        .join(F.broadcast(colm), "dow")
        .crossJoin(F.broadcast(tot))
        .select(
            "o", (F.col("rt") * F.col("ct") / F.col("n")).alias("e")
        )
    )
    chi = cells.agg(
        F.sum(
            F.round((F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e"), 6)
            .cast("decimal(28,6)")
        )
        .cast("double")
        .alias("chi2")
    )
    dims = obs.agg(
        F.count_distinct("event_type").cast("bigint").alias("r"),
        F.count_distinct("dow").cast("bigint").alias("c"),
    )
    return (
        tot.crossJoin(F.broadcast(dims))
        .crossJoin(F.broadcast(chi))
        .select(
            F.col("n").cast("bigint").alias("n"),
            "r",
            "c",
            ((F.col("r") - 1) * (F.col("c") - 1)).cast("bigint").alias("dof"),
            F.round("chi2", 6).alias("chi2"),
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
                ),
                6,
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# Longest consecutive-day streak per user (gaps and islands)
# ---------------------------------------------------------------------------


@register(
    "events_user_streaks",
    family="events",
    doc="Longest consecutive-active-day streak per user via GAPS-AND-"
    "ISLANDS: distinct (user, day), a per-user row_number in day order, "
    "and day - row_number as the island anchor (constant within a run "
    "of consecutive days, the textbook trick) -> per-island lengths -> "
    "per-user max -> distribution of users by their longest streak.  "
    "Every window partitions by user_id (bounded by a user's active "
    "days); all arithmetic is exact INT/DATE.  The engagement-streak "
    "rollup every activity dashboard runs.",
    oracle="""
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
isl AS (
  SELECT user_id,
         day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day ASC)
                    AS INT) AS anchor
  FROM ud
),
runs AS (
  SELECT user_id, anchor, CAST(COUNT(*) AS BIGINT) AS len
  FROM isl GROUP BY user_id, anchor
),
best AS (SELECT user_id, MAX(len) AS best_streak FROM runs GROUP BY user_id)
SELECT CAST(best_streak AS BIGINT) AS best_streak,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM best GROUP BY best_streak
""",
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    isl = ud.select(
        "user_id",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("anchor"),
    )
    runs = isl.groupBy("user_id", "anchor").agg(
        F.count(F.lit(1)).cast("bigint").alias("len")
    )
    best = runs.groupBy("user_id").agg(F.max("len").alias("best_streak"))
    return best.groupBy(F.col("best_streak").cast("bigint").alias("best_streak")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users")
    )


# ---------------------------------------------------------------------------
# Adamic-Adar link prediction on the co-purchase graph
# ---------------------------------------------------------------------------

AA_ORDER_CAP = 1000
AA_TOP = 20


@register(
    "graph_adamic_adar",
    family="graph",
    doc="Adamic-Adar link prediction on the part co-purchase graph "
    "(same bounded demo graph as graph_triangle_count): for every "
    "NON-adjacent part pair with at least one common neighbor, "
    "AA(a,b) = sum over common neighbors z of 1/ln(deg(z)) — the "
    "classic who-should-be-connected score.  Distributed shape: "
    "candidate pairs come from the WEDGE join (adjacency ⋈ adjacency "
    "on the shared center, a<b — never all pairs), existing edges are "
    "removed with one broadcast-able anti-join, and each center's "
    "1/ln(deg) term is rounded then DECIMAL-summed so the per-pair sum "
    "is order-deterministic across engines.  deg(z) >= 2 for every "
    "wedge center, so ln is never 0.  Output: top-20 predicted links "
    "with full tie-break.",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {AA_ORDER_CAP}
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
wedge AS (
  SELECT x.v AS a, y.v AS b, x.u AS z
  FROM adj x JOIN adj y ON x.u = y.u AND x.v < y.v
),
cand AS (
  SELECT w.a, w.b,
         CAST(SUM(CAST(ROUND(1.0 / LN(deg.d), 6) AS DECIMAL(18,6)))
              AS DOUBLE) AS aa_score,
         CAST(COUNT(*) AS BIGINT) AS n_common
  FROM wedge w JOIN deg ON deg.u = w.z
  WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = w.a AND e.b = w.b)
  GROUP BY w.a, w.b
)
SELECT a, b, ROUND(aa_score, 6) AS aa_score, n_common
FROM cand
ORDER BY aa_score DESC, a ASC, b ASC
LIMIT {AA_TOP}
""",
)
def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < AA_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
        .localCheckpoint()  # reused: adjacency (2x), anti-join
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    x = adj.select(F.col("u").alias("z"), F.col("v").alias("pa"))
    y = adj.select(F.col("u").alias("z"), F.col("v").alias("pb"))
    wedge = x.join(y, "z").where(F.col("pa") < F.col("pb"))
    nonadj = wedge.join(
        e,
        (wedge["pa"] == e["a"]) & (wedge["pb"] == e["b"]),
        "left_anti",
    )
    cand = (
        nonadj.join(deg, nonadj["z"] == deg["u"])
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(
            F.sum(F.round(F.lit(1.0) / F.log("d"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("aa_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_common"),
        )
    )
    return (
        cand.select("a", "b", F.round("aa_score", 6).alias("aa_score"), "n_common")
        .orderBy(F.col("aa_score").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(AA_TOP)
    )


# ---------------------------------------------------------------------------
# Bounded-depth multi-source BFS hop distances
# ---------------------------------------------------------------------------

BFS_ORDER_CAP = 1000
BFS_SEED_MOD = 50
BFS_MAX_HOPS = 4


def _bfs_oracle() -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {BFS_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM adj),
f0 AS MATERIALIZED (SELECT v FROM nodes WHERE v % {BFS_SEED_MOD} = 0),
vis0 AS MATERIALIZED (SELECT v FROM f0)"""
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT DISTINCT adj.v AS v FROM adj JOIN f{i - 1} p ON adj.u = p.v
  WHERE NOT EXISTS (SELECT 1 FROM vis{i - 1} w WHERE w.v = adj.v)
),
vis{i} AS MATERIALIZED (
  SELECT v FROM vis{i - 1} UNION ALL SELECT v FROM f{i}
)"""
        )
    levels = "\nUNION ALL\n".join(
        f"SELECT {i} AS hop, v FROM f{i}" for i in range(BFS_MAX_HOPS + 1)
    )
    parts.append(f"hops AS MATERIALIZED (\n{levels}\n)")
    final = f"""
SELECT CAST(hop AS INT) AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM hops GROUP BY hop
UNION ALL
SELECT -1 AS hop, CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM nodes WHERE NOT EXISTS (SELECT 1 FROM vis{BFS_MAX_HOPS} w
                             WHERE w.v = nodes.v)
"""
    return ",\n".join(parts) + final


@register(
    "graph_bfs_hops",
    family="graph",
    doc="Bounded-depth multi-source BFS (operators/bfs.py) on the part "
    "co-purchase graph: every part whose key is divisible by 50 seeds "
    "the search, and each reachable node is labeled with its minimum "
    "hop distance (<= 4) — the k-hop-neighborhood feature every graph "
    "feature pipeline computes.  Per level: ONE frontier-adjacency "
    "equi-join + one visited anti-join, localCheckpointed so the plan "
    "stays flat (the Pregel frontier pattern; frontier-sized shuffles, "
    "never graph-sized).  The oracle UNROLLS all 4 levels as "
    "MATERIALIZED CTEs (NOTES gotcha 11).  Output: nodes per hop "
    "level plus the count unreached within 4 hops (hop = -1).",
    oracle=_bfs_oracle(),
)
def graph_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bfs import bfs_hops

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < BFS_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()  # reused every BFS level
    )
    nodes = adj.select("u").distinct().withColumnRenamed("u", "v")
    seeds = nodes.where(F.col("v") % BFS_SEED_MOD == 0)
    visited = bfs_hops(adj, seeds, BFS_MAX_HOPS)
    per_hop = visited.groupBy(F.col("hop").cast("int").alias("hop")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes")
    )
    unreached = (
        nodes.join(visited.select("v"), "v", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .select(F.lit(-1).cast("int").alias("hop"), "n_nodes")
    )
    return per_hop.unionByName(unreached)


# ---------------------------------------------------------------------------
# FP-growth frequent itemsets (PFP)
# ---------------------------------------------------------------------------

FPG_MINSUP = 2
FPG_MAX_LEN = 3


@register(
    "mine_fpgrowth_itemsets",
    family="dedup",
    doc="ALL frequent itemsets up to size 3 over the order baskets via "
    "parallel FP-growth (operators/fpgrowth.py): broadcast F-list "
    "prune, ONE shuffle of group-dependent prefix transactions, then "
    "independent per-item conditional-pattern-base mining in Arrow "
    "batches with FP-tree path compression — the wide-basket "
    "complement to the join-per-level a-priori tier "
    "(mine_association_rules / mine_frequent_triples), which "
    "re-shuffles the corpus once per itemset size.  The oracle "
    "enumerates sizes 1-3 with naive unpruned self-joins: equality "
    "proves the PFP group decomposition produces every itemset "
    "exactly once with exact support.",
    oracle=f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
s1 AS (
  SELECT 1 AS size, CAST(l_partkey AS VARCHAR) AS items,
         COUNT(*) AS support
  FROM li GROUP BY l_partkey HAVING COUNT(*) >= {FPG_MINSUP}
),
s2 AS (
  SELECT 2 AS size,
         CAST(a.l_partkey AS VARCHAR) || '|' || CAST(b.l_partkey AS VARCHAR)
           AS items,
         COUNT(*) AS support
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 2 HAVING COUNT(*) >= {FPG_MINSUP}
),
s3 AS (
  SELECT 3 AS size,
         CAST(a.l_partkey AS VARCHAR) || '|' || CAST(b.l_partkey AS VARCHAR)
           || '|' || CAST(c.l_partkey AS VARCHAR) AS items,
         COUNT(*) AS support
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  JOIN li c ON a.l_orderkey = c.l_orderkey AND b.l_partkey < c.l_partkey
  GROUP BY 2 HAVING COUNT(*) >= {FPG_MINSUP}
)
SELECT CAST(size AS INT) AS size, items, CAST(support AS BIGINT) AS support
FROM (SELECT * FROM s1 UNION ALL SELECT * FROM s2 UNION ALL SELECT * FROM s3)
""",
)
def mine_fpgrowth_itemsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fpgrowth import fpgrowth_itemsets

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    sets = fpgrowth_itemsets(
        li, "l_orderkey", "l_partkey", FPG_MINSUP, max_len=FPG_MAX_LEN,
        n_groups=64,  # PFP F-list sharding: 64 Arrow batches, not |items|
    )
    return sets.select(
        F.size("items").cast("int").alias("size"),
        F.concat_ws("|", F.transform("items", lambda x: x.cast("string"))).alias(
            "items"
        ),
        F.col("support").cast("bigint").alias("support"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation with broadcast quintile cutoffs
# ---------------------------------------------------------------------------

RFM_QS = (0.2, 0.4, 0.6, 0.8)


@register(
    "events_rfm_segmentation",
    family="events",
    doc="RFM (recency / frequency / monetary) user segmentation over "
    "purchase events — the classic CRM rollup, built WITHOUT a global "
    "NTILE window (the textbook formulation ranks all users in one "
    "unpartitioned window — a scale-killer this repo's window audit "
    "forbids): per-user metrics come from one aggregate (recency = "
    "days since the user's last purchase relative to the corpus max "
    "day, frequency = purchase count, monetary = DECIMAL-exact value "
    "sum), each metric's quintile CUTOFFS come from one tiny exact-"
    "percentile aggregate (Spark percentile == DuckDB quantile_cont), "
    "and scores attach via broadcast — two scans of nothing but the "
    "per-user aggregate.  Score = 1 + #cutoffs strictly below the "
    "metric (r_score 5 = stalest).  Output: users and mean spend per "
    "(r,f,m) cell.",
    oracle=f"""
WITH u AS (
  SELECT user_id,
         MAX(CAST(ts AS DATE)) AS last_day,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE) AS money
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
mx AS (SELECT MAX(last_day) AS corpus_max FROM u),
m AS (
  SELECT user_id, datediff('day', last_day, corpus_max) AS rec, freq, money
  FROM u CROSS JOIN mx
),
cuts AS (
  SELECT
    {", ".join(f"ROUND(CAST(quantile_cont(rec, {q}) AS DOUBLE), 6) AS rc{i}, "
               f"ROUND(CAST(quantile_cont(freq, {q}) AS DOUBLE), 6) AS fc{i}, "
               f"ROUND(CAST(quantile_cont(money, {q}) AS DOUBLE), 6) AS mc{i}"
               for i, q in enumerate(RFM_QS))}
  FROM m
),
scored AS (
  SELECT user_id, money,
         1 {" ".join(f"+ CASE WHEN rec > rc{i} THEN 1 ELSE 0 END"
                     for i in range(len(RFM_QS)))} AS r_score,
         1 {" ".join(f"+ CASE WHEN freq > fc{i} THEN 1 ELSE 0 END"
                     for i in range(len(RFM_QS)))} AS f_score,
         1 {" ".join(f"+ CASE WHEN ROUND(money, 6) > mc{i} THEN 1 ELSE 0 END"
                     for i in range(len(RFM_QS)))} AS m_score
  FROM m CROSS JOIN cuts
)
SELECT CAST(r_score AS INT) AS r_score, CAST(f_score AS INT) AS f_score,
       CAST(m_score AS INT) AS m_score,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(CAST(SUM(CAST(ROUND(money, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_money
FROM scored GROUP BY 1, 2, 3
""",
)
def events_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("freq"),
            F.sum(F.round("value", 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("money"),
        )
        .localCheckpoint()  # reused: corpus max, cutoffs, scoring
    )
    mx = u.agg(F.max("last_day").alias("corpus_max"))
    m = u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.datediff("corpus_max", "last_day").alias("rec"),
        "freq",
        "money",
    )
    cut_cols = []
    for i, q in enumerate(RFM_QS):
        cut_cols += [
            F.round(F.percentile("rec", q), 6).alias(f"rc{i}"),
            F.round(F.percentile("freq", q), 6).alias(f"fc{i}"),
            F.round(F.percentile("money", q), 6).alias(f"mc{i}"),
        ]
    cuts = m.agg(*cut_cols)

    def score(metric, prefix):
        s = F.lit(1)
        for i in range(len(RFM_QS)):
            s = s + F.when(metric > F.col(f"{prefix}{i}"), 1).otherwise(0)
        return s

    scored = m.crossJoin(F.broadcast(cuts)).select(
        "user_id",
        "money",
        score(F.col("rec"), "rc").alias("r_score"),
        score(F.col("freq"), "fc").alias("f_score"),
        score(F.round("money", 6), "mc").alias("m_score"),
    )
    return scored.groupBy(
        F.col("r_score").cast("int").alias("r_score"),
        F.col("f_score").cast("int").alias("f_score"),
        F.col("m_score").cast("int").alias("m_score"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(
            F.sum(F.round("money", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_money"),
    )


# ---------------------------------------------------------------------------
# Hash-sampled quantile estimation (the 100 TB quantile path)
# ---------------------------------------------------------------------------

HSQ_PERMILLE = 10  # 1% deterministic systematic sample


@register(
    "agg_hash_sample_quantiles",
    family="agg",
    doc="Sample-based quantile estimation with a DETERMINISTIC hash "
    "sample — the quantile path that actually runs at 100 TB, where an "
    "exact global sort is off the table and approx_percentile's sketch "
    "is engine-specific (agg_percentile_approx stays rows-only for "
    "exactly that reason): md5(orderkey) lands each row in a stable "
    "1% systematic sample (no rand(), so both engines and every retry "
    "see the same rows), exact interpolated quantiles are computed on "
    "the sample AND on the full population, and the output reports "
    "both plus the absolute estimation error at p50/p90/p99 — the "
    "sample is population-independent per key, so resampling composes "
    "with incremental ingest.  Fully hash-oracled end to end.",
    oracle=f"""
WITH s AS (
  SELECT l_extendedprice FROM lineitem
  WHERE CAST(('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '_' ||
              CAST(l_linenumber AS VARCHAR)), 1, 15)) AS BIGINT)
        % 1000 < {HSQ_PERMILLE}
),
pop AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pop,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS pop_p50,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 6) AS pop_p90,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 6) AS pop_p99
  FROM lineitem
),
smp AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE), 6) AS smp_p50,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE), 6) AS smp_p90,
         ROUND(CAST(quantile_cont(l_extendedprice, 0.99) AS DOUBLE), 6) AS smp_p99
  FROM s
)
SELECT pop.n_pop, smp.n_sample,
       pop.pop_p50, smp.smp_p50, ROUND(ABS(pop.pop_p50 - smp.smp_p50), 6) AS err_p50,
       pop.pop_p90, smp.smp_p90, ROUND(ABS(pop.pop_p90 - smp.smp_p90), 6) AS err_p90,
       pop.pop_p99, smp.smp_p99, ROUND(ABS(pop.pop_p99 - smp.smp_p99), 6) AS err_p99
FROM pop CROSS JOIN smp
""",
)
def agg_hash_sample_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    li = table(spark, sf_dir, "lineitem")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("_"),
        F.col("l_linenumber").cast("string"),
    )
    s = li.where(md5_long(key) % 1000 < HSQ_PERMILLE)
    pop = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pop"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("pop_p50"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("pop_p90"),
        F.round(F.percentile("l_extendedprice", 0.99), 6).alias("pop_p99"),
    )
    smp = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sample"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("smp_p50"),
        F.round(F.percentile("l_extendedprice", 0.9), 6).alias("smp_p90"),
        F.round(F.percentile("l_extendedprice", 0.99), 6).alias("smp_p99"),
    )
    return (
        pop.crossJoin(F.broadcast(smp))
        .select(
            "n_pop",
            "n_sample",
            "pop_p50",
            "smp_p50",
            F.round(F.abs(F.col("pop_p50") - F.col("smp_p50")), 6).alias("err_p50"),
            "pop_p90",
            "smp_p90",
            F.round(F.abs(F.col("pop_p90") - F.col("smp_p90")), 6).alias("err_p90"),
            "pop_p99",
            "smp_p99",
            F.round(F.abs(F.col("pop_p99") - F.col("smp_p99")), 6).alias("err_p99"),
        )
    )


# ---------------------------------------------------------------------------
# Per-image luminance entropy over the real PNG decode path
# ---------------------------------------------------------------------------


@register(
    "multimodal_image_entropy",
    family="multimodal",
    doc="Per-image Shannon entropy of the 16-bin luminance histogram "
    "over the REAL PNG decode path (operators/multimodal.py::"
    "png_luminance_bins — inflate + 5-filter unfilter + integer BT.601 "
    "luma) — the flat/low-information image gate an image-curation "
    "pipeline runs (single-color banners and test cards score near 0, "
    "textured photos near log2(16)=4).  H = sum over non-empty bins of "
    "round(-(n/N) log2(n/N), 6), DECIMAL-summed so the 16-term float "
    "sum is order-deterministic; images bucket into 0.25-wide entropy "
    "bands (ROUND first, then FLOOR — NOTES gotcha 14).  The oracle "
    "replays the closed-form pixel pattern and every arithmetic step "
    "without touching a PNG byte — drift anywhere in the codec breaks "
    "the hash.  Scale: blobs never leave the executor; per image only "
    "<= 16 narrow rows reach the two partitioned-by-image aggregates.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 24 + 4 AS w, doc_id % 16 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id,
         ((299 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y) % 256)
         + 587 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y + 11) % 256)
         + 114 * ((doc_id * 7 + 3 * xs.x + 5 * ys.y + 22) % 256)) // 1000)
         // 16 AS bin
  FROM dims, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
),
hist AS (
  SELECT doc_id, bin, CAST(COUNT(*) AS BIGINT) AS n_px
  FROM px GROUP BY doc_id, bin
),
tot AS (SELECT doc_id, SUM(n_px) AS n FROM hist GROUP BY doc_id),
ent AS (
  SELECT hist.doc_id,
         CAST(SUM(CAST(ROUND(-(n_px / CAST(n AS DOUBLE))
                             * log2(n_px / CAST(n AS DOUBLE)), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS h
  FROM hist JOIN tot ON hist.doc_id = tot.doc_id
  GROUP BY hist.doc_id
)
SELECT CAST(FLOOR(ROUND(h, 6) * 4) AS INT) AS entropy_band,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       ROUND(CAST(SUM(CAST(ROUND(h, 6) AS DECIMAL(18,6))) AS DOUBLE)
             / COUNT(*), 6) AS mean_entropy
FROM ent GROUP BY 1
""",
)
def multimodal_image_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import png_luminance_bins, synthesize_png_media

    d = table(spark, sf_dir, "documents")
    hist = png_luminance_bins(synthesize_png_media(d.select("doc_id")))
    tot = hist.groupBy("image_id").agg(F.sum("n_px").alias("n"))
    p = F.col("n_px") / F.col("n").cast("double")
    ent = (
        hist.join(tot, "image_id")
        .groupBy("image_id")
        .agg(
            F.sum(F.round(-p * F.log2(p), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("h")
        )
    )
    return ent.groupBy(
        F.floor(F.round("h", 6) * 4).cast("int").alias("entropy_band")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.round(
            F.sum(F.round("h", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_entropy"),
    )


# ---------------------------------------------------------------------------
# Video frame sampling over the real MJPEG/AVI decode path
# ---------------------------------------------------------------------------


@register(
    "multimodal_video_frame_stats",
    family="multimodal",
    doc="Every-2nd-frame sampling + per-frame pixel/motion statistics "
    "over the REAL video decode path (operators/video.py): a genuine "
    "RIFF/AVI Motion-JPEG container (avih/strl/movi/idx1 chunk walk, "
    "declared-vs-actual frame-count cross-check) whose frames decode "
    "through the REAL baseline-JPEG codec (operators/jpeg.py Huffman + "
    "IDCT) — the frame-sample step every video feature pipeline runs "
    "before per-frame models, with blobs never leaving the executor.  "
    "Motion proxy = sum of |frame-pixel-sum deltas| between consecutive "
    "sampled frames — exact BIGINTs end to end.  The fixture is the "
    "constant-8x8-block exact-round-trip JPEG construction, so the "
    "oracle replays container + codec + sampling + motion arithmetic "
    "in closed form; drift anywhere (RIFF walk, chunk padding, Huffman, "
    "dequant, IDCT, sampling stride) breaks the hash.  Output grouped "
    "per (dims, frame-count) class.",
    oracle="""
WITH spec AS (
  SELECT doc_id, 8 * (doc_id % 3 + 1) AS w, 8 * (doc_id % 2 + 1) AS h,
         doc_id % 5 + 2 AS n
  FROM documents
),
fr AS (
  SELECT doc_id, w, h, n, fs.f
  FROM spec, UNNEST(range(0, n, 2)) AS fs(f)
),
blocks AS (
  SELECT doc_id, f,
         (doc_id * 11 + 7 * f + 13 * bxs.bx + 29 * bys.by) % 256 AS v
  FROM fr, UNNEST(range(0, w // 8)) AS bxs(bx),
           UNNEST(range(0, h // 8)) AS bys(by)
),
per_frame AS (
  SELECT doc_id, f, CAST(SUM(64 * v) AS BIGINT) AS fsum,
         CAST(MIN(v) AS INT) AS mn, CAST(MAX(v) AS INT) AS mx
  FROM blocks GROUP BY doc_id, f
),
deltas AS (
  SELECT doc_id, f, fsum, mn, mx,
         ABS(fsum - LAG(fsum) OVER (PARTITION BY doc_id ORDER BY f ASC))
           AS d
  FROM per_frame
),
per_video AS (
  SELECT s.doc_id, s.w, s.h, s.n,
         (s.n + 1) // 2 AS n_sampled,
         SUM(dl.fsum) AS px_sum, MIN(dl.mn) AS px_min, MAX(dl.mx) AS px_max,
         COALESCE(SUM(dl.d), 0) AS motion_abs
  FROM spec s JOIN deltas dl ON dl.doc_id = s.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(n AS BIGINT) AS n_frames,
       CAST(COUNT(*) AS BIGINT) AS n_videos,
       CAST(SUM(px_sum) AS BIGINT) AS px_sum,
       CAST(MIN(px_min) AS INT) AS px_min,
       CAST(MAX(px_max) AS INT) AS px_max,
       CAST(SUM(motion_abs) AS BIGINT) AS motion_abs
FROM per_video GROUP BY 1, 2, 3
""",
)
def multimodal_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.video import synthesize_mjpeg_media, video_frame_stats

    d = table(spark, sf_dir, "documents")
    stats = video_frame_stats(synthesize_mjpeg_media(d.select("doc_id")), every=2)
    return stats.groupBy(
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
        F.col("n_frames").cast("bigint").alias("n_frames"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_videos"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
        F.sum("motion_abs").cast("bigint").alias("motion_abs"),
    )


# ---------------------------------------------------------------------------
# Nearest-direction as-of join
# ---------------------------------------------------------------------------


@register(
    "join_asof_nearest",
    family="join",
    doc="NEAREST-direction as-of join (operators/asof_join.py, "
    "direction='nearest' — completes the backward/forward/nearest "
    "family of pd.merge_asof): every click is matched to the user's "
    "closest purchase in absolute time, exact ties preferring backward "
    "(merge_asof semantics; the operator evaluates the backward and "
    "forward fill passes over ONE shuffled layout and picks per row).  "
    "Purchases are deduped per (user, ts) keeping the greatest "
    "event_id first, mirroring the operator's right-side dedup.  The "
    "oracle is the naive per-row LATERAL minimum — equality proves the "
    "two-pass window composition implements the nearest semantics "
    "exactly.  Output: per match side (none/exact/backward/forward), "
    "click count and mean |Δt| in seconds from exact microsecond "
    "BIGINT sums.",
    oracle="""
WITH l AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
),
r0 AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts FROM (
    SELECT r0.*, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS rn
    FROM r0
  ) WHERE rn = 1
),
m AS (
  SELECT l.user_id, l.ts, rr.mts
  FROM l LEFT JOIN LATERAL (
    SELECT r.ts AS mts FROM r WHERE r.user_id = l.user_id
    ORDER BY ABS(date_diff('microsecond', r.ts, l.ts)) ASC, r.ts ASC
    LIMIT 1
  ) rr ON TRUE
),
c AS (
  SELECT CASE WHEN mts IS NULL THEN 'none'
              WHEN mts = ts THEN 'exact'
              WHEN mts < ts THEN 'backward' ELSE 'forward' END AS side,
         COALESCE(ABS(date_diff('microsecond', mts, ts)), 0) AS d
  FROM m
)
SELECT side, CAST(COUNT(*) AS BIGINT) AS n_clicks,
       ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*) / 1000000.0, 6)
         AS mean_abs_delta_sec
FROM c GROUP BY side
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof_join import asof_join

    ev = table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("mts", F.col("ts"))
    )
    m = asof_join(
        left, right, key="user_id", ts="ts", right_order="event_id",
        value_cols=["mts"], direction="nearest",
    )
    d = F.coalesce(
        F.abs(F.expr("timestampdiff(MICROSECOND, mts, ts)")), F.lit(0)
    )
    side = (
        F.when(F.col("mts").isNull(), "none")
        .when(F.col("mts") == F.col("ts"), "exact")
        .when(F.col("mts") < F.col("ts"), "backward")
        .otherwise("forward")
    )
    return (
        m.select(side.alias("side"), d.alias("d"))
        .groupBy("side")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
            F.round(
                F.sum("d").cast("double") / F.count(F.lit(1)) / F.lit(1000000.0), 6
            ).alias("mean_abs_delta_sec"),
        )
    )


# ---------------------------------------------------------------------------
# Difference-in-differences estimator
# ---------------------------------------------------------------------------

DID_CUTOFF = "2024-01-16"


@register(
    "quality_did_estimator",
    family="drift",
    doc="Difference-in-differences readout: users hash-split into two "
    "variants (md5 parity, same bucketing as the z-test), the corpus "
    "split pre/post at a fixed date boundary (DATE comparison — "
    "zone-free), the outcome is mean purchase value per cell, and "
    "DiD = (postB - preB) - (postA - preA) — the causal-effect "
    "estimator every experiment platform reports when randomization "
    "happens before the treatment window.  One scan, one 4-cell "
    "aggregate, exact DECIMAL value sums, one identical closing "
    "expression tree.",
    oracle=f"""
WITH p AS (
  SELECT CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           % 2 AS variant,
         CASE WHEN CAST(ts AS DATE) < DATE '{DID_CUTOFF}'
              THEN 0 ELSE 1 END AS post,
         value
  FROM events WHERE event_type = 'purchase'
),
cells AS (
  SELECT variant, post,
         CAST(SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS DOUBLE)
           / COUNT(*) AS m,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM p GROUP BY variant, post
),
w AS (
  SELECT
    MAX(CASE WHEN variant = 0 AND post = 0 THEN m END) AS pre_a,
    MAX(CASE WHEN variant = 0 AND post = 1 THEN m END) AS post_a,
    MAX(CASE WHEN variant = 1 AND post = 0 THEN m END) AS pre_b,
    MAX(CASE WHEN variant = 1 AND post = 1 THEN m END) AS post_b,
    CAST(SUM(n) AS BIGINT) AS n_purchases
  FROM cells
)
SELECT ROUND(pre_a, 6) AS pre_a, ROUND(post_a, 6) AS post_a,
       ROUND(pre_b, 6) AS pre_b, ROUND(post_b, 6) AS post_b,
       ROUND((post_b - pre_b) - (post_a - pre_a), 6) AS did,
       n_purchases
FROM w
""",
)
def quality_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.hashing import md5_long

    ev = table(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        (md5_long(F.col("user_id").cast("string")) % 2).alias("variant"),
        F.when(F.to_date("ts") < F.lit(DID_CUTOFF).cast("date"), 0)
        .otherwise(1)
        .alias("post"),
        "value",
    )
    cells = p.groupBy("variant", "post").agg(
        (
            F.sum(F.round("value", 6).cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )

    def cell(v, s):
        return F.max(
            F.when((F.col("variant") == v) & (F.col("post") == s), F.col("m"))
        )

    return cells.agg(
        cell(0, 0).alias("pa"),
        cell(0, 1).alias("qa"),
        cell(1, 0).alias("pb"),
        cell(1, 1).alias("qb"),
        F.sum("n").cast("bigint").alias("n_purchases"),
    ).select(
        F.round("pa", 6).alias("pre_a"),
        F.round("qa", 6).alias("post_a"),
        F.round("pb", 6).alias("pre_b"),
        F.round("qb", 6).alias("post_b"),
        F.round(
            (F.col("qb") - F.col("pb")) - (F.col("qa") - F.col("pa")), 6
        ).alias("did"),
        "n_purchases",
    )


# ---------------------------------------------------------------------------
# U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

ATTR_WINDOW_DAYS = 7


@register(
    "events_position_attribution",
    family="events",
    doc="U-shaped (position-based) multi-touch attribution — the "
    "marketing-science upgrade of last-touch "
    "(events_view_click_attribution): each purchase credits the user's "
    "clicks in the preceding 7 days with 40% to the first touch, 40% "
    "to the last, and 20% split across the middles (single touch takes "
    "1.0, a pair takes 0.5/0.5), channel = props k mod 4.  Shape: one "
    "user-keyed band join (purchase x clicks within the window — the "
    "range-join pattern, per-user fan-out bounded by activity), "
    "per-conversion windows for position/count (partitioned by "
    "conversion, never global), per-credit ROUND then DECIMAL sum so "
    "the 0.2/(n-2) repeating fractions aggregate identically across "
    "engines.",
    oracle=f"""
WITH conv AS (
  SELECT event_id AS conv_id, user_id, ts AS cts
  FROM events WHERE event_type = 'purchase'
),
clk AS (
  SELECT user_id, event_id AS click_id, ts,
         CAST(json_extract(props, '$.k') AS BIGINT) % 4 AS channel
  FROM events WHERE event_type = 'click'
),
touch AS (
  SELECT c.conv_id, k.channel, k.ts, k.click_id,
         ROW_NUMBER() OVER (PARTITION BY c.conv_id
                            ORDER BY k.ts ASC, k.click_id ASC) AS pos,
         COUNT(*) OVER (PARTITION BY c.conv_id) AS n
  FROM conv c JOIN clk k
    ON k.user_id = c.user_id
   AND k.ts < c.cts
   AND k.ts >= c.cts - INTERVAL {ATTR_WINDOW_DAYS} DAY
),
credit AS (
  SELECT channel,
         ROUND(CASE WHEN n = 1 THEN 1.0
                    WHEN n = 2 THEN 0.5
                    WHEN pos = 1 OR pos = n THEN 0.4
                    ELSE 0.2 / (n - 2) END, 6) AS cr
  FROM touch
)
SELECT CAST(channel AS INT) AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(CAST(cr AS DECIMAL(18,6))) AS DOUBLE) AS credit
FROM credit GROUP BY channel
""",
)
def events_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id"),
        F.col("ts").alias("cts"),
    )
    clk = ev.where(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        "ts",
        (F.get_json_object("props", "$.k").cast("bigint") % 4).alias("channel"),
    )
    touch = conv.join(clk, "user_id").where(
        (F.col("ts") < F.col("cts"))
        & (F.col("ts") >= F.expr(f"cts - INTERVAL {ATTR_WINDOW_DAYS} DAY"))
    )
    wp = Window.partitionBy("conv_id").orderBy(
        F.col("ts").asc(), F.col("click_id").asc()
    )
    wn = Window.partitionBy("conv_id")
    pos = touch.select(
        "channel",
        F.row_number().over(wp).alias("pos"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cr = F.round(
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("pos") == 1) | (F.col("pos") == F.col("n")), 0.4)
        .otherwise(F.lit(0.2) / (F.col("n") - 2)),
        6,
    )
    return (
        pos.select(F.col("channel").cast("int").alias("channel"), cr.alias("cr"))
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.sum(F.col("cr").cast("decimal(18,6)")).cast("double").alias("credit"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified rerank
# ---------------------------------------------------------------------------

MMR_N = 20
MMR_K = 6
MMR_LAM, MMR_MU = 0.7, 0.3


def _mmr_oracle() -> str:
    cos = (
        "ROUND(list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
        " * sqrt(list_dot_product({b}, {b}))), 6)"
    )
    parts = [
        f"""WITH e AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
qv AS MATERIALIZED (SELECT v AS q FROM e WHERE vec_id = 0),
cand AS MATERIALIZED (
  SELECT c.vec_id, {cos.format(a="qv.q", b="c.v")} AS rel
  FROM e c, qv WHERE c.vec_id != 0
  ORDER BY rel DESC, c.vec_id ASC LIMIT {MMR_N}
),
pairs AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib, {cos.format(a="ea.v", b="eb.v")} AS sim
  FROM cand a JOIN e ea ON ea.vec_id = a.vec_id
  JOIN cand b ON b.vec_id != a.vec_id JOIN e eb ON eb.vec_id = b.vec_id
),
s1 AS MATERIALIZED (
  SELECT vec_id, ROUND({MMR_LAM} * rel, 6) AS score
  FROM cand ORDER BY score DESC, vec_id ASC LIMIT 1
),
r1 AS MATERIALIZED (
  SELECT * FROM cand WHERE vec_id NOT IN (SELECT vec_id FROM s1)
)"""
    ]
    for i in range(2, MMR_K + 1):
        sel = " UNION ALL ".join(f"SELECT vec_id FROM s{j}" for j in range(1, i))
        parts.append(
            f"""s{i} AS MATERIALIZED (
  SELECT c.vec_id,
         ROUND({MMR_LAM} * c.rel - {MMR_MU} * (
           SELECT MAX(p.sim) FROM pairs p
           WHERE p.ia = c.vec_id AND p.ib IN ({sel})), 6) AS score
  FROM r{i - 1} c ORDER BY score DESC, c.vec_id ASC LIMIT 1
),
r{i} AS MATERIALIZED (
  SELECT * FROM r{i - 1} WHERE vec_id NOT IN (SELECT vec_id FROM s{i})
)"""
        )
    final = "\nUNION ALL\n".join(
        f"SELECT {i} AS pick, vec_id, score FROM s{i}"
        for i in range(1, MMR_K + 1)
    )
    return ",\n".join(parts) + "\n" + final


@register(
    "retrieval_mmr_rerank",
    family="retrieval",
    doc="Maximal-Marginal-Relevance diversified rerank (operators/"
    "similarity.py::mmr_rerank — Carbonell & Goldstein '98): top-20 "
    "cosine candidates for query vector 0 (brute_force_topk, the "
    "bounded first-stage retriever), then 6 greedy picks maximizing "
    "0.7·rel − 0.3·max-sim-to-selected — the rerank that stops a "
    "retrieval-augmented pipeline from returning six near-duplicates.  "
    "Every score rounds to 6 dp with vec_id tie-break so the greedy "
    "path is engine-deterministic; λ and μ are independent literals "
    "(1 − 0.7 is not the double 0.3).  All k iterations run on "
    "candidate-sized frames (TakeOrdered on <= 20 rows, "
    "localCheckpointed); the oracle unrolls the greedy loop as "
    "MATERIALIZED per-pick CTEs with correlated MAX penalties.  "
    "Scale: candidate generation is the distributed stage (any ANN "
    "tier); the rerank is intentionally candidate-local.",
    oracle=_mmr_oracle(),
)
def retrieval_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import (
        brute_force_topk,
        mmr_rerank,
        pairwise_cosines,
    )

    e = table(spark, sf_dir, "embeddings")
    q0 = e.where(F.col("vec_id") == 0)
    cand = brute_force_topk(q0, e, k=MMR_N).select(
        F.col("neighbor_id").alias("vec_id"), F.col("cosine").alias("rel")
    )
    cvecs = e.join(cand.select("vec_id"), "vec_id")
    pairs = pairwise_cosines(cvecs)
    out = mmr_rerank(cand, pairs, k=MMR_K, lam=MMR_LAM, mu=MMR_MU)
    return out.select(
        F.col("pick").cast("int").alias("pick"), "vec_id", "score"
    )


# ---------------------------------------------------------------------------
# Strict-order windowed funnel
# ---------------------------------------------------------------------------

FUNNEL_STEP2_HOURS = 1
FUNNEL_STEP3_HOURS = 24


@register(
    "events_funnel_windowed_strict",
    family="events",
    doc="Strict-order windowed funnel view -> click -> purchase: step 2 "
    "must follow the user's FIRST view within 1 hour, step 3 must "
    "follow the matched click within 24 hours — the per-step-deadline "
    "semantics product funnels actually use (events_funnel_conversion "
    "is the unconstrained ordering variant).  Sequential dependence is "
    "three user-keyed conditional MIN aggregates chained by equi-joins "
    "(each step's anchor = previous step's matched timestamp) — no "
    "windows, no per-user row explosion beyond the user-keyed "
    "aggregates.  Counts are exact; per-step median latency comes from "
    "exact interpolated percentiles over BIGINT microsecond deltas.",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {FUNNEL_STEP2_HOURS} HOUR
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t2
    AND e.ts <= s2.t2 + INTERVAL {FUNNEL_STEP3_HOURS} HOUR
  GROUP BY e.user_id
),
j AS (
  SELECT s1.user_id, s1.t1, s2.t2, s3.t3
  FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
  LEFT JOIN s3 ON s3.user_id = s1.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_step1,
       CAST(COUNT(t2) AS BIGINT) AS n_step2,
       CAST(COUNT(t3) AS BIGINT) AS n_step3,
       ROUND(CAST(COUNT(t3) AS DOUBLE) / COUNT(*), 6) AS conv_rate,
       ROUND(CAST(quantile_cont(date_diff('microsecond', t1, t2), 0.5)
                  AS DOUBLE) / 1000000.0, 6) AS median_view_to_click_sec,
       ROUND(CAST(quantile_cont(date_diff('microsecond', t2, t3), 0.5)
                  AS DOUBLE) / 1000000.0, 6) AS median_click_to_buy_sec
FROM j
""",
)
def events_funnel_windowed_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    s1 = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(
            (F.col("ts") > F.col("t1"))
            & (F.col("ts") <= F.expr(f"t1 + INTERVAL {FUNNEL_STEP2_HOURS} HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(
            (F.col("ts") > F.col("t2"))
            & (F.col("ts") <= F.expr(f"t2 + INTERVAL {FUNNEL_STEP3_HOURS} HOUR"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    j = s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_step1"),
        F.count("t2").cast("bigint").alias("n_step2"),
        F.count("t3").cast("bigint").alias("n_step3"),
        F.round(F.count("t3").cast("double") / F.count(F.lit(1)), 6).alias(
            "conv_rate"
        ),
        F.round(
            F.percentile(F.expr("timestampdiff(MICROSECOND, t1, t2)"), 0.5)
            / F.lit(1000000.0),
            6,
        ).alias("median_view_to_click_sec"),
        F.round(
            F.percentile(F.expr("timestampdiff(MICROSECOND, t2, t3)"), 0.5)
            / F.lit(1000000.0),
            6,
        ).alias("median_click_to_buy_sec"),
    )


# ---------------------------------------------------------------------------
# Harmonic closeness centrality from per-source bounded BFS
# ---------------------------------------------------------------------------


def _closeness_oracle() -> str:
    parts = [
        f"""WITH li AS MATERIALIZED (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < {BFS_ORDER_CAP}
),
e AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
nodes AS MATERIALIZED (SELECT DISTINCT u AS v FROM adj),
f0 AS MATERIALIZED (
  SELECT v AS src, v FROM nodes WHERE v % {BFS_SEED_MOD} = 0
),
vis0 AS MATERIALIZED (SELECT src, v FROM f0)"""
    ]
    for i in range(1, BFS_MAX_HOPS + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT DISTINCT p.src, adj.v FROM adj JOIN f{i - 1} p ON adj.u = p.v
  WHERE NOT EXISTS (SELECT 1 FROM vis{i - 1} w
                    WHERE w.src = p.src AND w.v = adj.v)
),
vis{i} AS MATERIALIZED (
  SELECT src, v FROM vis{i - 1} UNION ALL SELECT src, v FROM f{i}
)"""
        )
    levels = "\nUNION ALL\n".join(
        f"SELECT src, v, {i} AS hop FROM f{i}"
        for i in range(1, BFS_MAX_HOPS + 1)
    )
    parts.append(f"hops AS MATERIALIZED (\n{levels}\n)")
    final = f"""
SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached,
       CAST(SUM(CAST(ROUND(1.0 / hop, 6) AS DECIMAL(18,6))) AS DOUBLE)
         AS harmonic
FROM hops GROUP BY src
ORDER BY harmonic DESC, src ASC
LIMIT 10
"""
    return ",\n".join(parts) + final


@register(
    "graph_harmonic_closeness",
    family="graph",
    doc="Hop-bounded harmonic closeness centrality "
    "(operators/bfs.py::bfs_hops_per_source): every 50th part seeds "
    "its own BFS over the co-purchase graph (the sampled-sources "
    "recipe — seed count is the work multiplier, exactly how "
    "Brandes-style approximations bound centrality cost), and "
    "harmonic(src) = sum of 1/hop over nodes within 4 hops — the "
    "disconnected-safe closeness variant.  Per-hop terms round then "
    "DECIMAL-sum; top-10 with full tie-break.  The oracle unrolls all "
    "4 labeled-frontier levels as MATERIALIZED (src, v) CTEs.",
    oracle=_closeness_oracle(),
)
def graph_harmonic_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bfs import bfs_hops_per_source

    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < BFS_ORDER_CAP)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = (
        e.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(e.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .localCheckpoint()
    )
    seeds = (
        adj.select("u").distinct().withColumnRenamed("u", "v")
        .where(F.col("v") % BFS_SEED_MOD == 0)
    )
    hops = bfs_hops_per_source(adj, seeds, BFS_MAX_HOPS).where(F.col("hop") >= 1)
    return (
        hops.groupBy("src")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_reached"),
            F.sum(F.round(F.lit(1.0) / F.col("hop"), 6).cast("decimal(18,6)"))
            .cast("double")
            .alias("harmonic"),
        )
        .orderBy(F.col("harmonic").desc(), F.col("src").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# 1-D earth mover's distance (Wasserstein-1) between value distributions
# ---------------------------------------------------------------------------

EMD_BINS = 20
EMD_WIDTH = 25


@register(
    "quality_emd_drift",
    family="drift",
    doc="1-D earth mover's distance (Wasserstein-1) between the click "
    "and purchase value distributions on 20 fixed 25-wide bins — the "
    "drift statistic that, unlike PSI/KS/JS (all present in this "
    "battery), weights HOW FAR mass moved, not just that it moved.  "
    "EMD = width · Σ|CDF_p − CDF_q| computed EXACTLY: per-bin counts "
    "cross-multiplied (p_i·Nq − q_i·Np, BIGINT), cumulated over the "
    "20-bin spine via a tiny triangle join (j <= i — no global window, "
    "so the sweep stays inside the repo's window audit), |·| summed "
    "exactly, and ONE final double division by Np·Nq.  The bin spine "
    "is generated on both engines so empty bins count.",
    oracle=f"""
WITH src AS (
  SELECT LEAST(CAST(FLOOR(value / {EMD_WIDTH}) AS BIGINT), {EMD_BINS - 1})
           AS bin,
         event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
spine AS (SELECT b.bin FROM UNNEST(range(0, {EMD_BINS})) AS b(bin)),
cnt AS (
  SELECT spine.bin,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'click' THEN 1 END), 0)
              AS BIGINT) AS p,
         CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 END), 0)
              AS BIGINT) AS q
  FROM spine LEFT JOIN src ON src.bin = spine.bin
  GROUP BY spine.bin
),
tot AS (SELECT SUM(p) AS np, SUM(q) AS nq FROM cnt),
diff AS (
  SELECT cnt.bin, cnt.p * tot.nq - cnt.q * tot.np AS d
  FROM cnt CROSS JOIN tot
),
cum AS (
  SELECT a.bin, CAST(SUM(b.d) AS BIGINT) AS c
  FROM diff a JOIN diff b ON b.bin <= a.bin
  GROUP BY a.bin
)
SELECT CAST(tot.np AS BIGINT) AS n_click,
       CAST(tot.nq AS BIGINT) AS n_purchase,
       CAST(SUM(ABS(cum.c)) AS BIGINT) AS abs_cum_scaled,
       ROUND({EMD_WIDTH}.0 * SUM(ABS(cum.c))
             / (CAST(tot.np AS DOUBLE) * tot.nq), 6) AS emd
FROM cum CROSS JOIN tot
GROUP BY tot.np, tot.nq
""",
)
def quality_emd_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    src = ev.where(F.col("event_type").isin("click", "purchase")).select(
        F.least(
            F.floor(F.col("value") / EMD_WIDTH).cast("bigint"),
            F.lit(EMD_BINS - 1).cast("bigint"),
        ).alias("bin"),
        "event_type",
    )
    spine = spark.range(EMD_BINS).select(F.col("id").cast("bigint").alias("bin"))
    cnt = (
        spine.join(src, "bin", "left")
        .groupBy("bin")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "click", 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("p"),
            F.coalesce(
                F.sum(F.when(F.col("event_type") == "purchase", 1)), F.lit(0)
            )
            .cast("bigint")
            .alias("q"),
        )
    )
    tot = cnt.agg(F.sum("p").alias("np"), F.sum("q").alias("nq"))
    diff = cnt.crossJoin(F.broadcast(tot)).select(
        "bin", (F.col("p") * F.col("nq") - F.col("q") * F.col("np")).alias("d")
    ).localCheckpoint()  # 20 rows, reused on both sides of the triangle join
    a = diff.select(F.col("bin").alias("abin"))
    cum = (
        a.join(F.broadcast(diff), F.col("bin") <= F.col("abin"))
        .groupBy("abin")
        .agg(F.sum("d").cast("bigint").alias("c"))
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("np", "nq")
        .agg(F.sum(F.abs(F.col("c"))).cast("bigint").alias("abs_cum_scaled"))
        .select(
            F.col("np").cast("bigint").alias("n_click"),
            F.col("nq").cast("bigint").alias("n_purchase"),
            "abs_cum_scaled",
            F.round(
                F.lit(float(EMD_WIDTH))
                * F.col("abs_cum_scaled")
                / (F.col("np").cast("double") * F.col("nq")),
                6,
            ).alias("emd"),
        )
    )


# ---------------------------------------------------------------------------
# HLL set algebra: intersection via inclusion-exclusion
# ---------------------------------------------------------------------------


def _hll_intersection_oracle() -> str:
    from ..operators import sketches as SK

    m = SK.HLL_M
    alpha = f"0.7213 / (1.0 + 1.079 / {float(m)}) * {float(m)} * {float(m)}"
    return f"""
WITH h AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'A' ELSE 'B' END AS seg,
         CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),1,15)) AS BIGINT)
           % {m} AS bucket,
         CAST(('0x'||substr(md5(CAST(o_custkey AS VARCHAR)),17,12)) AS BIGINT)
           AS w,
         o_custkey
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
),
ranked AS (
  SELECT seg, bucket,
         CASE WHEN w = 0 THEN 49 ELSE 49 - length(bin(w)) END AS rank,
         o_custkey
  FROM h
),
seg_regs AS (
  SELECT seg, bucket, MAX(rank) AS maxrank FROM ranked GROUP BY 1, 2
),
u_regs AS (
  SELECT 'U' AS seg, bucket, MAX(maxrank) AS maxrank FROM seg_regs GROUP BY 2
),
regs AS (SELECT * FROM seg_regs UNION ALL SELECT * FROM u_regs),
est AS (
  SELECT seg,
         CAST({m} - COUNT(*) AS BIGINT) AS v_zero,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - maxrank))
              + ({m} - COUNT(*)) * (CAST(1 AS BIGINT) << 49)
              AS BIGINT) AS s_scaled
  FROM regs GROUP BY 1
),
std AS (
  SELECT seg,
         ROUND(CASE WHEN ({alpha} / (CAST(s_scaled AS DOUBLE)
                                     / {float(1 << 49)})) <= {2.5 * m}
                         AND v_zero > 0
                    THEN {float(m)} * LN({float(m)} / CAST(v_zero AS DOUBLE))
                    ELSE {alpha} / (CAST(s_scaled AS DOUBLE)
                                    / {float(1 << 49)}) END, 6) AS e
  FROM est
),
p AS (
  SELECT MAX(CASE WHEN seg = 'A' THEN e END) AS est_a,
         MAX(CASE WHEN seg = 'B' THEN e END) AS est_b,
         MAX(CASE WHEN seg = 'U' THEN e END) AS est_union
  FROM std
),
ex AS (
  SELECT CAST(COUNT(DISTINCT CASE WHEN seg = 'A' THEN o_custkey END)
              AS BIGINT) AS exact_a,
         CAST(COUNT(DISTINCT CASE WHEN seg = 'B' THEN o_custkey END)
              AS BIGINT) AS exact_b
  FROM ranked
),
exi AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS exact_intersection FROM (
    SELECT o_custkey FROM ranked WHERE seg = 'A'
    INTERSECT
    SELECT o_custkey FROM ranked WHERE seg = 'B'
  )
)
SELECT p.est_a, p.est_b, p.est_union,
       ROUND(p.est_a + p.est_b - p.est_union, 6) AS est_intersection,
       ex.exact_a, ex.exact_b, exi.exact_intersection
FROM p, ex, exi
"""


@register(
    "sketch_hll_intersection",
    family="agg",
    doc="HLL SET ALGEBRA on the deterministic register sketch "
    "(operators/sketches.py): distinct-customer sketches for URGENT "
    "(A) and HIGH (B) order priorities, the union sketch by bucket-wise "
    "MAX merge (never re-scanning), and |A∩B| estimated by "
    "inclusion-exclusion est(A) + est(B) − est(A∪B) — the standard "
    "sketch-only intersection (HLLs don't intersect directly; "
    "inclusion-exclusion is how audience-overlap systems do it), with "
    "the exact intersection beside it as the visible error audit.  "
    "All arithmetic on the ROUNDED per-set estimates (gotcha 14), all "
    "sketch state exact BIGINTs — fully hash-oracled like its parent "
    "sketch_hll_mergeable.",
    oracle=_hll_intersection_oracle(),
)
def sketch_hll_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators import sketches as SKo

    o = (
        table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(
            F.when(F.col("o_orderpriority") == "1-URGENT", "A")
            .otherwise("B")
            .alias("seg"),
            "o_custkey",
        )
        .localCheckpoint()  # reused: sketches + two exact audits
    )
    seg_regs = SKo.hll_registers(o, "o_custkey", ["seg"]).localCheckpoint()
    u_regs = SKo.hll_merge(seg_regs.drop("seg")).select(
        F.lit("U").alias("seg"), "bucket", "maxrank"
    )
    est = SKo.hll_estimate(seg_regs.unionByName(u_regs), ["seg"])

    def pick(s):
        return F.max(F.when(F.col("seg") == s, F.col("est_std")))

    p = est.agg(
        pick("A").alias("est_a"), pick("B").alias("est_b"),
        pick("U").alias("est_union"),
    )
    ex = o.agg(
        F.count_distinct(
            F.when(F.col("seg") == "A", F.col("o_custkey"))
        ).cast("bigint").alias("exact_a"),
        F.count_distinct(
            F.when(F.col("seg") == "B", F.col("o_custkey"))
        ).cast("bigint").alias("exact_b"),
    )
    exi = (
        o.where(F.col("seg") == "A")
        .select("o_custkey")
        .intersect(o.where(F.col("seg") == "B").select("o_custkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_intersection"))
    )
    return (
        p.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(exi))
        .select(
            "est_a", "est_b", "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 6
            ).alias("est_intersection"),
            "exact_a", "exact_b", "exact_intersection",
        )
    )


# ---------------------------------------------------------------------------
# VARIANT semi-structured battery (Spark 4 surface)
# ---------------------------------------------------------------------------


@register(
    "json_variant_battery",
    family="scalar",
    doc="Semi-structured VARIANT battery over the event props JSON — "
    "the Spark 4 path for open-schema columns (parse_json once, typed "
    "variant_get extraction, no per-field re-parse), exercised "
    "alongside the classic get_json_object path "
    "(json_extract_events): per k-decade bucket, exact counts and "
    "sums of the extracted BIGINT, plus missing-path extractions "
    "proving NULL semantics match the JSON tier.  DuckDB twin uses "
    "json_extract — the cross-engine contract is on the extracted "
    "VALUES, which is exactly what a storage-format-agnostic pipeline "
    "needs.",
    oracle="""
SELECT CAST(CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS BIGINT)
         AS k_decade,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(SUM(CASE WHEN json_extract(props, '$.missing') IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
FROM events
GROUP BY 1
""",
)
def json_variant_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    v = ev.select(F.parse_json("props").alias("v"))
    k = F.variant_get(F.col("v"), "$.k", "bigint")
    return (
        v.select(
            F.floor(k / 10).cast("bigint").alias("k_decade"),
            k.alias("k"),
            F.variant_get(F.col("v"), "$.missing", "string").alias("miss"),
        )
        .groupBy("k_decade")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("k").cast("bigint").alias("k_sum"),
            F.sum(F.when(F.col("miss").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_missing"),
        )
    )


# ---------------------------------------------------------------------------
# Pure spark.sql() surface: textual SQL end to end
# ---------------------------------------------------------------------------


@register(
    "sql_surface_topk_months",
    family="window",
    doc="Pure TEXTUAL SQL through spark.sql() — temp view + CTE + "
    "window rank + subquery filter, zero DataFrame operators — "
    "proving the engine's SQL front end end-to-end (every other "
    "registered query builds plans through the DataFrame API; a "
    "migrating user gets both).  Top-2 revenue months per return flag "
    "with exact DECIMAL revenue and full tie-breaks.",
    oracle="""
WITH m AS (
  SELECT l_returnflag, strftime(CAST(l_shipdate AS DATE), '%Y-%m') AS month,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem GROUP BY 1, 2
),
r AS (
  SELECT l_returnflag, month, revenue,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY revenue DESC, month ASC) AS rk
  FROM m
)
SELECT l_returnflag, month, ROUND(revenue, 6) AS revenue, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 2
""",
)
def sql_surface_topk_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
WITH m AS (
  SELECT l_returnflag, date_format(l_shipdate, 'yyyy-MM') AS month,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem_v GROUP BY 1, 2
),
r AS (
  SELECT l_returnflag, month, revenue,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY revenue DESC, month ASC) AS rk
  FROM m
)
SELECT l_returnflag, month, ROUND(revenue, 6) AS revenue, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 2
"""
    )


# ---------------------------------------------------------------------------
# Sentence segmentation stats
# ---------------------------------------------------------------------------


@register(
    "text_sentence_stats",
    family="text",
    doc="Regex sentence segmentation ([.!?]+ terminators, trimmed, "
    "empties dropped — the pre-tokenization segmentation pass every "
    "text pipeline runs before per-sentence models) with per-language "
    "rollups: documents, sentences, sentences per doc, exact mean and "
    "max sentence length in characters.  Lengths are exact BIGINTs; "
    "one scan, one explode bounded by per-doc sentence count, one "
    "aggregate.  Same regex class on both engines (Java regex == RE2 "
    "for this pattern).",
    oracle="""
WITH s AS (
  SELECT lang, TRIM(piece) AS sent
  FROM documents, UNNEST(string_split_regex(text, '[.!?]+')) AS u(piece)
  WHERE TRIM(piece) <> ''
),
per AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sentences,
         CAST(SUM(LENGTH(sent)) AS BIGINT) AS chars_sum,
         CAST(MAX(LENGTH(sent)) AS INT) AS max_chars
  FROM s GROUP BY lang
),
d AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang)
SELECT d.lang, d.n_docs, per.n_sentences,
       ROUND(CAST(per.n_sentences AS DOUBLE) / d.n_docs, 6)
         AS sentences_per_doc,
       ROUND(CAST(per.chars_sum AS DOUBLE) / per.n_sentences, 6)
         AS mean_sentence_chars,
       per.max_chars
FROM d JOIN per ON per.lang = d.lang
""",
)
def text_sentence_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents")
    s = (
        doc.select(
            "lang", F.explode(F.split("text", r"[.!?]+")).alias("piece")
        )
        .select("lang", F.trim("piece").alias("sent"))
        .where(F.col("sent") != "")
    )
    per = s.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sentences"),
        F.sum(F.length("sent")).cast("bigint").alias("chars_sum"),
        F.max(F.length("sent")).cast("int").alias("max_chars"),
    )
    d = doc.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    return d.join(per, "lang").select(
        "lang",
        "n_docs",
        "n_sentences",
        F.round(F.col("n_sentences").cast("double") / F.col("n_docs"), 6).alias(
            "sentences_per_doc"
        ),
        F.round(F.col("chars_sum").cast("double") / F.col("n_sentences"), 6).alias(
            "mean_sentence_chars"
        ),
        "max_chars",
    )


# ---------------------------------------------------------------------------
# DBSCAN density clustering composed from the grid epsilon-join + CC
# ---------------------------------------------------------------------------

DB_EPS = 0.8
DB_MINPTS = 5


@register(
    "cluster_dbscan_grid",
    family="dedup",
    doc="DBSCAN density clustering COMPOSED from this repo's scale "
    "primitives: the grid-bucketed ε-join (3×3 cell replication — "
    "candidate counts bounded by cell occupancy) supplies each "
    "purchase point's ε-neighborhood count, core points (|N_ε| ≥ 5 "
    "incl. self) connect through ε-edges, clusters come from "
    "distributed connected components (operators/components.py "
    "min-label + pointer jumping), and border points take the MINIMUM "
    "cluster id among their core neighbors — the deterministic "
    "variant of DBSCAN's order-dependent border assignment (documented "
    "divergence; core/noise sets are exactly DBSCAN's).  Output: one "
    "row per cluster (id = min core point id) with core/border/size, "
    "plus the noise row (cluster_id = -1).  The oracle replays the "
    "naive all-pairs neighborhood + recursive-CTE closure — equality "
    "proves the grid candidates AND the distributed CC agree with the "
    "textbook definition.",
    oracle=f"""
WITH RECURSIVE p AS (
  SELECT event_id, value AS x,
         EXTRACT(hour FROM ts) + EXTRACT(minute FROM ts) / 60.0 AS y
  FROM events WHERE event_type = 'purchase'
),
nbp AS (
  SELECT a.event_id AS id_q, b.event_id AS id_n
  FROM p a JOIN p b ON a.event_id <> b.event_id
  WHERE ABS(a.x - b.x) < {DB_EPS} AND ABS(a.y - b.y) < {DB_EPS}
),
nb AS (SELECT id_q, COUNT(*) AS n FROM nbp GROUP BY id_q),
core AS (SELECT id_q AS id FROM nb WHERE n + 1 >= {DB_MINPTS}),
ce AS (
  SELECT e.id_q AS s, e.id_n AS t FROM nbp e
  JOIN core ca ON ca.id = e.id_q JOIN core cb ON cb.id = e.id_n
),
reach(node, lbl) AS (
  SELECT id, id FROM core
  UNION
  SELECT e.t, r.lbl FROM reach r JOIN ce e ON e.s = r.node
),
core_lab AS (SELECT node AS id, MIN(lbl) AS cluster FROM reach GROUP BY node),
border_lab AS (
  SELECT e.id_q AS id, MIN(c.cluster) AS cluster
  FROM nbp e JOIN core_lab c ON c.id = e.id_n
  WHERE NOT EXISTS (SELECT 1 FROM core WHERE core.id = e.id_q)
  GROUP BY e.id_q
),
cl AS (
  SELECT cluster,
         CAST(SUM(is_core) AS BIGINT) AS n_core,
         CAST(SUM(1 - is_core) AS BIGINT) AS n_border,
         CAST(COUNT(*) AS BIGINT) AS size
  FROM (
    SELECT cluster, 1 AS is_core FROM core_lab
    UNION ALL
    SELECT cluster, 0 FROM border_lab
  ) GROUP BY cluster
),
noise AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p
  WHERE NOT EXISTS (SELECT 1 FROM core_lab WHERE core_lab.id = p.event_id)
    AND NOT EXISTS (SELECT 1 FROM border_lab WHERE border_lab.id = p.event_id)
)
SELECT CAST(cluster AS BIGINT) AS cluster_id, n_core, n_border, size FROM cl
UNION ALL
SELECT -1, 0, 0, n FROM noise
""",
)
def cluster_dbscan_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.components import connected_components

    ev = table(spark, sf_dir, "events")
    p = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            F.col("value").alias("x"),
            (F.hour("ts") + F.minute("ts") / F.lit(60.0)).alias("y"),
        )
        .localCheckpoint()  # reused: both join sides + the noise audit
    )
    cx, cy = F.floor(F.col("x") / DB_EPS), F.floor(F.col("y") / DB_EPS)
    q = p.select(
        F.col("event_id").alias("id_q"),
        F.col("x").alias("xq"),
        F.col("y").alias("yq"),
        F.explode(
            F.array(
                *[
                    F.struct((cx + dx).alias("gx"), (cy + dy).alias("gy"))
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("cell"),
    ).select("id_q", "xq", "yq", F.col("cell.gx").alias("gx"), F.col("cell.gy").alias("gy"))
    n = p.select(
        F.col("event_id").alias("id_n"),
        F.col("x").alias("xn"),
        F.col("y").alias("yn"),
        cx.alias("gx"),
        cy.alias("gy"),
    )
    nbp = (
        q.join(n, ["gx", "gy"])
        .where(F.col("id_q") != F.col("id_n"))
        .where(
            (F.abs(F.col("xq") - F.col("xn")) < DB_EPS)
            & (F.abs(F.col("yq") - F.col("yn")) < DB_EPS)
        )
        .select("id_q", "id_n")
        .localCheckpoint()  # reused: counts, core edges, border labels
    )
    nb = nbp.groupBy("id_q").agg(F.count(F.lit(1)).alias("n"))
    core = nb.where(F.col("n") + 1 >= DB_MINPTS).select(F.col("id_q").alias("id"))
    ce = (
        nbp.join(core.withColumnRenamed("id", "id_q"), "id_q")
        .join(core.withColumnRenamed("id", "id_n"), "id_n")
        .select(F.col("id_q").alias("src"), F.col("id_n").alias("dst"))
    )
    comp = connected_components(ce)
    core_lab = (
        core.join(comp, core["id"] == comp["node"], "left")
        .select("id", F.coalesce(F.col("component"), F.col("id")).alias("cluster"))
        .localCheckpoint()  # reused: border labels + per-cluster rollup
    )
    border_lab = (
        nbp.join(core_lab.withColumnRenamed("id", "id_n"), "id_n")
        .join(core.withColumnRenamed("id", "id_q"), "id_q", "left_anti")
        .groupBy(F.col("id_q").alias("id"))
        .agg(F.min("cluster").alias("cluster"))
    )
    labeled = core_lab.select("id", "cluster", F.lit(1).alias("is_core")).unionByName(
        border_lab.select("id", "cluster", F.lit(0).alias("is_core"))
    ).localCheckpoint()  # reused: cluster rollup + noise anti-join
    cl = labeled.groupBy("cluster").agg(
        F.sum("is_core").cast("bigint").alias("n_core"),
        F.sum(F.lit(1) - F.col("is_core")).cast("bigint").alias("n_border"),
        F.count(F.lit(1)).cast("bigint").alias("size"),
    )
    noise = (
        p.join(labeled.select(F.col("id").alias("event_id")), "event_id", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.lit(-1).cast("bigint").alias("cluster_id"),
            F.lit(0).cast("bigint").alias("n_core"),
            F.lit(0).cast("bigint").alias("n_border"),
            F.col("n").alias("size"),
        )
    )
    return cl.select(
        F.col("cluster").cast("bigint").alias("cluster_id"),
        "n_core",
        "n_border",
        "size",
    ).unionByName(noise)


# ---------------------------------------------------------------------------
# Cohen's kappa inter-rater agreement
# ---------------------------------------------------------------------------


@register(
    "quality_cohens_kappa",
    family="drift",
    doc="Cohen's kappa agreement between two deterministic document "
    "raters — the chance-corrected agreement statistic every "
    "labeling/curation pipeline reports when two heuristics (or "
    "annotators, or model versions) vote on the same corpus: rater A "
    "flags long documents (n_chars >= 500), rater B flags documents "
    "whose space density >= 0.15 (ROUND first, then compare — gotcha "
    "14), kappa = (po - pe) / (1 - pe) from the exact 2x2 counts, per "
    "language.  One scan, one 2x2-per-lang aggregate, identical "
    "closing arithmetic.",
    oracle="""
WITH r AS (
  SELECT lang,
         CASE WHEN n_chars >= 500 THEN 1 ELSE 0 END AS a,
         CASE WHEN ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                         / CAST(LENGTH(text) AS DOUBLE), 6) >= 0.15
              THEN 1 ELSE 0 END AS b
  FROM documents WHERE LENGTH(text) > 0
),
c AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(a * b) AS BIGINT) AS n11,
         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n00,
         CAST(SUM(a) AS BIGINT) AS ra,
         CAST(SUM(b) AS BIGINT) AS rb
  FROM r GROUP BY lang
)
SELECT lang, n, n11, n00,
       ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS po,
       ROUND((ra * rb + (n - ra) * (n - rb))
             / (CAST(n AS DOUBLE) * n), 6) AS pe,
       ROUND(((n11 + n00) / CAST(n AS DOUBLE)
              - (ra * rb + (n - ra) * (n - rb)) / (CAST(n AS DOUBLE) * n))
             / (1.0 - (ra * rb + (n - ra) * (n - rb))
                      / (CAST(n AS DOUBLE) * n)), 6) AS kappa
FROM c
""",
)
def quality_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    doc = table(spark, sf_dir, "documents").where(F.length("text") > 0)
    a = F.when(F.col("n_chars") >= 500, 1).otherwise(0)
    b = F.when(
        F.round(
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))))
            / F.length("text").cast("double"),
            6,
        )
        >= 0.15,
        1,
    ).otherwise(0)
    c = doc.select("lang", a.alias("a"), b.alias("b")).groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("a") * F.col("b")).cast("bigint").alias("n11"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).cast("bigint").alias("n00"),
        F.sum("a").cast("bigint").alias("ra"),
        F.sum("b").cast("bigint").alias("rb"),
    )
    po = (F.col("n11") + F.col("n00")) / F.col("n").cast("double")
    pe = (
        F.col("ra") * F.col("rb") + (F.col("n") - F.col("ra")) * (F.col("n") - F.col("rb"))
    ) / (F.col("n").cast("double") * F.col("n"))
    return c.select(
        "lang",
        "n",
        "n11",
        "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (F.lit(1.0) - pe), 6).alias("kappa"),
    )


# ---------------------------------------------------------------------------
# Max drawdown of the cumulative daily revenue series
# ---------------------------------------------------------------------------


@register(
    "events_max_drawdown",
    family="events",
    doc="Maximum drawdown of the cumulative daily purchase-revenue "
    "series — the running-peak-to-trough drop (the financial risk "
    "statistic, and the same max-subarray algebra as burst/regression "
    "detection): daily exact-DECIMAL revenue, cumulative sums over the "
    "bounded ~30-day calendar via a broadcast TRIANGLE join (i <= j — "
    "the repo's no-global-window discipline for day-domain prefix "
    "sums; at an unbounded horizon this runs through "
    "operators/prefix_sum.py), then the peak/trough pair maximizing "
    "cum_i − cum_j over i < j with full date tie-breaks.  Every "
    "intermediate is an exact DECIMAL; one final DOUBLE cast.",
    oracle="""
WITH d AS (
  SELECT CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value, 6) AS DECIMAL(18,6))) AS rev
  FROM events WHERE event_type = 'purchase' GROUP BY 1
),
cum AS (
  SELECT a.day, CAST(SUM(b.rev) AS DECIMAL(28,6)) AS c
  FROM d a JOIN d b ON b.day <= a.day GROUP BY a.day
),
dd AS (
  SELECT p.day AS peak_day, t.day AS trough_day,
         CAST(p.c - t.c AS DOUBLE) AS drawdown
  FROM cum p JOIN cum t ON p.day < t.day
)
SELECT strftime(peak_day, '%Y-%m-%d') AS peak_day,
       strftime(trough_day, '%Y-%m-%d') AS trough_day,
       ROUND(drawdown, 6) AS max_drawdown,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_days
FROM dd
ORDER BY drawdown DESC, peak_day ASC, trough_day ASC
LIMIT 1
""",
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round("value", 6).cast("decimal(18,6)")).alias("rev"))
        .localCheckpoint()  # ~30 rows, reused on both triangle sides + count
    )
    a = d.select(F.col("day").alias("aday"))
    cum = (
        a.join(F.broadcast(d), F.col("day") <= F.col("aday"))
        .groupBy("aday")
        .agg(F.sum("rev").cast("decimal(28,6)").alias("c"))
        .localCheckpoint()  # both sides of the drawdown pair join
    )
    p = cum.select(F.col("aday").alias("peak_day"), F.col("c").alias("pc"))
    t = cum.select(F.col("aday").alias("trough_day"), F.col("c").alias("tc"))
    n = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    return (
        p.join(F.broadcast(t), F.col("peak_day") < F.col("trough_day"))
        .select(
            F.date_format("peak_day", "yyyy-MM-dd").alias("peak_day"),
            F.date_format("trough_day", "yyyy-MM-dd").alias("trough_day"),
            F.round((F.col("pc") - F.col("tc")).cast("double"), 6).alias(
                "max_drawdown"
            ),
        )
        .orderBy(
            F.col("max_drawdown").desc(),
            F.col("peak_day").asc(),
            F.col("trough_day").asc(),
        )
        .limit(1)
        .crossJoin(F.broadcast(n))
    )


# ---------------------------------------------------------------------------
# GIF pixel stats over the real LZW decode path
# ---------------------------------------------------------------------------


@register(
    "multimodal_gif_pixel_stats",
    family="multimodal",
    doc="Integer pixel statistics over the REAL GIF decode path "
    "(operators/gif.py — GIF87a with variable-width LSB-first LZW, "
    "CLEAR/EOI codes, 12-bit table cap with reset, sub-block framing, "
    "256-gray palette where index == luma): the fourth honest image "
    "codec beside PNG/JPEG/MJPEG.  GIF is lossless, so the oracle "
    "recomputes every decoded pixel from the closed-form fixture "
    "(pixel(x,y) = (id·5 + 7x + 11y) mod 256) — drift in bit packing, "
    "code-width bumps or sub-block reassembly breaks the hash.  "
    "Grouped per dimension class; blobs never leave the executor.",
    oracle="""
WITH dims AS (
  SELECT doc_id, doc_id % 20 + 4 AS w, doc_id % 12 + 4 AS h FROM documents
),
px AS (
  SELECT doc_id, w, h,
         (doc_id * 5 + 7 * xs.x + 11 * ys.y) % 256 AS v
  FROM dims, UNNEST(range(0, w)) AS xs(x), UNNEST(range(0, h)) AS ys(y)
),
per AS (
  SELECT doc_id, w, h,
         CAST(SUM(v) AS BIGINT) AS s, MIN(v) AS mn, MAX(v) AS mx
  FROM px GROUP BY 1, 2, 3
)
SELECT CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       CAST(SUM(s) AS BIGINT) AS px_sum,
       CAST(MIN(mn) AS INT) AS px_min,
       CAST(MAX(mx) AS INT) AS px_max
FROM per GROUP BY 1, 2
""",
)
def multimodal_gif_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.gif import gif_pixel_stats, synthesize_gif_media

    d = table(spark, sf_dir, "documents")
    stats = gif_pixel_stats(synthesize_gif_media(d.select("doc_id")))
    return stats.groupBy(
        F.col("width").cast("int").alias("width"),
        F.col("height").cast("int").alias("height"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("px_sum").cast("bigint").alias("px_sum"),
        F.min("px_min").cast("int").alias("px_min"),
        F.max("px_max").cast("int").alias("px_max"),
    )


# ---------------------------------------------------------------------------
# Tolerance-bounded as-of join
# ---------------------------------------------------------------------------


@register(
    "join_asof_tolerance",
    family="join",
    doc="Backward as-of join with a TOLERANCE bound "
    "(operators/asof_join.py tolerance param — completes pd.merge_asof "
    "parity: direction x tolerance, hypothesis-tested against pandas "
    "in tests/test_mining_properties.py): each click matches the "
    "user's latest preceding purchase ONLY if it is within 1 hour — "
    "matches farther away are nulled, not replaced (the deadline "
    "semantics attribution and feature-freshness joins need).  Oracle "
    "is the correlated bounded-window maximum.  Output: matched vs "
    "unmatched counts and the exact mean match age in seconds.",
    oracle="""
WITH l AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
r0 AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
),
r AS (
  SELECT user_id, ts FROM (
    SELECT r0.*, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                    ORDER BY event_id DESC) AS rn
    FROM r0
  ) WHERE rn = 1
),
m AS (
  SELECT l.user_id, l.ts,
         (SELECT MAX(r.ts) FROM r
          WHERE r.user_id = l.user_id AND r.ts <= l.ts
            AND r.ts >= l.ts - INTERVAL 1 HOUR) AS mts
  FROM l
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(COUNT(mts) AS BIGINT) AS n_matched,
       ROUND(CAST(SUM(date_diff('microsecond', mts, ts)) AS DOUBLE)
             / COUNT(mts) / 1000000.0, 6) AS mean_age_sec
FROM m
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.asof_join import asof_join

    ev = table(spark, sf_dir, "events")
    left = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    right = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", "ts", "event_id")
        .withColumn("mts", F.col("ts"))
    )
    m = asof_join(
        left, right, key="user_id", ts="ts", right_order="event_id",
        value_cols=["mts"], direction="backward",
        tolerance="INTERVAL 1 HOUR",
    )
    return m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clicks"),
        F.count("mts").cast("bigint").alias("n_matched"),
        F.round(
            F.sum(F.expr("timestampdiff(MICROSECOND, mts, ts)")).cast("double")
            / F.count("mts")
            / F.lit(1000000.0),
            6,
        ).alias("mean_age_sec"),
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "graph_assortativity",
    family="graph",
    doc="Degree assortativity (Newman's r) of the part co-purchase "
    "graph — the Pearson correlation of endpoint degrees over the "
    "DIRECTED edge list (each undirected edge counted both ways, the "
    "standard symmetrization): positive r = hubs prefer hubs "
    "(social-network-like), negative = hubs prefer leaves "
    "(dependency/star-like) — a one-number structural fingerprint "
    "alongside the degree power-law and clustering coefficient "
    "queries.  Degrees are exact BIGINTs from one aggregate, the "
    "correlation follows agg_corr_manual's exact-decimal-moment "
    "discipline (sums as DECIMAL, one identical double expression).",
    oracle=f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
  WHERE l_orderkey < 1000
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM adj GROUP BY u),
ed AS (
  SELECT du.d AS x, dv.d AS y
  FROM adj JOIN deg du ON du.u = adj.u JOIN deg dv ON dv.u = adj.v
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(28,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(x AS DECIMAL(28,0)) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(x AS DECIMAL(28,0)) * x) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(y AS DECIMAL(28,0)) * y) AS DOUBLE) AS syy
  FROM ed
)
SELECT n,
       ROUND((n * sxy - sx * sy)
             / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 6)
         AS assortativity
FROM m
""",
)
def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        table(spark, sf_dir, "lineitem")
        .where(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("a"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("b"))
    e = (
        a.join(b, (a["ok"] == b["ok"]) & (F.col("a") < F.col("b")))
        .select("a", "b")
        .distinct()
    )
    adj = e.select(F.col("a").alias("u"), F.col("b").alias("v")).unionAll(
        e.select(F.col("b").alias("u"), F.col("a").alias("v"))
    ).localCheckpoint()  # reused: degree aggregate + edge-degree join
    deg = adj.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    du = deg.select(F.col("u").alias("ju"), F.col("d").alias("x"))
    dv = deg.select(F.col("u").alias("jv"), F.col("d").alias("y"))
    ed = (
        adj.join(du, adj["u"] == du["ju"])
        .join(dv, adj["v"] == dv["jv"])
        .select("x", "y")
    )
    dec = lambda c: F.col(c).cast("decimal(28,0)")
    m = ed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(dec("x")).cast("double").alias("sx"),
        F.sum(dec("y")).cast("double").alias("sy"),
        F.sum(dec("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(dec("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(dec("y") * F.col("y")).cast("double").alias("syy"),
    )
    return m.select(
        "n",
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (
                F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            6,
        ).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# Delta-method variance of a ratio metric
# ---------------------------------------------------------------------------


@register(
    "quality_ratio_delta_method",
    family="drift",
    doc="Delta-method standard error of a RATIO metric — revenue per "
    "active day per user — the experimentation-platform statistic for "
    "metrics that are ratios of two per-unit quantities (naive "
    "per-row variance is wrong because numerator and denominator "
    "covary per user): per-user x = exact purchase revenue, y = "
    "active days; ratio = X̄/Ȳ; Var ≈ (sx² /ȳ² − 2·x̄·sxy/ȳ³ + "
    "x̄²·sy²/ȳ⁴)/n from exact DECIMAL cross-moments (population "
    "variances), one identical closing expression tree.  One scan, "
    "one per-user aggregate, one moment aggregate.",
    oracle="""
WITH u AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN event_type = 'purchase'
                       THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                       ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) AS x,
         CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS y
  FROM events GROUP BY user_id
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6))) AS DOUBLE) AS sx,
         CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x, 6) AS DECIMAL(18,6)) * y) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
         CAST(SUM(y * y) AS DOUBLE) AS syy
  FROM u
),
d AS (
  SELECT n, sx / n AS mx, sy / n AS my,
         sxx / n - (sx / n) * (sx / n) AS vx,
         syy / n - (sy / n) * (sy / n) AS vy,
         sxy / n - (sx / n) * (sy / n) AS cxy
  FROM m
)
SELECT n,
       ROUND(mx / my, 6) AS ratio,
       ROUND((vx / (my * my)
              - 2.0 * mx * cxy / (my * my * my)
              + mx * mx * vy / (my * my * my * my)) / n, 6) AS var_delta,
       ROUND(SQRT((vx / (my * my)
              - 2.0 * mx * cxy / (my * my * my)
              + mx * mx * vy / (my * my * my * my)) / n), 6) AS se_delta
FROM d
""",
)
def quality_ratio_delta_method(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round("value", 6).cast("decimal(18,6)"),
            ).otherwise(F.lit(0).cast("decimal(18,6)"))
        )
        .cast("double")
        .alias("x"),
        F.count_distinct(F.to_date("ts")).cast("bigint").alias("y"),
    )
    m = u.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.round("x", 6).cast("decimal(18,6)")).cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.round("x", 6).cast("decimal(18,6)") * F.col("y"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 6).cast("decimal(28,6)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    mx, my = F.col("sx") / F.col("n"), F.col("sy") / F.col("n")
    d = m.select(
        "n",
        mx.alias("mx"),
        my.alias("my"),
        (F.col("sxx") / F.col("n") - mx * mx).alias("vx"),
        (F.col("syy") / F.col("n") - my * my).alias("vy"),
        (F.col("sxy") / F.col("n") - mx * my).alias("cxy"),
    )
    var = (
        F.col("vx") / (F.col("my") * F.col("my"))
        - F.lit(2.0) * F.col("mx") * F.col("cxy")
        / (F.col("my") * F.col("my") * F.col("my"))
        + F.col("mx") * F.col("mx") * F.col("vy")
        / (F.col("my") * F.col("my") * F.col("my") * F.col("my"))
    ) / F.col("n")
    return d.select(
        "n",
        F.round(F.col("mx") / F.col("my"), 6).alias("ratio"),
        F.round(var, 6).alias("var_delta"),
        F.round(F.sqrt(var), 6).alias("se_delta"),
    )


# ---------------------------------------------------------------------------
# Fano-factor overdispersion of daily event counts
# ---------------------------------------------------------------------------


@register(
    "events_fano_overdispersion",
    family="events",
    doc="Fano factor (variance-to-mean ratio) of the DAILY COUNT "
    "process per event type — the overdispersion test against the "
    "Poisson null (F = 1): F >> 1 means bursty arrivals (incidents, "
    "bot storms), F < 1 means regularized traffic (rate limiting at "
    "work) — the count-process companion to text_burstiness_"
    "dispersion's term-frequency variant.  Daily counts come off the "
    "calendar spine derived from the data's own min/max day "
    "(broadcast), so zero-event days count; population variance from "
    "exact BIGINT moments, one identical closing expression.",
    oracle="""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT CAST(datediff('day', MIN(day), MAX(day)) + 1 AS BIGINT) AS n_days
  FROM d
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_active,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(c * c) AS BIGINT) AS s2
  FROM d GROUP BY 1
)
SELECT event_type, span.n_days, n_active, s1 AS n_events,
       ROUND(CAST(s1 AS DOUBLE) / span.n_days, 6) AS mean_daily,
       ROUND((CAST(s2 AS DOUBLE) / span.n_days
              - (CAST(s1 AS DOUBLE) / span.n_days)
                * (CAST(s1 AS DOUBLE) / span.n_days))
             / (CAST(s1 AS DOUBLE) / span.n_days), 6) AS fano
FROM m CROSS JOIN span
""",
)
def events_fano_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    d = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint()  # reused: span scalar + per-type moments
    span = d.agg(
        (F.datediff(F.max("day"), F.min("day")) + 1).cast("bigint").alias("n_days")
    )
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active"),
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_days")
    return m.crossJoin(F.broadcast(span)).select(
        "event_type",
        "n_days",
        "n_active",
        F.col("s1").alias("n_events"),
        F.round(mean, 6).alias("mean_daily"),
        F.round(
            (F.col("s2").cast("double") / F.col("n_days") - mean * mean) / mean, 6
        ).alias("fano"),
    )
