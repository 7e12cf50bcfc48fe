"""Connected components over a candidate-pair edge list (dedup clustering).

Near-dup pair generators (``operators.dedup.minhash_lsh_pairs``,
``simhash_near_pairs``, the cosine-LSH pair query) emit *pairs*; a
production dedup pass needs *clusters* — every document mapped to a
canonical component id so exactly one survivor per near-dup group can
be elected.  Pairs → clusters is transitive closure, i.e. graph
connected components.

Algorithm: iterative min-label propagation with pointer jumping
(path compression), the DataFrame rendering of the alternating-
algorithm family (Kiveris et al., "Connected Components in MapReduce
and Beyond", SoCC'14).  Per round every node takes the minimum label
in its closed neighborhood, then labels are compressed one hop
(``L(v) := L(L(v))``), cutting convergence from O(diameter) to
O(log diameter) rounds.  Each round is two equi-joins that shuffle on
node id — no ``collect_set`` of neighborhoods, so a giant star (one
hub with 10^9 spokes) never materializes a single huge row.  Lineage
is cut per round with ``localCheckpoint`` (same pattern as
``operators/ivf.py``: without it round N's plan re-executes rounds
1..N-1); on a real cluster swap for reliable ``checkpoint()`` so
executor loss cannot lose the round state.

The reference has no graph operators at all — this extends the engine
for the LLM-dedup pipeline the brief makes first-class.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, Window

from .lineage import cut_lineage

# Symmetrized edge count that comfortably solves inside ONE executor
# task (~32 bytes/edge → ~64 MB at the bound; union-find over it is
# well under a second) — the same Lattanzi et al. (SPAA'11) filtering
# budget as mst.LOCAL_FINISH_MAX / scc.SCC_LOCAL_FINISH_MAX.
CC_LOCAL_FINISH_MAX = 2_000_000


def union_find_local(sym_edges: DataFrame) -> DataFrame:
    """Single-task union-find over an edge set that fits one executor —
    the filtering endgame shared with ``mst.kruskal_local`` and
    ``scc.tarjan_local``: component labels are algorithm-independent
    (min member id), so the output is bit-identical to the pointer-
    jumping fixpoint (tests/test_dedup_clusters.py parity) while paying
    ONE Arrow batch instead of O(log diameter) sequential join rounds ×
    per-job latency.  Input: (src, dst) rows (symmetry not required);
    output: (node, component)."""
    import pandas as pd

    def finish(pdf: "pd.DataFrame") -> "pd.DataFrame":
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for s, d in zip(pdf["src"], pdf["dst"]):
            rs, rd = find(int(s)), find(int(d))
            if rs != rd:
                parent[max(rs, rd)] = min(rs, rd)
        nodes = set(int(v) for v in pdf["src"]) | set(
            int(v) for v in pdf["dst"]
        )
        out_n = sorted(nodes)
        return pd.DataFrame(
            {"node": out_n, "component": [find(n) for n in out_n]}
        )

    return (
        sym_edges.select("src", "dst")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(lambda pdf: finish(pdf), "node long, component long")
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    local_finish_max: int = CC_LOCAL_FINISH_MAX,
) -> DataFrame:
    """(node BIGINT, component BIGINT) — component is the min node id
    reachable from ``node`` over the undirected edge set.

    When the symmetrized edge count (measured off the observe that
    rides the materialization anyway) fits ``local_finish_max``, the
    closure runs as ONE single-task union-find batch
    (``union_find_local`` — identical labels); otherwise the
    distributed pointer-jumping fixpoint runs, and raises
    ``RuntimeError`` if not converged within ``max_iter`` rounds
    (pointer jumping needs ~log2(diameter) rounds, so 25 covers any
    graph with diameter < 2^25 — in practice every dedup graph).
    Pass ``local_finish_max=0`` to force the distributed path (tests
    do, for parity coverage).
    """
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    ).where(
        F.col("src").isNotNull()
        & F.col("dst").isNotNull()
        & (F.col("src") != F.col("dst"))
    )
    # Materialize the symmetrized edge list ONCE: every propagation round
    # joins against it, and without the checkpoint each round would
    # re-execute the upstream candidate-generation pipeline (at scale:
    # re-running MinHash/LSH per iteration).  On a cluster, persist or
    # reliable-checkpoint instead.
    obs0 = Observation()
    sym = (
        e.unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    if (obs0.get["n"] or 0) <= local_finish_max:
        return union_find_local(sym)
    # Convergence probe: labels only ever decrease, so sum(comp) strictly
    # decreases until the fixpoint.  The probe RIDES each round's
    # checkpoint via observe (the scc.py fusion — a dedicated per-round
    # aggregate job would double the round's job count for a scalar the
    # materialization pass can compute for free).
    # Summed as decimal(38,0): a BIGINT sum over huge node ids can wrap
    # (non-ANSI Spark), and a wrapped sum equal to prev_sum would falsely
    # report convergence.
    _probe = F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
    obs1 = Observation()
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .observe(obs1, _probe)
        .transform(cut_lineage)
    )
    prev_sum = obs1.get["s"]
    for _ in range(max_iter):
        # 1. propagate: every node offers its label to each neighbor
        msgs = sym.join(labels, sym["src"] == labels["node"]).select(
            F.col("dst").alias("node"), F.col("comp")
        )
        new = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # 2. pointer jump: comp := label(comp).  Labels only ever
        # decrease and label(c) <= c, so least() == the jumped label.
        jump = new.select(
            F.col("node").alias("comp"), F.col("comp").alias("comp_jump")
        )
        obs = Observation()
        new = (
            new.join(jump, "comp", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("comp_jump"), F.col("comp"))
                ).alias("comp"),
            )
            .observe(obs, _probe)
            .transform(cut_lineage)
        )
        labels = new
        cur_sum = obs.get["s"]
        if cur_sum == prev_sum:
            return labels.select("node", F.col("comp").alias("component"))
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components: no convergence in {max_iter} rounds")


def dedup_clusters(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) from near-dup pairs.

    ``nodes`` (optional, one ``id_col`` column) is the document
    universe: ids appearing in no pair become singleton clusters of
    themselves — so the output is a total assignment usable directly
    for survivor election (``min(doc_id) per cluster_id`` keeps one
    canonical copy per group).
    """
    comp = connected_components(pairs, src=src, dst=dst)
    if nodes is None:
        base = comp.select(F.col("node").alias(id_col), "component")
    else:
        base = nodes.select(F.col(id_col).cast("long").alias(id_col)).join(
            comp, F.col(id_col) == F.col("node"), "left"
        ).select(id_col, "component")
    out = base.select(
        id_col, F.coalesce("component", F.col(id_col)).alias("cluster_id")
    )
    return out.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    )


def elect_survivors(
    pairs: DataFrame,
    nodes: DataFrame | None = None,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_col: str = "doc_id",
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Survivor election: near-dup pairs → one kept document per cluster.

    Composes ``dedup_clusters`` (the partition of the near-dup graph)
    with ``operators.pagerank`` (the ordering inside each part): for
    every cluster of size ≥ 2 the survivor is the member with the
    highest PageRank on the symmetrized pair graph — the document most
    other near-dups point at — with ties broken by min ``id_col``
    (deterministic; ranks are compared rounded to 6, matching the
    centrality query's surfaced precision).  Singleton clusters are
    excluded: with no duplicate to drop there is no election to run.

    Returns (cluster_id, cluster_size, survivor_doc_id,
    survivor_pagerank, n_dropped).

    Scale shape: clusters ⋈ ranks is one doc_id-keyed equi-join; the
    election itself is a single struct-max aggregate keyed on
    cluster_id — no per-cluster window, no driver-side loop.  Both
    inputs reuse the same symmetrized edge list.
    """
    from .pagerank import pagerank

    # materialize the pair list ONCE: both consumers (components, PageRank)
    # checkpoint their own derived edge lists, and without this the
    # candidate-generation pipeline upstream (e.g. MinHash/LSH or a shingle
    # self-join) would re-execute for each
    pairs = pairs.transform(cut_lineage)
    # cluster sizes come from the pair-connected node set alone: the
    # election filters to cluster_size >= 2, and a node outside every
    # pair can only ever be a singleton — so the former corpus-sized
    # left join + corpus-wide size window (dedup_clusters over the full
    # ``nodes`` universe) bought nothing here.  ``nodes`` still scopes
    # membership (pair endpoints outside the universe stay excluded,
    # exactly as the left-join form excluded them), but as an inner
    # join whose output is comp-sized — the corpus never shuffles and
    # the size window's input is the pair-connected set (guide §2.4).
    comp = connected_components(pairs, src=src, dst=dst)
    if nodes is None:
        base = comp.select(
            F.col("node").alias(id_col), F.col("component").alias("cluster_id")
        )
    else:
        base = (
            nodes.select(F.col(id_col).cast("long").alias(id_col))
            .join(comp, F.col(id_col) == F.col("node"))
            .select(id_col, F.col("component").alias("cluster_id"))
        )
    clusters = base.withColumn(
        "cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id"))
    )
    edges = pairs.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, iters=iters, damping=damping).select(
        F.col("node"), F.round(F.col("pr"), 6).alias("pr6")
    )
    joined = clusters.where(F.col("cluster_size") >= 2).join(
        ranks, F.col(id_col) == F.col("node")
    )
    winner = joined.groupBy("cluster_id").agg(
        F.max("cluster_size").alias("cluster_size"),
        F.max(
            F.struct(
                F.col("pr6").alias("pr"), (-F.col(id_col)).alias("neg_id")
            )
        ).alias("win"),
    )
    return winner.select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        F.col("cluster_size").cast("long").alias("cluster_size"),
        (-F.col("win.neg_id")).cast("long").alias("survivor_doc_id"),
        F.col("win.pr").alias("survivor_pagerank"),
        (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
    )
