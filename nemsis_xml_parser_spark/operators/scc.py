"""Strongly connected components of a DIRECTED graph — forward/backward
min-label peeling (the FW-BW family: Fleischer/Hendrickson/Pinar "On
Identifying Strongly Connected Components in Parallel", and its
label-propagation rendering in Pregel-style systems).

Per round, over the still-unresolved subgraph:

1. ``fwd(v)`` = min node id among v's ancestors (and v) — a min-label
   fixpoint along edge direction;
2. ``bwd(v)`` = min node id among v's descendants (and v) — the same
   fixpoint on reversed edges;
3. every v with ``fwd(v) == bwd(v) == m`` is RESOLVED into SCC(m): m
   reaches v (fwd) and v reaches m (bwd), so they are mutually
   reachable.  Resolution is SCC-ATOMIC: within one SCC every member
   has the same ancestor set and the same descendant set (strong
   connectivity composes paths through any member), so fwd and bwd are
   constant across the SCC — either the whole SCC resolves this round
   (and the shared value is necessarily its own minimum member) or
   none of it does.  The SCC of the globally minimal unresolved node
   always satisfies fwd = bwd = that minimum, so every round makes
   progress and the loop terminates.
4. resolved nodes leave the edge set; repeat on the residual.

Round count equals the depth at which min-labels collide along the
condensation DAG — small for cycle-rich graphs (every round clears at
least the current global-min SCC and, in practice, most label-agreeing
mass).  Pure-DAG regions are handled by the TRIM phase each round
(peel source/sink/isolated nodes to a fixpoint — singletons by
construction, the FW-BW hardening of Slota et al., "BFS and
Coloring-based Parallel Algorithms for Strongly Connected
Components", IPDPS'14), so trees and dependency DAGs dissolve in
O(depth) cheap rounds and the double fixpoints only ever run on the
cycle-bearing core.

Distributed shape: each fixpoint round is one src-keyed equi-join +
one node-keyed min-aggregate (the same shuffles as
``components.connected_components``); the peeling loop never
materializes reachability PAIRS — state stays (node, label) — which is
the difference between this and a transitive-closure SCC at scale.
Convergence probes are scalar aggregates (sum of labels strictly
decreases), lineage cut per round with ``localCheckpoint`` (swap for
reliable ``checkpoint()`` on a cluster).

The reference (a psycopg2 ETL) has no graph surface; §2.I tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation

from .lineage import cut_lineage

# Broadcast-side row count below which the per-iteration message join
# broadcasts instead of shuffling (see the inline note in
# _dual_min_label_fixpoint).  4M (node, dir, lbl) rows ≈ 100 MB — safely
# inside executor broadcast budgets; beyond it the shuffle path is right.
# The fixpoint gates on the MEASURED label-state row count (2 per node,
# off the init observe); _trim gates its node-core broadcast on the
# surviving edge count, which upper-bounds the core's node rows.
_BROADCAST_STATE_MAX = 4_000_000


# Residual edge count that comfortably solves inside ONE executor task —
# the same budget reasoning as mst.LOCAL_FINISH_MAX (~48 bytes/edge →
# ~100 MB at the bound, linear-time Tarjan over it is seconds).
SCC_LOCAL_FINISH_MAX = 2_000_000


def tarjan_local(edges: DataFrame) -> DataFrame:
    """Single-task Tarjan over a residual edge set that fits one
    executor — the Lattanzi et al. (SPAA'11) filtering endgame, same
    recipe as ``mst.kruskal_local``: run the distributed trim/peel
    rounds only until the residual is PROVABLY small (the trim loop's
    edge-count probe rides its checkpoint job anyway), then finish the
    cycle-bearing core in one Arrow batch instead of paying O(log n)
    inherently-sequential fixpoint iterations × per-job latency.  SCC
    labels are algorithm-independent (scc = min member id), so the
    output is bit-identical to the FW-BW path (tests/test_scc_kmeans.py
    parity).  Every residual node is an edge endpoint (trim guarantees
    in- AND out-degree ≥ 1), so the edge list alone carries the node
    set.  Output: (node, scc)."""
    import pandas as pd

    def finish(pdf: "pd.DataFrame") -> "pd.DataFrame":
        adj: dict[int, list[int]] = {}
        nodes: set[int] = set()
        for u, v in zip(pdf["u"], pdf["v"]):
            ui, vi = int(u), int(v)
            adj.setdefault(ui, []).append(vi)
            nodes.add(ui)
            nodes.add(vi)
        index: dict[int, int] = {}
        low: dict[int, int] = {}
        comp: dict[int, int] = {}
        stack: list[int] = []
        on_stack: set[int] = set()
        counter = 0
        for root in nodes:
            if root in index:
                continue
            work = [(root, 0)]  # iterative DFS: (node, next-child idx)
            while work:
                node, pi = work[-1]
                if pi == 0:
                    index[node] = low[node] = counter
                    counter += 1
                    stack.append(node)
                    on_stack.add(node)
                children = adj.get(node, ())
                descended = False
                for i in range(pi, len(children)):
                    w = children[i]
                    if w not in index:
                        work[-1] = (node, i + 1)
                        work.append((w, 0))
                        descended = True
                        break
                    if w in on_stack and index[w] < low[node]:
                        low[node] = index[w]
                if descended:
                    continue
                if low[node] == index[node]:
                    members = []
                    while True:
                        w = stack.pop()
                        on_stack.discard(w)
                        members.append(w)
                        if w == node:
                            break
                    m = min(members)
                    for w in members:
                        comp[w] = m
                work.pop()
                if work:
                    parent = work[-1][0]
                    if low[node] < low[parent]:
                        low[parent] = low[node]
        return pd.DataFrame(
            {"node": list(comp.keys()), "scc": list(comp.values())}
        )

    return (
        edges.select("u", "v")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(lambda pdf: finish(pdf), "node long, scc long")
    )


def _dual_min_label_fixpoint(
    edges: DataFrame, nodes: DataFrame, max_iter: int, n_edges: int
) -> DataFrame:
    """Run the forward (min-ancestor) and backward (min-descendant)
    fixpoints SIMULTANEOUSLY on a direction-tagged label frame —
    (node, dir, lbl) with dir 0 = along edges, dir 1 = reversed — so
    each iteration is ONE join + ONE min-aggregate covering both
    directions (the round-6 NOTES fusion: the sequential fwd-then-bwd
    loops paid two probe collects and two job chains per iteration for
    the same shuffle volume).

    Pointer jumping is sound per direction exactly as before: lbl(v)
    is always an ancestor-or-self of v within its own direction
    (invariant holds at init, under min-of-predecessors updates, and
    under composition), so least(lbl(v), lbl(lbl(v))) — joined on the
    SAME dir tag — stays within the ancestor set and cuts convergence
    from O(diameter) to O(log diameter) rounds.  (Fusing a SECOND
    jump into the same materialization was measured and rejected:
    the composed self-referencing sub-plans re-execute the round's
    aggregate enough times to cost more than the saved iterations.)
    The convergence probe (sum of labels over both directions,
    monotone non-increasing; both fixpoints monotone, so an unchanged
    sum means BOTH converged) rides the SAME job as the round's
    lineage cut via ``observe`` — zero dedicated probe jobs (the
    round-8 rework: the old loop paid a cut job + a probe-collect job
    per iteration; this pays one).

    Returns (node, lbl, blbl): forward and backward min labels."""
    de = (
        edges.select(F.lit(0).alias("dir"), "u", "v")
        .unionByName(
            edges.select(
                F.lit(1).alias("dir"),
                F.col("v").alias("u"),
                F.col("u").alias("v"),
            )
        )
        .transform(cut_lineage)
    )
    probe = F.sum(F.col("lbl").cast("decimal(38,0)")).alias("s")
    obs0 = Observation()
    labels = (
        nodes.select(
            "node",
            F.explode(F.array(F.lit(0), F.lit(1))).alias("dir"),
        )
        .withColumn("lbl", F.col("node"))
        .observe(obs0, probe, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    prev = obs0.get["s"]
    # Gate the broadcast on the ACTUAL label-state row count (2 per node,
    # free off the init observe) — node count can approach the edge count,
    # so an edge-count gate could broadcast ~2x the intended budget.
    small = obs0.get["n"] <= _BROADCAST_STATE_MAX
    # cut_lineage erases size stats, so AQE never discovers that the
    # label state is broadcastable, and shuffles BOTH sides of the
    # message join every iteration.  The caller-supplied edge count
    # (tracked by trim anyway) recovers the decision AQE would make:
    # when the state is provably small, BROADCAST it into the message
    # join.  The jump self-join is NOT hinted — its right side is the
    # round's aggregate, whose shuffle exchange the planner reuses
    # verbatim, while a broadcast there would re-execute the aggregate
    # subtree (measured 19.9 s vs 24.5 s warm on the sf0.1 demo core).
    # Coalescing the checkpoints to 1 partition was also measured and
    # REJECTED (21.3 s): it serializes every post-shuffle stage onto
    # one task, which costs more than the 32-near-empty-task overhead
    # it removes.  At scale the guard fails and the shuffle path is
    # untouched.
    hint = F.broadcast if small else (lambda d: d)
    for _ in range(max_iter):
        msgs = de.join(
            hint(labels.withColumnRenamed("node", "u")), ["dir", "u"]
        ).select("dir", F.col("v").alias("node"), "lbl")
        new = (
            labels.unionByName(msgs)
            .groupBy("dir", "node")
            .agg(F.min("lbl").alias("lbl"))
        )
        jump = new.select(
            "dir",
            F.col("node").alias("lbl"),
            F.col("lbl").alias("lbl_jump"),
        )
        new = new.join(jump, ["dir", "lbl"], "left").select(
            "dir",
            "node",
            F.least(
                F.col("lbl"), F.coalesce(F.col("lbl_jump"), F.col("lbl"))
            ).alias("lbl"),
        )
        obs = Observation()
        labels = new.observe(obs, probe).transform(cut_lineage)
        cur = obs.get["s"]
        if cur == prev:
            return labels.groupBy("node").agg(
                F.min(F.when(F.col("dir") == 0, F.col("lbl"))).alias("lbl"),
                F.min(F.when(F.col("dir") == 1, F.col("lbl"))).alias("blbl"),
            )
        prev = cur
    raise RuntimeError(f"min-label fixpoint: no convergence in {max_iter} rounds")


def _resolve_round(
    edges: DataFrame, nodes: DataFrame, max_iter: int, n_edges: int
):
    """One FW-BW resolution round: run the dual fixpoint, cut the
    (node, lbl, blbl) result ONCE with the unresolved count riding the
    cut job via ``observe``, and return

    (both, n_unresolved, residual_edges)

    where residual_edges keeps only edges BOTH of whose endpoints are
    unresolved AND share the same (fwd, bwd) label class.  The class
    filter is the FW-BW divide step (Fleischer et al.): an SCC's
    members all share one (fwd, bwd) pair, so a cross-class edge can
    never be intra-SCC — dropping it shatters the residual into
    independent classes that the next round's trim + fixpoint resolve
    in parallel, instead of re-walking one barely-shrunk graph."""
    obs = Observation()
    both = (
        _dual_min_label_fixpoint(edges, nodes, max_iter, n_edges)
        .observe(
            obs,
            F.sum(
                (F.col("lbl") != F.col("blbl")).cast("long")
            ).alias("n_unresolved"),
        )
        .transform(cut_lineage)
    )
    n_unresolved = obs.get["n_unresolved"] or 0
    unresolved = both.where(F.col("lbl") != F.col("blbl"))
    eu = unresolved.select(
        F.col("node").alias("u"),
        F.col("lbl").alias("lbl_u"),
        F.col("blbl").alias("blbl_u"),
    )
    ev = unresolved.select(
        F.col("node").alias("v"),
        F.col("lbl").alias("lbl_v"),
        F.col("blbl").alias("blbl_v"),
    )
    residual = (
        edges.join(eu, "u")
        .join(ev, "v")
        .where(
            (F.col("lbl_u") == F.col("lbl_v"))
            & (F.col("blbl_u") == F.col("blbl_v"))
        )
        .select("u", "v")
    )
    return both, n_unresolved, residual


def _trim(e: DataFrame, nodes: DataFrame, max_trim: int):
    """Peel nodes that cannot lie on any cycle — in-degree 0, out-degree
    0, or isolated (the FW-BW 'trim' phase of Slota et al.): the loop
    iterates the edge set to its 'every endpoint has both an in- and an
    out-edge' fixpoint, so a DAG of depth d (trees, dependency graphs)
    fully dissolves in O(d) cheap rounds instead of O(n) double-fixpoint
    peeling rounds.  The convergence probe — the surviving edge
    count — rides the cut job via ``observe``, so each sub-iteration
    is exactly ONE Spark job (round-8 rework: the old loop paid an
    emptiness probe + four cut jobs per sub-iteration; fusing two peel
    steps per job was measured and rejected — the repeated degree
    sub-plans re-execute and cost more than the saved job overhead).
    Node bookkeeping falls
    out ONCE at the end: survivors = endpoints of the fixpoint edge
    set, trimmed = the rest — trimmed nodes are singleton SCCs by
    construction (no cycle passes through a source or sink).
    Returns (edges, nodes, trimmed, n_edges) with nodes/trimmed LAZY
    (see inline note) and n_edges the surviving edge count."""
    cnt = F.count(F.lit(1)).alias("n")
    prev = e.count()  # e arrives checkpointed from the caller
    for _ in range(max_trim):
        if prev == 0:
            break
        # same small-state broadcast reasoning as the fixpoint: core is
        # bounded by the surviving edge count, which we track anyway
        hint = F.broadcast if prev <= _BROADCAST_STATE_MAX else (lambda d: d)
        has_in = e.select(F.col("v").alias("node")).distinct()
        has_out = e.select(F.col("u").alias("node")).distinct()
        core = has_in.join(has_out, "node", "left_semi")
        cur = e.join(
            hint(core.withColumnRenamed("node", "u")), "u", "left_semi"
        ).join(hint(core.withColumnRenamed("node", "v")), "v", "left_semi")
        obs = Observation()
        e2 = cur.observe(obs, cnt).transform(cut_lineage)
        n = obs.get["n"]
        e = e2
        if n == prev:
            break
        prev = n
    survivors = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    # both outputs stay LAZY over the checkpointed edge fixpoint — the
    # caller accumulates `trimmed` into a union list collected once at
    # the end, and `new_nodes` feeds the label init which is cut anyway,
    # so cutting (or emptiness-probing) them here would only add jobs to
    # every peeling round.  `prev` is the surviving edge count: 0 means
    # the whole residual dissolved and the caller can stop without its
    # own emptiness job.
    new_nodes = nodes.join(survivors, "node", "left_semi")
    trimmed = nodes.join(survivors, "node", "left_anti")
    return e, new_nodes, trimmed, prev


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_rounds: int = 25,
    max_iter: int = 50,
    max_trim: int = 50,
    local_finish_max: int = SCC_LOCAL_FINISH_MAX,
) -> DataFrame:
    """(node BIGINT, scc BIGINT) — scc = min node id of the node's
    strongly connected component.  Every node mentioned by any edge is
    assigned; isolated SCCs (no cycle through the node) come out as
    singletons labeled by themselves.

    Each round first TRIMS source/sink/isolated nodes to a fixpoint
    (singletons by construction — closes the DAG-pathology seam the
    original peeling loop documented); then, when the trimmed residual
    is provably small (edge count ≤ ``local_finish_max``, off the trim
    probe that runs anyway), finishes it in ONE single-task Tarjan
    batch (``tarjan_local`` — the Lattanzi filtering endgame, labels
    bit-identical to the fixpoint path); otherwise runs the FW-BW
    min-label resolution on the residual cycle-bearing core and peels
    again.  Pass ``local_finish_max=0`` to force the distributed path
    (tests do, for parity coverage)."""
    e = (
        edges.select(
            F.col(src).cast("long").alias("u"), F.col(dst).cast("long").alias("v")
        )
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .distinct()
        .transform(cut_lineage)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .transform(cut_lineage)
    )
    # per-round outputs accumulate LAZILY (every part is a cheap select
    # over an already-checkpointed frame) and union once at the end —
    # the old loop paid two accumulator checkpoint jobs per round
    outs: list[DataFrame] = []
    for _ in range(max_rounds):
        e, nodes, trimmed, n_edges = _trim(e, nodes, max_trim)
        outs.append(trimmed.select("node", F.col("node").alias("scc")))
        if n_edges == 0:
            # the residual dissolved entirely in the trim phase; with no
            # edges left there are no surviving nodes either (survivors
            # are edge endpoints), so the round — and the peel — is done
            break
        if n_edges <= local_finish_max:
            outs.append(tarjan_local(e))
            break
        both, n_unresolved, residual = _resolve_round(
            e, nodes, max_iter, n_edges
        )
        outs.append(
            both.where(F.col("lbl") == F.col("blbl")).select(
                "node", F.col("lbl").alias("scc")
            )
        )
        if n_unresolved == 0:
            # resolution emptied the graph on this round — success even
            # when it happens on the final max_rounds iteration (the
            # trim-phase emptiness check would never run again)
            break
        nodes = both.where(F.col("lbl") != F.col("blbl")).select("node")
        e = residual.transform(cut_lineage)
    else:
        raise RuntimeError(
            f"strongly_connected_components: residual graph not empty "
            f"after {max_rounds} peeling rounds"
        )
    out = outs[0]
    for part in outs[1:]:
        out = out.unionByName(part)
    return out
