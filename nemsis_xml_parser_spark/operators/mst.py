"""Borůvka minimum spanning forest — bulk-parallel MST by per-component
minimum-edge contraction.

Borůvka (1926; the algorithm behind every distributed MST — MapReduce
MST of Lattanzi et al. "Filtering: a method for solving graph problems
in MapReduce", GraphX's MST recipes) is the naturally data-parallel MST:
each round EVERY component picks its minimum-weight outgoing edge (one
hash aggregate), the picked edges merge components (pointer jumping on
a functional graph), and the component count at least halves — so
``rounds`` = log2(n) completes the forest, and a FIXED smaller round
count yields the replayable partial forest (the ktruss/kmeans
fixed-iteration convention here).

Correctness hinges on a TOTAL edge order: ties in weight are broken by
(w, u, v), making the MST unique and both engines' picks identical.
With a total order the per-round pointer graph (component -> component
at the other end of its min edge) has only 2-cycles — a length>=3 cycle
would contain a non-minimal edge picked over a smaller incident one —
so cycle breaking is local (the smaller label of a mutual pair roots),
and chains resolve by pointer-jump doubling, O(log chain) rounds.

Distributed shape per round: two node-keyed equi-joins stamp component
labels onto edges, one (component)-keyed hash aggregate picks minima
(map-side combine reduces each partition to <= |components| rows), and
the contraction state is one (component, parent) row per component —
never an adjacency materialization.  Lineage is cut per round with
``lineage.cut_lineage`` (eager localCheckpoint + stats reset — see
that module for the Spark 4 BigInt-stats pathology this sidesteps;
reliable checkpoint on a real cluster).

Reference parity: the reference (psycopg2 ETL) has no graph surface;
§2.I extension tier.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, Window

from .lineage import cut_lineage

# Node-state row count below which the per-round label joins broadcast
# the (small) state side instead of shuffling both sides — cut_lineage
# erases the stats AQE would have used for the same decision (the
# operators/scc.py convention).  At scale the guard fails and the
# shuffle path is untouched.
_BROADCAST_STATE_MAX = 4_000_000


def _resolve_roots_local(ptr: DataFrame) -> DataFrame:
    """Single-task twin of ``_resolve_roots`` for a pointer graph that
    fits one executor — the Lattanzi filtering endgame
    (components.union_find_local / kruskal_local convention): ONE Arrow
    batch replaces the per-round 2-cycle-break checkpoint plus
    O(log chain) sequential jump jobs.  The pointer fixpoint is unique
    (a functional forest whose roots self-loop after the 2-cycle rule),
    so labels are bit-identical to the distributed doubling
    (tests/test_mst.py parity pins it)."""
    import pandas as pd

    def finish(pdf: "pd.DataFrame") -> "pd.DataFrame":
        oc = dict(zip((int(x) for x in pdf["c"]), (int(x) for x in pdf["oc"])))
        # 2-cycle break: mutual pairs root at the smaller label
        par = {
            c: (min(c, o) if oc.get(o) == c else o) for c, o in oc.items()
        }

        def find(x: int) -> int:
            r = x
            while par.get(r, r) != r:
                r = par[r]
            while par.get(x, x) != x:  # path compression
                par[x], x = r, par[x]
            return r

        cs = sorted(oc)
        return pd.DataFrame(
            {"c": cs, "root": [find(c) for c in cs]}
        ).astype({"c": "int64", "root": "int64"})

    return (
        ptr.select("c", "oc")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(lambda pdf: finish(pdf), "c long, root long")
    )


def _resolve_roots(
    ptr: DataFrame, max_jump: int = 25, small: bool = False
) -> DataFrame:
    """(c, root) for every component in ``ptr`` (c -> oc, its min-edge
    neighbor).  Breaks the 2-cycles (mutual pairs root at the smaller
    label), then pointer-jumps to the chain root by doubling.

    Each jump is ONE Spark job: the moved-pointer count rides the
    round's checkpoint via ``observe`` (the scc.py probe fusion — the
    old loop paid a dedicated changed-probe job per jump), and with
    ``small`` the jump's lookup side broadcasts (it is a projection of
    the checkpointed state, so the broadcast re-scan is a leaf read)."""
    hint = F.broadcast if small else (lambda d: d)
    q = ptr.select(F.col("c").alias("qc"), F.col("oc").alias("qoc"))
    par = (
        ptr.join(hint(q), ptr["oc"] == q["qc"], "left")
        .select(
            "c",
            F.when(
                F.col("qoc") == F.col("c"), F.least(F.col("c"), F.col("oc"))
            )
            .otherwise(F.col("oc"))
            .alias("par"),
        )
        .transform(cut_lineage)
    )
    for _ in range(max_jump):
        b = par.select(F.col("c").alias("bc"), F.col("par").alias("bpar"))
        obs = Observation()
        jumped = (
            par.join(hint(b), par["par"] == b["bc"], "left")
            .select(
                "c",
                F.coalesce(F.col("bpar"), F.col("par")).alias("par"),
                (
                    F.col("bpar").isNotNull()
                    & (F.col("bpar") != F.col("par"))
                )
                .cast("long")
                .alias("moved"),
            )
            .observe(obs, F.sum("moved").alias("m"))
            .transform(cut_lineage)
        )
        par = jumped.select("c", "par")
        if (obs.get["m"] or 0) == 0:
            return par.withColumnRenamed("par", "root")
    raise RuntimeError(f"pointer jumping did not converge in {max_jump} rounds")


def _boruvka_local(
    e: DataFrame, rounds: int
) -> tuple[DataFrame, DataFrame]:
    """Single-task twin of the full Borůvka round ladder for an edge
    set under ``LOCAL_FINISH_MAX`` — ONE Arrow batch replays every
    round's (min-edge pick, 2-cycle break, pointer-jump contraction)
    with the identical integer logic, so both the round-tagged pick
    set AND the final component labels are bit-for-bit the distributed
    values (tests/test_mst.py parity pins both).  The distributed loop
    pays 2+ eager jobs per round of pure local-mode latency; at scale
    the caller's guard fails and that path is untouched.

    Returns (picked (round, u, v, w), comp (node, c)) — both filters
    over one pinned tag-union frame, so the kernel runs once.
    """
    import pandas as pd

    def finish(pdf: "pd.DataFrame") -> "pd.DataFrame":
        us = [int(x) for x in pdf["u"]]
        vs = [int(x) for x in pdf["v"]]
        ws = [int(x) for x in pdf["w"]]
        comp: dict[int, int] = {}
        for u, v in zip(us, vs):
            comp[u] = u
            comp[v] = v
        out_k: list[int] = []
        out_a: list[int] = []
        out_b: list[int] = []
        out_c: list[int] = []
        out_d: list[int] = []
        for r in range(1, rounds + 1):
            best: dict[int, tuple[int, int, int, int]] = {}
            for u, v, w in zip(us, vs, ws):
                cu, cv = comp[u], comp[v]
                if cu == cv:
                    continue
                key_u = (w, u, v, cv)
                key_v = (w, u, v, cu)
                if cu not in best or key_u < best[cu]:
                    best[cu] = key_u
                if cv not in best or key_v < best[cv]:
                    best[cv] = key_v
            if not best:
                break
            # picked edges this round, deduped across picking components
            picked_round = sorted({(w, u, v) for w, u, v, _ in best.values()})
            for w, u, v in picked_round:
                out_k.append(0)
                out_a.append(r)
                out_b.append(u)
                out_c.append(v)
                out_d.append(w)
            # pointer graph c -> oc, 2-cycle break, root fixpoint —
            # the _resolve_roots_local logic inline
            oc = {c: k[3] for c, k in best.items()}
            par = {
                c: (min(c, o) if oc.get(o) == c else o)
                for c, o in oc.items()
            }

            def find(x: int) -> int:
                root = x
                while par.get(root, root) != root:
                    root = par[root]
                while par.get(x, x) != x:  # path compression
                    par[x], x = root, par[x]
                return root

            roots = {c: find(c) for c in oc}
            comp = {n: roots.get(c, c) for n, c in comp.items()}
        for n in sorted(comp):
            out_k.append(1)
            out_a.append(n)
            out_b.append(comp[n])
            out_c.append(0)
            out_d.append(0)
        return pd.DataFrame(
            {"k": out_k, "a": out_a, "b": out_b, "c": out_c, "d": out_d}
        ).astype("int64")

    tagged = cut_lineage(
        e.select("u", "v", "w")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda pdf: finish(pdf), "k int, a long, b long, c long, d long"
        )
    )
    picked = tagged.where(F.col("k") == 0).select(
        F.col("a").cast("int").alias("round"),
        F.col("b").alias("u"),
        F.col("c").alias("v"),
        F.col("d").alias("w"),
    )
    comp = tagged.where(F.col("k") == 1).select(
        F.col("a").alias("node"), F.col("b").alias("c")
    )
    return picked, comp


def boruvka_forest(
    edges: DataFrame, rounds: int, local_finish_max: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Run ``rounds`` Borůvka rounds over ``edges`` (u, v, w — canonical
    u < v, one row per undirected edge; (w, u, v) must be unique, which
    canonical pairs guarantee).

    Returns (picked, comp): ``picked`` — forest edges (round, u, v, w),
    every edge tagged with the round that contracted it; ``comp`` —
    final (node, c) component labels.  With rounds >= log2(n) the picked
    set IS the minimum spanning forest (unique under the total order);
    fewer rounds give the replayable partial forest.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    obs_m = Observation()
    e = (
        edges.select("u", "v", "w")
        .where(F.col("u") < F.col("v"))
        .observe(obs_m, F.count(F.lit(1)).alias("m"))
        .transform(cut_lineage)
    )
    # whole-ladder single-task endgame: when the edge set fits the
    # filtering budget (count rides the pin's observe), every round's
    # pick + contraction replays in ONE Arrow batch instead of 2+ eager
    # jobs per round (see _boruvka_local; streaming/msf.py only reaches
    # here when OVER the budget, so its distributed path is unchanged)
    budget = LOCAL_FINISH_MAX if local_finish_max is None else local_finish_max
    if (obs_m.get["m"] or 0) <= budget:
        return _boruvka_local(e, rounds)
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
    )
    obs0 = Observation()
    comp = (
        nodes.select("node", F.col("node").alias("c"))
        .observe(obs0, F.count(F.lit(1)).alias("n"))
        .transform(cut_lineage)
    )
    small = (obs0.get["n"] or 0) <= _BROADCAST_STATE_MAX
    hint = F.broadcast if small else (lambda d: d)
    # per-round picks accumulate LAZILY (each part is a cheap select
    # over its round's checkpointed pick) and union once at the end —
    # the old loop paid an accumulator checkpoint job per round
    picked_parts: list[DataFrame] = []
    for r in range(1, rounds + 1):
        cu = comp.select(F.col("node").alias("u"), F.col("c").alias("cu"))
        cv = comp.select(F.col("node").alias("v"), F.col("c").alias("cv"))
        ce = (
            e.join(hint(cu), "u")
            .join(hint(cv), "v")
            .where(F.col("cu") != F.col("cv"))
        )
        both = ce.select(
            F.col("cu").alias("c"), "w", "u", "v", F.col("cv").alias("oc")
        ).unionByName(
            ce.select(
                F.col("cv").alias("c"), "w", "u", "v", F.col("cu").alias("oc")
            )
        )
        obs = Observation()
        pick = (
            both.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("c").orderBy("w", "u", "v")
                ),
            )
            .where(F.col("rn") == 1)
            .select("c", "oc", "u", "v", "w")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .transform(cut_lineage)
        )
        # an empty pick means no cross-component edge survived — the
        # emptiness probe rides the pick checkpoint (the old loop paid
        # a dedicated limit(1).count() job per round)
        n_pick = obs.get["n"] or 0
        if n_pick == 0:
            break
        picked_parts.append(
            pick.select("u", "v", "w").distinct().withColumn("round", F.lit(r))
        )
        # the pointer graph is one row per PICKING component — when it
        # fits one executor (the same filtering budget as kruskal_local)
        # the root fixpoint resolves as one Arrow batch lazily inside
        # the contraction checkpoint, replacing 2-5 sequential jump jobs
        # per round; at scale the distributed doubling path is untouched
        ptr = pick.select("c", "oc")
        roots = (
            _resolve_roots_local(ptr)
            if n_pick <= LOCAL_FINISH_MAX
            else _resolve_roots(ptr, small=small)
        )
        comp = (
            comp.join(
                hint(roots.withColumnRenamed("c", "c_old")),
                comp["c"] == F.col("c_old"),
                "left",
            )
            .select(
                "node", F.coalesce(F.col("root"), F.col("c")).alias("c")
            )
            .transform(cut_lineage)
        )
    if not picked_parts:
        picked = e.limit(0).withColumn("round", F.lit(0)).select(
            "round", "u", "v", "w"
        )
    else:
        picked = picked_parts[0]
        for part in picked_parts[1:]:
            picked = picked.unionByName(part)
    return picked.select("round", "u", "v", "w"), comp


# Residual edge count that comfortably solves inside ONE executor task
# (~48 bytes/edge -> ~100 MB at the bound, seconds of union-find).
LOCAL_FINISH_MAX = 2_000_000


def kruskal_local(edges: DataFrame) -> DataFrame:
    """Single-task Kruskal over a residual edge set that fits in one
    executor — the endgame of the MapReduce MST recipe (Lattanzi et
    al., SPAA'11: run filtering/Borůvka rounds only until the residual
    fits in memory, then finish locally).  Under the same (w, u, v)
    total order the MSF is unique, so this picks EXACTLY the edges the
    distributed Borůvka rounds would (tests/test_mst.py parity).

    Input must be canonical (u < v) min-reduced edges with **integer
    weights** (u, v, w all coerce to long — the output schema is
    ``u long, v long, w long`` and values pass through ``int()``, so a
    caller with double weights would get silent truncation; cast or
    scale to integers first, as streaming/msf.py's canonical_min_edges
    does).  Returns the forest as (u, v, w).  One Arrow batch in,
    O(nodes) rows out — callers guard with ``LOCAL_FINISH_MAX``.
    """
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

        keep_u: list[int] = []
        keep_v: list[int] = []
        keep_w: list[int] = []
        order = sorted(zip(pdf["w"], pdf["u"], pdf["v"]))
        for w, u, v in order:
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
                keep_u.append(int(u))
                keep_v.append(int(v))
                keep_w.append(int(w))
        return pd.DataFrame({"u": keep_u, "v": keep_v, "w": keep_w})

    return (
        edges.select("u", "v", "w")
        .groupBy(F.lit(1).alias("__g"))
        .applyInPandas(
            lambda pdf: finish(pdf), "u long, v long, w long"
        )
    )
