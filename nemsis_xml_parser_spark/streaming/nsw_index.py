"""Streaming graph-ANN index maintenance — incremental node insert into
the persisted navigable-small-world graph (the streaming twin of
``operators/nsw.py::build_nsw_graph``, the r11 VERDICT's remaining
batch-only ANN index).

Deployment model mirrors ``streaming/ivf_index.py`` (train-once /
add-forever):

* coarse centroids AND the per-cell hub seeds are fixed by batch 0 and
  frozen — the seeded iters=0 quantizer of the batch graph, so cell
  boundaries and the navigation hub layer never move under
  already-linked nodes (re-seeding would strand old nav links);
* the VECTOR store is byte-compatible with the IVF stream's
  (``cells/batch={id}/cid={c}``, batch-keyed OVERWRITE,
  cid-partitioned) — ``read_ivf_cells``/``compact_ivf_cells`` are
  reused verbatim;
* EDGES are maintained per microbatch with the classic NSW insertion
  rule (Malkov et al.): each new node links to its ``g_intra`` most
  cosine-similar CANDIDATES, where history candidates come from a
  BEAM SEARCH over the graph built so far (cost O(batch × beam ×
  degree × hops) — independent of corpus size; an exhaustive
  history-in-cell scan is O(corpus²/nlist) over a stream's lifetime
  and measured 61 rows/s at bench scale) and in-batch candidates from
  a vectorized same-cell top-``g_intra`` matmul kernel
  (trigger-bounded).  Each beam-found HISTORY neighbor gains a
  back-link so new nodes stay reachable — capped at ``g_intra`` per
  old node per batch, with edge COMPACTION re-pruning every node's
  intra out-edges to the top-``2 * g_intra`` by current cosine
  (HNSW's M_max0 = 2M layer-0 ceiling — pruning to exactly
  ``g_intra`` measurably costs recall, see ``compact_nsw_edges``)
  and repairing any node the prune left unreachable (orphan repair,
  ditto).
  Navigation links (node → its ``seed_links`` nearest cells' seeds,
  uncapped, ``kind='nav_up'``; seed → node, ``kind='nav_down'``,
  capped at ``NAV_MAX`` per cell EVER via the nav-budget sidecar) are
  kept apart from intra edges and never cosine-pruned — they are the
  navigability bootstrap, and the hub cap is what keeps the beam's
  first-hop expansion corpus-independent.  The two nav directions
  carry distinct kinds so the budget sidecar counts exactly the
  down-links (ADVICE r12: batch 0's seed nodes emit seed→seed
  up-links that a single 'nav' kind made indistinguishable,
  overcounting each cell's budget by up to ``seed_links``).

Single-batch equivalence: a corpus arriving in ONE batch (under the
nav budget) produces exactly ``build_nsw_graph``'s edge set — the
guided path with an empty graph degenerates to the batch build's
per-src top-``g_intra`` + bidirectional seed links, with the matmul
kernel reproducing the expression scoring ROUND-6-exactly — pinned by
``tests/test_nsw_index_stream``.

Exactly-once: both stores are batch-keyed OVERWRITE (the history-index
argument verbatim); the batch body is a deterministic function of the
batch and the history EXCLUDING the batch's own dir, so a replay
rewrites identical bytes.  That claim holds ACROSS the compaction
boundary because compaction runs at the START of the batch after the
fold window's checkpoint commit and excludes any crashed prior attempt
of the running batch (r13; previously it ran between a batch's writes
and its commit, where a replay could see its own rows through the
compacted store).  Crash/replay windows can still leave duplicate rows
visible; the searcher is duplicate-immune (edges are joined distinct,
candidates deduped per (query, node) before ranking) and the next
compaction folds duplicates away.

Reference parity: none — §2.I streaming-similarity tier.
"""

from __future__ import annotations

import os
import shutil

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.streaming import StreamingQuery

from ..functions import vectors as V
from ..operators.ivf import assign_cells_arrow, nearest_arrow, train_centroids
from ..operators.nsw import cell_topg_pairs_arrow as _inbatch_topg_pairs
from ..operators.lineage import cut_lineage
from ..operators.txlog import commit_table, current_version, read_table, vacuum
from .ivf_index import compact_ivf_cells, read_ivf_cells, read_ivf_centroids

__all__ = [
    "read_nsw_seeds",
    "read_nsw_edges",
    "nsw_insertion_edges_guided",
    "start_nsw_index_stream",
    "nsw_stream_index_topk",
    "compact_nsw_edges",
]

def _seeded_cent_rows(seeds, centroids):
    """Collected centroid rows restricted to SEEDED cells — the KB-scale
    closure input of the Arrow nearest kernel (two tiny driver reads;
    both tables are frozen after batch 0)."""
    seed_cids = {int(r.cid) for r in seeds.select("cid").collect()}
    return [r for r in centroids.collect() if int(r.cid) in seed_cids]


_EDGE_COMPACT = "edges_compacted"
EDGE_SCHEMA = "src long, dst long, kind string"

#: hub fan-out ceiling: total seed→node nav edges per cell, ever.  The
#: flat hub layer is only navigable if a seed's out-degree stays
#: bounded — un-capped, every batch adds its nodes under their seeds
#: and the beam search's first-hop expansion grows with the CORPUS
#: (measured: the 61 rows/s wall).  Reachability of later nodes comes
#: from the intra back-links the beam-guided insert creates, so the
#: hub only needs enough children to bootstrap descent.
NAV_MAX = 128


def _read_nav_used(
    index_root: str, exclude_batch: int | None = None
) -> dict[int, int]:
    """Per-cell count of nav seed→node edges committed so far — the
    monotone budget sidecar (driver-side pyarrow, the hot-fps recipe:
    one tiny ``nav_used/batch=N`` dir per batch that added any,
    own-batch dir excluded on replay)."""
    import pyarrow.parquet as pq

    root = os.path.join(index_root, "nav_used")
    used: dict[int, int] = {}
    if os.path.isdir(root):
        for d in sorted(os.listdir(root)):
            if not d.startswith("batch=") or d == f"batch={exclude_batch}":
                continue
            f = os.path.join(root, d, "part-0.parquet")
            if os.path.isfile(f):
                t = pq.read_table(f)
                for cid, n in zip(
                    t["cid"].to_pylist(), t["n"].to_pylist()
                ):
                    used[int(cid)] = used.get(int(cid), 0) + int(n)
    return used


def _write_nav_used(
    index_root: str, batch_id: int, counts: dict[int, int]
) -> None:
    """Batch-keyed sidecar append (tmp + atomic rename, foreign files
    cleared; nothing written when empty — the write_hot_fps contract)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not counts:
        return
    d = os.path.join(index_root, "nav_used", f"batch={batch_id}")
    os.makedirs(d, exist_ok=True)
    for f in os.listdir(d):
        if f != "part-0.parquet":
            os.remove(os.path.join(d, f))
    cids = sorted(counts)
    tmp = os.path.join(d, ".part-0.parquet.tmp")
    pq.write_table(
        pa.table(
            {
                "cid": pa.array(cids, pa.int32()),
                "n": pa.array([counts[c] for c in cids], pa.int64()),
            }
        ),
        tmp,
    )
    os.replace(tmp, os.path.join(d, "part-0.parquet"))


def _nav_adds_from_edges(
    index_root: str, batch_id: int, seeds_map: dict[int, int]
) -> dict[int, int]:
    """Count the batch's seed→node nav additions per cell by reading
    the just-written edges dir driver-side (pyarrow, MB-scale, no
    Spark job).  ``seeds_map`` is svid → cid."""
    import pyarrow.parquet as pq

    d = os.path.join(index_root, "edges", f"batch={batch_id}")
    counts: dict[int, int] = {}
    svids = set(seeds_map)
    for f in os.listdir(d):
        if not f.endswith(".parquet") or f.startswith("."):
            continue
        t = pq.read_table(os.path.join(d, f), columns=["src", "kind"])
        for src, kind in zip(t["src"].to_pylist(), t["kind"].to_pylist()):
            if kind == "nav_down" and src in svids:
                cid = seeds_map[src]
                counts[cid] = counts.get(cid, 0) + 1
    return counts


def read_nsw_seeds(spark: SparkSession, index_root: str) -> DataFrame | None:
    """Frozen (cid, svid) hub seeds, or None before batch 0 commits them
    (same _SUCCESS-gated bootstrap as the centroids)."""
    d = f"{index_root}/seeds"
    if not os.path.isfile(os.path.join(d, "_SUCCESS")):
        return None
    return spark.read.parquet(d)


def read_nsw_edges(
    spark: SparkSession, index_root: str, exclude_batch: int | None = None
) -> DataFrame:
    """All committed (src, dst, kind) edges: the latest compaction plus
    every batch dir since.  ``exclude_batch`` skips one batch dir (the
    replay determinism guard — a replayed batch must not see its own
    crashed output).  May contain duplicates in crash windows —
    consumers read it distinct."""
    edges_dir = f"{index_root}/edges"
    parts = []
    if os.path.isdir(edges_dir):
        dirs = [
            os.path.join(edges_dir, d)
            for d in sorted(os.listdir(edges_dir))
            if d.startswith("batch=") and d != f"batch={exclude_batch}"
        ]
        if dirs:
            parts.append(
                spark.read.schema(EDGE_SCHEMA).parquet(*dirs)
            )
    if current_version(index_root, _EDGE_COMPACT) is not None:
        parts.append(
            read_table(spark, index_root, _EDGE_COMPACT).select(
                "src", "dst", "kind"
            )
        )
    if not parts:
        return spark.createDataFrame([], EDGE_SCHEMA)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _pair_cos(sv, sn, dv, dn):
    denom = sn * dn
    return F.round(
        F.when(denom > 0, V.dot(sv, dv) / denom).otherwise(F.lit(0.0)), 6
    )


def compact_nsw_edges(
    spark: SparkSession, index_root: str, g_intra: int = 6,
    g_keep: int | None = None,
    exclude_batch: int | None = None,
) -> int:
    """Fold the edge view into the next txlog version: nav links pass
    through DISTINCT (navigability is not a similarity property); intra
    edges are re-pruned to each src's exact top-``g_keep`` by cosine
    against the CURRENT vector store — the bounded-degree invariant the
    per-batch back-links relax between folds.  ``g_keep`` defaults to
    ``2 * g_intra`` (HNSW's layer-0 convention, M_max0 = 2M): inserts
    still TARGET ``g_intra`` links, but the fold's ceiling is looser —
    measured (r14, sf0.1 ANN_RECALL probe), pruning to exactly
    ``g_intra`` cost the compacted graph ~0.07 recall@10 (0.445 →
    0.372 single-entry) because the accumulated back-links it discards
    are precisely the late-node reachability the guided insert relies
    on; at 2x the degree the beam's per-hop expansion stays bounded
    and the recall survives the fold.

    Orphan repair (r14 recall lever): the cosine-only re-prune can
    STRAND a late-inserted node — its only in-edges are the back-links
    its insert created, and those lose the history node's top-
    ``g_intra`` contest as better neighbors accumulate; a node with no
    in-edge is unreachable by any beam and its true-neighbor queries
    silently lose recall.  After pruning, every indexed non-seed node
    with ZERO remaining in-edges keeps its single best PRE-prune
    in-edge (kind ``repair``, top-1 by the same ROUND-6 cosine /
    src-asc tie-break); a node with no pre-prune in-edge at all (rare:
    nav budget exhausted at insert AND no back-link survived a crash
    window) instead gets one seed→node repair link from its lowest-id
    nav_up target — the VERDICT-r13-sanctioned re-offer of the hub
    down-link its insert was denied.  Repair edges are in-degree
    floors, not out-degree growth: at most ONE per once-orphaned node,
    they pass through later folds like nav links, and the intra
    out-degree bound stays exactly ``g_intra``.

    Folded batch dirs are removed, old versions vacuumed.
    ``exclude_batch`` keeps one batch dir out of the fold entirely
    (the compact_ivf_cells own-batch exclusion argument: compacting at
    the start of batch N must not fold a crashed prior attempt of N
    itself)."""
    if g_keep is None:
        g_keep = 2 * g_intra
    edges_dir = f"{index_root}/edges"
    folded = [
        d for d in os.listdir(edges_dir)
        if d.startswith("batch=") and d.split("=", 1)[1].isdigit()
        and d != f"batch={exclude_batch}"
    ] if os.path.isdir(edges_dir) else []
    edges = read_nsw_edges(
        spark, index_root, exclude_batch=exclude_batch
    ).distinct()
    vecs = (
        _cells_view(spark, index_root, exclude_batch=exclude_batch)
        .dropDuplicates(["item_id"])
        .select("item_id", "iv", V.norm(F.col("iv")).alias("nrm"))
    )
    sv = vecs.select(
        F.col("item_id").alias("src"),
        F.col("iv").alias("sv"), F.col("nrm").alias("sn"),
    )
    dv = vecs.select(
        F.col("item_id").alias("dst"),
        F.col("iv").alias("dv"), F.col("nrm").alias("dn"),
    )
    intra = (
        edges.where(F.col("kind") == "intra")
        .join(sv, "src").join(dv, "dst")
        .select(
            "src", "dst",
            _pair_cos(F.col("sv"), F.col("sn"), F.col("dv"), F.col("dn")).alias("cos"),
        )
    )
    w = Window.partitionBy("src").orderBy(F.col("cos").desc(), F.col("dst").asc())
    pruned = (
        intra.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= g_keep)
        .select("src", "dst", F.lit("intra").alias("kind"))
    )
    nav = edges.where(F.col("kind") != "intra").select("src", "dst", "kind")
    # orphan repair: nodes unreachable after the prune keep their best
    # pre-prune in-edge (or, lacking any, one reversed nav_up hub link)
    seeds = read_nsw_seeds(spark, index_root)
    kept = pruned.unionByName(nav)
    orphans = (
        vecs.select(F.col("item_id").alias("dst"))
        .join(kept.select("dst").distinct(), "dst", "left_anti")
    )
    if seeds is not None:
        orphans = orphans.join(
            F.broadcast(seeds.select(F.col("svid").alias("dst"))),
            "dst", "left_anti",
        )
    worphan = Window.partitionBy("dst").orderBy(
        F.col("cos").desc(), F.col("src").asc()
    )
    repair_in = (
        intra.join(F.broadcast(orphans), "dst", "left_semi")
        .withColumn("rn", F.row_number().over(worphan))
        .where(F.col("rn") == 1)
        .select("src", "dst", F.lit("repair").alias("kind"))
    )
    still = orphans.join(repair_in.select("dst"), "dst", "left_anti")
    repair_hub = (
        edges.where(F.col("kind") == "nav_up")
        .select(F.col("src").alias("dst"), F.col("dst").alias("src"))
        .join(F.broadcast(still), "dst", "left_semi")
        .groupBy("dst")
        .agg(F.min("src").alias("src"))
        .select("src", "dst", F.lit("repair").alias("kind"))
    )
    ver = commit_table(
        kept.unionByName(repair_in).unionByName(repair_hub),
        index_root, _EDGE_COMPACT,
    )
    for d in folded:
        shutil.rmtree(os.path.join(edges_dir, d), ignore_errors=True)
    vacuum(index_root, _EDGE_COMPACT, keep=2)
    return ver


def _cells_view(
    spark: SparkSession, index_root: str, exclude_batch: int | None = None
) -> DataFrame:
    """read_ivf_cells with one batch dir optionally excluded (the
    replay-determinism guard: a replayed batch must not see its own
    crashed cell output).  Exclusion is by file path — the compacted
    txlog rows carry no batch dir and always pass."""
    cells = read_ivf_cells(spark, index_root)
    if exclude_batch is None:
        return cells
    return (
        cells.withColumn(
            "__b", F.regexp_extract(F.input_file_name(), r"batch=(\d+)", 1)
        )
        .where(F.col("__b") != F.lit(str(exclude_batch)))
        .drop("__b")
    )


def _beam_search(
    qv: DataFrame,
    graph: DataFrame,
    vecs: DataFrame,
    seeds: DataFrame,
    cent_rows,
    k: int,
    beam: int,
    hops: int,
    entries: int,
) -> DataFrame:
    """The NSW beam-search loop over explicit (query_id, qv) /
    (src, dst) / (node, nv) frames — shared by the public searcher and
    the graph-guided insertion (which points it at exclude-own-batch
    views).  Returns (query_id, neighbor_id, cosine, rank).

    Scoring shape (r13, measured on the maintenance bench): candidate
    pairs are scored by shipping ONLY (query_id, node) ids through
    Arrow — both vector sides ride in the kernel closure
    (``V.cosine_pairs_indexed_pandas``, same per-row float64 math as
    the two-column kernel).  The query side is trigger/caller-bounded;
    the candidate-node side is gathered per hop with one small
    semi-join collect and is HUB-BUDGET-bounded (<= nlist x NAV_MAX
    first-hop children, x degree per further hop), never
    corpus-bounded — the NAV_MAX cap is what makes the gather sound.
    vs the join-the-vector-store-per-hop form this cuts the per-pair
    payload ~30x (two 32-dim float64 copies -> 16 bytes) and drops the
    vecs join from every hop job; the hub fan-out (~NAV_MAX ids per
    query at hop 2) stays, but as ids, not embeddings.

    Hop 1 skips scoring entirely when ``entries <= beam``: its
    candidates are exactly the <= ``entries`` entry seeds per query,
    so top-``beam`` of them is the identity — the first score + rank
    + checkpoint job was pure overhead (measured ~1s/batch)."""
    qrows = qv.collect()
    spark = qv.sparkSession

    def pair_scorer(cand):
        """Gather the candidate nodes' vectors (one bounded collect),
        return (scored_df, kernel) with non-indexed nodes filtered —
        the inner vecs join used to do that filtering."""
        nid_df = cand.select("node").distinct()
        nrows = vecs.join(
            F.broadcast(nid_df), "node", "left_semi"
        ).collect()
        cos_udf = V.cosine_pairs_indexed_pandas(
            [r.query_id for r in qrows], [r.qv for r in qrows],
            [r.node for r in nrows], [r.nv for r in nrows],
        )
        known = spark.createDataFrame(
            [(int(r.node),) for r in nrows], "node long"
        )
        return (
            cand.join(F.broadcast(known), "node", "left_semi"),
            cos_udf,
        )

    qcell = nearest_arrow(
        qv.select(F.col("query_id").alias("__vid"), F.col("qv").alias("v")),
        cent_rows,
        keep=entries,
    ).select(F.col("__vid").alias("query_id"), "cid")
    state = qcell.join(F.broadcast(seeds), "cid").select(
        "query_id", F.col("svid").alias("node")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("node").asc()
    )
    for _hop in range(hops):
        if _hop == 0 and entries <= beam:
            # <= entries candidates per query, all kept: rank is the
            # identity.  One cheap cut replaces the score+window job.
            kept = state.transform(cut_lineage)
        else:
            cand = state.select("query_id", "node").distinct()
            filtered, cos_udf = pair_scorer(cand)
            scored = filtered.select(
                "query_id", "node",
                F.round(
                    cos_udf(F.col("query_id"), F.col("node")), 6
                ).alias("cosine"),
            )
            kept = (
                scored.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= beam)
                .select("query_id", "node")
                # cut per hop: hop t+1's scoring must not replay hops
                # 1..t (operators/nsw.py's rejected-experiment note).
                # REJECTED r12 variant: skipping the LAST hop's cut —
                # its kept feeds two consumers, and the duplicated
                # subtree re-scans the GROWING vector store; measured
                # 568 -> 452 rows/s as history accumulated.
                .transform(cut_lineage)
            )
        expansion = kept.join(
            graph, kept["node"] == graph["src"]
        ).select("query_id", F.col("dst").alias("node"))
        state = kept.unionByName(expansion)
    fcand = state.select("query_id", "node").distinct()
    ffiltered, fcos = pair_scorer(fcand)
    final = (
        ffiltered.where(F.col("node") != F.col("query_id"))
        .select(
            "query_id",
            F.col("node").alias("neighbor_id"),
            F.round(fcos(F.col("query_id"), F.col("node")), 6).alias(
                "cosine"
            ),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        final.withColumn("rank", F.row_number().over(wf))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "cosine",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def nsw_insertion_edges_guided(
    batch_df: DataFrame,
    cells: DataFrame,
    found: DataFrame,
    seeds: DataFrame,
    cent_rows=None,
    g_intra: int = 6,
    seed_links: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nav_max: int | None = None,
    nav_used: dict[int, int] | None = None,
) -> DataFrame:
    """Edge additions — the textbook NSW insert: each new node's
    HISTORY candidates come from a BEAM SEARCH over the current graph
    (``found``: (query_id, neighbor_id, cosine) from
    :func:`_beam_search`, cost independent of corpus size — an
    exhaustive history scan would be O(corpus²/nlist) across a stream's
    lifetime), its IN-BATCH candidates from the vectorized same-cell
    top-``g_intra`` kernel (trigger-bounded).  Both pools carry the
    same ROUND-6 cosine, so one per-src window picks the final
    top-``g_intra`` across them; back-links and nav links follow the
    module docstring.  With an empty ``found`` (batch 0) this IS the
    batch build's edge set (kernel == expression scoring up to
    last-ulp rounding, pinned by the single-batch parity test)."""
    in_batch = _inbatch_topg_pairs(cells, g_intra).select(
        "src", "dst", F.lit(False).alias("is_hist"),
        # re-round with F.round (HALF_UP): the beam pool's cosines are
        # F.round'ed, and both pools rank in ONE per-src window below —
        # the kernel's np.round (half-to-even) could tie-break a cosine
        # landing exactly on a 5e-7 boundary differently (ADVICE r12).
        # Idempotent for values already on the 1e-6 grid; the kernel
        # keeps np.round internally only for its own top-g selection.
        F.round(F.col("cos"), 6).alias("cos"),
    )
    hist_cand = found.select(
        F.col("query_id").alias("src"),
        F.col("neighbor_id").alias("dst"),
        F.lit(True).alias("is_hist"),
        F.col("cosine").alias("cos"),
    )
    scored = in_batch.unionByName(hist_cand)
    wsrc = Window.partitionBy("src").orderBy(
        F.col("cos").desc(), F.col("dst").asc()
    )
    intra = (
        scored.withColumn("rn", F.row_number().over(wsrc))
        .where(F.col("rn") <= g_intra)
        .select("src", "dst", "is_hist", "cos")
    )
    wdst = Window.partitionBy("dst").orderBy(
        F.col("cos").desc(), F.col("src").asc()
    )
    back = (
        intra.where(F.col("is_hist"))
        .withColumn("bn", F.row_number().over(wdst))
        .where(F.col("bn") <= g_intra)
        .select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.lit("intra").alias("kind"),
        )
    )
    probes = nearest_arrow(
        batch_df.select(
            F.col(id_col).alias("__vid"),
            V.to_double_array(F.col(vec_col)).alias("v"),
        ),
        cent_rows,
        keep=seed_links,
    ).select(F.col("__vid").alias("node"), "cid")
    linked = probes.join(F.broadcast(seeds), "cid").where(
        F.col("node") != F.col("svid")
    )
    nav_up = linked.select(
        F.col("node").alias("src"), F.col("svid").alias("dst"),
        F.lit("nav_up").alias("kind"),
    )
    nav_down = linked
    if nav_max is not None:
        # hub fan-out budget: only the first (nav_max - used) nodes per
        # cell, by id, ever receive a seed->node edge — the EXACT
        # degree cap (module NAV_MAX note); the used counts come from
        # the driver-side sidecar, so the budget is monotone and
        # replay-deterministic.  node->seed edges stay uncapped (their
        # degree is <= seed_links per node).
        spark = batch_df.sparkSession
        wnav = Window.partitionBy("cid").orderBy(F.col("node").asc())
        nav_down = nav_down.withColumn("__rn", F.row_number().over(wnav))
        if nav_used:
            used_df = spark.createDataFrame(
                [(int(c), int(n)) for c, n in sorted(nav_used.items())],
                "cid int, __used long",
            )
            nav_down = nav_down.join(F.broadcast(used_df), "cid", "left")
        else:
            nav_down = nav_down.withColumn("__used", F.lit(0).cast("long"))
        nav_down = nav_down.where(
            F.col("__rn") <= nav_max - F.coalesce(F.col("__used"), F.lit(0))
        )
    nav = nav_up.unionByName(
        nav_down.select(
            F.col("svid").alias("src"), F.col("node").alias("dst"),
            F.lit("nav_down").alias("kind"),
        )
    )
    return (
        intra.select("src", "dst", F.lit("intra").alias("kind"))
        .unionByName(back)
        .unionByName(nav)
        .distinct()
    )


def start_nsw_index_stream(
    vec_stream: DataFrame,
    index_root: str,
    checkpoint_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 8,
    g_intra: int = 6,
    seed_links: int = 3,
    beam: int = 8,
    hops: int = 3,
    nav_max: int = NAV_MAX,
    available_now: bool = True,
    batch_shuffle_partitions: int | None = 4,
    compact_every: int | None = 8,
) -> StreamingQuery:
    """foreachBatch loop: (freeze centroids + seeds on batch 0) →
    assign cells → NSW insertion edges → batch-keyed OVERWRITE writes →
    periodic compaction of both stores.

    Insertion has two regimes.  Batch 0 (empty history) runs the
    exhaustive in-cell scan — exactly ``build_nsw_graph``, the parity
    contract.  Every later batch is GRAPH-GUIDED (the textbook NSW
    insert): history candidates come from a ``beam``×``hops`` beam
    search over the graph built so far, so per-batch cost is
    O(batch × beam × degree × hops) — independent of corpus size —
    while in-batch candidates stay the exhaustive same-cell pairs
    (trigger-bounded).  An exhaustive-vs-history scan would be
    O(corpus²/nlist) across the stream's lifetime; the beam-guided
    insert is what makes the index maintainable forever."""

    frozen_cache: dict = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev: dict[str, str | None] = {}
        if batch_shuffle_partitions is not None:
            for key, val in (
                ("spark.sql.shuffle.partitions", batch_shuffle_partitions),
                ("spark.sql.files.minPartitionNum", 4),
                ("spark.sql.adaptive.enabled", "false"),
            ):
                prev[key] = spark.conf.get(key, None)
                spark.conf.set(key, str(val))
        try:
            if compact_every and batch_id > 0 and (
                batch_id % compact_every == 0
            ):
                # compaction runs at the START of the batch AFTER the
                # fold window's checkpoint commit — never between a
                # batch's writes and its commit — and excludes any
                # crashed prior attempt of THIS batch, so a replayed
                # batch can never see its own rows through the
                # compacted store (exactly-once stays exact across the
                # compaction boundary; same fold coverage as the old
                # end-of-batch trigger, shifted one commit later)
                compact_ivf_cells(
                    spark, index_root, exclude_batch=batch_id
                )
                compact_nsw_edges(
                    spark, index_root, g_intra=g_intra,
                    exclude_batch=batch_id,
                )
            centroids = read_ivf_centroids(spark, index_root)
            if centroids is None:
                # iters=0: the seeded closed-form quantizer — the exact
                # cell geometry of the batch NSW build (parity contract)
                train_centroids(
                    batch_df, nlist, 0, id_col, vec_col
                ).coalesce(1).write.mode("overwrite").parquet(
                    f"{index_root}/centroids"
                )
                centroids = read_ivf_centroids(spark, index_root)
            if read_nsw_seeds(spark, index_root) is None:
                # hub layer frozen from batch 0: min id per id%nlist
                # stratum (build_nsw_graph's _seed_members on batch 0);
                # strata batch 0 misses simply have no hub — their
                # queries enter through the nearest SEEDED cell
                (
                    batch_df.select(
                        (F.col(id_col) % nlist).cast("int").alias("cid"),
                        F.col(id_col).alias("svid"),
                    )
                    .groupBy("cid")
                    .agg(F.min("svid").alias("svid"))
                    .coalesce(1)
                    .write.mode("overwrite")
                    .parquet(f"{index_root}/seeds")
                )
            seeds = read_nsw_seeds(spark, index_root)
            if not frozen_cache:
                # centroids and seeds are frozen after batch 0: collect
                # both ONCE per stream (KB-scale) — the Arrow nearest
                # kernels carry them in their closures every batch
                cent_rows = centroids.collect()
                seeds_map = {
                    int(r.svid): int(r.cid) for r in seeds.collect()
                }
                seed_cids = set(seeds_map.values())
                frozen_cache["cents"] = cent_rows
                frozen_cache["seeded_cents"] = [
                    r for r in cent_rows if int(r.cid) in seed_cids
                ]
                frozen_cache["seeds_map"] = seeds_map
            cells = assign_cells_arrow(
                batch_df, frozen_cache["cents"], id_col, vec_col
            ).withColumn("nrm", V.norm(F.col("iv"))).persist()
            edir = f"{index_root}/edges"
            have_graph = (
                current_version(index_root, _EDGE_COMPACT) is not None
                or (
                    os.path.isdir(edir)
                    and any(
                        d.startswith("batch=")
                        and d != f"batch={batch_id}"
                        for d in os.listdir(edir)
                    )
                )
            )
            if not have_graph:
                # batch 0 (or nothing committed yet): no graph to
                # search — the guided path with an empty candidate
                # frame degenerates to the batch build's edge set
                found = spark.createDataFrame(
                    [], "query_id long, neighbor_id long, cosine double"
                )
            else:
                graph = (
                    read_nsw_edges(
                        spark, index_root, exclude_batch=batch_id
                    )
                    .select("src", "dst")
                    .distinct()
                )
                # graph-guided insert: candidates via beam search over
                # the committed graph (own-batch dirs excluded from
                # both views — the replay determinism guard)
                # materialize the deduped vector view ONCE per batch:
                # every beam hop's checkpoint job joins it, and without
                # the cut each hop re-scans the growing (and batch-dir-
                # fragmented) cell store — measured the dominant share
                # of the per-hop job cost at bench scale (r13)
                vecs = (
                    _cells_view(spark, index_root, exclude_batch=batch_id)
                    .dropDuplicates(["item_id"])
                    .select(
                        F.col("item_id").alias("node"),
                        F.col("iv").alias("nv"),
                    )
                    .transform(cut_lineage)
                )
                qv = batch_df.select(
                    F.col(id_col).alias("query_id"),
                    V.to_double_array(F.col(vec_col)).alias("qv"),
                )
                # insertion search runs leaner than query search: one
                # entry cell and hops-1 is enough to land candidates —
                # the final per-src window mixes them with the in-batch
                # kernel pairs and the back-links keep the graph
                # reachable; the recall parity test guards the quality
                found = _beam_search(
                    qv, graph.transform(cut_lineage), vecs, seeds,
                    frozen_cache["seeded_cents"], k=g_intra, beam=beam,
                    hops=max(2, hops - 1), entries=1,
                )
            nav_used = _read_nav_used(index_root, exclude_batch=batch_id)
            edges = nsw_insertion_edges_guided(
                batch_df, cells, found, seeds,
                frozen_cache["seeded_cents"],
                g_intra=g_intra, seed_links=seed_links,
                id_col=id_col, vec_col=vec_col,
                nav_max=nav_max, nav_used=nav_used,
            )
            # single file per batch dir (same defragmentation argument
            # as the cells write; ~60k edge rows per bench batch)
            edges.repartition(1).write.mode("overwrite").parquet(
                f"{index_root}/edges/batch={batch_id}"
            )
            seeds_map = frozen_cache["seeds_map"]
            _write_nav_used(
                index_root, batch_id,
                _nav_adds_from_edges(index_root, batch_id, seeds_map),
            )
            # repartition by cid before the partitionBy write: ONE file
            # per (batch, cid) instead of one per (shuffle partition,
            # cid) — the cell store is re-scanned by every subsequent
            # batch's beam, and the 4x file fan-out was listing/open
            # latency in every hop job (repartition, not coalesce: the
            # compute above keeps its width)
            cells.select("cid", "item_id", "iv").repartition(
                F.col("cid")
            ).write.mode("overwrite").partitionBy("cid").parquet(
                f"{index_root}/cells/batch={batch_id}"
            )
            cells.unpersist()
        finally:
            for key, val in prev.items():
                if val is None:
                    spark.conf.unset(key)
                else:
                    spark.conf.set(key, val)

    writer = vec_stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def nsw_stream_index_topk(
    spark: SparkSession,
    index_root: str,
    queries: DataFrame,
    k: int = 5,
    beam: int = 8,
    hops: int = 3,
    entries: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Beam search over the stream-maintained graph —
    ``operators/nsw.py::nsw_beam_topk``'s search loop (``_beam_search``)
    pointed at the persisted stores, duplicate-immune (edges joined
    distinct, candidates deduped per hop by the same distinct the batch
    searcher already applies)."""
    centroids = read_ivf_centroids(spark, index_root)
    seeds = read_nsw_seeds(spark, index_root)
    if centroids is None or seeds is None:
        raise ValueError(f"no committed index under {index_root}")
    cent_rows = _seeded_cent_rows(seeds, centroids)
    graph = read_nsw_edges(spark, index_root).select(
        "src", "dst"
    ).distinct().transform(cut_lineage)
    vecs = (
        read_ivf_cells(spark, index_root)
        .dropDuplicates(["item_id"])
        .select(F.col("item_id").alias("node"), F.col("iv").alias("nv"))
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        V.to_double_array(F.col(vec_col)).alias("qv"),
    )
    return _beam_search(
        qv, graph, vecs, seeds, cent_rows,
        k=k, beam=beam, hops=hops, entries=entries,
    )
