"""Level-synchronous DISTRIBUTED flow kernels for giant components (G13/G14).

The reference walks the whole graph single-threaded in topological order
(upstream accumulation src/bin/osm-lump-ways-down/main.rs:805-910, biggest-end
:1126-1170). Round 1 of this engine ran each weak component inside one
``map_groups`` task — fine for many small components, but a planet river
network is effectively ONE component, which must not land in one task. This
module runs the same dataflow as bucket-local rounds:

- every edge is shipped to bucket(src) (the authoritative copy — its owner
  computes the edge's upstream) and, when different, to bucket(dst) (the
  read-only in-edge view its destination needs);
- a bucket therefore knows, for every node it owns, the node's complete in- and
  out-edge sets, and finalizes any owned node whose in-edges are all done —
  id-local chains cascade inside one round, so rounds ≈ cross-bucket depth,
  not node depth;
- per-round output is ONLY the authoritative copies (one row per edge), so no
  vote/merge step is needed; a ``newly`` counter per bucket drives convergence;
- state checkpoints every ``checkpoint_every`` rounds (north rule: a killed
  job resumes mid-algorithm).

Split-rule parity with stages/scc._flow_group (reference quirks kept):
single-out nodes push ``inflow + length`` downstream and stamp the edge with
``inflow``; multi-out nodes recompute per-tag inflow as Σ(upstream+length) over
in-edges, split a tag's inflow over that tag's out count, spread orphan-tag
inflow equally over ALL outs, and push the stamped value WITHOUT adding the
out-edge's own length. The push amount therefore depends on the PREDECESSOR's
out-degree; it travels on the edge row as ``pushed_m`` so no degree lookup is
needed downstream.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Optional

import numpy as np
import pyarrow as pa

from .relational import snapshot

_SHIFT = 6  # id-range bucket (shared convention with stages/scc.py)


def _flow_round_local(df, split_equally: bool):
    """One bucket, one round: finalize every owned node whose in-edges are done.

    Rows: kind 0 = authoritative edge copy (bucket(src) == this bucket),
    kind 1 = in-edge view (cross-bucket, bucket(dst) == this bucket).
    Emits updated kind-0 rows plus a per-row ``newly`` count (newly finalized
    edges, summed by the driver for convergence)."""
    kind = df["kind"].to_numpy()
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    length = df["length_m"].to_numpy()
    tag = df["tagid"].to_numpy()
    up = df["upstream_m"].to_numpy().copy()
    pushed = df["pushed_m"].to_numpy().copy()
    done = df["done"].to_numpy().copy()
    bucket = int(df["bucket"].iloc[0])
    if split_equally:
        tag = np.full(len(src), -1, dtype=np.int64)

    own_idx = np.where(kind == 0)[0]
    outs = defaultdict(list)   # owned node -> [edge idx] (kind 0)
    ins = defaultdict(list)    # owned node -> [edge idx] (kind 0 local or kind 1)
    for i in own_idx:
        outs[int(src[i])].append(int(i))
        if int(dst[i]) >> _SHIFT == bucket:
            ins[int(dst[i])].append(int(i))
    for i in np.where(kind == 1)[0]:
        ins[int(dst[i])].append(int(i))

    # nodes owned here with out-edges and not yet fully finalized
    pending = {n for n, es in outs.items()
               if any(done[i] == 0 for i in es)}
    newly = 0
    progress = True
    while progress and pending:
        progress = False
        for n in sorted(pending):
            in_es = ins.get(n, ())
            if any(done[i] == 0 for i in in_es):
                continue
            o = outs[n]
            if len(o) == 1:
                curr = float(sum(pushed[i] for i in in_es))
                ei = o[0]
                up[ei] = curr
                pushed[ei] = curr + float(length[ei])
                done[ei] = 1
            else:
                inflow = defaultdict(float)
                for i in in_es:
                    inflow[int(tag[i])] += float(up[i]) + float(length[i])
                outs_per_group = defaultdict(int)
                for i in o:
                    outs_per_group[int(tag[i])] += 1
                outflow = {t: inflow.get(t, 0.0) / c
                           for t, c in outs_per_group.items()}
                for t_in, amt in inflow.items():
                    if t_in not in outs_per_group:
                        for t_out in outflow:
                            outflow[t_out] += amt / len(o)
                for i in o:
                    up[i] = outflow[int(tag[i])]
                    pushed[i] = outflow[int(tag[i])]
                    done[i] = 1
            newly += len(o)
            pending.discard(n)
            progress = True

    keep = own_idx
    out = pa.table({
        "src": pa.array(src[keep].astype(np.int64)),
        "dst": pa.array(dst[keep].astype(np.int64)),
        "length_m": pa.array(length[keep].astype(np.float64)),
        "tagid": pa.array(df["tagid"].to_numpy()[keep].astype(np.int64)),
        "upstream_m": pa.array(up[keep].astype(np.float64)),
        "pushed_m": pa.array(pushed[keep].astype(np.float64)),
        "done": pa.array(done[keep].astype(np.int8)),
    })
    n_out = len(keep)
    newly_col = np.zeros(n_out, dtype=np.int64)
    if n_out:
        newly_col[0] = newly
    return out.append_column("newly", pa.array(newly_col))


def upstream_flow_distributed(edges_ds, *, split_equally: bool = True,
                              num_partitions: int = 8, checkpoint=None,
                              max_rounds: int = 512, checkpoint_every: int = 8):
    """G13 over a DAG edge Dataset (src, dst, length_m[, tagid]) without any
    per-component task: bucket-local dataflow rounds (module docstring).
    Requires unique (src, dst) pairs (G11 contraction dedupes parallel edges).
    Returns (src, dst, length_m[, tagid], upstream_m) like the map_groups
    path — tagid passes through only when the input carried it."""
    has_tag = "tagid" in edges_ds.schema().names

    def init(batch: pa.Table) -> pa.Table:
        n = len(batch)
        t = pa.table({
            "src": batch["src"], "dst": batch["dst"],
            "length_m": batch["length_m"].cast(pa.float64()),
            "tagid": (batch["tagid"].cast(pa.int64()) if "tagid" in batch.column_names
                      else pa.array(np.full(n, -1, dtype=np.int64))),
            "upstream_m": pa.array(np.zeros(n, dtype=np.float64)),
            "pushed_m": pa.array(np.zeros(n, dtype=np.float64)),
            "done": pa.array(np.zeros(n, dtype=np.int8)),
        })
        return t

    state = snapshot(edges_ds.map_batches(init, batch_format="pyarrow"))

    fp_prefix = None
    start_round = 0
    if checkpoint is not None and checkpoint.root is not None:
        import hashlib

        from ..state.checkpoint import content_digest

        digest = content_digest(state, ("src", "dst"))
        fp = hashlib.md5(
            f"flow|{split_equally}|{num_partitions}|{state.count()}|{digest}"
            .encode()).hexdigest()[:10]
        fp_prefix = f"flow-{fp}"
        # resume from the latest checkpointed round
        for r in range(max_rounds - 1, -1, -1):
            if checkpoint.has(f"{fp_prefix}/r{r}"):
                state = checkpoint.load(f"{fp_prefix}/r{r}")
                start_round = r + 1
                break

    def fanout(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        bs = s >> _SHIFT
        bd = d >> _SHIFT
        cross = bs != bd
        nc = int(cross.sum())
        cols = {}
        for c in ("src", "dst", "length_m", "tagid", "upstream_m",
                  "pushed_m", "done"):
            a = batch[c].to_numpy(zero_copy_only=False)
            cols[c] = pa.array(np.concatenate([a, a[cross]]))
        cols["bucket"] = pa.array(np.concatenate([bs, bd[cross]]), pa.int64())
        cols["kind"] = pa.array(np.concatenate(
            [np.zeros(len(s), dtype=np.int8), np.ones(nc, dtype=np.int8)]))
        return pa.table(cols)

    for rnd in range(start_round, max_rounds):
        out = state.map_batches(fanout, batch_format="pyarrow") \
                   .groupby("bucket").map_groups(
                       lambda df: _flow_round_local(df, split_equally),
                       batch_format="pandas")
        out = snapshot(out)
        newly = out.sum("newly")
        state = out.drop_columns(["newly"])
        if checkpoint is not None and checkpoint.root is not None \
                and (rnd + 1) % checkpoint_every == 0:
            state = checkpoint.save(f"{fp_prefix}/r{rnd}", state,
                                    extra={"round": rnd, "newly": newly})
        if newly == 0:
            break

    remaining = state.count() - int(state.sum("done") or 0)
    if remaining:
        raise RuntimeError(
            f"upstream_flow_distributed: {remaining} edges never finalized "
            f"after {max_rounds} rounds — cycle in input? contract SCCs first (G11)")
    return state.select_columns(
        ["src", "dst", "length_m"] + (["tagid"] if has_tag else [])
        + ["upstream_m"])


# ------------------------------------------------------------------- G14

def _bige_round_local(df):
    """One bucket, one reverse-dataflow round of biggest-end assignment.

    Rows: kind 0 = successor VIEW (node = the owned predecessor, other = the
    successor, end/up/done = the successor's state as of last round — produced
    by a states⋈edges join), kind 2 = owned node state. An owned node assigns
    itself once ALL its successors are assigned: assignment = the successor
    assignment maximizing (end_upstream, -end_nid) (deterministic tie-break,
    stages/waterways.py). Newly assigned OWNED successors update local views in
    the same round, so id-local chains cascade in one round."""
    kind = df["kind"].to_numpy()
    node = df["node"].to_numpy()
    other = df["other"].to_numpy()
    end_nid = df["end_nid"].to_numpy()
    end_up = df["end_up"].to_numpy()
    done = df["done"].to_numpy()

    # successor views per owned node; assignments of nodes (own or foreign)
    succs = defaultdict(list)       # owned node -> [successor id]
    view: dict[int, tuple] = {}     # successor id -> (done, end_up, end_nid)
    owned: dict[int, list] = {}     # node -> [end_nid, end_up, done]
    for i in range(len(kind)):
        if kind[i] == 0:
            n, m = int(node[i]), int(other[i])
            succs[n].append(m)
            if int(done[i]) == 1:
                view[m] = (float(end_up[i]), int(end_nid[i]))
        else:
            owned[int(node[i])] = [int(end_nid[i]), float(end_up[i]),
                                   int(done[i])]
    # owned assigned nodes are authoritative views for local successors
    for n, st in owned.items():
        if st[2] == 1:
            view[n] = (st[1], st[0])

    newly = 0
    progress = True
    while progress:
        progress = False
        for n in sorted(owned):
            st = owned[n]
            if st[2] == 1:
                continue
            ss = succs.get(n, ())
            if not ss or any(s not in view for s in ss):
                continue
            # views carry (end_upstream-of-the-assigned-END, end_nid), so the
            # max IS the reference's (end_up[assigned[d]], -assigned[d]) rule
            # and the winning pair propagates unchanged to predecessors
            best = max((view[s][0], -view[s][1]) for s in ss)
            st[0], st[1], st[2] = -best[1], best[0], 1
            view[n] = (st[1], st[0])
            newly += 1
            progress = True

    n_nodes = len(owned)
    nodes_arr = np.fromiter(owned.keys(), dtype=np.int64, count=n_nodes)
    ends_arr = np.fromiter((v[0] for v in owned.values()), dtype=np.int64,
                           count=n_nodes)
    ups_arr = np.fromiter((v[1] for v in owned.values()), dtype=np.float64,
                          count=n_nodes)
    done_arr = np.fromiter((v[2] for v in owned.values()), dtype=np.int8,
                           count=n_nodes)
    newly_col = np.zeros(n_nodes, dtype=np.int64)
    if n_nodes:
        newly_col[0] = newly
    return pa.table({
        "node": pa.array(nodes_arr),
        "end_nid": pa.array(ends_arr),
        "end_up": pa.array(ups_arr),
        "done": pa.array(done_arr),
        "newly": pa.array(newly_col),
    })


def biggest_end_distributed(flow_edges_ds, *, num_partitions: int = 8,
                            max_rounds: int = 512):
    """G14 without per-component tasks: every node is assigned the downstream
    end with maximal (end_upstream, -end_nid), via reverse dataflow rounds —
    each round one states⋈edges join (successor views) + one bucketed local
    cascade. Input: flow-annotated DAG edges (src, dst, length_m, upstream_m).
    Output: (node, end_nid) for every node (ends map to themselves)."""
    from .relational import cogroup_join, concat_blocks

    # ---- init: ends = outdeg-0 nodes; end_up(end) = Σ in (upstream + length).
    # One bucketed pass over both-endpoint edge copies gives complete degree
    # info per owned id range.
    def fanout_static(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        bs = s >> _SHIFT
        bd = d >> _SHIFT
        cross = bs != bd
        nc = int(cross.sum())
        ln = batch["length_m"].to_numpy(zero_copy_only=False)
        up = batch["upstream_m"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(np.concatenate([bs, bd[cross]]), pa.int64()),
            "kind": pa.array(np.concatenate([np.zeros(len(s), dtype=np.int8),
                                             np.ones(nc, dtype=np.int8)])),
            "node": pa.array(np.concatenate([s, s[cross]]), pa.int64()),
            "other": pa.array(np.concatenate([d, d[cross]]), pa.int64()),
            "length_m": pa.array(np.concatenate([ln, ln[cross]]), pa.float64()),
            "upstream_m": pa.array(np.concatenate([up, up[cross]]), pa.float64()),
        })

    def init_states(df):
        kind = df["kind"].to_numpy()
        node = df["node"].to_numpy()
        other = df["other"].to_numpy()
        ln = df["length_m"].to_numpy()
        up = df["upstream_m"].to_numpy()
        bucket = int(df["bucket"].iloc[0])
        outdeg = defaultdict(int)
        in_sum = defaultdict(float)
        seen = set()
        for i in range(len(kind)):
            s, d = int(node[i]), int(other[i])
            same = (s >> _SHIFT == bucket) and (d >> _SHIFT == bucket)
            if kind[i] == 1 and same:
                continue  # same-bucket edges already counted via kind 0
            if s >> _SHIFT == bucket:
                outdeg[s] += 1
                seen.add(s)
            if d >> _SHIFT == bucket:
                in_sum[d] += float(up[i]) + float(ln[i])
                seen.add(d)
        nodes = sorted(seen)
        return pa.table({
            "node": pa.array(np.array(nodes, dtype=np.int64)),
            "end_nid": pa.array(np.array(
                [n if outdeg[n] == 0 else -1 for n in nodes], dtype=np.int64)),
            "end_up": pa.array(np.array(
                [in_sum[n] if outdeg[n] == 0 else 0.0 for n in nodes],
                dtype=np.float64)),
            "done": pa.array(np.array(
                [1 if outdeg[n] == 0 else 0 for n in nodes], dtype=np.int8)),
        })

    static = snapshot(flow_edges_ds.map_batches(fanout_static,
                                                batch_format="pyarrow"))
    states = snapshot(static.groupby("bucket").map_groups(
        init_states, batch_format="pandas"))
    edges_sd = snapshot(flow_edges_ds.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"]}),
        batch_format="pyarrow"))

    for rnd in range(max_rounds):
        # successor views: edges ⋈ states on dst
        st_d = states.map_batches(
            lambda b: pa.table({"dst": b["node"], "_e": b["end_nid"],
                                "_u": b["end_up"], "_d": b["done"]}),
            batch_format="pyarrow")
        views = cogroup_join(edges_sd, st_d, ("dst",), how="inner",
                             num_partitions=num_partitions)

        def tag_views(batch: pa.Table) -> pa.Table:
            s = batch["src"].to_numpy(zero_copy_only=False)
            return pa.table({
                "bucket": pa.array(s >> _SHIFT, pa.int64()),
                "kind": pa.array(np.zeros(len(s), dtype=np.int8)),
                "node": batch["src"],
                "other": batch["dst"],
                "end_nid": batch["_e"],
                "end_up": batch["_u"],
                "done": batch["_d"].cast(pa.int8()),
            })

        def tag_states(batch: pa.Table) -> pa.Table:
            n = batch["node"].to_numpy(zero_copy_only=False)
            return pa.table({
                "bucket": pa.array(n >> _SHIFT, pa.int64()),
                "kind": pa.array(np.full(len(n), 2, dtype=np.int8)),
                "node": batch["node"],
                "other": pa.array(np.zeros(len(n), dtype=np.int64)),
                "end_nid": batch["end_nid"],
                "end_up": batch["end_up"],
                "done": batch["done"].cast(pa.int8()),
            })

        out = concat_blocks(
            views.map_batches(tag_views, batch_format="pyarrow"),
            states.map_batches(tag_states, batch_format="pyarrow"),
        ).groupby("bucket").map_groups(_bige_round_local, batch_format="pandas")
        out = snapshot(out)
        newly = out.sum("newly")
        states = snapshot(out.map_batches(
            lambda b: pa.table({"node": b["node"], "end_nid": b["end_nid"],
                                "end_up": b["end_up"], "done": b["done"]}),
            batch_format="pyarrow"))
        if newly == 0:
            break
    undone = states.count() - int(states.sum("done") or 0)
    if undone:
        raise RuntimeError(
            f"biggest_end_distributed: {undone} nodes unassigned after "
            f"{max_rounds} rounds — cycle in input?")
    return states.select_columns(["node", "end_nid"])


# ------------------------------------------------------------ G16 distributed

def _succ_table(flow_edges_ds, assign_ds, *, num_partitions: int = 8):
    """Per-node successor for the G16 upstream walk: for every node d, the
    in-edge (s → d) maximizing (upstream_m, s, length_m) among predecessors
    s in the SAME G14 assignment class (-down/main.rs grouped-ends candidate
    rule, mirrored by waterways._component_walks `max(cands)`). Self-loops
    excluded. Output rows: (node, ptr, hop_len, hop_up) — walking up from
    ``node`` continues at ``ptr`` along an edge of length ``hop_len`` whose
    upstream value is ``hop_up``."""
    from .relational import cogroup_join

    e = flow_edges_ds.map_batches(
        lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                            "length_m": b["length_m"],
                            "upstream_m": b["upstream_m"]}),
        batch_format="pyarrow")
    a_src = assign_ds.map_batches(
        lambda b: pa.table({"src": b["node"], "_as": b["end_nid"]}),
        batch_format="pyarrow")
    a_dst = assign_ds.map_batches(
        lambda b: pa.table({"dst": b["node"], "_ad": b["end_nid"]}),
        batch_format="pyarrow")
    e = cogroup_join(e, a_src, ("src",), how="inner",
                     num_partitions=num_partitions)
    e = cogroup_join(e, a_dst, ("dst",), how="inner",
                     num_partitions=num_partitions)

    def same_class(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        asn = b["_as"].to_numpy(zero_copy_only=False)
        adn = b["_ad"].to_numpy(zero_copy_only=False)
        keep = (asn == adn) & (s != d)
        bkt = (d[keep].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
               >> np.uint64(17)).astype(np.int64) % num_partitions
        return pa.table({
            "node": pa.array(d[keep], pa.int64()),
            "ptr": pa.array(s[keep], pa.int64()),
            "hop_len": b["length_m"].to_numpy(zero_copy_only=False)[keep],
            "hop_up": b["upstream_m"].to_numpy(zero_copy_only=False)[keep],
            "_b": pa.array(bkt, pa.int64()),
        })

    cand = e.map_batches(same_class, batch_format="pyarrow")

    def argmax_per_node(t: pa.Table) -> pa.Table:
        d = t["node"].to_numpy(zero_copy_only=False)
        s = t["ptr"].to_numpy(zero_copy_only=False)
        ln = t["hop_len"].to_numpy(zero_copy_only=False)
        up = t["hop_up"].to_numpy(zero_copy_only=False)
        # sort by node asc, then (up, s, ln) DESC — first row per node wins
        order = np.lexsort((-ln, -s, -up, d))
        d, s, ln, up = d[order], s[order], ln[order], up[order]
        first = np.zeros(len(d), dtype=bool)
        first[0:1] = True
        first[1:] = d[1:] != d[:-1]
        return pa.table({
            "node": pa.array(d[first], pa.int64()),
            "ptr": pa.array(s[first], pa.int64()),
            "hop_len": pa.array(ln[first], pa.float64()),
            "hop_up": pa.array(up[first], pa.float64()),
        })

    return snapshot(cand.groupby("_b").map_groups(argmax_per_node,
                                                  batch_format="pyarrow"))


def _compose_levels(left, right, *, num_partitions: int = 8,
                    inner_only: bool = False):
    """Compose chain segments: for each row x of ``left`` (covering hops
    x→x.ptr), extend by ``right``'s segment at x.ptr when one exists. With
    ``inner_only`` the un-extendable rows are dropped (binary-lifting level
    construction); otherwise they pass through unchanged (Wyllie pointer
    jumping). Returns (dataset, n_extended).

    ONE ``left_outer`` join per round — the original inner + left_anti pair
    paid two full join passes per doubling round, and at small scale the
    per-execution fixed cost dominated (grouped_paths_dist 13.9 s → ~7 s).
    Unmatched rows pass through via null-fill; null handling avoids float64
    round-trips of 63-bit node ids (``fill_null`` + int64 cast, never NaN)."""
    import pyarrow.compute as pc

    from .relational import cogroup_join

    rview = right.map_batches(
        lambda b: pa.table({"ptr": b["node"], "_p2": b["ptr"],
                            "_d2": b["hop_len"], "_s2": b["_s"],
                            "_u2": b["hop_up"]}),
        batch_format="pyarrow")
    joined = cogroup_join(left, rview, ("ptr",), how="left_outer",
                          num_partitions=num_partitions)

    def compose(b: pa.Table) -> pa.Table:
        ok = pc.is_valid(b["_p2"]).to_numpy(zero_copy_only=False)
        p2 = pc.fill_null(b["_p2"], 0).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        d2 = pc.fill_null(b["_d2"], 0.0).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        s2 = pc.fill_null(b["_s2"], 0).cast(pa.int64()) \
            .to_numpy(zero_copy_only=False)
        u2 = pc.fill_null(b["_u2"], 0.0).cast(pa.float64()) \
            .to_numpy(zero_copy_only=False)
        ptr = b["ptr"].to_numpy(zero_copy_only=False)
        hop_len = b["hop_len"].to_numpy(zero_copy_only=False)
        hop_up = b["hop_up"].to_numpy(zero_copy_only=False)
        s = b["_s"].to_numpy(zero_copy_only=False)
        t = pa.table({
            "node": b["node"],
            "ptr": pa.array(np.where(ok, p2, ptr), pa.int64()),
            "hop_len": pa.array(np.where(ok, hop_len + d2, hop_len),
                                pa.float64()),
            "hop_up": pa.array(np.where(ok, u2, hop_up), pa.float64()),
            "_s": pa.array(np.where(ok, s + s2, s), pa.int64()),
            "_ext": pa.array(ok.astype(np.int64), pa.int64()),
        })
        if inner_only:
            t = t.filter(pa.array(ok))
        return t

    out = snapshot(joined.map_batches(compose, batch_format="pyarrow"))
    if inner_only:
        n_ext = out.count()  # metadata-only on a snapshot
    else:
        n_ext = int(out.sum("_ext") or 0)
    # _ext is dropped LAZILY — the next round's consumer fuses the select
    return out.select_columns(["node", "ptr", "hop_len", "hop_up", "_s"]), \
        n_ext


def grouped_paths_distributed(flow_edges_ds, assign_ds, *,
                              max_dist_m: Optional[float] = None,
                              num_partitions: int = 8, max_rounds: int = 48):
    """G16 path rows WITHOUT per-component tasks — distributed list ranking.

    Semantics (-down/main.rs:1426-1714, parity vs waterways._component_walks):
    from every end (outdeg-0 node) walk UP the in-edge maximizing
    (upstream_m, src, length_m) among same-assignment predecessors, cutting
    when no candidate remains or cumulative distance would exceed
    ``max_dist_m``. Ends' walks are provably disjoint — each stays inside its
    own G14 assignment class (one end per class) and the successor function is
    acyclic on a DAG — so the reference's shared used-set never changes the
    result and each path is the pointer chain e → succ(e) → succ²(e) → ….

    Distributed shape: (1) one bucketed argmax builds the successor table;
    (2) Wyllie pointer doubling compresses every chain in O(log chain-hops)
    join rounds, each state row carrying (ptr, Σ hop_len, hop count, upstream
    of the hop entering ptr); (3) uncapped: each end reads its own fully
    compressed state; capped: the doubling levels are KEPT (2^r-hop exact
    segments) and each end binary-lifts down them greedily — take a 2^r jump
    iff cumulative stays ≤ cap, exact because hop lengths are nonnegative so
    cumulative distance is monotone along the chain. No task ever holds a
    whole component; rounds are joins over (node, ptr, scalars) rows only.

    Returns path rows: (end_nid, n_nodes, dist_m, from_upstream_m,
    to_upstream_m) — one per end reachable from the edge set."""
    from .relational import bucket_agg, cogroup_join, concat_blocks

    succ = _succ_table(flow_edges_ds, assign_ds,
                       num_partitions=num_partitions)
    lvl0 = snapshot(succ.map_batches(
        lambda b: b.append_column("_s", pa.array(
            np.ones(len(b), dtype=np.int64))),
        batch_format="pyarrow"))

    # ends = distinct dst never appearing as src (outdeg 0; isolated nodes
    # are absent from the edge set, matching the sequential walk's universe)
    dsts = bucket_agg(flow_edges_ds.map_batches(
        lambda b: pa.table({"node": b["dst"]}), batch_format="pyarrow"),
        ["node"], {"_n": (None, "count")},
        num_partitions=num_partitions, combine=True).select_columns(["node"])
    srcs = bucket_agg(flow_edges_ds.map_batches(
        lambda b: pa.table({"node": b["src"]}), batch_format="pyarrow"),
        ["node"], {"_n": (None, "count")},
        num_partitions=num_partitions, combine=True).select_columns(["node"])
    ends = snapshot(cogroup_join(dsts, srcs, ("node",), how="left_anti",
                                 num_partitions=num_partitions))

    # first hop per end (to_upstream_m = hop_up + hop_len, main.rs:1651-1660)
    first = cogroup_join(ends, succ, ("node",), how="inner",
                         num_partitions=num_partitions)
    first = snapshot(first.map_batches(
        lambda b: pa.table({
            "node": b["node"],
            "to_up": pa.array(
                b["hop_up"].to_numpy(zero_copy_only=False)
                + b["hop_len"].to_numpy(zero_copy_only=False), pa.float64())}),
        batch_format="pyarrow"))
    lone = cogroup_join(ends, succ, ("node",), how="left_anti",
                        num_partitions=num_partitions)

    if max_dist_m is None:
        # Wyllie pointer jumping to convergence; each end's state is then the
        # whole chain: hops=_s, dist=hop_len, from_upstream_m=hop_up
        states = lvl0
        for _ in range(max_rounds):
            states, n_ext = _compose_levels(states, states,
                                            num_partitions=num_partitions)
            if n_ext == 0:
                break
        else:
            raise RuntimeError(
                f"grouped_paths_distributed: chains not compressed after "
                f"{max_rounds} doubling rounds — cycle in input?")
        est = cogroup_join(first, states, ("node",), how="inner",
                           num_partitions=num_partitions)

        def finish(b: pa.Table) -> pa.Table:
            f = b["hop_up"].to_numpy(zero_copy_only=False)
            t = b["to_up"].to_numpy(zero_copy_only=False)
            return pa.table({
                "end_nid": b["node"].cast(pa.int64()),
                "n_nodes": pa.array(
                    b["_s"].to_numpy(zero_copy_only=False) + 1, pa.int64()),
                "dist_m": b["hop_len"].cast(pa.float64()),
                "from_upstream_m": pa.array(f, pa.float64()),
                "to_upstream_m": pa.array(t, pa.float64()),
            })

        walked = est.map_batches(finish, batch_format="pyarrow")
    else:
        # binary lifting: levels[r] = exact 2^r-hop segments; greedy descent
        levels = [lvl0]
        for _ in range(max_rounds):
            nxt, n_ext = _compose_levels(levels[-1], levels[-1],
                                         num_partitions=num_partitions,
                                         inner_only=True)
            if n_ext == 0:
                break
            levels.append(nxt)
        else:
            raise RuntimeError(
                f"grouped_paths_distributed: >2^{max_rounds}-hop chain — "
                "cycle in input?")
        est = snapshot(ends.map_batches(
            lambda b: pa.table({
                "end": b["node"], "cur": b["node"],
                "dist": pa.array(np.zeros(len(b)), pa.float64()),
                "hops": pa.array(np.zeros(len(b), dtype=np.int64)),
                "last_up": pa.array(np.full(len(b), np.nan), pa.float64()),
            }), batch_format="pyarrow"))
        for lv in reversed(levels):
            lview = lv.map_batches(
                lambda b: pa.table({"cur": b["node"], "_p": b["ptr"],
                                    "_d": b["hop_len"], "_u": b["hop_up"],
                                    "_n": b["_s"]}),
                batch_format="pyarrow")
            # ONE left_outer join per level (rows with no segment at cur
            # simply stay — same fusion as _compose_levels)
            j = cogroup_join(est, lview, ("cur",), how="left_outer",
                             num_partitions=num_partitions)

            def take_if_fits(b: pa.Table, cap=float(max_dist_m)) -> pa.Table:
                import pyarrow.compute as _pc

                matched = _pc.is_valid(b["_p"]).to_numpy(zero_copy_only=False)
                p2 = _pc.fill_null(b["_p"], 0).cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                d2 = _pc.fill_null(b["_d"], 0.0).cast(pa.float64()) \
                    .to_numpy(zero_copy_only=False)
                n2 = _pc.fill_null(b["_n"], 0).cast(pa.int64()) \
                    .to_numpy(zero_copy_only=False)
                u2 = _pc.fill_null(b["_u"], 0.0).cast(pa.float64()) \
                    .to_numpy(zero_copy_only=False)
                dist = b["dist"].to_numpy(zero_copy_only=False)
                ok = matched & (dist + d2 <= cap)
                lu = b["last_up"].to_numpy(zero_copy_only=False)
                return pa.table({
                    "end": b["end"],
                    "cur": pa.array(np.where(
                        ok, p2, b["cur"].to_numpy(zero_copy_only=False)),
                        pa.int64()),
                    "dist": pa.array(np.where(ok, dist + d2, dist),
                                     pa.float64()),
                    "hops": pa.array(np.where(
                        ok, b["hops"].to_numpy(zero_copy_only=False) + n2,
                        b["hops"].to_numpy(zero_copy_only=False)), pa.int64()),
                    "last_up": pa.array(np.where(ok, u2, lu), pa.float64()),
                })

            est = snapshot(j.map_batches(take_if_fits,
                                         batch_format="pyarrow"))
        est = est.map_batches(
            lambda b: pa.table({"node": b["end"], "dist": b["dist"],
                                "hops": b["hops"], "last_up": b["last_up"]}),
            batch_format="pyarrow")
        est = cogroup_join(est, first, ("node",), how="inner",
                           num_partitions=num_partitions)

        def finish_cap(b: pa.Table) -> pa.Table:
            hops = b["hops"].to_numpy(zero_copy_only=False)
            took = hops >= 1
            f = b["last_up"].to_numpy(zero_copy_only=False)
            t = np.where(took, b["to_up"].to_numpy(zero_copy_only=False),
                         np.nan)
            return pa.table({
                "end_nid": b["node"].cast(pa.int64()),
                "n_nodes": pa.array(hops + 1, pa.int64()),
                "dist_m": b["dist"].cast(pa.float64()),
                "from_upstream_m": pa.array(np.where(took, f, np.nan),
                                            pa.float64()),
                "to_upstream_m": pa.array(t, pa.float64()),
            })

        walked = est.map_batches(finish_cap, batch_format="pyarrow")

    lone_rows = lone.map_batches(
        lambda b: pa.table({
            "end_nid": b["node"].cast(pa.int64()),
            "n_nodes": pa.array(np.ones(len(b), dtype=np.int64)),
            "dist_m": pa.array(np.zeros(len(b)), pa.float64()),
            "from_upstream_m": pa.array(np.full(len(b), np.nan), pa.float64()),
            "to_upstream_m": pa.array(np.full(len(b), np.nan), pa.float64()),
        }), batch_format="pyarrow")
    return concat_blocks(walked, lone_rows)
