"""Per-component graph operators (reference G2-G9) — run inside
``groupby(component).map_groups`` after G1 assigns components.

The reference applies these to in-memory ``Graph2`` objects per way-group
(src/graph/undirected_graph.rs); after distributed CC each component fits in
one block. Giant components get a pre-flight size probe in
pipelines/group_ops.py (``MAX_GROUP_ROWS``): compression auto-routes to the
distributed ``compress_stats_distributed`` formulation, the inherently
one-graph-in-memory ops fail loudly. Components process in
parallel as Ray tasks; each op below is a faithful re-creation:

- G2 ``compress``            — src/graph/undirected_graph.rs:640-716: repeatedly
  remove degree-2 vertices, merging inter chains; if a parallel edge would form,
  undo and exclude the vertex.
- G3 ``remove_spikes``       — :718-754: iteratively drop degree-1 leaves not in
  the keep-set.
- G4 ``into_lines_random``   — :382-426: start at a degree-1 vertex among the
  first 100 scanned (else first vertex), greedily walk unvisited neighbours,
  removing traversed edges.
- G5 ``into_lines_as_crow_flies`` — :428-482: find the max-haversine vertex
  pair, A* between them, remove the path, recurse on remaining components.
- G6 ``dijkstra``            — src/dij.rs:24-54: integer-centimetre edge
  lengths, single-predecessor tree.
- G7 ``astar``               — src/dij.rs:84-202: haversine heuristic.
- G8 ``frames``              — src/way_group.rs:76-154: convex hull of vertex
  positions → all-pairs shortest paths between hull nodes → union into a frames
  graph → into_lines_random.
- G9 ``betweenness``         — src/graph/undirected_graph.rs:552-638: sampled
  sources (K7 farthest-point sampling, :484-550), per-source Dijkstra, backward
  path-count accumulation over the predecessor tree (single shortest path per
  pair, exactly like the reference).

Positions are a plain dict ``nid → (lat_e7, lon_e7)`` fixed-point ints;
distances via functions.haversine.
"""

from __future__ import annotations

import heapq
from collections import defaultdict
from typing import Callable, Dict, Iterable, List, Optional, Tuple

import numpy as np

from ..functions.haversine import haversine_m_fp
from ..functions.utils import min_max


def _hav(pos, a: int, b: int) -> float:
    pa_, pb_ = pos[a], pos[b]
    return float(haversine_m_fp(np.array([pa_[0]]), np.array([pa_[1]]),
                                np.array([pb_[0]]), np.array([pb_[1]]))[0])


class ComponentGraph:
    """Undirected graph with contracted-edge inter chains (Graph2 + InterStore
    analog, held per component)."""

    def __init__(self):
        self.adj: Dict[int, set] = defaultdict(set)
        self.inters: Dict[Tuple[int, int], List[int]] = {}

    # --------------------------------------------------------------- plumbing
    @classmethod
    def from_edge_rows(cls, u_arr, v_arr, inters_list=None) -> "ComponentGraph":
        g = cls()
        for i in range(len(u_arr)):
            inter = list(inters_list[i]) if inters_list is not None else []
            g.add_edge(int(u_arr[i]), int(v_arr[i]), inter)
        return g

    def add_edge(self, a: int, b: int, inter: Optional[List[int]] = None) -> None:
        if a == b:
            return
        self.adj[a].add(b)
        self.adj[b].add(a)
        if inter:
            lo, hi = (a, b) if a < b else (b, a)
            self.inters[(lo, hi)] = inter if a < b else inter[::-1]

    def remove_edge(self, a: int, b: int) -> None:
        self.adj[a].discard(b)
        self.adj[b].discard(a)
        if not self.adj[a]:
            del self.adj[a]
        if not self.adj[b]:
            del self.adj[b]
        self.inters.pop((a, b) if a < b else (b, a), None)

    def contains_edge(self, a: int, b: int) -> bool:
        return b in self.adj.get(a, ())

    def degree(self, n: int) -> int:
        return len(self.adj.get(n, ()))

    def vertices(self):
        return self.adj.keys()

    def num_vertices(self) -> int:
        return len(self.adj)

    def is_empty(self) -> bool:
        return not self.adj

    def edges(self) -> Iterable[Tuple[int, int]]:
        for a, nbrs in self.adj.items():
            for b in nbrs:
                if a < b:
                    yield (a, b)

    def inter_of(self, a: int, b: int) -> List[int]:
        """Inter chain oriented a→b (endpoints excluded)."""
        if a < b:
            return list(self.inters.get((a, b), []))
        return list(self.inters.get((b, a), []))[::-1]

    def expand(self, a: int, b: int) -> List[int]:
        """Full polyline a..b including endpoints (InterStore.expand analog)."""
        return [a] + self.inter_of(a, b) + [b]

    def edge_length_m(self, a: int, b: int, pos) -> float:
        chain = self.expand(a, b)
        lats = np.array([pos[n][0] for n in chain], dtype=np.int64)
        lons = np.array([pos[n][1] for n in chain], dtype=np.int64)
        if len(chain) < 2:
            return 0.0
        return float(np.sum(haversine_m_fp(lats[:-1], lons[:-1], lats[1:], lons[1:])))

    # ------------------------------------------------------------------ G2
    def compress(self, never_remove: Callable[[int], bool] = lambda n: False) -> None:
        """Contract degree-2 vertices, merging inters; undo when a parallel
        edge would form (undirected_graph.rs:640-716)."""
        excluded: set = set()
        while True:
            queue = [n for n in self.adj
                     if self.degree(n) == 2 and n not in excluded and not never_remove(n)]
            if not queue:
                break
            while queue:
                nid = queue.pop()
                if self.degree(nid) != 2 or never_remove(nid):
                    continue
                nid_a, nid_b = sorted(self.adj[nid])
                if self.contains_edge(nid_a, nid_b) or nid_a == nid_b:
                    excluded.add(nid)
                    continue
                inter = self.inter_of(nid_a, nid) + [nid] + self.inter_of(nid, nid_b)
                self.remove_edge(nid_a, nid)
                self.remove_edge(nid, nid_b)
                self.add_edge(nid_a, nid_b, inter)
                queue.append(nid_a)
                queue.append(nid_b)

    # ------------------------------------------------------------------ G3
    def remove_spikes(self, never_remove: Callable[[int], bool] = lambda n: False) -> None:
        """Iteratively drop degree-1 leaves (undirected_graph.rs:718-754)."""
        while True:
            leaves = [n for n in self.adj
                      if self.degree(n) == 1 and not never_remove(n)]
            if not leaves:
                break
            for n in leaves:
                if self.degree(n) == 1:
                    (other,) = self.adj[n]
                    self.remove_edge(n, other)

    # ------------------------------------------------------------------ G4
    def into_lines_random(self, expand: bool = False):
        """Decompose into node paths, consuming the graph
        (undirected_graph.rs:382-426)."""
        while not self.is_empty():
            start = None
            for i, n in enumerate(self.adj):
                if i >= 100:
                    break
                if self.degree(n) == 1:
                    start = n
                    break
            if start is None:
                start = next(iter(self.adj))
            path = [start]
            while True:
                last = path[-1]
                nxt = next((v for v in sorted(self.adj.get(last, ()))
                            if v not in path), None)
                if nxt is None:
                    break
                self.remove_edge(last, nxt)
                path.append(nxt)
            yield path

    # ------------------------------------------------------------------ G6/G7
    def dijkstra(self, start: int, edge_len_cm: Dict[Tuple[int, int], int]):
        """Single-source, single-predecessor tree (dij.rs:24-54).
        Returns {node: (prev, dist_cm)}; unreachable nodes keep dist=inf."""
        prev_dist = {n: (0, float("inf")) for n in self.adj}
        prev_dist[start] = (start, 0)
        frontier = [(0, start)]
        while frontier:
            d, cur = heapq.heappop(frontier)
            if d > prev_dist[cur][1]:
                continue
            for nb in self.adj[cur]:
                nd = d + edge_len_cm[(cur, nb) if cur < nb else (nb, cur)]
                if nd < prev_dist[nb][1]:
                    prev_dist[nb] = (cur, nd)
                    heapq.heappush(frontier, (nd, nb))
        return prev_dist

    def astar_path(self, src: int, dst: int, pos) -> Optional[List[int]]:
        """One-to-one shortest path with haversine heuristic (dij.rs:84-202)."""
        dist = {src: 0.0}
        prev = {src: src}
        frontier = [(0.0, 0.0, src)]
        while frontier:
            _f, d, cur = heapq.heappop(frontier)
            if cur == dst:
                path = [dst]
                while path[-1] != src:
                    path.append(prev[path[-1]])
                return path[::-1]
            if d > dist.get(cur, float("inf")):
                continue
            for nb in self.adj[cur]:
                nd = d + self.edge_length_m(cur, nb, pos)
                if nd < dist.get(nb, float("inf")):
                    dist[nb] = nd
                    prev[nb] = cur
                    heapq.heappush(frontier, (nd + _hav(pos, nb, dst), nd, nb))
        return None

    # ------------------------------------------------------------------ G5
    def into_lines_as_crow_flies(self, pos):
        """Max-haversine pair → A* path → remove → recurse
        (undirected_graph.rs:428-482)."""
        stack = [self]
        while stack:
            g = stack.pop()
            if g.is_empty():
                continue
            verts = list(g.adj.keys())
            lats = np.array([pos[n][0] for n in verts], dtype=np.int64)
            lons = np.array([pos[n][1] for n in verts], dtype=np.int64)
            best = (-1.0, None, None)
            for i in range(len(verts)):
                d = haversine_m_fp(
                    np.full(len(verts) - i - 1, lats[i]),
                    np.full(len(verts) - i - 1, lons[i]),
                    lats[i + 1:], lons[i + 1:])
                if len(d):
                    j = int(np.argmax(d))
                    if d[j] > best[0]:
                        best = (float(d[j]), verts[i], verts[i + 1 + j])
            path = g.astar_path(best[1], best[2], pos)
            for a, b in zip(path, path[1:]):
                g.remove_edge(a, b)
            if not g.is_empty():
                stack.extend(g.split_components())
            yield path

    def split_components(self) -> List["ComponentGraph"]:
        """BFS peel into connected subgraphs (into_disconnected_graphs analog)."""
        seen: set = set()
        out = []
        for start in list(self.adj.keys()):
            if start in seen:
                continue
            comp = ComponentGraph()
            stack = [start]
            seen.add(start)
            while stack:
                n = stack.pop()
                for nb in self.adj[n]:
                    comp.add_edge(n, nb, self.inter_of(n, nb))
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            out.append(comp)
        return out

    # ------------------------------------------------------------------ G8
    def frames(self, pos):
        """Convex hull → all-pairs shortest paths between hull nodes → union →
        into_lines_random (way_group.rs:76-154)."""
        hull_nodes = self._convex_hull_nodes(pos)
        frames_graph = ComponentGraph()
        for i in range(len(hull_nodes)):
            for j in range(i + 1, len(hull_nodes)):
                path = self.astar_path(hull_nodes[i], hull_nodes[j], pos)
                if path:
                    for a, b in zip(path, path[1:]):
                        frames_graph.add_edge(a, b)
        return frames_graph.into_lines_random()

    def dedup_hull_points(self, pos) -> dict:
        """D4 position dedup before the hull (way_group.rs:94-98 dedup step):
        {position: first node with that position} in adjacency insertion
        order — qhull input must be duplicate-free."""
        pts: dict = {}
        for n in self.adj:
            pts.setdefault(pos[n], n)  # position dedup: first node wins
        return pts

    def _convex_hull_nodes(self, pos) -> List[int]:
        """Andrew monotone chain over vertex positions (dedup'd), mapped back to
        node ids (quick_hull analog in way_group.rs:94-121)."""
        pts = self.dedup_hull_points(pos)
        coords = sorted(pts.keys())
        if len(coords) <= 2:
            return sorted(pts.values())

        def cross(o, a, b):
            return ((a[0] - o[0]) * (b[1] - o[1])
                    - (a[1] - o[1]) * (b[0] - o[0]))

        lower: list = []
        for p in coords:
            while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
                lower.pop()
            lower.append(p)
        upper: list = []
        for p in reversed(coords):
            while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
                upper.pop()
            upper.append(p)
        hull = set(lower[:-1] + upper[:-1])
        return sorted(pts[c] for c in hull)

    # ------------------------------------------------------------------ K7
    def sample_vertexes(self, num: int, pos, seed: int = 42) -> List[int]:
        """Farthest-point sampling (undirected_graph.rs:484-550; deterministic
        seeded rng instead of the reference's thread rng — documented
        divergence, the reference is nondeterministic here)."""
        verts = sorted(self.adj.keys())
        if num >= len(verts):
            return verts
        rng = np.random.RandomState(seed)
        lats = np.array([pos[n][0] for n in verts], dtype=np.float64)
        lons = np.array([pos[n][1] for n in verts], dtype=np.float64)
        chosen_idx = [int(rng.randint(len(verts)))]
        chosen = {verts[chosen_idx[0]]}
        # min distance to any chosen point, in crude equirect units (sampling
        # only needs relative spread, like the reference's kdtree euclidean)
        d2 = (lats - lats[chosen_idx[0]]) ** 2 + (lons - lons[chosen_idx[0]]) ** 2
        while len(chosen) < num:
            k = min(100, len(verts))
            cand = rng.choice(len(verts), size=k, replace=False)
            cand = [c for c in cand if verts[c] not in chosen]
            if not cand:
                continue
            best = max(cand, key=lambda c: d2[c])
            chosen.add(verts[best])
            chosen_idx.append(best)
            nd = (lats - lats[best]) ** 2 + (lons - lons[best]) ** 2
            d2 = np.minimum(d2, nd)
        return sorted(chosen)

    # ------------------------------------------------------------------ G9
    def betweenness(self, nodes: List[int], pos,
                    source_indices=None,
                    edge_len_cm: Optional[Dict[Tuple[int, int], int]] = None,
                    ) -> Dict[Tuple[int, int], int]:
        """Sampled edge betweenness (undirected_graph.rs:552-638): integer-cm
        edge lengths, per-source Dijkstra (single-predecessor), backward
        accumulation of path counts into per-edge u64.

        ``source_indices`` restricts which positions of ``nodes`` act as the
        Dijkstra source (each source still pairs with every LATER node of the
        full list) — the unit of the intra-component fan-out: the pair set
        partitions exactly across disjoint index subsets, so partial results
        SUM to the full run (pipelines/group_ops.component_betweenness).

        ``edge_len_cm`` supplies precomputed integer-cm lengths so the
        giant-component fan-out can ship a broadcast compressed graph WITHOUT
        its chain geometry (pipelines/group_ops._betweenness_giant); when
        None they are derived from ``pos`` exactly as before."""
        if edge_len_cm is None:
            edge_len_cm = {}
            for a, b in self.edges():
                edge_len_cm[(a, b)] = int(
                    round(self.edge_length_m(a, b, pos) * 100))
        bc: Dict[Tuple[int, int], int] = {e: 0 for e in edge_len_cm}
        idxs = range(len(nodes)) if source_indices is None else source_indices
        for i in idxs:
            nid0 = nodes[i]
            targets = nodes[i + 1:]
            if not targets:
                break
            prev_dist = self.dijkstra(nid0, edge_len_cm)
            # walk every target back toward the source in decreasing-distance
            # order, merging counts at shared prefix nodes (the reference's
            # buf_segs max-heap logic)
            acc: Dict[int, int] = {}
            heap: list = []
            for t in targets:
                if t == nid0 or prev_dist[t][1] == float("inf"):
                    continue
                if t not in acc:
                    heapq.heappush(heap, (-prev_dist[t][1], t))
                acc[t] = acc.get(t, 0) + 1
            while heap:
                _negd, nid_b = heapq.heappop(heap)
                cnt = acc.pop(nid_b, 0)
                if cnt == 0 or nid_b == nid0:
                    continue
                nid_a = prev_dist[nid_b][0]
                key = (nid_a, nid_b) if nid_a < nid_b else (nid_b, nid_a)
                bc[key] += cnt
                if nid_a != nid0:
                    if nid_a not in acc:
                        heapq.heappush(heap, (-prev_dist[nid_a][1], nid_a))
                    acc[nid_a] = acc.get(nid_a, 0) + cnt
        return bc
