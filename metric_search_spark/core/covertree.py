"""Cover-tree metric index — numpy kernel with reference-parity semantics.

This is the per-partition kernel of the Spark engine: each executor builds one
of these over the records of a spatial cell (inside ``applyInPandas``) and
answers nn/knn/rnn probes against it. It re-implements, from its observed
behavior, the cover tree of the reference (/root/reference/details/tree.cpp) —
same invariants, same golden outputs — in array-oriented Python. It is NOT a
translation: storage is flat parallel arrays (not heap nodes), traversals are
explicit stacks (not recursion), and distance evaluations are numpy batches.

Parity notes (file:line cite the reference whose behavior is matched):

- covdist = base**level; sepdist = 2*base**(level-1)    (tree.cpp:197-206)
- insert with root-promotion loop while d(root,x) > base*covdist/(base-1)
                                                        (tree.cpp:413-458)
- recursive descent: first child (ascending distance) with d <= child.covdist;
  else attach at parent.level-1                         (tree.cpp:1104-1131)
- nn/knn/rnn best-first DFS, children ascending by distance, subtree pruned
  unless bound > d(child,q) - child.parent_dist         (tree.cpp:602-627,
  658-690, 711-735). ``parent_dist`` is the distance child->parent, used by the
  reference as a descendant bound. That bound is a heuristic; ``prune="safe"``
  instead uses the true subtree radius  base**(level+1)/(base-1), making
  nn/knn/rnn exact. ``prune="reference"`` reproduces the reference bit-for-bit.
- knn tie behavior: sorted insert via upper_bound => equal distances keep
  earlier-visited node first                            (tree.cpp:664-677)
- rnn membership is STRICT d < radius                   (tree.cpp:718)
- insert_if compares against the ROOT's distance only   (tree.cpp:358-377)
- erase: exact-match nn (d <= 0); root case promotes the back-most leaf and
  re-levels it to the old root's level; non-root case unlinks via
  swap-with-back and re-inserts orphan children at root with insert_ (no root
  promotion, subtree levels untouched)                  (tree.cpp:497-582)
- N is decremented on erase, and IDs are assigned from the live counter, so an
  insert after an erase can reuse an ID                 (tree.cpp:400, 545, 576)
- clustering: quota buckets = differenced floor(N*d_i); anchor = nn(center)
  climbed until base**level >= radius; proximity-ordered DFS grab
                                                        (tree.cpp:1263-1430)
  including the reference's use of original-order ``dists[index]`` while
  iterating children in sorted order (tree.cpp:1296-1306) — kept verbatim for
  golden-test parity.
- to_json: stack DFS (push-children) node/edge export, ``std::fixed`` distance
  formatting                                            (tree.cpp:1459-1506)
"""

from __future__ import annotations

import math
from bisect import bisect_right, insort
from typing import Any, Callable, Iterable

import numpy as np

from metric_search_spark.core.metrics import Metric

__all__ = [
    "CoverTree",
    "UnsortedDistributionError",
    "BadDistributionError",
]


class UnsortedDistributionError(ValueError):
    """distribution must be ascending (tree.hpp:43)."""


class BadDistributionError(ValueError):
    """distribution values must lie in [0,1] (tree.hpp:44)."""


def check_distribution(distribution: Iterable[float]) -> None:
    """Mirror is_distribution_ok (tree.cpp:1344-1356): ascending first, then range."""
    dist = list(distribution)
    if not dist:
        return
    d0 = dist[0]
    for d in dist[1:]:
        if d < d0:
            raise UnsortedDistributionError(f"distribution not ascending: {dist}")
        if d < 0.0 or d > 1.0:
            raise BadDistributionError(f"distribution value out of [0,1]: {d}")
        d0 = d


class CoverTree:
    """Mutable cover tree over opaque records with a pluggable metric.

    ``metric`` is either a :class:`Metric` (batch-vectorized) or any callable
    ``(a, b) -> float``.
    """

    def __init__(self, metric: Metric | Callable[[Any, Any], float], base: float = 2.0):
        self.base = float(base)
        if isinstance(metric, Metric):
            self.metric = metric
        else:
            m = Metric()
            m.one = metric  # type: ignore[method-assign]
            self.metric = m
        # flat node storage; index into these arrays == node handle
        self.data: list[Any] = []
        self.level: list[int] = []
        self.parent: list[int] = []  # -1 == no parent
        self.parent_dist: list[float] = []
        self.ids: list[int] = []
        self.children: list[list[int]] = []
        self.alive: list[bool] = []
        # exact upper bound on d(node, any descendant), maintained on mutation.
        # This replaces the reference's unsound use of parent_dist as the
        # descendant bound (tree.cpp:86,624,686,732): that heuristic provably
        # misses results (e.g. its own test_erase sequence: after erasing 3 and
        # 5 from {3,5,-10,50,1,-200,200}, nn(-10) prunes the subtree holding
        # -10 because 11 > 60-49). ``prune="safe"`` uses this bound and is
        # exact; ``prune="reference"`` reproduces the reference behavior.
        self.sub_radius: list[float] = []
        self.root: int = -1
        self.N = 0  # live record count (decremented by erase, like tree.cpp:545)
        self.max_scale = 0
        # True when the metric returns integral distances (the reference's
        # Distance is the metric's return type; affects to_json formatting)
        self.integral_distance = False

    # ------------------------------------------------------------------ basics

    def __len__(self) -> int:
        return self.N

    def size(self) -> int:
        return self.N

    def empty(self) -> bool:
        return self.root < 0

    def level_size(self) -> int:
        """Root level == max level (tree.cpp:810-814)."""
        return self.level[self.root]

    def covdist(self, n: int) -> float:
        return self.base ** self.level[n]

    def sepdist(self, n: int) -> float:
        return 2.0 * self.base ** (self.level[n] - 1)

    def _d(self, n: int, x: Any) -> float:
        return float(self.metric.one(self.data[n], x))

    def _d_children(self, n: int, x: Any) -> np.ndarray:
        ch = self.children[n]
        if not ch:
            return np.empty(0)
        return np.asarray(self.metric.batch([self.data[c] for c in ch], x), dtype=np.float64)

    def _sorted_children(self, n: int, x: Any) -> tuple[list[int], np.ndarray]:
        """argsort of children by distance to x (tree.cpp:335-351): returns
        (sorted positions, distances in ORIGINAL child order)."""
        dists = self._d_children(n, x)
        order = np.argsort(dists, kind="stable").tolist()
        return order, dists

    def _new_node(self, x: Any, level: int = 0) -> int:
        idx = len(self.data)
        self.data.append(x)
        self.level.append(level)
        self.parent.append(-1)
        self.parent_dist.append(0.0)
        self.ids.append(self.N)
        self.children.append([])
        self.alive.append(True)
        self.sub_radius.append(0.0)
        return idx

    # ------------------------------------------------------------------ insert

    def insert(self, x: Any) -> None:
        node = self._new_node(x, level=0)
        self.N += 1
        if self.root < 0:
            self.root = node
        else:
            self.root = self._insert_top(self.root, node)

    def insert_batch(self, xs: Iterable[Any]) -> None:
        for x in xs:
            self.insert(x)

    def insert_if(self, x: Any, threshold: float) -> bool:
        """Root-distance-threshold dedupe filter (tree.cpp:358-377 quirk: checks
        the ROOT only, not the true nearest neighbor)."""
        if self.root < 0 or self._d(self.root, x) > threshold:
            self.insert(x)
            return True
        return False

    def insert_if_batch(self, xs: Iterable[Any], threshold: float) -> int:
        return sum(1 for x in xs if self.insert_if(x, threshold))

    def _insert_top(self, p: int, x: int) -> int:
        """tree.cpp:413-458: root promotion when the point falls outside the
        root's covering ball, else recursive descent."""
        base = self.base
        if self._d(p, self.data[x]) > self.covdist(p):
            while self._d(p, self.data[x]) > base * self.covdist(p) / (base - 1.0):
                # splice the back-most leaf up as the new root
                current, par = p, -1
                while self.children[current]:
                    par = current
                    current = self.children[current][-1]
                if par >= 0:
                    self.children[par].pop()
                    self.level[current] = self.level[p] + 1
                    self.children[current].append(p)
                    self.parent[p] = current
                    d_pc = self._d(p, self.data[current])
                    self.parent_dist[p] = d_pc
                    self.sub_radius[current] = max(
                        self.sub_radius[current], d_pc + self.sub_radius[p]
                    )
                    p = current
                    self.parent[p] = -1
                    self.parent_dist[p] = 0.0
                else:
                    self.level[p] += 1
            self.level[x] = self.level[p] + 1
            self.parent[x] = -1
            self.children[x].append(p)
            d_px = self._d(p, self.data[x])
            self.parent_dist[p] = d_px
            self.parent[p] = x
            self.sub_radius[x] = max(self.sub_radius[x], d_px + self.sub_radius[p])
            self.max_scale = self.level[x]
            return x
        return self._insert_rec(p, x)

    def _insert_rec(
        self, p: int, x: int, d_px: float | None = None, x_radius: float = 0.0
    ) -> int:
        """tree.cpp:1104-1131, iteratively: descend into the first child (by
        ascending distance) whose covdist covers x; else attach at level-1.
        ``x_radius`` is x's own subtree radius (nonzero for erase re-inserts)."""
        cur = p
        xd = self.data[x]
        d_cur = self._d(p, xd) if d_px is None else d_px
        while True:
            self.sub_radius[cur] = max(self.sub_radius[cur], d_cur + x_radius)
            order, dists = self._sorted_children(cur, xd)
            nxt = -1
            for qi in order:
                q = self.children[cur][qi]
                if dists[qi] <= self.covdist(q):
                    nxt = q
                    d_cur = float(dists[qi])
                    break
            if nxt < 0:
                self.children[cur].append(x)
                self.parent[x] = cur
                self.parent_dist[x] = d_cur
                self.level[x] = self.level[cur] - 1
                return p
            cur = nxt

    # ------------------------------------------------------------------ search

    def _subtree_bound(self, child: int, prune: str) -> float:
        """Upper bound on d(child, any descendant of child).

        reference: child.parent_dist (tree.cpp:624,686,732 — heuristic that can
                   miss true neighbors; kept for behavioral study).
        safe:      the maintained exact bound ``sub_radius`` (never misses).
        none:      exhaustive traversal.
        """
        if prune == "reference":
            return self.parent_dist[child]
        if prune == "none":
            return math.inf
        return self.sub_radius[child]

    def nn(self, x: Any, prune: str = "safe") -> tuple[int, float]:
        """Nearest neighbor (tree.cpp:591-627). Returns (node, distance)."""
        if self.root < 0:
            raise ValueError("nn on empty tree")
        best_n, best_d = self.root, self._d(self.root, x)
        # explicit stack preserving the reference's recursion order: children
        # pushed in reverse-sorted order; prune bound re-evaluated at pop time
        # (equivalent to the reference's sequential per-child check).
        stack: list[tuple[int, float]] = []
        node, dist_node = self.root, best_d
        while True:
            if dist_node < best_d:
                best_n, best_d = node, dist_node
            order, dists = self._sorted_children(node, x)
            for qi in reversed(order):
                stack.append((self.children[node][qi], float(dists[qi])))
            while stack:
                cand, dc = stack.pop()
                if best_d > dc - self._subtree_bound(cand, prune):
                    node, dist_node = cand, dc
                    break
            else:
                break
        return best_n, best_d

    def knn(self, x: Any, k: int = 10, prune: str = "safe") -> list[tuple[int, float]]:
        """k nearest neighbors, ascending distance (tree.cpp:635-690).

        Tie behavior matches the reference's upper_bound insert: equal
        distances stay in visit order.
        """
        if self.root < 0:
            return []
        k = int(k)
        nnd: list[float] = [math.inf] * k
        nnn: list[int] = [-1] * k

        def offer(node: int, d: float) -> None:
            if d < nnd[-1]:
                pos = bisect_right(nnd, d)
                nnd.insert(pos, d)
                nnn.insert(pos, node)
                nnd.pop()
                nnn.pop()

        stack: list[tuple[int, float]] = []
        node, dist_node = self.root, self._d(self.root, x)
        while True:
            offer(node, dist_node)
            order, dists = self._sorted_children(node, x)
            for qi in reversed(order):
                stack.append((self.children[node][qi], float(dists[qi])))
            while stack:
                cand, dc = stack.pop()
                if nnd[-1] > dc - self._subtree_bound(cand, prune):
                    node, dist_node = cand, dc
                    break
            else:
                break
        return [(n, d) for n, d in zip(nnn, nnd) if n >= 0]

    def rnn(self, x: Any, radius: float = 1.0, prune: str = "safe") -> list[tuple[int, float]]:
        """Range search: nodes with d STRICTLY < radius (tree.cpp:698-735),
        in the reference's visit order."""
        out: list[tuple[int, float]] = []
        if self.root < 0:
            return out
        stack: list[tuple[int, float]] = []
        node, dist_node = self.root, self._d(self.root, x)
        while True:
            if dist_node < radius:
                out.append((node, dist_node))
            order, dists = self._sorted_children(node, x)
            for qi in reversed(order):
                stack.append((self.children[node][qi], float(dists[qi])))
            while stack:
                cand, dc = stack.pop()
                if radius > dc - self._subtree_bound(cand, prune):
                    node, dist_node = cand, dc
                    break
            else:
                break
        return out

    # ------------------------------------------------------------------- erase

    def _find_any_leaf(self) -> int:
        cur = self.root
        while self.children[cur]:
            cur = self.children[cur][-1]
        return cur

    def _extract_node(self, node: int) -> None:
        par = self.parent[node]
        if par < 0:
            return
        ch = self.children[par]
        for i, c in enumerate(ch):
            if c == node:
                ch[i] = ch[-1]
                ch.pop()
                break
        self.parent[node] = -1

    def erase(self, x: Any) -> bool:
        """tree.cpp:526-582. Deviation from the reference: the exact-match
        lookup uses the sound prune ('safe'), because the reference's own
        parent_dist prune can fail to find a record that IS in the tree (its
        test_erase sequence triggers this), which would leak the record."""
        if self.root < 0:
            return False
        node_p, d = self.nn(x, prune="safe")
        if d > 0.0:
            return False
        if node_p == self.root:
            if not self.children[node_p]:
                self.root = -1
                self.alive[node_p] = False
                self.N -= 1
                return True
            leaf = self._find_any_leaf()
            self._extract_node(leaf)
            self.level[leaf] = self.level[self.root]
            old_children = list(self.children[node_p])
            self.root = leaf
            self.children[leaf] = old_children
            for c in old_children:
                self.parent[c] = leaf
            if old_children:
                d_lc = self.metric.batch([self.data[c] for c in old_children], self.data[leaf])
                self.sub_radius[leaf] = max(
                    self.sub_radius[leaf],
                    max(
                        float(d) + self.sub_radius[c]
                        for d, c in zip(d_lc, old_children)
                    ),
                )
            self.children[node_p] = []
            self.alive[node_p] = False
            self.N -= 1
            return True
        parent_p = self.parent[node_p]
        ch = self.children[parent_p]
        for i, c in enumerate(ch):
            if c == node_p:
                ch[i] = ch[-1]
                ch.pop()
                break
        for q in list(self.children[node_p]):
            self.parent[q] = -1
            self.root = self._insert_rec(self.root, q, x_radius=self.sub_radius[q])
        self.children[node_p] = []
        self.alive[node_p] = False
        self.N -= 1
        return True

    # ------------------------------------------------------------ full exports

    def _stack_traverse(self) -> Iterable[int]:
        """The reference's stack DFS (push root; pop; push children in order →
        siblings visited in reverse child order) — tree.cpp:760-771, 942-961."""
        if self.root < 0:
            return
        stack = [self.root]
        while stack:
            cur = stack.pop()
            yield cur
            stack.extend(self.children[cur])

    def traverse(self, fn: Callable[[int], None]) -> None:
        for n in self._stack_traverse():
            fn(n)

    def traverse_child(self, fn: Callable[[int], None]) -> None:
        """Visit every node EXCEPT the root (tree.cpp:963-981). The reference
        calls back at child-PUSH time — children of each popped node in
        order, before descending — so the visit order differs from
        ``traverse`` (which yields at pop); preserved exactly. Table form:
        ``nodes.where(parent_id != -1)``."""
        if self.root < 0:
            return
        stack = [self.root]
        while stack:
            cur = stack.pop()
            for child in self.children[cur]:
                stack.append(child)
                fn(child)

    def to_vector(self) -> list[Any]:
        """All records ordered by ID (tree.cpp:755-783)."""
        zipped = sorted(((self.ids[n], self.data[n]) for n in self._stack_traverse()))
        return [d for _, d in zipped]

    def get_by_id(self, rec_id: int) -> int:
        """Node handle for a record ID (linear scan like operator[], tree.cpp:785-800)."""
        last = self.root
        for n in self._stack_traverse():
            last = n
            if self.ids[n] == rec_id:
                return n
        return last

    def __getitem__(self, rec_id: int) -> Any:
        return self.data[self.get_by_id(rec_id)]

    def print_levels(self) -> dict[int, int]:
        """Histogram: node count per level (tree.cpp:815-840, sans stdout)."""
        out: dict[int, int] = {}
        for n in self._stack_traverse():
            out[self.level[n]] = out.get(self.level[n], 0) + 1
        return out

    # --------------------------------------------------------------- invariants

    def check_covering(self) -> bool:
        """d(parent, child) <= parent.covdist() for every edge (tree.cpp:842-870)."""
        for n in self._stack_traverse():
            if self.children[n]:
                dists = self._d_children(n, self.data[n])
                if np.any(dists > self.covdist(n) + 1e-12):
                    return False
        return True

    def check_nesting(self) -> bool:
        """child.level == parent.level - 1 (holds for pure-insert trees; erase's
        orphan re-insert intentionally breaks it, as in the reference)."""
        for n in self._stack_traverse():
            for c in self.children[n]:
                if self.level[c] != self.level[n] - 1:
                    return False
        return True

    def separation_violations(self) -> int:
        """Count sibling pairs at the same level closer than sepdist. The
        reference does not enforce separation (simplified cover tree); exposed
        as a diagnostic, not an invariant."""
        bad = 0
        for n in self._stack_traverse():
            ch = self.children[n]
            for i in range(len(ch)):
                for j in range(i + 1, len(ch)):
                    a, b = ch[i], ch[j]
                    if self.level[a] == self.level[b]:
                        d = self._d(a, self.data[b])
                        if d <= 2.0 * self.base ** (self.level[a] - 1):
                            bad += 1
        return bad

    # --------------------------------------------------------------- clustering

    def _find_neighbour_radius_points(self, points: list[Any]) -> float:
        p1 = points[0]
        r = -math.inf
        for p in points[1:]:
            r = max(r, float(self.metric.one(p1, p)))
        return r

    def clustering(
        self,
        distribution: list[float],
        ids: list[int] | None = None,
        points: list[Any] | None = None,
    ) -> list[list[int]]:
        """Quota-sized proximity partitioning (tree.cpp:1341-1430). Overloads:
        (distribution, ids, points) / (distribution, ids) / (distribution, points).
        """
        check_distribution(distribution)
        if ids is not None and points is not None:
            sel = [points[i] for i in ids]
            radius = self._find_neighbour_radius_points(sel)
            center = points[ids[0]]
        elif ids is not None:
            sel = [self[i] for i in ids]
            radius = self._find_neighbour_radius_points(sel)
            center = sel[0]
        elif points is not None:
            radius = self._find_neighbour_radius_points(points)
            center = points[0]
        else:
            raise ValueError("need ids and/or points")
        return self._clustering_impl(list(distribution), center, radius)

    def _clustering_impl(
        self, distribution: list[float], center: Any, radius: float
    ) -> list[list[int]]:
        n = self.size()
        sizes = [int(float(n) * d) for d in distribution]
        ls = sizes[0]
        for i in range(1, len(sizes)):
            ls1 = sizes[i]
            sizes[i] -= ls
            ls = ls1

        proot, _ = self.nn(center, prune="reference")
        while self.base ** self.level[proot] < radius:
            proot = self.parent[proot]
            if proot < 0:  # center radius exceeds the whole tree: use root
                proot = self.root
                break

        result: list[list[int]] = [[] for _ in distribution]
        cur = 0
        while cur < len(sizes) and sizes[cur] == 0:
            cur += 1
        if cur == len(sizes):
            return result

        parsed: set[int] = set()
        state = {"cur": cur}

        def update_idx() -> bool:
            if len(result[state["cur"]]) == sizes[state["cur"]]:
                state["cur"] += 1
            return state["cur"] == len(result)

        def grab_sub_tree(pr: int) -> bool:
            # tree.cpp:1274-1319 — including the original-order dists[index]
            # quirk while iterating sorted children.
            order, dists = self._sorted_children(pr, center)
            d_root = self._d(pr, center)
            root_added = False
            if len(order) == 0 or dists[order[0]] > d_root:
                if self.ids[pr] not in parsed:
                    result[state["cur"]].append(self.ids[pr])
                    parsed.add(self.ids[pr])
                    root_added = True
                    if update_idx():
                        return True
            for index, i in enumerate(order):
                if not root_added and dists[index] > d_root:
                    if self.ids[pr] not in parsed:
                        result[state["cur"]].append(self.ids[pr])
                        parsed.add(self.ids[pr])
                        root_added = True
                        if update_idx():
                            return True
                child = self.children[pr][i]
                if self.ids[child] not in parsed:
                    if grab_sub_tree(child):
                        return True
            if not root_added and self.ids[pr] not in parsed:
                result[state["cur"]].append(self.ids[pr])
                parsed.add(self.ids[pr])
                if update_idx():
                    return True
            return False

        # grab_tree (tree.cpp:1321-1339)
        if grab_sub_tree(proot):
            return result
        parsed.add(self.ids[proot])
        pr = self.parent[proot]
        while pr >= 0:
            if grab_sub_tree(pr):
                return result
            pr = self.parent[pr]
        return result

    # ------------------------------------------------------------- (de)serialize

    def to_rows(self) -> list[dict[str, Any]]:
        """Flatten to a node table (the engine's checkpoint row format): one row
        per live node with parent linkage and child position — the same field
        set the reference serializes (tree.cpp:143-147) plus ordering info."""
        rows = []
        for n in self._stack_traverse():
            par = self.parent[n]
            pos = self.children[par].index(n) if par >= 0 else 0
            rows.append(
                {
                    "node_id": n,
                    "parent_id": par,
                    "child_pos": pos,
                    "level": self.level[n],
                    "parent_dist": float(self.parent_dist[n]),
                    "sub_radius": float(self.sub_radius[n]),
                    "rec_id": self.ids[n],
                    "data": self.data[n],
                }
            )
        return rows

    @classmethod
    def from_rows(
        cls, rows: list[dict[str, Any]], metric: Metric | Callable[[Any, Any], float],
        base: float = 2.0,
    ) -> "CoverTree":
        t = cls(metric, base=base)
        if not rows:
            return t
        remap: dict[int, int] = {}
        for r in rows:
            idx = len(t.data)
            remap[r["node_id"]] = idx
            t.data.append(r["data"])
            t.level.append(int(r["level"]))
            t.parent.append(int(r["parent_id"]))  # remapped below
            t.parent_dist.append(float(r["parent_dist"]))
            t.sub_radius.append(float(r.get("sub_radius", math.inf)))
            t.ids.append(int(r["rec_id"]))
            t.children.append([])
            t.alive.append(True)
        kids: dict[int, list[tuple[int, int]]] = {}
        for r in rows:
            n = remap[r["node_id"]]
            p = r["parent_id"]
            if p < 0:
                t.root = n
                t.parent[n] = -1
            else:
                t.parent[n] = remap[p]
                kids.setdefault(remap[p], []).append((int(r["child_pos"]), n))
        for p, lst in kids.items():
            t.children[p] = [n for _, n in sorted(lst)]
        t.N = len(rows)
        t.max_scale = t.level[t.root]
        return t

    def same_tree(self, other: "CoverTree") -> bool:
        """Structural equality (tree.cpp:1081-1102): ID, level, parent_dist,
        data and child order all equal."""
        def eq(a: int, b: int) -> bool:
            if (
                self.ids[a] != other.ids[b]
                or self.level[a] != other.level[b]
                or self.parent_dist[a] != other.parent_dist[b]
                or not np.array_equal(np.asarray(self.data[a]), np.asarray(other.data[b]))
            ):
                return False
            if len(self.children[a]) != len(other.children[b]):
                return False
            return all(eq(x, y) for x, y in zip(self.children[a], other.children[b]))

        if self.root < 0 or other.root < 0:
            return self.root < 0 and other.root < 0
        return eq(self.root, other.root)

    def to_json(self, printer: Callable[[Any], str] | None = None) -> str:
        """Graph export {nodes, edges} byte-matching the reference format
        (tree.cpp:1459-1506; goldens tests/test_api.cpp:108-117)."""
        if printer is None:
            def printer(v: Any) -> str:
                if isinstance(v, (list, np.ndarray)):
                    inner = ",".join(_cxx_to_string(x) for x in v)
                    return "[ " + inner + " ]"
                return _cxx_to_string(v)

        nodes: list[tuple[int, Any]] = []
        edges: list[tuple[int, int, float]] = []
        for n in self._stack_traverse():
            nodes.append((self.ids[n], self.data[n]))
            if self.parent[n] >= 0:
                edges.append((self.ids[self.parent[n]], self.ids[n], self.parent_dist[n]))
        parts = ["{\n", '"nodes": [\n']
        for i, (nid, val) in enumerate(nodes):
            parts.append(f'{{ "id":{nid}, "values":{printer(val)}}}')
            if i != len(nodes) - 1:
                parts.append(",")
            parts.append("\n")
        parts.append('],\n"edges": [\n')
        for i, (s, tgt, d) in enumerate(edges):
            dstr = str(int(d)) if self.integral_distance else _cxx_fixed(d)
            parts.append(f'{{ "source":{s}, "target":{tgt}, "distance":{dstr}}}')
            if i != len(edges) - 1:
                parts.append(",")
            parts.append("\n")
        parts.append("]}\n")
        return "".join(parts)


def _cxx_to_string(v: Any) -> str:
    """std::to_string formatting: integral → digits, floating → 6-decimal fixed."""
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    return f"{float(v):.6f}"


def _cxx_fixed(v: Any) -> str:
    """std::fixed on the Distance type: ints print bare, floats 6-decimal."""
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    f = float(v)
    if f == int(f) and isinstance(v, float) and v == int(v):
        # reference Distance is the metric's return type; int metrics print "1"
        return f"{f:.6f}"
    return f"{f:.6f}"
