"""Top-k kernels over the compressed index: exact vectorized + block-max WAND.

Runs inside applyInPandas workers (one group per query). Two kernels:

- `topk_exact`: decode the query's posting shards, accumulate
  idf * tf_norm per doc with np.add.at (order = sorted-term order, same
  accumulation order as the oracle), top-k via lexsort. No Python-level
  per-doc loop; right choice when pruning can't win (few postings, or
  every doc is a candidate).

- `topk_wand`: document-at-a-time block-max WAND (VLDB'11 style): lists
  sorted by current doc, pivot by cumulative upper bound vs the running
  threshold, block-max check before full evaluation, block-granular
  skipping via block_last_doc + searchsorted. Exact top-k (ties
  score DESC, doc_id ASC) — pruning only discards docs that provably
  cannot enter.

`topk_auto` picks per query: small candidate volume -> exact; else WAND.
"""

from __future__ import annotations

import heapq

import numpy as np

from connectors_spark.functions.codec import decode_block, decode_shard
from connectors_spark.operators.score import tf_norm_np

EXACT_PATH_MAX_POSTINGS = 1 << 19  # 512k entries: below this, brute numpy wins

# diagnostic: blocks decoded since process start (tests measure skip ratio)
BLOCKS_DECODED = 0


def _theta_seed(shards_by_term: list[tuple[float, list]], k: int) -> float:
    """Safe pre-seed for the WAND threshold (two-level merge, VERDICT r2
    item 7): within ONE term, blocks are doc-disjoint, so the top-k block
    maxima are achieved by k DISTINCT docs, and each achiever's total
    score >= its single-term contribution (other terms add >= 0). Hence
    max over terms of idf * (k-th largest block_max_w) lower-bounds the
    GLOBAL k-th best score — every group kernel may start its threshold
    there and skip blocks it would otherwise evaluate before its local
    heap fills. Returned one float-ulp lower so exact-tie docs (ranked by
    doc ASC) always survive the > theta pruning checks.

    VALID ONLY on a pristine index (no tombstones — the achiever could
    be dead; single generation with unchanged avgdl — stored block maxima
    are then achieved, not just bounds). Callers gate on that."""
    best = -1.0
    for idf, rows in shards_by_term:
        arrs = [np.asarray(row["block_max_w"], dtype=np.float64)
                for row in rows]
        if not arrs:
            continue
        bm = np.concatenate(arrs) if len(arrs) > 1 else arrs[0]
        if len(bm) >= k > 0:
            kth = float(np.partition(bm, len(bm) - k)[len(bm) - k])
            v = idf * kth
            if v > best:
                best = v
    return float(np.nextafter(best, -np.inf)) if best > 0 else -1.0


class ShardCursor:
    """Cursor over one encoded (term, shard) run with block skipping.

    `ub_scale` corrects stored block-max bounds when the live avgdl has
    grown since the shard was encoded: tf_norm(avgdl') <= tf_norm(avgdl) *
    max(1, avgdl'/avgdl), so scaled bounds stay true upper bounds after
    incremental updates (operators/delta.py)."""

    __slots__ = ("row", "idf", "k1", "b", "avgdl", "n", "n_blocks", "ub",
                 "block_i", "docs", "tfs", "dls", "pos", "exhausted", "scale",
                 "bl", "bmw")

    def __init__(self, row, idf: float, avgdl: float, k1: float, b: float,
                 ub_scale: float = 1.0):
        self.row = row
        self.idf = float(idf)
        self.k1, self.b, self.avgdl = k1, b, avgdl
        self.scale = max(1.0, float(ub_scale))
        self.n = int(row["n_docs"])
        # block metadata as ndarrays ONCE: seek() and the metadata
        # fast-forward loop searchsorted these on every skip, and
        # re-materializing them per call dominated kernel time on
        # low-theta queries (the r3 bench regression)
        self.bl = np.asarray(row["block_last_doc"], dtype=np.int64)
        self.bmw = np.asarray(row["block_max_w"], dtype=np.float64)
        self.n_blocks = len(self.bl)
        # list-level upper bound: idf * max block_max_w (scaled)
        self.ub = self.idf * float(self.bmw.max()) * self.scale
        self.block_i = -1
        self.exhausted = False
        self._load_block(0)

    def _load_block(self, bi: int):
        if bi >= self.n_blocks:
            self.exhausted = True
            return
        if bi != self.block_i:
            global BLOCKS_DECODED
            BLOCKS_DECODED += 1
            self.docs, self.tfs, self.dls = decode_block(self.row, bi)
            self.block_i = bi
        self.pos = 0

    def cur_doc(self) -> int:
        return int(self.docs[self.pos])

    def block_ub(self) -> float:
        return self.idf * float(self.bmw[self.block_i]) * self.scale

    def block_last(self) -> int:
        return int(self.bl[self.block_i])

    def score_cur(self) -> float:
        tf, dl = float(self.tfs[self.pos]), float(self.dls[self.pos])
        return self.idf * (tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)))

    def advance(self):
        """Move to the next posting."""
        self.pos += 1
        if self.pos >= len(self.docs):
            self._load_block(self.block_i + 1)

    def seek(self, target: int):
        """Move to the first doc >= target (block-granular skip)."""
        if self.exhausted:
            return
        if self.block_last() < target:
            bi = int(np.searchsorted(self.bl, target))
            if bi >= self.n_blocks:
                self.exhausted = True
                return
            self._load_block(bi)
        p = int(np.searchsorted(self.docs[self.pos:], target)) + self.pos
        if p >= len(self.docs):  # target beyond decoded block (== block_last case)
            self.pos = len(self.docs) - 1
            while not self.exhausted and self.cur_doc() < target:
                self.advance()
        else:
            self.pos = p


def _in_sorted(sorted_arr: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Membership of `values` in a sorted array (vectorized)."""
    if len(sorted_arr) == 0:
        return np.zeros(len(values), dtype=bool)
    pos = np.searchsorted(sorted_arr, values)
    pos = np.minimum(pos, len(sorted_arr) - 1)
    return sorted_arr[pos] == values


def _topk_from_scores(doc_idx: np.ndarray, scores: np.ndarray, k: int):
    order = np.lexsort((doc_idx, -scores))[:k]
    return doc_idx[order], scores[order]


def topk_exact(shards_by_term: list[tuple[float, list]], k: int,
               avgdl: float, k1: float, b: float,
               dead: np.ndarray | None = None,
               group_filter: tuple[int, int] | None = None,
               require_all: int | None = None):
    """shards_by_term: [(idf, [encoded rows])] in SORTED term order.
    `dead`: sorted doc_idx tombstones — masked out before scoring.
    `group_filter=(G, g)`: score only docs with doc_idx % G == g — the
    doc-space slice owned by this (query, group) partial-top-k task
    (IndexReader.topk). Replicated coarse shards carry out-of-group docs
    whose postings for finer-sharded terms live elsewhere; scoring them
    here would produce partial sums, so they are masked at decode.
    `require_all=n`: conjunctive (ES bool-must) mode — keep only docs
    matched by exactly n query terms (a doc appears once per matching
    term, so its posting count IS its matched-term count). Valid per
    group because every doc's postings for every term share its home
    group."""
    all_docs, all_w = [], []
    for idf, rows in shards_by_term:
        for row in rows:
            d, tf, dl = decode_shard(row)
            if group_filter is not None:
                G, g = group_filter
                ing = (d % G) == g
                d, tf, dl = d[ing], tf[ing], dl[ing]
            if dead is not None and len(dead):
                live = ~_in_sorted(dead, d)
                d, tf, dl = d[live], tf[live], dl[live]
            all_docs.append(d)
            all_w.append(idf * tf_norm_np(tf, dl, avgdl, k1, b))
    if not all_docs:
        return np.zeros(0, dtype=np.int64), np.zeros(0)
    docs = np.concatenate(all_docs)
    ws = np.concatenate(all_w)
    uniq, inv = np.unique(docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, ws)
    if require_all is not None:
        nmatch = np.bincount(inv, minlength=len(uniq))
        keep = nmatch == require_all
        uniq, acc = uniq[keep], acc[keep]
    return _topk_from_scores(uniq, acc, k)


def topk_wand(shards_by_term: list[tuple[float, list]], k: int,
              avgdl: float, k1: float, b: float,
              dead: np.ndarray | None = None,
              group_filter: tuple[int, int] | None = None,
              theta_seed: float = -1.0):
    cursors = [
        ShardCursor(row, idf, avgdl, k1, b,
                    ub_scale=float(row.get("_ub_scale", 1.0))
                    if hasattr(row, "get") else 1.0)
        for idf, rows in shards_by_term
        for row in rows
        if int(row["n_docs"]) > 0
    ]
    dead = dead if dead is not None and len(dead) else None
    cursors = [c for c in cursors if not c.exhausted]
    heap: list[tuple[float, int]] = []  # (score, -doc): min-heap on score
    # theta_seed: a caller-provided lower bound on the global k-th best
    # score (see _theta_seed) — the threshold never drops below it, and
    # because it is valid BEFORE the heap fills, seeded runs may skip
    # blocks from the first iteration (every true top-k doc scores above
    # the seed, so none is ever pruned and the heap still reaches k)
    theta = theta_seed
    seeded = theta_seed > -1.0

    def offer(doc: int, score: float):
        nonlocal theta
        # theta is kept ONE FLOAT ULP BELOW the kth score: pruning uses
        # `<= theta` / `> theta`, so a candidate TYING the kth score is
        # never skipped and can still win on the doc-ASC tie-break (the
        # seed path already guarantees this via nextafter in _theta_seed)
        if len(heap) < k:
            heapq.heappush(heap, (score, -doc))
            if len(heap) == k:
                theta = max(theta, float(np.nextafter(heap[0][0], -np.inf)))
        elif score > heap[0][0] or (score == heap[0][0] and -doc > heap[0][1]):
            heapq.heapreplace(heap, (score, -doc))
            theta = max(theta, float(np.nextafter(heap[0][0], -np.inf)))

    while True:
        live = [c for c in cursors if not c.exhausted]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc())
        # pivot: first prefix whose summed ub can beat theta
        acc_ub, pivot_i = 0.0, -1
        for i, c in enumerate(live):
            acc_ub += c.ub
            if acc_ub > theta:
                pivot_i = i
                break
        if pivot_i < 0:
            break  # nothing can beat theta
        pivot_doc = live[pivot_i].cur_doc()
        # extend pivot set to all lists already at pivot_doc
        while pivot_i + 1 < len(live) and live[pivot_i + 1].cur_doc() == pivot_doc:
            pivot_i += 1
        if live[0].cur_doc() == pivot_doc:
            # block-max refinement: sum of current-block ubs at pivot
            bm_ub = 0.0
            for c in live[: pivot_i + 1]:
                if c.block_last() < pivot_doc:
                    c.seek(pivot_doc)
                    if c.exhausted:
                        continue
                bm_ub += c.block_ub() if c.block_last() >= pivot_doc else c.ub
            if bm_ub <= theta and (seeded or len(heap) == k):
                # No doc covered ONLY by the pivot set can win inside the
                # current blocks. Fast-forward over block METADATA alone
                # (block_last_doc / block_max_w — no decode) until the
                # first doc range whose summed block maxima can beat
                # theta, capped at the next list's current doc — beyond
                # it, later lists start contributing (Ding&Suel BMW
                # GetNewCandidate). Only the landing block is decoded.
                pivots = [c for c in live[: pivot_i + 1] if not c.exhausted]
                cap = (live[pivot_i + 1].cur_doc()
                       if pivot_i + 1 < len(live) else None)
                target = pivot_doc
                while True:
                    bm, boundary = 0.0, None
                    for c in pivots:
                        bi = int(np.searchsorted(c.bl, target))
                        if bi >= c.n_blocks:
                            continue  # no postings at/after target
                        bm += c.idf * float(c.bmw[bi]) * c.scale
                        bend = int(c.bl[bi])
                        boundary = bend if boundary is None else min(boundary, bend)
                    if boundary is None:
                        # pivot set exhausted past target
                        target = None
                        break
                    if bm > theta:
                        break
                    nxt_target = boundary + 1
                    if cap is not None and nxt_target >= cap:
                        target = cap
                        break
                    target = nxt_target
                if target is None:
                    for c in pivots:
                        c.exhausted = True
                else:
                    for c in pivots:
                        if not c.exhausted and c.cur_doc() < target:
                            c.seek(target)
                continue
            # out-of-group docs (replicated coarse shards) have partial
            # postings here — their full score is computed in their home
            # group, so never offer them (see topk_exact docstring)
            in_group = (group_filter is None
                        or pivot_doc % group_filter[0] == group_filter[1])
            if not in_group:
                for c in live[: pivot_i + 1]:
                    if not c.exhausted and c.cur_doc() == pivot_doc:
                        c.advance()
                continue
            score = 0.0
            for c in live[: pivot_i + 1]:
                if not c.exhausted and c.cur_doc() == pivot_doc:
                    score += c.score_cur()
                    c.advance()
            if dead is None or not _in_sorted(
                dead, np.array([pivot_doc], dtype=np.int64)
            )[0]:
                offer(pivot_doc, score)
        else:
            # advance lists before the pivot up to it
            for c in live[:pivot_i]:
                if c.cur_doc() < pivot_doc:
                    c.seek(pivot_doc)
    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return (
        np.array([-d for _, d in out], dtype=np.int64),
        np.array([s for s, _ in out], dtype=np.float64),
    )


def topk_auto(shards_by_term, k, avgdl, k1, b, dead=None, group_filter=None,
              theta_seed: float = -1.0):
    total = sum(int(r["n_docs"]) for _, rows in shards_by_term for r in rows)
    if total <= EXACT_PATH_MAX_POSTINGS or len(shards_by_term) == 1:
        return topk_exact(shards_by_term, k, avgdl, k1, b, dead, group_filter)
    return topk_wand(shards_by_term, k, avgdl, k1, b, dead, group_filter,
                     theta_seed=theta_seed)
