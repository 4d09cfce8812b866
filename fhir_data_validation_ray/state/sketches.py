"""Mergeable sketches for distributed column statistics.

Both sketches follow the partial-aggregate pattern (SURVEY.md §2.6): each
``map_batches`` task builds a partial from its batch; partials are tiny,
deterministic, and merge associatively — so the final reduce is a driver-side
fold over per-batch sketch rows, never a shuffle of raw values.

- **TDigest**: fixed-boundary merging digest. Values are clustered into at
  most ``delta`` centroids whose quantile spans follow the k1 (arcsine)
  scale function — fine resolution at the tails, coarse in the middle.
  Deterministic (no randomness, no insertion-order dependence beyond float
  summation within a cluster) and fully vectorized. Divergence from
  Dunning's canonical algorithm: cluster boundaries are the FIXED k-scale
  grid rather than greedy size-limited merging — same asymptotic accuracy,
  simpler merge.
- **HyperLogLog**: p-bit register HLL (default p=14 -> 16 KiB, ~0.8% error)
  over 64-bit FNV hashes, with linear-counting small-range correction.
- **CountMinSketch**: depth x width counter grid over 64-bit FNV hashes —
  point-frequency estimates for UNBOUNDED key spaces where the exact
  value-count fold's distinct-cardinality assumption breaks. One-sided
  error: estimate >= true count always; overshoot <= 2N/width with
  probability 1 - 2^-depth per query.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..functions.hashing import hash_str


# ------------------------------------------------------------------ t-digest
@dataclass
class TDigest:
    means: np.ndarray    # centroid means, ascending
    weights: np.ndarray  # centroid weights (float64)
    delta: int = 128

    @staticmethod
    def _boundaries(delta: int) -> np.ndarray:
        """Quantile boundaries of the fixed k-scale grid: k(q) = δ/2π·asin(2q−1)."""
        j = np.arange(delta + 1, dtype=np.float64)
        return (np.sin(np.pi * (j / delta) - np.pi / 2) + 1.0) / 2.0

    @classmethod
    def from_values(cls, values: np.ndarray, delta: int = 128) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return cls(np.empty(0), np.empty(0), delta)
        v = np.sort(v)
        return cls._compress(v, np.ones(v.size), delta)

    @classmethod
    def _compress(cls, means: np.ndarray, weights: np.ndarray, delta: int) -> "TDigest":
        """means must be ascending. Cluster by fixed k-scale quantile bins."""
        total = weights.sum()
        cum = np.cumsum(weights) - weights / 2.0  # centroid mid-quantile mass
        q = cum / total
        bins = np.searchsorted(cls._boundaries(delta), q, side="right") - 1
        bins = np.clip(bins, 0, delta - 1)
        # merge per bin: weighted mean (deterministic given sorted input)
        uniq, inv = np.unique(bins, return_inverse=True)
        w = np.bincount(inv, weights=weights)
        m = np.bincount(inv, weights=means * weights) / w
        return cls(m, w, delta)

    def merge(self, other: "TDigest") -> "TDigest":
        if self.means.size == 0:
            return other
        if other.means.size == 0:
            return self
        m = np.concatenate([self.means, other.means])
        w = np.concatenate([self.weights, other.weights])
        order = np.argsort(m, kind="stable")
        return TDigest._compress(m[order], w[order], self.delta)

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return float("nan")
        if self.means.size == 1:
            return float(self.means[0])
        total = self.weights.sum()
        cum = np.cumsum(self.weights) - self.weights / 2.0
        target = q * total
        return float(np.interp(target, cum, self.means))

    def to_rows(self) -> dict:
        return {"means": self.means.tolist(), "weights": self.weights.tolist(),
                "delta": self.delta}

    @classmethod
    def from_rows(cls, d: dict) -> "TDigest":
        return cls(np.asarray(d["means"], np.float64),
                   np.asarray(d["weights"], np.float64), int(d["delta"]))


# -------------------------------------------------------------- HyperLogLog
@dataclass
class HyperLogLog:
    registers: np.ndarray  # uint8[2^p]
    p: int = 14

    @classmethod
    def empty(cls, p: int = 14) -> "HyperLogLog":
        return cls(np.zeros(1 << p, dtype=np.uint8), p)

    @classmethod
    def from_hashes(cls, h: np.ndarray, p: int = 14) -> "HyperLogLog":
        hll = cls.empty(p)
        hll.add_hashes(h)
        return hll

    @classmethod
    def from_strings(cls, arr: np.ndarray, p: int = 14) -> "HyperLogLog":
        return cls.from_hashes(hash_str(arr), p)

    def add_hashes(self, h: np.ndarray) -> None:
        h = np.asarray(h, dtype=np.uint64)
        if h.size == 0:
            return
        # FNV-1a avalanches poorly in the bits HLL slices on; run the values
        # through a splitmix64-style finalizer first (pure function of the
        # hash, so merges stay consistent across batches)
        h = h.copy()
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
        p = self.p
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        w = h & np.uint64((1 << (64 - p)) - 1)
        # rho = leading-zero count of the (64-p)-bit suffix + 1
        # = (64-p) - bit_length(w) + 1; w < 2^50 so float64 log2 is exact
        bl = np.zeros(h.size, dtype=np.int64)
        nz = w > 0
        bl[nz] = np.floor(np.log2(w[nz].astype(np.float64))).astype(np.int64) + 1
        rho = ((64 - p) - bl + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        return HyperLogLog(np.maximum(self.registers, other.registers), self.p)

    def estimate(self) -> float:
        m = float(len(self.registers))
        alpha = 0.7213 / (1 + 1.079 / m)
        inv = np.power(2.0, -self.registers.astype(np.float64))
        e = alpha * m * m / inv.sum()
        zeros = int((self.registers == 0).sum())
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # linear counting
        return e


# -------------------------------------------------------------- count-min
_CMS_MIX_A = np.uint64(0x9E3779B97F4A7C15)  # per-row odd multipliers derive
_CMS_MIX_B = np.uint64(0xC2B2AE3D27D4EB4F)  # from splitmix64's constants


@dataclass
class CountMinSketch:
    """Count-Min frequency sketch (Cormode & Muthukrishnan 2005): ``depth``
    independent hash rows over a ``width``-counter grid. Updates and point
    queries are fully vectorized; merge is elementwise add, so per-batch
    partials fold exactly like TDigest/HLL. Estimates are one-sided
    (``estimate >= true``); keep-side decisions built on it can only
    over-keep, never silently drop."""

    counts: np.ndarray  # int64[depth, width]
    width: int = 2048
    depth: int = 4

    @classmethod
    def empty(cls, width: int = 2048, depth: int = 4) -> "CountMinSketch":
        return cls(np.zeros((depth, width), dtype=np.int64), width, depth)

    def _rows(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices — splitmix-style per-row remix of the
        FNV hashes (pure function of the hash: merges stay consistent)."""
        h = np.asarray(h, dtype=np.uint64)
        j = np.arange(self.depth, dtype=np.uint64).reshape(-1, 1)
        x = h[None, :] * (_CMS_MIX_A + np.uint64(2) * j) + _CMS_MIX_B * j
        x ^= x >> np.uint64(29)
        x *= _CMS_MIX_A
        x ^= x >> np.uint64(32)
        return (x % np.uint64(self.width)).astype(np.int64)

    def add_hashes(self, h: np.ndarray, counts: np.ndarray | None = None) -> None:
        if len(h) == 0:
            return
        c = np.ones(len(h), dtype=np.int64) if counts is None else \
            np.asarray(counts, dtype=np.int64)
        idx = self._rows(h)
        for j in range(self.depth):
            np.add.at(self.counts[j], idx[j], c)

    def add_strings(self, arr: np.ndarray, counts: np.ndarray | None = None) -> None:
        self.add_hashes(hash_str(np.asarray(arr, dtype="U")), counts)

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if len(h) == 0:
            return np.zeros(0, dtype=np.int64)
        idx = self._rows(h)
        est = self.counts[0][idx[0]]
        for j in range(1, self.depth):
            est = np.minimum(est, self.counts[j][idx[j]])
        return est.astype(np.int64)

    def estimate_strings(self, arr: np.ndarray) -> np.ndarray:
        return self.estimate_hashes(hash_str(np.asarray(arr, dtype="U")))

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("cannot merge CMS of different shapes")
        return CountMinSketch(self.counts + other.counts, self.width, self.depth)

    def to_bytes(self) -> bytes:
        return self.counts.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes, width: int = 2048, depth: int = 4) -> "CountMinSketch":
        return cls(np.frombuffer(b, dtype=np.int64).reshape(depth, width).copy(),
                   width, depth)


# ---------------------------------------------------------------------- KLL
@dataclass
class KLL:
    """KLL quantile sketch (Karnin-Lang-Liberty 2016; see also "An
    Experimental Analysis of Quantile Sketches over Data Streams", EDBT
    2023): a hierarchy of compactors where level i holds items of weight
    2^i and has geometrically DECAYING capacity k·c^(H-1-i) (c = 2/3), so
    total space is O(k) while rank error stays O(1/k)·n.

    Divergence from the paper, for distributed determinism: the compaction
    coin is a per-sketch alternating bit (the standard derandomization)
    instead of a random flip, and merge concatenates level-wise then
    compacts — the result depends only on the multiset of inputs per
    partial and the fold tree, never on a seed. Error bounds are checked
    empirically by the property suite rather than inherited from the
    randomized analysis."""

    levels: list  # list[np.ndarray float64], levels[i] items have weight 2^i
    k: int = 200
    flip: int = 0

    C = 2.0 / 3.0

    @classmethod
    def empty(cls, k: int = 200) -> "KLL":
        return cls([np.empty(0, np.float64)], k, 0)

    @classmethod
    def from_values(cls, values: np.ndarray, k: int = 200) -> "KLL":
        s = cls.empty(k)
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size:
            s.levels[0] = v.copy()
            s._compress()
        return s

    def _cap(self, level: int, height: int) -> int:
        return max(int(np.ceil(self.k * (self.C ** (height - 1 - level)))), 2)

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            h = len(self.levels)
            if self.levels[i].size <= self._cap(i, h):
                i += 1
                continue
            lv = np.sort(self.levels[i], kind="stable")
            odd = lv.size % 2
            keep = lv[:odd]                     # odd leftover stays
            promoted = lv[odd + self.flip::2]   # every other item, weight x2
            self.flip ^= 1
            self.levels[i] = keep
            if i + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
            self.levels[i + 1] = np.concatenate(
                [self.levels[i + 1], promoted])
            # growing a level changes every cap; restart the sweep
            i = 0 if len(self.levels) != h else i + 1

    def merge(self, other: "KLL") -> "KLL":
        if self.k != other.k:
            raise ValueError("cannot merge KLL of different k")
        n = max(len(self.levels), len(other.levels))
        levels = []
        for i in range(n):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            levels.append(np.concatenate([a, b]).astype(np.float64))
        out = KLL(levels, self.k, self.flip ^ other.flip)
        out._compress()
        return out

    def _weighted(self):
        items = np.concatenate(self.levels) if self.levels else np.empty(0)
        weights = np.concatenate(
            [np.full(lv.size, 1 << i, np.int64)
             for i, lv in enumerate(self.levels)]) \
            if self.levels else np.empty(0, np.int64)
        order = np.argsort(items, kind="stable")
        return items[order], weights[order]

    @property
    def n(self) -> int:
        return int(sum(lv.size << i for i, lv in enumerate(self.levels)))

    def rank(self, value: float) -> int:
        """Estimated number of inserted items <= value."""
        items, weights = self._weighted()
        return int(weights[items <= value].sum())

    def quantile(self, q: float) -> float:
        items, weights = self._weighted()
        if items.size == 0:
            return float("nan")
        cum = np.cumsum(weights)
        target = q * cum[-1]
        return float(items[min(np.searchsorted(cum, target, side="left"),
                               items.size - 1)])

    def to_rows(self) -> dict:
        return {"levels": [lv.tolist() for lv in self.levels],
                "k": self.k, "flip": self.flip}

    @classmethod
    def from_rows(cls, d: dict) -> "KLL":
        return cls([np.asarray(lv, np.float64) for lv in d["levels"]],
                   int(d["k"]), int(d["flip"]))
