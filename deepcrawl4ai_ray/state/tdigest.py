"""Merging t-digest — mergeable quantile sketch (Dunning & Ertl 2019,
"Computing extremely accurate quantiles using t-digests").

The partial-aggregate path for grouped quantiles at corpus scale: each
map_batches task folds its values into a digest (≤ ~2δ centroids), only
digest bytes (~16 B per centroid) move through the groupby shuffle, and
per-group digests merge associatively.  Rank error is bounded by the
k₁ scale function: ≲ 1/δ at mid quantiles, tighter near the tails.

From-scratch implementation of the published design; no reference-repo
analog (the reference has no numeric aggregation at all, SURVEY.md
§2.5).
"""

from __future__ import annotations

import numpy as np


class TDigest:
    __slots__ = ("compression", "means", "weights", "_buf_m", "_buf_w", "min", "max")

    def __init__(self, compression: int = 200):
        self.compression = int(compression)
        self.means = np.empty(0, np.float64)
        self.weights = np.empty(0, np.float64)
        self._buf_m: list = []
        self._buf_w: list = []
        self.min = np.inf
        self.max = -np.inf

    # ------------------------------------------------------------------ build
    def add_many(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[np.isfinite(v)]
        if v.size == 0:
            return
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        self._buf_m.append(v)
        self._buf_w.append(np.ones(v.size, np.float64))
        if sum(b.size for b in self._buf_m) >= 4 * self.compression:
            self._flush()

    def merge(self, other: "TDigest") -> None:
        """Associative + commutative up to the documented rank-error
        bound (centroid sets differ by merge order; quantile estimates
        stay within the k₁ bound either way)."""
        other._flush()
        if other.means.size:
            self._buf_m.append(other.means)
            self._buf_w.append(other.weights)
            self.min = min(self.min, other.min)
            self.max = max(self.max, other.max)
            self._flush()

    def _k(self, q: float) -> float:
        # k₁ scale: δ · (asin(2q−1)/π + ½) — tail-accurate
        return self.compression * (np.arcsin(2.0 * q - 1.0) / np.pi + 0.5)

    def _flush(self) -> None:
        if not self._buf_m:
            return
        m = np.concatenate([self.means] + self._buf_m)
        w = np.concatenate([self.weights] + self._buf_w)
        self._buf_m, self._buf_w = [], []
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        total = float(w.sum())
        out_m: list = []
        out_w: list = []
        cur_m, cur_w = float(m[0]), float(w[0])
        w_before = 0.0  # total weight of emitted centroids
        k_lo = self._k(0.0)
        for i in range(1, m.size):
            if self._k((w_before + cur_w + w[i]) / total) - k_lo <= 1.0:
                # weighted mean update keeps the centroid exact
                cur_m += (m[i] - cur_m) * (w[i] / (cur_w + w[i]))
                cur_w += w[i]
            else:
                out_m.append(cur_m)
                out_w.append(cur_w)
                w_before += cur_w
                k_lo = self._k(w_before / total)
                cur_m, cur_w = float(m[i]), float(w[i])
        out_m.append(cur_m)
        out_w.append(cur_w)
        self.means = np.asarray(out_m, np.float64)
        self.weights = np.asarray(out_w, np.float64)

    # ------------------------------------------------------------------ query
    @property
    def n(self) -> float:
        return float(self.weights.sum()) + sum(float(b.sum()) for b in self._buf_w)

    def quantile(self, q: float) -> float:
        self._flush()
        m, w = self.means, self.weights
        if m.size == 0:
            return float("nan")
        if m.size == 1:
            return float(m[0])
        total = float(w.sum())
        target = q * total
        cum = np.cumsum(w) - w / 2.0  # centroid midpoints in rank space
        if target <= cum[0]:
            lo, hi, tlo, thi = self.min, float(m[0]), 0.0, float(cum[0])
        elif target >= cum[-1]:
            lo, hi, tlo, thi = float(m[-1]), self.max, float(cum[-1]), total
        else:
            i = int(np.searchsorted(cum, target))
            lo, hi, tlo, thi = float(m[i - 1]), float(m[i]), float(cum[i - 1]), float(cum[i])
        if thi <= tlo:
            return lo
        return lo + (hi - lo) * (target - tlo) / (thi - tlo)

    # -------------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        self._flush()
        head = np.array([self.compression, self.means.size, self.min, self.max], np.float64)
        return head.tobytes() + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        head = np.frombuffer(b[:32], np.float64)
        d = cls(int(head[0]))
        k = int(head[1])
        d.min, d.max = float(head[2]), float(head[3])
        d.means = np.frombuffer(b[32 : 32 + 8 * k], np.float64).copy()
        d.weights = np.frombuffer(b[32 + 8 * k : 32 + 16 * k], np.float64).copy()
        return d
