"""KLL quantile sketch (Karnin–Lang–Liberty 2016, the algorithm the
north star names for per-partition quantiles) — pure numpy, mergeable,
deterministic.

Spark ships Greenwald–Khanna (``approx_percentile``) and DataSketches
HLL, but no KLL; this module supplies the missing sketch as the engine's
own primitive so per-partition states can ride the checkpoint ledger and
merge across ingest batches like the moments/HLL/histogram states
(operators/incremental.py).

Structure (the standard simplified KLL): level h holds a buffer of items
each standing for 2^h input rows. Inserts land in level 0; when the
sketch is over capacity the lowest over-full level is sorted and every
other item (random even/odd offset) is promoted to level h+1 — each
compaction halves the buffer and doubles the weight. Level capacities
shrink geometrically from the top: cap(h) = max(ceil(k·(2/3)^(H−h)), 8),
so total space is O(k·log(n/k)) and the rank error is O(1/k) with high
probability (k=200 ⇒ well under 1% observed; the pytest suite pins
empirical bounds across distributions).

DETERMINISM: the even/odd compaction offset is the only randomness in
KLL. Here it derives from ``crc32(f"{seed}:{level}:{compaction_count}")``
— the same generator-vs-checker trick the audio fixtures use
(fixtures/signal.py) — so a sketch built twice over the same stream is
IDENTICAL, cross-process and cross-executor. Merges fold the counters
in, so merge results are deterministic too (though not bit-equal to the
single-pass sketch — the guarantee, as in the paper, is the shared error
bound; pytest pins both).

Reference parity: the reference's forgiving decoder funnels every input
shape through one tolerant surface (internal/dirtyjson/decoder.go);
NaNs here are likewise tolerated and dropped at insert, counted
separately, mirroring the null-handling contract of operators/stats.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_CAP_RATIO = 2.0 / 3.0
_MIN_CAP = 8


def _cap(k: int, depth_from_top: int) -> int:
    return max(int(np.ceil(k * (_CAP_RATIO ** depth_from_top))), _MIN_CAP)


class KLL:
    """One KLL sketch over float64 items. Not thread-safe; cheap to
    copy via to_bytes/from_bytes."""

    __slots__ = ("k", "seed", "n", "levels", "compactions")

    def __init__(self, k: int = 200, seed: int = 0):
        if k < _MIN_CAP:
            raise ValueError(f"k must be >= {_MIN_CAP}")
        self.k = int(k)
        self.seed = int(seed) & 0xFFFFFFFF
        self.n = 0  # items inserted (excluding NaN)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.compactions = 0

    # -- core ------------------------------------------------------------

    def _capacity(self) -> int:
        top = len(self.levels) - 1
        return sum(_cap(self.k, top - h) for h in range(top + 1))

    def _offset_bit(self, level: int) -> int:
        token = f"{self.seed}:{level}:{self.compactions}".encode()
        return zlib.crc32(token) & 1

    def _compact(self) -> None:
        """Halve the lowest over-capacity level into the one above."""
        top = len(self.levels) - 1
        for h in range(top + 1):
            if len(self.levels[h]) > _cap(self.k, top - h):
                buf = np.sort(self.levels[h])
                off = self._offset_bit(h)
                self.compactions += 1
                kept = buf[off::2]
                self.levels[h] = np.empty(0, dtype=np.float64)
                if h + 1 > top:
                    self.levels.append(np.empty(0, dtype=np.float64))
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], kept])
                return
        # no level individually over: grow the hierarchy by compacting
        # level 0 anyway (keeps total size bounded)
        self._compact_level0_force()

    def _compact_level0_force(self) -> None:
        buf = np.sort(self.levels[0])
        off = self._offset_bit(0)
        self.compactions += 1
        kept = buf[off::2]
        self.levels[0] = np.empty(0, dtype=np.float64)
        if len(self.levels) == 1:
            self.levels.append(np.empty(0, dtype=np.float64))
        self.levels[1] = np.concatenate([self.levels[1], kept])

    def update(self, values) -> "KLL":
        """Insert a batch (array-like). NaNs are dropped (the caller
        counts nulls separately, as operators/stats.py does).

        CHUNK-INVARIANT: values are admitted fill-to-capacity, one
        compaction granule at a time, so the resulting state depends
        only on the cumulative stream — update(a+b) ≡ update(a);
        update(b) — never on how a caller (e.g. Arrow batching in
        operators/stats.py) happened to slice it. That is what lets the
        pytest twin rebuild executor sketches byte-for-byte."""
        arr = np.asarray(values, dtype=np.float64).ravel()
        arr = arr[~np.isnan(arr)]
        if len(arr) == 0:
            return self
        self.n += len(arr)
        i = 0
        while i < len(arr):
            space = self._capacity() - sum(len(b) for b in self.levels)
            if space <= 0:
                self._compact()
                continue
            take = min(space, len(arr) - i)
            self.levels[0] = np.concatenate(
                [self.levels[0], arr[i:i + take]])
            i += take
        return self

    def merge(self, other: "KLL") -> "KLL":
        """Fold ``other`` into self (k must match). Level buffers
        concatenate weight-for-weight, then normal compaction restores
        the space bound. Deterministic: the combined compaction counter
        seeds subsequent offsets."""
        if other.k != self.k:
            raise ValueError("cannot merge sketches with different k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self.compactions += other.compactions
        self.seed = (self.seed ^ other.seed) & 0xFFFFFFFF
        while sum(len(b) for b in self.levels) > self._capacity():
            self._compact()
        return self

    # -- queries ----------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        items, weights = [], []
        for h, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << h, dtype=np.int64))
        if not items:
            return (np.empty(0), np.empty(0, dtype=np.int64))
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, p: float) -> float:
        """Estimated p-quantile (0 <= p <= 1)."""
        if self.n == 0:
            return float("nan")
        it, wt = self._weighted()
        total = wt.sum()
        target = p * total
        cum = np.cumsum(wt)
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, len(it) - 1)])

    def quantiles(self, ps) -> list[float]:
        return [self.quantile(float(p)) for p in ps]

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        if self.n == 0:
            return float("nan")
        it, wt = self._weighted()
        total = wt.sum()
        idx = int(np.searchsorted(it, x, side="right"))
        return float(wt[:idx].sum() / total)

    # -- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        parts = [struct.pack("<IIqII", self.k, self.seed, self.n,
                             self.compactions, len(self.levels))]
        for buf in self.levels:
            parts.append(struct.pack("<I", len(buf)))
            parts.append(np.ascontiguousarray(buf).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, blob: bytes) -> "KLL":
        k, seed, n, comps, n_levels = struct.unpack_from("<IIqII", blob, 0)
        off = struct.calcsize("<IIqII")
        sk = cls(k=k, seed=seed)
        sk.n = n
        sk.compactions = comps
        sk.levels = []
        for _ in range(n_levels):
            (ln,) = struct.unpack_from("<I", blob, off)
            off += 4
            sk.levels.append(np.frombuffer(
                blob, dtype=np.float64, count=ln, offset=off).copy())
            off += 8 * ln
        return sk
