"""From-scratch cuckoo filter (bloom fallback with deletion support).

Used when the URL-seen set needs TTL/windowed semantics (re-crawl after
expiry): a bloom can't delete, a cuckoo filter can. 4-slot buckets,
16-bit fingerprints (~12 bits/key effective at 95% load), partial-key
cuckoo hashing: i2 = i1 XOR hash(fp), so either bucket is derivable from
the other plus the fingerprint.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np

from .hashing import murmur3_32, url_hash64_vec

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int):
        nbuckets = 1
        while nbuckets * _SLOTS < capacity:
            nbuckets <<= 1  # power of two so XOR indexing stays in range
        nbuckets <<= 1  # headroom -> ~50% load at stated capacity
        self.nbuckets = nbuckets
        self.mask = np.uint64(nbuckets - 1)
        self.table = np.zeros((nbuckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.default_rng(42)  # deterministic eviction choice

    # -- helpers -------------------------------------------------------------
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        fp = ((keys >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        return np.where(fp == 0, np.uint16(1), fp)  # 0 means empty slot

    def _index1(self, keys: np.ndarray) -> np.ndarray:
        return (keys & self.mask).astype(np.uint64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # i2 = i1 ^ murmur3(fp); vectorized via the low 32 bits of a cheap mix
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(0xFFFFFFFF)
        return (idx ^ fph) & self.mask

    # -- single-key ops --------------------------------------------------------
    def _insert_one(self, idx: int, fp: int) -> bool:
        for i in (idx, int(self._alt_index(np.uint64(idx), np.uint16(fp)))):
            row = self.table[i]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        # evict loop
        cur = idx
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self.table[cur, slot] = int(self.table[cur, slot]), fp
            cur = int(self._alt_index(np.uint64(cur), np.uint16(fp)))
            row = self.table[cur]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table full

    def add(self, urls: Iterable[str]) -> int:
        keys = url_hash64_vec(list(urls))
        fps = self._fingerprint(keys)
        idxs = self._index1(keys)
        ok = 0
        for idx, fp in zip(idxs, fps):
            if self._insert_one(int(idx), int(fp)):
                ok += 1
        return ok

    def contains(self, urls: Iterable[str]) -> np.ndarray:
        keys = url_hash64_vec(list(urls))
        fps = self._fingerprint(keys)
        i1 = self._index1(keys)
        i2 = self._alt_index(i1, fps)
        in1 = (self.table[i1.astype(np.int64)] == fps[:, None]).any(axis=1)
        in2 = (self.table[i2.astype(np.int64)] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete(self, urls: Iterable[str]) -> int:
        keys = url_hash64_vec(list(urls))
        fps = self._fingerprint(keys)
        i1s = self._index1(keys)
        removed = 0
        for key_i1, fp in zip(i1s, fps):
            for i in (int(key_i1), int(self._alt_index(key_i1, fp))):
                row = self.table[i]
                hits = np.nonzero(row == fp)[0]
                if len(hits):
                    row[hits[0]] = 0
                    self.count -= 1
                    removed += 1
                    break
        return removed

    def load_factor(self) -> float:
        return self.count / (self.nbuckets * _SLOTS)
