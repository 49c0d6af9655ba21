"""Exactly-once state: LSN high-water mark + Bloom filter + exact ranges.

Three layers of duplicate defense for incoming change events, cheapest
first (the north rule's "per-micro-batch dedup via Bloom-filter + LSN
high-water-mark state store"):

1. **HWM fast path** — `lsn > hwm` rows are definitely new (batches are
   ordered LSN ranges); pure JVM-side filter, zero extra cost for the
   overwhelmingly common case.
2. **Bloom filter** over all applied lsns — probabilistic fast-reject
   for `lsn <= hwm` suspects. Vectorized numpy double-hashing inside an
   Arrow-batched pandas UDF (no per-row Python). False positives are
   safe: a "maybe applied" suspect merely falls through to layer 3.
3. **Exact applied-range check** — broadcast range-join against the
   manifest's coalesced applied LSN ranges (tiny: O(#gaps)).

The Bloom state lives beside the checkpoint and is rebuildable from the
manifest lineage (crash-safe: losing it only costs re-running layer 3).
Reference analog: the in-batch address dedup set (neo4j_csv.go:97) and
the LastBlockNumber resume point (neo4j_csv.go:62-79), generalized to
cross-run state.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — vectorized, deterministic."""
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x ^= x >> np.uint64(33)
        x *= _MIX1
        x ^= x >> np.uint64(33)
        x *= _MIX2
        x ^= x >> np.uint64(33)
    return x


class LsnBloom:
    """Plain numpy bit-array Bloom filter over int64 lsns."""

    def __init__(self, n_bits: int = 1 << 23, n_hashes: int = 5):
        assert n_bits % 8 == 0
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros(n_bits // 8, dtype=np.uint8)

    def _positions(self, lsns: np.ndarray) -> np.ndarray:
        h1 = _mix64(lsns.astype(np.uint64))
        h2 = _mix64(h1 + np.uint64(0x9E3779B97F4A7C15))
        ks = np.arange(self.n_hashes, dtype=np.uint64)[:, None]
        with np.errstate(over="ignore"):
            pos = (h1[None, :] + ks * h2[None, :]) % np.uint64(self.n_bits)
        return pos  # shape (n_hashes, n)

    def add_many(self, lsns: np.ndarray) -> None:
        if len(lsns) == 0:
            return
        pos = self._positions(np.asarray(lsns, dtype=np.int64)).ravel()
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))

    def might_contain_many(self, lsns: np.ndarray) -> np.ndarray:
        if len(lsns) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(lsns, dtype=np.int64))
        hit = (self.bits[(pos >> 3).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
        return hit.all(axis=0).astype(bool)

    # ------------------------------------------------------------ persist
    def save(self, path: str) -> None:
        tmp = path + ".tmp.npz"  # savez appends .npz when missing
        np.savez_compressed(
            tmp,
            bits=self.bits,
            meta=np.array([self.n_bits, self.n_hashes], dtype=np.int64),
        )
        os.rename(tmp, path)  # np.load sniffs the zip magic, any extension

    @classmethod
    def load(cls, path: str) -> "LsnBloom":
        z = np.load(path)
        n_bits, n_hashes = (int(v) for v in z["meta"])
        b = cls(n_bits=n_bits, n_hashes=n_hashes)
        b.bits = z["bits"]
        return b

    @classmethod
    def rebuild_from_ranges(cls, ranges: list[list[int]], **kw) -> "LsnBloom":
        b = cls(**kw)
        for lo, hi in ranges:
            b.add_many(np.arange(lo, hi + 1, dtype=np.int64))
        return b


class ExactlyOnceFilter:
    """Composable already-applied filter for ``apply_batch``."""

    def __init__(self, lineage: dict, bloom: LsnBloom | None = None):
        self.hwm = lineage["hwm"]
        self.ranges = lineage["applied_ranges"]
        self.bloom = bloom

    def __call__(self, ev: DataFrame) -> DataFrame:
        """Exact already-applied filter. Splits the batch on the HWM:
        rows above it are definitely new (zero-cost keep); rows at or
        below go through Bloom + exact-range membership, so a LATE batch
        (delivered after a higher segment) is applied, never silently
        dropped — only true duplicates die here."""
        if not self.ranges:
            return ev
        # Contiguous-history fast path: when the applied ranges are one
        # gapless run ending at the HWM (the normal ordered-stream
        # state), every lsn <= hwm is a definite duplicate — the whole
        # guard reduces to the HWM filter, no Bloom pass, no range join.
        if len(self.ranges) == 1 and self.ranges[0][1] == self.hwm:
            lo = self.ranges[0][0]
            return ev.filter(
                (F.col("lsn") > F.lit(self.hwm)) | (F.col("lsn") < F.lit(lo))
            )
        fresh = ev.filter(F.col("lsn") > F.lit(self.hwm))
        ev = ev.filter(F.col("lsn") <= F.lit(self.hwm))
        if self.bloom is not None:
            bits, n_bits, n_hashes = self.bloom.bits, self.bloom.n_bits, self.bloom.n_hashes

            # Self-contained closure (numpy only, no module references):
            # survives pickling to python workers regardless of how the
            # driver process found this package (spark-submit --py-files,
            # PYTHONPATH, or cwd).
            @F.pandas_udf("boolean")
            def maybe_applied(lsn: pd.Series) -> pd.Series:
                import numpy as _np

                x = lsn.to_numpy().astype(_np.uint64)
                if len(x) == 0:
                    return pd.Series([], dtype=bool)

                def mix(v):
                    v = v.copy()
                    with _np.errstate(over="ignore"):
                        v ^= v >> _np.uint64(33)
                        v *= _np.uint64(0xFF51AFD7ED558CCD)
                        v ^= v >> _np.uint64(33)
                        v *= _np.uint64(0xC4CEB9FE1A85EC53)
                        v ^= v >> _np.uint64(33)
                    return v

                h1 = mix(x)
                with _np.errstate(over="ignore"):
                    h2 = mix(h1 + _np.uint64(0x9E3779B97F4A7C15))
                    ks = _np.arange(n_hashes, dtype=_np.uint64)[:, None]
                    pos = (h1[None, :] + ks * h2[None, :]) % _np.uint64(n_bits)
                hit = (
                    bits[(pos >> 3).astype(_np.int64)]
                    >> (pos & _np.uint64(7)).astype(_np.uint8)
                ) & 1
                return pd.Series(hit.all(axis=0).astype(bool))

            # rows the Bloom definitely hasn't seen are new — keep them
            # without the exact check; Bloom "maybe" rows go to layer 3.
            ev = ev.withColumn("__maybe", maybe_applied(F.col("lsn")))
        else:
            ev = ev.withColumn("__maybe", F.lit(True))
        spark = ev.sparkSession
        rng = spark.createDataFrame(
            [(int(lo), int(hi)) for lo, hi in self.ranges], "lo long, hi long"
        )
        dup = (
            ev.filter(F.col("__maybe"))
            .join(
                F.broadcast(rng),
                (F.col("lsn") >= F.col("lo")) & (F.col("lsn") <= F.col("hi")),
                "left_semi",
            )
            .select("lsn")
        )
        survivors = ev.join(F.broadcast(dup), "lsn", "left_anti").drop("__maybe")
        return fresh.unionByName(survivors)
