"""Threshold-tuned MinHash-LSH dedup operator (the generalized form of
the gated ``dedup_minhash_lsh`` query).

The gated query pins k=8 / 4 bands x 2 rows for oracle reproducibility;
this operator picks the banding FROM the target Jaccard threshold via
the S-curve: with b bands of r rows, a pair at similarity s becomes a
candidate with probability 1 - (1 - s^r)^b, whose inflection sits at
t ~= (1/b)^(1/r). ``tune_bands`` chooses the (b, r) factorization of
n_hashes whose inflection is closest to the requested threshold, so the
caller thinks in "dedup at >= 0.7 Jaccard", not in banding arithmetic.

Scale shape identical to the gated query: per-band bucket joins for
candidates, exact Jaccard verified ONLY for candidates, sizes riding
the signature aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.pipeline_queries import (
    MH_A,
    _jaccard_for_pairs,
    _minhash_docsets,
    _shingled,
)


def s_curve_threshold(b: int, r: int) -> float:
    """Inflection point of the LSH S-curve for b bands of r rows."""
    return (1.0 / b) ** (1.0 / r)


def tune_bands(n_hashes: int, threshold: float) -> tuple[int, int]:
    """Pick (bands, rows) with bands*rows == n_hashes whose S-curve
    inflection best matches the target Jaccard threshold."""
    best = None
    for r in range(1, n_hashes + 1):
        if n_hashes % r:
            continue
        b = n_hashes // r
        t = s_curve_threshold(b, r)
        score = abs(t - threshold)
        if best is None or score < best[0]:
            best = (score, b, r)
    assert best is not None
    return best[1], best[2]


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    n_hashes: int = 16,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs (doc_a < doc_b) at Jaccard >= ``threshold``
    over 3-gram shingles. Banding auto-tuned from the threshold;
    ``verify=False`` returns raw LSH candidates (recall-oriented
    pre-filter, no exact Jaccard pass)."""
    assert n_hashes <= len(MH_A)
    b, r = tune_bands(n_hashes, threshold)
    # one cached relation: signatures + sizes + shingle sets (see
    # _minhash_docsets / _jaccard_for_pairs — the r7 array-verify form);
    # the doc-side repartition lets the shingle distinct AND the per-doc
    # aggregation reuse one doc_id partitioning, so the exploded shingle
    # index never crosses an exchange (guide §8)
    sigs_sz = _minhash_docsets(
        _shingled(docs.select("doc_id", "text").repartition("doc_id")),
        n_hashes=n_hashes,
    ).cache()
    bands = sigs_sz.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{j * r + i}").cast("string")
                                for i in range(r)
                            ],
                        ).alias("sig"),
                    )
                    for j in range(b)
                ]
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))
    a_, b_ = bands.alias("a"), bands.alias("b")
    cand = (
        a_.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    if not verify:
        return cand
    return _jaccard_for_pairs(cand, sigs_sz).filter(
        F.col("jaccard") >= threshold
    )
