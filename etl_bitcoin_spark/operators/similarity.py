"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k; the query side is broadcast
  and the corpus side is streamed — at 100 TB the corpus never
  shuffles, so the cost is one scan regardless of k or query count.
- ``rhp_signature`` / ``lsh_topk``: random-hyperplane LSH — deterministic
  seeded hyperplanes broadcast as a literal array; candidates = same
  signature bucket (optionally Hamming-adjacent probes); exact rerank
  inside buckets. The 100 TB path: the bucket join replaces the O(n*q)
  scan with per-bucket joins.
- ``ivf_topk``: inverted-file variant — coarse centroids from a seeded
  sample, assignment by argmin distance, search limited to the query's
  nprobe nearest centroids.

All dot products run JVM-side via zip_with/aggregate folds (no Python
in the scoring loop).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOT = (
    "aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
    " 0D, (acc, v) -> acc + v)"
)


def _cos(a: str, b: str):
    return (
        F.expr(DOT.format(a=a, b=b))
        / (
            F.sqrt(F.expr(DOT.format(a=a, b=a)))
            * F.sqrt(F.expr(DOT.format(a=b, b=b)))
        )
    )


def _norm(vec_col: str):
    """sqrt(v.v) — attached per ROW before a join so each side's norm
    is computed once, not once per candidate pair (r7, guide §1.2).
    cos = dot/(na*nb) is bit-identical to the fused _cos form: the
    same fold over the same values, merely factored out."""
    return F.sqrt(F.expr(DOT.format(a=vec_col, b=vec_col)))


def _cos_pre(a: str, b: str, na: str, nb: str):
    return F.expr(DOT.format(a=a, b=b)) / (F.col(na) * F.col(nb))


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast queries x streamed corpus."""
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
        _norm(vec_col).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
        _norm(vec_col).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("qid") != F.col("cid"))
        .withColumn("cos", _cos_pre("qv", "cv", "qn", "cn"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim)).round(6).tolist()


def rhp_signature(
    df: DataFrame, dim: int, n_bits: int = 8, seed: int = 42,
    vec_col: str = "embedding", out_col: str = "sig",
    margins_col: str | None = None,
) -> DataFrame:
    """Random-hyperplane signature: bit j = sign(v . h_j). Hyperplanes
    are a deterministic literal array -> pure JVM evaluation.

    ``margins_col`` additionally keeps the raw per-hyperplane dots
    ``m[j] = v . h_j`` (the QUERY-DIRECTED multi-probe signal: |m[j]|
    is the distance to hyperplane j's boundary, so the buckets most
    likely to hide a near-neighbor are the ones reached by flipping
    the smallest-|margin| bits — Lv et al., VLDB'07)."""
    planes = _hyperplanes(dim, n_bits, seed)
    planes_lit = F.array(
        *[F.array(*[F.lit(x) for x in p]) for p in planes]
    )
    df = df.withColumn("__planes", planes_lit)
    margins = F.expr(
        f"transform(__planes, p -> {DOT.format(a=vec_col, b='p')})"
    )
    df = df.withColumn("__m", margins)
    sig = F.expr(
        """
        aggregate(
          zip_with(
            transform(__m, x -> CASE WHEN x > 0D THEN 1L ELSE 0L END),
            sequence(0, size(__m) - 1),
            (bit, i) -> shiftleft(bit, cast(i as int))),
          0L, (acc, v) -> acc + v)
        """
    )
    df = df.withColumn(out_col, sig).drop("__planes")
    if margins_col is None:
        return df.drop("__m")
    if margins_col == "__m":
        return df
    return df.withColumnRenamed("__m", margins_col)


def lsh_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 10,
    n_bits: int = 8, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_to: int | None = None,
    probes: int = 0,
    probe_budget: int | None = None,
) -> DataFrame:
    """ANN: candidates share the RHP signature bucket; exact cosine
    rerank within the bucket. Recall rises with fewer bits / more
    probes; this is the partition-local scale path. ``round_to`` rounds
    the cosine BEFORE ranking (cross-engine-stable tie behavior for the
    oracle gate).

    ``probes`` is the blind MULTI-PROBE Hamming radius: each query also
    probes every signature within ``probes`` bit flips of its own
    (probes=1 -> the exact bucket plus n_bits 1-flip neighbors). A
    near-neighbor that disagrees with the query on a few hyperplane
    signs — the dominant recall loss at practical bit widths — is
    recovered without touching the CORPUS side: only the bounded query
    frame fans out (x sum_{r<=probes} C(n_bits, r) rows), the joins
    stay per-bucket, and the corpus is still scanned exactly once. A
    (qid, cid) pair can match at most one probed bucket (the corpus
    signature is fixed and the probe set is distinct), so no dedup
    pass is needed.

    ``probe_budget=T`` is QUERY-DIRECTED multi-probe (standard
    multi-probe LSH, Lv et al. VLDB'07): instead of flipping blindly,
    each query probes the T buckets most likely to hold its
    near-neighbors — candidate flips are every 1- and 2-bit subset
    ranked by the summed |margin| of the flipped hyperplanes (a small
    |v.h_j| means the neighbor plausibly sits on the other side of
    h_j), exact bucket first. Radius-2 recall at a radius-1 probe
    count; the ranking is pure JVM array algebra on the bounded query
    frame (sort of n_bits + C(n_bits,2) structs per query). Exclusive
    with ``probes``."""
    from itertools import combinations

    from pyspark.sql import Window

    if not 0 <= probes <= n_bits:
        raise ValueError(f"probes must be in [0, {n_bits}]")
    if probe_budget is not None and probes > 0:
        raise ValueError("pass probes OR probe_budget, not both")
    max_budget = 1 + n_bits + n_bits * (n_bits - 1) // 2
    if probe_budget is not None and not 1 <= probe_budget <= max_budget:
        raise ValueError(f"probe_budget must be in [1, {max_budget}]")
    c = rhp_signature(
        corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
            _norm(vec_col).alias("cn"),
        ),
        dim, n_bits, seed, "cv",
    )
    q = rhp_signature(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
            _norm(vec_col).alias("qn"),
        ),
        dim, n_bits, seed, "qv",
        margins_col="__m" if probe_budget is not None else None,
    )
    if probe_budget is not None:
        # rank candidate flips (singles + pairs) by summed |margin|,
        # keep the T-1 cheapest after the exact bucket (mask 0). The
        # probe masks are distinct per query, so a (qid, cid) pair
        # still matches at most one probed bucket — no dedup needed.
        nb = n_bits
        flips = F.expr(
            f"""
            slice(array_sort(concat(
              transform(sequence(0, {nb} - 1), j ->
                struct(abs(__m[j]) as cost,
                       shiftleft(1L, j) as mask)),
              flatten(transform(sequence(0, {nb} - 2), j ->
                transform(sequence(j + 1, {nb} - 1), k ->
                  struct(abs(__m[j]) + abs(__m[k]) as cost,
                         shiftleft(1L, j) + shiftleft(1L, k) as mask))))
            )), 1, {probe_budget - 1})
            """
        )
        q = (
            q.withColumn("__flips", flips)
            .withColumn(
                "sig",
                F.explode(F.expr(
                    "concat(array(sig),"
                    " transform(__flips, s -> sig ^ s.mask))"
                )),
            )
            .drop("__m", "__flips")
        )
    elif probes > 0:
        masks = [0] + [
            sum(1 << j for j in comb)
            for r in range(1, probes + 1)
            for comb in combinations(range(n_bits), r)
        ]
        q = q.withColumn(
            "sig",
            F.explode(F.array(*[
                F.expr(f"sig ^ {m}L") for m in masks
            ])),
        )
    cand = c.join(F.broadcast(q), "sig").filter(F.col("qid") != F.col("cid"))
    scored = cand.withColumn("cos", _cos_pre("qv", "cv", "qn", "cn"))
    if round_to is not None:
        scored = scored.withColumn("cos", F.round("cos", round_to))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    )


def ivf_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_centroids: int = 16, nprobe: int = 2, seed: int = 42,
    id_col: str = "vec_id", vec_col: str = "embedding",
    round_to: int | None = None,
) -> DataFrame:
    """IVF ANN: coarse centroids = a deterministic sample of the corpus
    (k-means|| seeding without the iterations — adequate as a coarse
    quantizer); cells searched = the query's nprobe nearest centroids.
    Centroid sampling uses the portable md5-based h48 (not Spark's
    murmur hash) so a DuckDB oracle reproduces the exact same sample."""
    from pyspark.sql import Window

    cents = (
        corpus.select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent"))
        .orderBy(
            F.expr(
                f"cast(conv(substr(md5(cast(cent_id + {seed} as string)),1,12),"
                "16,10) as bigint) % 997"
            ),
            "cent_id",
        )
        .limit(n_centroids)
    )

    cents = cents.withColumn("cent_n", _norm("cent"))

    def assign(df, idc, vc, nc, keep_n):
        # both norms precomputed: the row's once per ROW (not per
        # centroid), the centroid's once per centroid (r7)
        scored = df.crossJoin(F.broadcast(cents)).withColumn(
            "cent_cos", _cos_pre(vc, "cent", nc, "cent_n")
        )
        w = Window.partitionBy(idc).orderBy(
            F.col("cent_cos").desc(), F.col("cent_id")
        )
        return (
            scored.withColumn("crk", F.row_number().over(w))
            .filter(F.col("crk") <= keep_n)
            .drop("cent", "cent_n", "cent_cos", "crk")
        )

    c = assign(
        corpus.select(
            F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"),
            _norm(vec_col).alias("cn"),
        ),
        "cid", "cv", "cn", 1,
    )
    q = assign(
        queries.select(
            F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"),
            _norm(vec_col).alias("qn"),
        ),
        "qid", "qv", "qn", nprobe,
    )
    cand = c.join(F.broadcast(q), "cent_id").filter(F.col("qid") != F.col("cid"))
    scored = cand.withColumn("cos", _cos_pre("qv", "cv", "qn", "cn"))
    if round_to is not None:
        scored = scored.withColumn("cos", F.round("cos", round_to))
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("qid", "cid", "cos", "rk")
    )
