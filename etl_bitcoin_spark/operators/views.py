"""Declarative incrementally-maintained views over the transcripts lake.

ROADMAP #12: the algebra behind ``refresh_conv_summaries`` —
changed-keys-only refresh via the change feed, delta arithmetic over
preimages for invertible aggregates, min/max-regression fallback, the
metrics-riding relay cursor, phantom-free restamps — generalized into a
small view DSL. A user declares WHAT the rollup is (grouping key +
aggregates); the engine derives both the full-recompute plan and the
incremental-maintenance plan from that one definition, so the two can
never drift.

Aggregate kinds (``out_type`` is the stored Spark type):

- ``("count", out_type)``           — row count (required: it doubles
                                      as the liveness signal; a group
                                      reaching 0 rows is dropped)
- ``("sum", expr_sql, out_type)``   — sum of a row-level SQL
                                      expression; fully invertible
                                      (pre-images subtract). Declare
                                      TOTAL expressions (coalesce away
                                      nulls): if every contributing row
                                      of a group is later removed, the
                                      algebraic sum lands at 0 where a
                                      full recompute of the surviving
                                      all-null rows would store NULL.
- ``("max", expr_sql, out_type)``   — max of an expression; NOT
                                      invertible: a tick that removes a
                                      row possibly holding the max
                                      falls back to recomputing just
                                      that group from upstream
- ``("min", expr_sql, out_type)``   — min; max's mirror (the
                                      regression fallback triggers on
                                      the removal side symmetrically)
- ``("avg", expr_sql, out_type)``   — SQL avg (null rows excluded);
                                      maintained invertibly through two
                                      HIDDEN stored companions
                                      (``__<name>_sum`` double,
                                      ``__<name>_cnt`` long) and
                                      recomputed as sum/cnt each tick —
                                      never ambiguous, never falls back
- ``("approx_distinct", expr_sql, out_type)`` — approximate distinct
                                      count via an engine-built DENSE
                                      HLL sketch (1024 registers stored
                                      as a ``map<int,int>`` hidden
                                      companion). Unlike library
                                      sketches the union is elementwise
                                      register max — EXACT, associative
                                      and representation-stable — so
                                      maintained state equals a full
                                      recompute bit-for-bit (the "one
                                      definition, cannot drift"
                                      invariant survives approximation:
                                      the ESTIMATE is approximate, the
                                      SKETCH algebra is exact). Inserts
                                      union; any removal of a non-null
                                      value falls back to recomputing
                                      that group (registers only grow).
                                      COST NOTE: a delete-heavy tick on
                                      a high-cardinality sketch view
                                      therefore degenerates toward full
                                      recompute of the changed groups —
                                      bounded by the
                                      FALLBACK_RECOMPUTE_FRACTION
                                      switch, which collapses such a
                                      tick to ONE recompute plan
                                      instead of algebraic + fallback

Key-changing updates are handled for free: the preimage row decrements
its OLD group, the postimage increments the NEW one — grouping the feed
rows by their own key values IS the correct algebra (relevant when the
view key is a mutable column like ``role``, not part of the upstream
primary key).

SCALE: maintenance is fully distributed — the per-tick combine is a
key-partitioned join of the delta aggregate against the current group
state, with count/sum combines as column expressions and the min/max
regression test as a ``when()`` split into a fallback frame. Nothing
per-group ever lands on the driver (the only collects are the affected
bucket-id list, bounded by ``n_buckets``, and two scalar counts), so a
tick touching millions of groups runs at cluster width. Changed-key
semi-joins broadcast only below ``BROADCAST_KEYS_MAX`` changed groups;
above it they become ordinary shuffle joins.

Exactly-once, cursor, and restamp semantics are identical to
``operators.incremental`` (same batch-id span, same metrics-riding
cursor walk, kept rows keep their original __lsn). Retention contract:
upstream expiry must cover the relay lag (re-bootstrap on cursor loss).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..tableformat.lake import (
    BUCKET_COL,
    DELETED_COL,
    LSN_COL,
    LakeTable,
    ddl_col_names,
)

# Changed-key sets at or below this many groups ride broadcast
# semi/anti joins; larger ticks (backfills, bulk corrections) use
# shuffle joins so the driver never materializes the key set.
BROADCAST_KEYS_MAX = 100_000

# Algebraic-tick degeneration guard: when the min/max/approx_distinct
# regression fallback would recompute MORE than this fraction of the
# tick's changed groups, the whole tick switches to the recompute plan
# instead — one upstream-semi-join plan beats the algebraic plan PLUS a
# near-total fallback recompute (two plans over ~the same groups). A
# delete-heavy workload on an extrema/sketch view hits this every tick;
# the switch keeps its cost at recompute parity instead of ~2x.
FALLBACK_RECOMPUTE_FRACTION = 0.5

_INVERTIBLE = ("count", "sum")
_EXTREMA = ("max", "min")

# Dense-HLL geometry for ("approx_distinct", ...): 2^10 registers.
# xxhash64(value) splits into a 10-bit register index and a 54-bit
# suffix whose MSB position gives the register rank (computed EXACTLY
# via length(bin(w)) — integer string ops, no float log). Standard
# error ~1.04/sqrt(1024) = 3.2%; linear counting keeps small
# cardinalities near-exact.
_HLL_P = 10
_HLL_M = 1 << _HLL_P
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


@dataclass(frozen=True)
class ViewSpec:
    """Declarative rollup: ``key_ddl`` names the grouping columns with
    their types (``"conv_id string"``, ``"role string"``); ``aggs`` maps
    output column -> (kind, expr_sql, out_type)."""

    name: str
    key_ddl: str
    aggs: dict[str, tuple] = field(hash=False)
    # True iff the view key is a subset of the upstream PRIMARY key
    # (immutable per row): lets mode="recompute" read the cheap plain
    # change feed — mutable keys need preimages to find the OLD group.
    key_is_upstream_key: bool = False

    @property
    def key(self) -> list[str]:
        return ddl_col_names(self.key_ddl)

    @property
    def storage_aggs(self) -> dict[str, tuple]:
        """Declared aggs with each avg expanded to its hidden
        invertible (sum, non-null count) pair and each approx_distinct
        to its hidden HLL register map — every kind here is
        count/sum/max/min/hll, the vocabulary the delta algebra
        speaks."""
        out: dict[str, tuple] = {}
        for name, s in self.aggs.items():
            if s[0] == "avg":
                out[f"__{name}_sum"] = ("sum", s[1], "double")
                out[f"__{name}_cnt"] = (
                    "sum", f"CAST(({s[1]}) IS NOT NULL AS INT)", "long",
                )
            elif s[0] == "approx_distinct":
                out[f"__{name}_hll"] = ("hll", s[1], "map<int,int>")
            else:
                out[name] = s
        return out

    @property
    def derived(self) -> dict[str, tuple]:
        """Output column -> recompute recipe for columns derived from
        hidden companions each tick: ("avg", sum_col, cnt_col, type) or
        ("hll", sketch_col, type)."""
        out: dict[str, tuple] = {}
        for n, s in self.aggs.items():
            if s[0] == "avg":
                out[n] = ("avg", f"__{n}_sum", f"__{n}_cnt", s[-1])
            elif s[0] == "approx_distinct":
                out[n] = ("hll", f"__{n}_hll", s[-1])
        return out

    @property
    def hll_aggs(self) -> dict[str, tuple]:
        """Hidden sketch column -> ("hll", expr_sql, type)."""
        return {
            n: s for n, s in self.storage_aggs.items() if s[0] == "hll"
        }

    @property
    def hidden_cols(self) -> list[str]:
        return [c for c in self.storage_aggs if c.startswith("__")]

    @property
    def out_cols(self) -> list[str]:
        """Stored column order: keys, declared aggs, hidden companions."""
        return self.key + list(self.aggs) + self.hidden_cols

    @property
    def ddl(self) -> str:
        cols = [self.key_ddl]
        for name, spec in self.aggs.items():
            cols.append(f"{name} {spec[-1]}")
        for name, spec in self.storage_aggs.items():
            if name.startswith("__"):
                cols.append(f"{name} {spec[-1]}")
        return ", ".join(cols)

    def validate(self) -> None:
        kinds = [s[0] for s in self.aggs.values()]
        if kinds.count("count") != 1:
            raise ValueError(
                f"view {self.name}: exactly one ('count', type) aggregate"
                " is required (it is the group-liveness signal)"
            )
        for name, s in self.aggs.items():
            if name.startswith("__"):
                raise ValueError(
                    f"view {self.name}: {name}: the __ prefix is reserved"
                    " for engine companion columns"
                )
            if s[0] not in (
                "count", "sum", "max", "min", "avg", "approx_distinct",
            ):
                raise ValueError(f"view {self.name}: unknown agg {s[0]!r}")
            want = 2 if s[0] == "count" else 3
            if len(s) != want:
                raise ValueError(
                    f"view {self.name}: {name} must be "
                    f"({'kind, out_type' if want == 2 else 'kind, expr_sql, out_type'})"
                )
        for col in ddl_col_names(self.key_ddl):
            if not col or any(ch in col for ch in "<>(),"):
                raise ValueError(
                    f"view {self.name}: malformed key_ddl column {col!r}"
                )

    @property
    def count_col(self) -> str:
        return next(n for n, s in self.aggs.items() if s[0] == "count")


def create_view_table(
    spark, root: str, spec: ViewSpec, n_buckets: int = 16
) -> LakeTable:
    spec.validate()
    return LakeTable.create(spark, root, spec.ddl, spec.key, n_buckets)


def _hll_bucket_rho(expr_sql: str) -> tuple:
    """(register index, rank) of one value under the dense-HLL hash
    split. rank = 1 + leading-zero count of the 54-bit suffix, computed
    exactly as 55 - length(bin(w)) — bin() is the integer MSB position,
    no floating-point log involved."""
    h = F.xxhash64(F.expr(expr_sql))
    bucket = h.bitwiseAND(F.lit(_HLL_M - 1)).cast("int")
    w = F.shiftrightunsigned(h, _HLL_P)
    rho = (
        F.when(w == 0, F.lit(64 - _HLL_P + 1))
        .otherwise(F.lit(64 - _HLL_P + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return bucket, rho


def _hll_sketch_agg(
    rows: DataFrame, key: list[str], expr_sql: str, out_name: str
) -> DataFrame:
    """Per-group dense-HLL register map: two-level aggregation —
    (key, register) max rank, then registers collected into a map
    (bounded at 1024 entries per group, so collect_list is safe at any
    group size). Null values are excluded (SQL distinct semantics)."""
    bucket, rho = _hll_bucket_rho(expr_sql)
    per = (
        rows.filter(F.expr(expr_sql).isNotNull())
        .select(*key, bucket.alias("__hb"), rho.alias("__hr"))
        .groupBy(*key, "__hb")
        .agg(F.max("__hr").alias("__hr"))
    )
    return per.groupBy(*key).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__hb"), F.col("__hr")))
        ).alias(out_name)
    )


def _hll_union(a, b):
    """Elementwise register max — the EXACT, associative sketch union
    (missing registers count as 0)."""
    return F.map_zip_with(
        a, b,
        lambda _, v1, v2: F.greatest(
            F.coalesce(v1, F.lit(0)), F.coalesce(v2, F.lit(0))
        ),
    )


def _hll_estimate(mcol, out_type: str):
    """Standard HLL estimator over the register map with linear
    counting for the small range; a NULL map (no non-null values ever)
    estimates 0, matching approx_count_distinct."""
    m = float(_HLL_M)
    sum_pow = F.aggregate(
        F.map_values(mcol), F.lit(0.0),
        lambda acc, v: acc + F.pow(F.lit(2.0), -v),
    ) + (F.lit(m) - F.size(mcol))  # absent registers contribute 2^0
    raw = F.lit(_HLL_ALPHA * m * m) / sum_pow
    v_zeros = F.lit(m) - F.size(mcol)  # stored ranks are always >= 1
    lin = F.lit(m) * F.log(F.lit(m) / v_zeros)
    est = F.when((raw <= F.lit(2.5 * m)) & (v_zeros > 0), lin).otherwise(raw)
    return (
        F.when(mcol.isNull(), F.lit(0))
        .otherwise(F.round(est, 0))
        .cast(out_type)
    )


def _add_derived(spec: ViewSpec, df: DataFrame) -> DataFrame:
    """Recompute the visible derived columns (avg, approx_distinct)
    from their hidden companions."""
    for name, d in spec.derived.items():
        if d[0] == "avg":
            _, sc, cc, t = d
            df = df.withColumn(
                name, (F.col(sc) / F.nullif(F.col(cc), F.lit(0))).cast(t)
            )
        else:
            _, mc, t = d
            df = df.withColumn(name, _hll_estimate(F.col(mc), t))
    return df


def _join_sketches(
    df: DataFrame, rows: DataFrame, spec: ViewSpec, key: list[str]
) -> DataFrame:
    """LEFT-join each hidden HLL register map (its own two-level agg
    over ``rows``) onto the base aggregate frame, null-safe on the view
    key (NULL-keyed groups are legitimate)."""
    from functools import reduce as _reduce

    for name, s in spec.hll_aggs.items():
        sk = _hll_sketch_agg(rows, key, s[1], name).select(
            *[F.col(k).alias(f"__sk_{k}") for k in key], name
        )
        cond = _reduce(
            lambda a, b: a & b,
            [df[k].eqNullSafe(sk[f"__sk_{k}"]) for k in key],
        )
        df = df.join(sk, cond, "left").drop(
            *[f"__sk_{k}" for k in key]
        )
    return df


def full_compute(spec: ViewSpec, rows: DataFrame) -> DataFrame:
    """The rollup itself, from live upstream rows — the ONE definition
    both the bootstrap/recompute path and the oracle of truth use."""
    aggs = []
    for name, s in spec.storage_aggs.items():
        kind, out_type = s[0], s[-1]
        if kind == "count":
            col = F.count("*").cast(out_type)
        elif kind == "sum":
            col = F.sum(F.expr(s[1])).cast(out_type)
        elif kind == "max":
            # cast INSIDE the extremum so stored values and the
            # algebraic path's add/remove candidates compare in the
            # same domain
            col = F.max(F.expr(s[1]).cast(out_type))
        elif kind == "min":
            col = F.min(F.expr(s[1]).cast(out_type))
        else:
            continue  # hll: joined below (two-level agg of its own)
        aggs.append(col.alias(name))
    df = rows.groupBy(*spec.key).agg(*aggs)
    if spec.hll_aggs:
        df = _join_sketches(df, rows, spec, spec.key)
    df = _add_derived(spec, df)
    return df.select(*spec.out_cols)


def _key_join(
    left: DataFrame,
    keys_df: DataFrame,
    key: list[str],
    how: str,
    small: bool = True,
) -> DataFrame:
    """Null-safe anti/semi join on the view key: a NULL-keyed group is
    a legitimate group (the key can be any nullable column), and plain
    name joins would never match NULL = NULL. ``small`` broadcasts the
    key side; large changed-key sets shuffle instead."""
    r = keys_df.select(*[F.col(k).alias(f"__k_{k}") for k in key])
    if small:
        r = F.broadcast(r)
    cond = reduce(
        lambda a, b: a & b,
        [left[k].eqNullSafe(r[f"__k_{k}"]) for k in key],
    )
    return left.join(r, cond, how)


def _combined_cols(
    spec: ViewSpec,
) -> tuple[list[Column], Column]:
    """Column expressions combining current group state (storage-agg
    column names, NULL for brand-new groups) with the tick's delta
    aggregate (``d_`` sums, ``a_``/``r_`` extremum candidates); plus
    the row-level ambiguity predicate that routes a possible min/max
    regression to the per-group recompute fallback."""
    out: list[Column] = []
    ambig: Column = F.lit(False)
    for name, s in spec.storage_aggs.items():
        kind, out_type = s[0], s[-1]
        old_c = F.col(name)
        if kind == "count":
            expr = (
                F.coalesce(old_c.cast("long"), F.lit(0))
                + F.coalesce(F.col(f"d_{name}").cast("long"), F.lit(0))
            ).cast(out_type)
        elif kind == "sum":
            d_c = F.col(f"d_{name}")
            # SQL sum null semantics: null means "no non-null rows
            # contributed"; a null delta leaves the value alone, a
            # null old value starts from the delta
            expr = (
                F.when(
                    old_c.isNull() & d_c.isNull(),
                    F.lit(None),
                )
                .otherwise(
                    F.coalesce(old_c, F.lit(0)) + F.coalesce(d_c, F.lit(0))
                )
                .cast(out_type)
            )
        elif kind == "hll":
            # registers only grow on insert: union is exact; ANY
            # removal of a non-null value may shrink the true distinct
            # set, which a grow-only sketch cannot express -> fallback
            a_c, r_c = F.col(f"a_{name}"), F.col(f"r_{name}")
            expr = (
                F.when(a_c.isNull(), old_c)
                .when(old_c.isNull(), a_c)
                .otherwise(_hll_union(old_c, a_c))
            )
            ambig = ambig | r_c.isNotNull()
        else:
            a_c, r_c = F.col(f"a_{name}"), F.col(f"r_{name}")
            if kind == "max":
                take_add = old_c.isNull() | (
                    a_c.isNotNull() & (a_c >= old_c)
                )
                keep_cur = r_c.isNull() | (r_c < old_c)
            else:
                take_add = old_c.isNull() | (
                    a_c.isNotNull() & (a_c <= old_c)
                )
                keep_cur = r_c.isNull() | (r_c > old_c)
            expr = F.when(take_add, a_c).when(keep_cur, old_c)
            ambig = ambig | (~take_add & ~keep_cur)
        out.append(expr.alias(name))
    return out, ambig


def refresh_view(
    upstream: LakeTable,
    downstream: LakeTable,
    spec: ViewSpec,
    upto_version: int | None = None,
    mode: str = "algebraic",
) -> dict[str, Any]:
    """One relay tick for a declared view. ``mode="algebraic"`` (the
    default here: declared views are built for the sublinear path)
    maintains count/sum/avg by delta arithmetic over the preimage feed
    and falls back to per-group recompute only where a min/max may
    regress; ``mode="recompute"`` rebuilds every changed group from
    upstream. Both modes run as distributed joins end-to-end."""
    from .incremental import _relay_cursor

    spec.validate()
    if mode not in ("recompute", "algebraic"):
        raise ValueError(f"unknown refresh mode {mode!r}")
    up_v = upto_version or upstream.snapshot()["version"]
    last_v = _relay_cursor(downstream)
    if up_v <= last_v:
        return {"applied": False, "reason": "up to date", "cursor": last_v}
    snap_d = downstream.snapshot()
    n_buckets = snap_d["n_buckets"]
    bucket_of = downstream.bucket_expr(n_buckets, spec.key)
    key = spec.key

    stamp = (
        lambda df: df.withColumn(LSN_COL, F.lit(up_v).cast("long"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, bucket_of)
    )
    n_fallback = 0
    to_unpersist: list[DataFrame] = []
    if last_v == 0:
        affected = list(range(n_buckets))
        content = stamp(
            full_compute(
                spec, upstream.read(version=up_v, user_cols=True)
            )
        )
    elif mode == "recompute":
        # recompute only needs the changed KEY SET. Immutable keys
        # (subset of the upstream primary key) come off the cheap
        # plain feed; mutable keys need preimages so the OLD group
        # of a key-changing update is refreshed too.
        feed = upstream.read_changes(
            last_v, up_v,
            include_preimages=not spec.key_is_upstream_key,
        )
        keys = (
            feed.select(*key).distinct().withColumn("__b", bucket_of)
            .persist()
        )
        to_unpersist.append(keys)
        small = keys.count() <= BROADCAST_KEYS_MAX
        affected = sorted(
            int(r["__b"]) for r in keys.select("__b").distinct().collect()
        )
        kdf = keys.drop("__b")
        kept = _key_join(
            downstream.read(version=snap_d["version"], buckets=affected),
            kdf, key, "left_anti", small=small,
        )
        live = upstream.read(version=up_v, user_cols=True)
        summaries = full_compute(
            spec, _key_join(live, kdf, key, "left_semi", small=small)
        )
        content = kept.unionByName(stamp(summaries))
    else:
        pre = F.col("_change_type").isin("update_preimage", "delete")
        post = F.col("_change_type").isin("update_postimage", "insert")
        sgn = F.when(post, 1).otherwise(-1)
        delta_aggs = []
        for name, s in spec.storage_aggs.items():
            kind, out_type = s[0], s[-1]
            if kind == "count":
                delta_aggs.append(
                    F.sum(sgn).cast(out_type).alias(f"d_{name}")
                )
            elif kind == "sum":
                delta_aggs.append(
                    F.sum(sgn * F.expr(s[1])).cast(out_type)
                    .alias(f"d_{name}")
                )
            elif kind == "hll":
                # only the removal flag rides the main delta agg; the
                # addition sketch needs its own two-level agg (below)
                delta_aggs.append(
                    F.max(
                        F.when(pre & F.expr(s[1]).isNotNull(), F.lit(1))
                    ).alias(f"r_{name}")
                )
            else:
                cast = F.expr(s[1]).cast(out_type)
                ext = F.max if kind == "max" else F.min
                delta_aggs.append(
                    ext(F.when(post, cast)).alias(f"a_{name}")
                )
                delta_aggs.append(
                    ext(F.when(pre, cast)).alias(f"r_{name}")
                )
        feed = upstream.read_changes(last_v, up_v, include_preimages=True)
        delta = feed.groupBy(*key).agg(*delta_aggs)
        for name, s in spec.hll_aggs.items():
            sk = _hll_sketch_agg(
                feed.filter(post), key, s[1], f"a_{name}"
            ).select(
                *[F.col(k).alias(f"__sk_{k}") for k in key], f"a_{name}"
            )
            cond = reduce(
                lambda a, b: a & b,
                [delta[k].eqNullSafe(sk[f"__sk_{k}"]) for k in key],
            )
            delta = delta.join(sk, cond, "left").drop(
                *[f"__sk_{k}" for k in key]
            )
        delta = delta.withColumn("__b", bucket_of).persist()
        to_unpersist.append(delta)
        n_changed = delta.count()
        small = n_changed <= BROADCAST_KEYS_MAX
        affected = sorted(
            int(r["__b"]) for r in delta.select("__b").distinct().collect()
        )
        kdf = delta.select(*key)
        kept = _key_join(
            downstream.read(version=snap_d["version"], buckets=affected),
            kdf, key, "left_anti", small=small,
        )
        # Combine = delta LEFT OUTER current changed-group state on the
        # view key (key-partitioned shuffle join; the state side is
        # semi-joined down to changed groups first so neither side
        # carries untouched groups). All arithmetic is column
        # expressions — no group row ever reaches the driver.
        cur = _key_join(
            downstream.read(
                version=snap_d["version"], buckets=affected,
                user_cols=True,
            ),
            kdf, key, "left_semi", small=small,
        )
        d2 = delta.drop("__b").select(
            *[F.col(k).alias(f"__k_{k}") for k in key],
            *[c for c in delta.columns if c not in key and c != "__b"],
        )
        cond = reduce(
            lambda a, b: a & b,
            [d2[f"__k_{k}"].eqNullSafe(cur[k]) for k in key],
        )
        combined_cols, ambig = _combined_cols(spec)
        cnt = spec.count_col
        j = (
            d2.join(cur, cond, "left_outer")
            .select(
                *[F.col(f"__k_{k}").alias(k) for k in key],
                *combined_cols,
                ambig.alias("__ambig"),
            )
            .filter(F.col(cnt) > 0)  # group fully gone -> drop
            .persist()
        )
        to_unpersist.append(j)
        clean = _add_derived(
            spec, j.filter(~F.col("__ambig")).drop("__ambig")
        )
        summaries = clean.select(*spec.out_cols)
        fb_keys = j.filter(F.col("__ambig")).select(*key)
        n_fallback = fb_keys.count()
        if (
            n_fallback
            and n_fallback >= FALLBACK_RECOMPUTE_FRACTION * n_changed
        ):
            # Delete-heavy degeneration: most changed groups need the
            # recompute fallback anyway, so running the algebraic plan
            # AND a near-total fallback union costs ~2 plans over the
            # same groups. Collapse the tick to the ONE recompute plan
            # over ALL changed groups (exactly mode="recompute"'s
            # combine; state identity is unchanged — full_compute is
            # the single definition both paths share).
            live = upstream.read(version=up_v, user_cols=True)
            summaries = full_compute(
                spec, _key_join(live, kdf, key, "left_semi", small=small)
            )
            mode = "algebraic->recompute"
        elif n_fallback:
            live = upstream.read(version=up_v, user_cols=True)
            summaries = summaries.unionByName(
                full_compute(
                    spec,
                    _key_join(
                        live, fb_keys, key, "left_semi",
                        small=n_fallback <= BROADCAST_KEYS_MAX,
                    ),
                )
            )
        content = kept.unionByName(stamp(summaries))

    try:
        ok = downstream.commit(
            content.repartition(max(1, len(affected)), F.col(BUCKET_COL)),
            affected,
            batch_id=f"relay-{last_v}-{up_v}",
            metrics={"relay_upstream_version": up_v,
                     "relay_from_version": last_v,
                     "relay_mode": mode,
                     "view": spec.name},
            base_version=snap_d["version"],
        )
    finally:
        # always release the tick's cached frames: a CommitConflict
        # here is RETRIED by the tailer (fresh snapshot, fresh persists)
        # and would otherwise leak this attempt's partitions for the
        # session lifetime
        for df in to_unpersist:
            df.unpersist()
    return {
        "applied": ok,
        "cursor": up_v,
        "from": last_v,
        "buckets": len(affected),
        "fallback_groups": n_fallback,
        # effective plan this tick: "algebraic", "recompute", or
        # "algebraic->recompute" (the delete-heavy single-plan switch)
        "mode": mode,
    }
