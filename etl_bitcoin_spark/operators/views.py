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

_INVERTIBLE = ("count", "sum")
_EXTREMA = ("max", "min")


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
        invertible (sum, non-null count) pair — every kind here is
        count/sum/max/min, the vocabulary the delta algebra speaks."""
        out: dict[str, tuple] = {}
        for name, s in self.aggs.items():
            if s[0] == "avg":
                out[f"__{name}_sum"] = ("sum", s[1], "double")
                out[f"__{name}_cnt"] = (
                    "sum", f"CAST(({s[1]}) IS NOT NULL AS INT)", "long",
                )
            else:
                out[name] = s
        return out

    @property
    def derived(self) -> dict[str, tuple[str, str, str]]:
        """avg output column -> (hidden sum col, hidden cnt col,
        out_type); recomputed from the combined hiddens each tick."""
        return {
            n: (f"__{n}_sum", f"__{n}_cnt", s[-1])
            for n, s in self.aggs.items()
            if s[0] == "avg"
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
            if s[0] not in ("count", "sum", "max", "min", "avg"):
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
        else:
            col = F.min(F.expr(s[1]).cast(out_type))
        aggs.append(col.alias(name))
    df = rows.groupBy(*spec.key).agg(*aggs)
    for name, (sc, cc, t) in spec.derived.items():
        df = df.withColumn(
            name, (F.col(sc) / F.nullif(F.col(cc), F.lit(0))).cast(t)
        )
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
            else:
                cast = F.expr(s[1]).cast(out_type)
                ext = F.max if kind == "max" else F.min
                delta_aggs.append(
                    ext(F.when(post, cast)).alias(f"a_{name}")
                )
                delta_aggs.append(
                    ext(F.when(pre, cast)).alias(f"r_{name}")
                )
        delta = (
            upstream.read_changes(last_v, up_v, include_preimages=True)
            .groupBy(*key)
            .agg(*delta_aggs)
            .withColumn("__b", bucket_of)
            .persist()
        )
        to_unpersist.append(delta)
        small = delta.count() <= BROADCAST_KEYS_MAX
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
        clean = j.filter(~F.col("__ambig")).drop("__ambig")
        for name, (sc, cc, t) in spec.derived.items():
            clean = clean.withColumn(
                name, (F.col(sc) / F.nullif(F.col(cc), F.lit(0))).cast(t)
            )
        summaries = clean.select(*spec.out_cols)
        fb_keys = j.filter(F.col("__ambig")).select(*key)
        n_fallback = fb_keys.count()
        if n_fallback:
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
    for df in to_unpersist:
        df.unpersist()
    return {
        "applied": ok,
        "cursor": up_v,
        "from": last_v,
        "buckets": len(affected),
        "fallback_groups": n_fallback,
    }
