"""Declarative incrementally-maintained views over the transcripts lake.

ROADMAP #12: the algebra behind ``refresh_conv_summaries`` —
changed-keys-only refresh via the change feed, delta arithmetic over
preimages for invertible aggregates, max-regression fallback, the
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

Key-changing updates are handled for free: the preimage row decrements
its OLD group, the postimage increments the NEW one — grouping the feed
rows by their own key values IS the correct algebra (relevant when the
view key is a mutable column like ``role``, not part of the upstream
primary key).

Exactly-once, cursor, and restamp semantics are identical to
``operators.incremental`` (same batch-id span, same metrics-riding
cursor walk, kept rows keep their original __lsn). Retention contract:
upstream expiry must cover the relay lag (re-bootstrap on cursor loss).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..tableformat.lake import BUCKET_COL, DELETED_COL, LSN_COL, LakeTable


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
        return [f.strip().split(" ")[0] for f in self.key_ddl.split(",")]

    @property
    def ddl(self) -> str:
        cols = [self.key_ddl]
        for name, spec in self.aggs.items():
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
            if s[0] not in ("count", "sum", "max"):
                raise ValueError(f"view {self.name}: unknown agg {s[0]!r}")
            want = 2 if s[0] == "count" else 3
            if len(s) != want:
                raise ValueError(
                    f"view {self.name}: {name} must be "
                    f"({'kind, out_type' if want == 2 else 'kind, expr_sql, out_type'})"
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
    for name, s in spec.aggs.items():
        kind, out_type = s[0], s[-1]
        if kind == "count":
            col = F.count("*").cast(out_type)
        elif kind == "sum":
            col = F.sum(F.expr(s[1])).cast(out_type)
        else:
            # cast INSIDE the max so stored values and the algebraic
            # path's amax/rmax candidates compare in the same domain
            col = F.max(F.expr(s[1]).cast(out_type))
        aggs.append(col.alias(name))
    return rows.groupBy(*spec.key).agg(*aggs)


def _key_join(left: DataFrame, keys_df, key: list[str], how: str):
    """Null-safe anti/semi join on the view key: a NULL-keyed group is
    a legitimate group (the key can be any nullable column), and plain
    name joins would never match NULL = NULL."""
    from functools import reduce

    r = keys_df.select(*[F.col(k).alias(f"__k_{k}") for k in key])
    cond = reduce(
        lambda a, b: a & b,
        [left[k].eqNullSafe(r[f"__k_{k}"]) for k in key],
    )
    return left.join(F.broadcast(r), cond, how)


def refresh_view(
    upstream: LakeTable,
    downstream: LakeTable,
    spec: ViewSpec,
    upto_version: int | None = None,
    mode: str = "algebraic",
) -> dict[str, Any]:
    """One relay tick for a declared view. ``mode="algebraic"`` (the
    default here: declared views are built for the sublinear path)
    maintains count/sum by delta arithmetic over the preimage feed and
    falls back to per-group recompute only where a max may regress;
    ``mode="recompute"`` rebuilds every changed group from upstream."""
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
    spark = upstream.spark
    key = spec.key

    stamp = (
        lambda df: df.withColumn(LSN_COL, F.lit(up_v).cast("long"))
        .withColumn(DELETED_COL, F.lit(False))
        .withColumn(BUCKET_COL, bucket_of)
    )
    n_fallback = 0
    if last_v == 0:
        affected = list(range(n_buckets))
        content = stamp(
            full_compute(
                spec, upstream.read(version=up_v, user_cols=True)
            )
        )
    else:
        if mode == "recompute":
            # recompute only needs the changed KEY SET. Immutable keys
            # (subset of the upstream primary key) come off the cheap
            # plain feed; mutable keys need preimages so the OLD group
            # of a key-changing update is refreshed too.
            feed = upstream.read_changes(
                last_v, up_v,
                include_preimages=not spec.key_is_upstream_key,
            )
            deltas = {
                tuple(r[k] for k in key): r
                for r in feed.select(*key).distinct()
                .withColumn("b", bucket_of)
                .collect()
            }
        else:
            pre = F.col("_change_type").isin("update_preimage", "delete")
            post = F.col("_change_type").isin("update_postimage", "insert")
            sgn = F.when(post, 1).otherwise(-1)
            delta_aggs = []
            for name, s in spec.aggs.items():
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
                    delta_aggs.append(
                        F.max(F.when(post, cast)).alias(f"amax_{name}")
                    )
                    delta_aggs.append(
                        F.max(F.when(pre, cast)).alias(f"rmax_{name}")
                    )
            deltas = {
                tuple(r[k] for k in key): r
                for r in upstream.read_changes(
                    last_v, up_v, include_preimages=True
                )
                .groupBy(*key)
                .agg(*delta_aggs)
                .withColumn("b", bucket_of)
                .collect()
            }
        affected = sorted({int(r["b"]) for r in deltas.values()})
        keys = spark.createDataFrame(list(deltas), spec.key_ddl)
        kept = _key_join(
            downstream.read(version=snap_d["version"], buckets=affected),
            keys, key, "left_anti",
        )

        if mode == "recompute":
            live = upstream.read(version=up_v, user_cols=True)
            summaries = full_compute(
                spec, _key_join(live, keys, key, "left_semi")
            )
        else:
            cur = {
                tuple(getattr(r, k) for k in key): r
                for r in _key_join(
                    downstream.read(
                        version=snap_d["version"], buckets=affected,
                        user_cols=True,
                    ),
                    keys, key, "left_semi",
                ).collect()
            }

            def _combine(old_v, delta):
                # SQL sum null semantics: null means "no non-null rows
                # contributed"; a null delta leaves the value alone, a
                # null old value starts from the delta
                if old_v is None and delta is None:
                    return None
                return (old_v or 0) + (delta or 0)

            rows, fallback = [], []
            cnt = spec.count_col
            for kt, d in deltas.items():
                old = cur.get(kt)
                vals = {}
                n = (getattr(old, cnt) if old else 0) + (
                    d[f"d_{cnt}"] or 0
                )
                if n <= 0:
                    continue  # group fully gone
                ambiguous = False
                for name, s in spec.aggs.items():
                    if s[0] in ("count", "sum"):
                        vals[name] = _combine(
                            getattr(old, name) if old else None,
                            d[f"d_{name}"],
                        )
                        if s[0] == "count" and vals[name] is None:
                            vals[name] = 0
                    else:
                        cur_m = getattr(old, name) if old else None
                        amax = d[f"amax_{name}"]
                        rmax = d[f"rmax_{name}"]
                        if cur_m is None or (
                            amax is not None and amax >= cur_m
                        ):
                            vals[name] = amax
                        elif rmax is None or rmax < cur_m:
                            vals[name] = cur_m
                        else:
                            ambiguous = True
                            break
                if ambiguous:
                    fallback.append(kt)
                    continue
                rows.append(
                    tuple(kt) + tuple(vals[n_] for n_ in spec.aggs)
                )
            summaries = spark.createDataFrame(rows, spec.ddl)
            n_fallback = len(fallback)
            if fallback:
                fb = spark.createDataFrame(fallback, spec.key_ddl)
                live = upstream.read(version=up_v, user_cols=True)
                summaries = summaries.unionByName(
                    full_compute(
                        spec, _key_join(live, fb, key, "left_semi")
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
    return {
        "applied": ok,
        "cursor": up_v,
        "from": last_v,
        "buckets": len(affected),
        "fallback_groups": n_fallback,
    }
