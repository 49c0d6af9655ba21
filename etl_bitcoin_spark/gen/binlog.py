"""Deterministic synthetic transcripts binlog generator + oracle replay.

Seeded numpy generation (no wall-clock nondeterminism), the analog of the
reference's canned block fixtures (loader/testdata/block_*.json) scaled by
a single knob. Produces the adversarial properties FIXTURES.md §2
requires: duplicated lsns (within and across segments), out-of-order
delivery inside a bounded window, conflicting updates with equal ts
(tie-break by lsn), delete-then-reinsert, hot conv_ids, and an additive
schema-evolution point before which the ``tool`` column does not exist.

``oracle_replay`` is the deterministic single-threaded golden (FIXTURES.md
§3): the engine's distributed result must equal it exactly.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS = np.datetime64("2024-01-01T00:00:00", "us")

ROLES = np.array(["user", "assistant", "system", "tool"])
TOOLS = np.array(["search", "python", "browser", "calculator", "none"])
WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark merge window batch "
    "stream shuffle join filter agg table row column key value data".split()
)


@dataclass
class BinlogSpec:
    seed: int = 42
    n_convs: int = 50
    max_turns: int = 20
    n_events: int = 1000
    dup_rate: float = 0.02
    ooo_window: int = 32
    hot_share: float = 0.2          # share of events hitting conv_id 0
    n_hot: int = 1                  # number of hot conversations
    evolution_point: float = 0.5    # fraction of lsns before `tool` exists
    n_segments: int = 8
    delete_rate: float = 0.08
    ts_collision_rate: float = 0.15  # fraction with second-truncated ts
    text_words: tuple[int, int] = field(default=(3, 12))


def generate_binlog(spec: BinlogSpec) -> pd.DataFrame:
    """Return the delivered event stream as a pandas DataFrame with a
    ``seg`` column (delivery order = segment order, shuffled within a
    segment). Unique lsns are 0..n_events-1; duplicate deliveries repeat
    an lsn verbatim."""
    rng = np.random.default_rng(spec.seed)
    n = spec.n_events
    lsn = np.arange(n, dtype=np.int64)

    # conv assignment with explicit hot keys
    hot = rng.random(n) < spec.hot_share
    conv_num = np.where(
        hot,
        rng.integers(0, spec.n_hot, n),
        rng.integers(spec.n_hot, spec.n_convs, n),
    )
    conv_id = np.char.add("conv_", conv_num.astype(str))
    turn_idx = rng.integers(0, spec.max_turns, n).astype(np.int32)

    op = np.where(rng.random(n) < spec.delete_rate, "D", "U")
    # make the first event of each key an insert (cosmetic; replay treats
    # I and U identically)
    key = conv_num.astype(np.int64) * 100000 + turn_idx
    first_seen = np.zeros(n, dtype=bool)
    _, first_idx = np.unique(key, return_index=True)
    first_seen[first_idx] = True
    op = np.where(first_seen & (op != "D"), "I", op)

    # timestamps: mostly increasing with lsn but jittered so conflicting
    # updates (later lsn, earlier ts) occur; a slice truncated to seconds
    # to force exact-ts ties resolved by lsn
    micros = lsn * 1_000_000 + rng.integers(-30_000_000, 30_000_000, n)
    micros = np.maximum(micros, 0)
    collide = rng.random(n) < spec.ts_collision_rate
    micros = np.where(collide, (micros // 60_000_000) * 60_000_000, micros)
    ts = BASE_TS + micros.astype("timedelta64[us]")

    n_words = rng.integers(spec.text_words[0], spec.text_words[1] + 1, n)
    word_idx = rng.integers(0, len(WORDS), (n, spec.text_words[1]))
    texts = [
        " ".join(WORDS[word_idx[i, : n_words[i]]]) + f" #{lsn[i]}"
        for i in range(n)
    ]

    evo_lsn = int(n * spec.evolution_point)
    tool = np.where(
        (lsn >= evo_lsn) & (rng.random(n) < 0.5),
        TOOLS[rng.integers(0, len(TOOLS), n)],
        None,
    )

    df = pd.DataFrame(
        {
            "lsn": lsn,
            "op": op,
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": ROLES[rng.integers(0, len(ROLES), n)],
            "text": texts,
            "tool": tool,
            "ts": ts,
        }
    )
    # deletes carry no payload
    d = df["op"] == "D"
    df.loc[d, ["role", "text", "tool"]] = None

    # segment by contiguous lsn range, then shuffle within segment
    # (bounded out-of-order), then inject duplicate deliveries
    seg_width = max(1, (n + spec.n_segments - 1) // spec.n_segments)
    df["seg"] = (df["lsn"] // seg_width).astype(np.int32)
    parts = []
    for s, g in df.groupby("seg", sort=True):
        g = g.sample(frac=1.0, random_state=int(spec.seed) + int(s))
        n_dup = int(len(g) * spec.dup_rate)
        if n_dup:
            dup_rows = g.sample(n=n_dup, random_state=int(spec.seed) + 7 + int(s))
            # half the dups redeliver within the same segment, half in the next
            half = n_dup // 2
            within = dup_rows.iloc[:half]
            later = dup_rows.iloc[half:].copy()
            later["seg"] = np.minimum(later["seg"] + 1, spec.n_segments - 1)
            g = pd.concat([g, within], ignore_index=True)
            g = g.sample(frac=1.0, random_state=int(spec.seed) + 13 + int(s))
            parts.append(g)
            parts.append(later)
        else:
            parts.append(g)
    out = pd.concat(parts, ignore_index=True)
    out = out.sort_values("seg", kind="stable").reset_index(drop=True)
    out["evolved"] = out["lsn"] >= evo_lsn
    return out


def write_segments(df: pd.DataFrame, out_dir: str) -> list[str]:
    """Write one parquet file per segment under ``out_dir``. Segments
    before the evolution point omit the ``tool`` column entirely
    (schema v1), forcing reader-side schema reconciliation."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s, g in df.groupby("seg", sort=True):
        cols = ["lsn", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts"]
        v1 = not bool(g["evolved"].any())
        g = g[[c for c in cols if not (v1 and c == "tool")]]
        tbl = pa.Table.from_pandas(g.reset_index(drop=True), preserve_index=False)
        # A segment whose column is ALL null (e.g. no event in the
        # segment carries a tool, or a pure-delete segment) infers the
        # pyarrow NULL type, which parquet stores as INT32 — an
        # unreadable WAL under the typed reader schema. Pin null-typed
        # columns to their contract types (what any real WAL producer's
        # fixed schema would do).
        want = {
            "lsn": pa.int64(), "op": pa.string(), "conv_id": pa.string(),
            "turn_idx": pa.int32(), "role": pa.string(),
            "text": pa.string(), "tool": pa.string(),
            "ts": pa.timestamp("us"),
        }
        for i, f in enumerate(tbl.schema):
            if pa.types.is_null(f.type) and f.name in want:
                tbl = tbl.set_column(
                    i, pa.field(f.name, want[f.name]),
                    tbl.column(i).cast(want[f.name]),
                )
        p = os.path.join(out_dir, f"seg-{int(s):05d}.parquet")
        pq.write_table(tbl, p)
        # WAL delivery contract: segment files carry strictly increasing
        # modification times in segment order (true of any real WAL
        # writer). Spark's FileStreamSource orders unseen files by mtime,
        # so this pins micro-batch order deterministically.
        epoch = 1_700_000_000 + int(s)
        os.utime(p, (epoch, epoch))
        paths.append(p)
    return paths


def oracle_replay(events: pd.DataFrame) -> pd.DataFrame:
    """Golden single-threaded replay (FIXTURES.md §3): process unique
    events in lsn order; I/U upserts iff (ts, lsn) >= stored (ts, lsn);
    D removes; duplicate lsns are no-ops. Returns the converged table
    sorted by (conv_id, turn_idx)."""
    ev = events.drop_duplicates(subset=["lsn"]).sort_values("lsn")
    state: dict[tuple[str, int], dict] = {}
    for row in ev.itertuples(index=False):
        k = (row.conv_id, int(row.turn_idx))
        if row.op == "D":
            state.pop(k, None)
        else:
            cur = state.get(k)
            if cur is None or (row.ts, row.lsn) >= (cur["ts"], cur["lsn"]):
                state[k] = {
                    "role": row.role,
                    "text": row.text,
                    "tool": row.tool,
                    "ts": row.ts,
                    "lsn": int(row.lsn),
                }
    rows = [
        {
            "conv_id": k[0],
            "turn_idx": k[1],
            "role": v["role"],
            "text": v["text"],
            "tool": v["tool"],
            "ts": v["ts"],
        }
        for k, v in state.items()
    ]
    out = pd.DataFrame(
        rows,
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"],
    )
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
