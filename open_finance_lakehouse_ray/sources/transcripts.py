"""Deterministic synthetic transcript tables (FIXTURES.md F1–F4).

The primary table every maintenance operator runs over:
``(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us])`` — from ``BASELINE.json`` ``input_hint``.

Everything is a pure function of ``(seed, conv_id, turn_idx, version)`` so
per-turn text equality is checkable without stored goldens (the
writer-is-not-the-witness discipline of the reference's idempotence
harness, ``/root/reference/tools/streaming_idempotence.py:17-22``).

Skew: turns-per-conversation is Zipf-ish (a few hot conversations
dominate) — the skew the MERGE bucket salting must break. The initial
layout is many small files with conversations interleaved randomly, so
compaction and Z-ordering have real work to do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

EPOCH_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z
ROLES = np.array(["user", "assistant", "tool"])
TOOLS = np.array(["search", "exec", "browse"])

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_WORDS = np.array(
    (
        "merge compact cluster manifest snapshot expire commit lineage turn "
        "conversation transcript agent tool batch arrow block shuffle sort key "
        "partition stream replay resume checkpoint idempotent latest wins stale "
        "order scan equality invariant zorder hilbert morton interleave bucket"
    ).split()
)


def _rng(seed: int, *streams: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, *streams]))


def conversation_sizes(seed: int, n_convs: int, mean_turns: float = 20.0) -> np.ndarray:
    """Zipf-ish turn counts, clamped to [1, 2000] (FIXTURES.md F1.1)."""
    rng = _rng(seed, 1)
    raw = rng.zipf(1.3, size=n_convs).astype(np.int64)
    sizes = np.clip(raw * max(1, int(mean_turns / 3)), 1, 2000)
    return sizes


def _text_key(conv_num: int | np.ndarray, turn_idx: int | np.ndarray, version: int):
    return (
        (np.uint64(0xBEEF) << np.uint64(56))
        ^ (np.asarray(conv_num, dtype=np.uint64) << np.uint64(24))
        ^ (np.asarray(turn_idx, dtype=np.uint64) & np.uint64(0xFFFFFF))
        ^ (np.uint64(version) << np.uint64(48))
    )


def turn_text(conv_id: str, turn_idx: int, version: int = 1) -> str:
    """Pure-function text payload — the per-turn equality oracle.

    Scalar mirror of :func:`turn_texts` (the vectorized generator): the
    two must agree bit-for-bit, which tests pin.
    """
    from open_finance_lakehouse_ray.functions.hashing import splitmix64_py

    conv_num = int(conv_id.rsplit("-", 1)[1])
    key = int(_text_key(conv_num, turn_idx, version))
    n = 8 + splitmix64_py(key) % 56
    words = [
        _WORDS[splitmix64_py(key + 1 + i) % len(_WORDS)] for i in range(n)
    ]
    return f"{conv_id}:{turn_idx}:v{version}:" + " ".join(words)


def turn_texts(
    conv_ids: pa.Array, conv_nums: np.ndarray, turn_idx: np.ndarray, version: int
) -> pa.Array:
    """Fully vectorized text payloads: word indices via splitmix64, a
    variable-length list assembled with Arrow offsets, joined by
    ``pc.binary_join`` — no Python loop over rows."""
    import pyarrow.compute as pc

    from open_finance_lakehouse_ray.functions.hashing import splitmix64

    # n words in [8, 64)
    base_key = _text_key(conv_nums, turn_idx, version)
    n = (8 + splitmix64(base_key) % np.uint64(56)).astype(np.int64)
    offsets = np.zeros(len(n) + 1, dtype=np.int64)
    np.cumsum(n, out=offsets[1:])
    total = int(offsets[-1])
    row_of = np.repeat(np.arange(len(n), dtype=np.int64), n)
    pos = np.arange(total, dtype=np.int64) - offsets[row_of]
    widx = splitmix64(base_key[row_of] + np.uint64(1) + pos.astype(np.uint64)) % np.uint64(
        len(_WORDS)
    )
    flat = pa.array(_WORDS[widx.astype(np.int64)], type=pa.string()).cast(
        pa.large_string()
    )
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    body = pc.binary_join(
        pa.LargeListArray.from_arrays(offsets, flat),
        pa.scalar(" ", type=pa.large_string()),
    )
    def _lg(arr):
        out = pc.cast(arr, pa.large_string())
        return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out

    prefix = pc.binary_join_element_wise(
        _lg(conv_ids),
        _lg(pa.array(turn_idx.astype("U"), type=pa.string())),
        pa.scalar(f"v{version}", type=pa.large_string()),
        pa.scalar("", type=pa.large_string()),
        pa.scalar(":", type=pa.large_string()),
    )
    return pc.binary_join_element_wise(
        prefix, body, pa.scalar("", type=pa.large_string())
    ).cast(pa.string())


def build_transcripts(
    seed: int = 42,
    n_convs: int = 300,
    mean_turns: float = 20.0,
    version: int = 1,
) -> pa.Table:
    """Build the full transcript table as one Arrow table (driver-side;
    used for fixtures and to seed benchmark tables)."""
    sizes = conversation_sizes(seed, n_convs, mean_turns)
    conv_nums = np.repeat(np.arange(n_convs), sizes)
    turn_idx = np.concatenate([np.arange(s) for s in sizes]).astype(np.int32)
    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_convs)])[conv_nums]

    rng = _rng(seed, 2)
    conv_start = rng.integers(0, 86_400_000_000 * 30, size=n_convs)  # 30-day span
    jitter = rng.integers(0, 5_000_000, size=len(turn_idx))
    ts = (
        EPOCH_US
        + conv_start[conv_nums]
        + turn_idx.astype(np.int64) * 60_000_000
        + jitter
    )

    role_idx = np.where(
        turn_idx % 2 == 0, 0, np.where((turn_idx // 2) % 3 == 2, 2, 1)
    )
    roles = ROLES[role_idx]
    tool_choice = TOOLS[_rng(seed, 3).integers(0, len(TOOLS), size=len(turn_idx))]
    tools = np.where(roles == "tool", tool_choice, None)

    conv_id_arr = pa.array(conv_ids, type=pa.string())
    texts = turn_texts(conv_id_arr, conv_nums.astype(np.int64), turn_idx, version)
    return pa.table(
        {
            "conv_id": conv_id_arr,
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(roles, type=pa.string()),
            "text": texts,
            "tool": pa.array(tools.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )


def shuffle_unclustered(table: pa.Table, seed: int = 42) -> pa.Table:
    """Interleave conversations randomly (FIXTURES.md F1.3) so the initial
    physical layout is unclustered and Z-order measurably helps."""
    rng = _rng(seed, 4)
    perm = rng.permutation(table.num_rows)
    return table.take(pa.array(perm))


def late_turns(
    base: pa.Table,
    seed: int = 42,
    n_updates: int = 50,
    n_inserts: int = 30,
    n_stale: int = 20,
) -> pa.Table:
    """FIXTURES.md F2 — the MERGE INTO source: updates (later ts, new text),
    inserts (new keys), stale duplicates (earlier ts, poison text that must
    never appear — the reference's unmissable 99999.00-price pattern,
    docs/STREAMING.md:361-383)."""
    rng = _rng(seed, 5)
    n = base.num_rows
    pick = rng.choice(n, size=min(n_updates + n_stale, n), replace=False)
    upd_rows = base.take(pa.array(pick[:n_updates]))
    stale_rows = base.take(pa.array(pick[n_updates : n_updates + n_stale]))

    def _col(t: pa.Table, name: str) -> np.ndarray:
        return t[name].to_numpy(zero_copy_only=False)

    # updates: same key, version-2 text, ts strictly later
    upd_texts = [
        turn_text(c, int(t), version=2)
        for c, t in zip(_col(upd_rows, "conv_id"), _col(upd_rows, "turn_idx"))
    ]
    upd = pa.table(
        {
            "conv_id": upd_rows["conv_id"],
            "turn_idx": upd_rows["turn_idx"],
            "role": upd_rows["role"],
            "text": pa.array(upd_texts, type=pa.string()),
            "tool": upd_rows["tool"],
            "ts": pa.array(
                _col(upd_rows, "ts").astype("datetime64[us]").astype(np.int64)
                + 3_600_000_000,
                type=pa.timestamp("us"),
            ),
        },
        schema=TRANSCRIPT_SCHEMA,
    )

    # stale: same key, EARLIER ts, poison text — must be ignored by MERGE
    stale = pa.table(
        {
            "conv_id": stale_rows["conv_id"],
            "turn_idx": stale_rows["turn_idx"],
            "role": stale_rows["role"],
            "text": pa.array(["STALE-MUST-NOT-APPEAR"] * stale_rows.num_rows),
            "tool": stale_rows["tool"],
            "ts": pa.array(
                _col(stale_rows, "ts").astype("datetime64[us]").astype(np.int64)
                - 7_200_000_000,
                type=pa.timestamp("us"),
            ),
        },
        schema=TRANSCRIPT_SCHEMA,
    )

    # inserts: extend existing conversations past their max turn + new convs
    import pyarrow.compute as pc

    max_turn = {}
    for c, t in zip(_col(base, "conv_id"), _col(base, "turn_idx")):
        if t >= max_turn.get(c, -1):
            max_turn[c] = t
    convs = sorted(max_turn)
    ins_records = []
    for k in range(n_inserts):
        if k % 3 == 2:
            cid = f"conv-9{k:07d}"  # brand-new conversation
            tix = 0
        else:
            cid = convs[int(rng.integers(0, len(convs)))]
            tix = max_turn[cid] + 1
            max_turn[cid] = tix
        ins_records.append((cid, tix))
    ins_conv = [c for c, _ in ins_records]
    ins_turn = np.array([t for _, t in ins_records], dtype=np.int32)
    ins_ts = EPOCH_US + 86_400_000_000 * 40 + np.arange(len(ins_records)) * 1_000_000
    ins = pa.table(
        {
            "conv_id": pa.array(ins_conv, type=pa.string()),
            "turn_idx": pa.array(ins_turn, type=pa.int32()),
            "role": pa.array(
                np.where(ins_turn % 2 == 0, "user", "assistant").tolist()
            ),
            "text": pa.array(
                [turn_text(c, int(t), version=1) for c, t in ins_records]
            ),
            "tool": pa.array([None] * len(ins_records), type=pa.string()),
            "ts": pa.array(ins_ts, type=pa.timestamp("us")),
        },
        schema=TRANSCRIPT_SCHEMA,
    )
    out = pa.concat_tables([upd, ins, stale])
    _ = pc  # imported for symmetry with other fixture helpers
    return out


def write_small_files(
    table: pa.Table, out_dir: str, rows_per_file: int = 500, seed: int = 42
) -> list[str]:
    """Write the table as many deliberately-undersized Parquet files
    (FIXTURES.md F1.2) so compaction has real work. Returns file paths."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    shuffled = shuffle_unclustered(table, seed)
    paths = []
    for i, start in enumerate(range(0, shuffled.num_rows, rows_per_file)):
        chunk = shuffled.slice(start, rows_per_file)
        p = os.path.join(out_dir, f"raw-{i:05d}.parquet")
        pq.write_table(chunk, p)
        paths.append(p)
    return paths
