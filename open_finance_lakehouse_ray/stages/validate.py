"""Contract gate: schema conformance + key sanity, enforced at the write
boundary — the Ray analog of the reference's Pandera contract
(``/root/reference/ofl/quality/contracts.py:11-33``, gated in
``ofl/ingestion/landing.py:58-70``: a violation withholds that series'
publication; siblings are unaffected).

Runs as a vectorized ``map_batches`` stage: casts every batch to the
canonical transcript schema (missing columns null-filled, the
``unionByName(allowMissingColumns=True)`` behavior of
``ofl/transform/spark/silver.py:205-209``) and raises
:class:`ContractViolation` on non-null-key or bound breaches, failing the
job *before* any commit replaces the published snapshot (the
checks-withhold-publication rule of ``ofl/transform/gold/runner.py:165-203``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from open_finance_lakehouse_ray.sources.transcripts import TRANSCRIPT_SCHEMA

ALLOWED_ROLES = ("user", "assistant", "tool", "system")


class ContractViolation(Exception):
    pass


def conform_batch(batch: pa.Table, schema: pa.Schema = TRANSCRIPT_SCHEMA) -> pa.Table:
    """Cast to the canonical schema; null-fill missing columns."""
    cols = []
    for field in schema:
        if field.name in batch.column_names:
            col = batch[field.name]
            if col.type != field.type:
                col = pc.cast(col, field.type)
        else:
            col = pa.nulls(batch.num_rows, type=field.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)


def validate_batch(
    batch: pa.Table,
    *,
    max_turn_idx: int | None = 2_000_000,
    check_roles: bool = True,
) -> pa.Table:
    """Conform + validate one batch; raises ContractViolation with the first
    breach's reason (the reference reports reason strings like
    ``missing_required_fields:<f>``, ``ofl/streaming/bronze.py:109-142``)."""
    batch = conform_batch(batch)
    if batch.num_rows == 0:
        return batch
    for key in ("conv_id", "turn_idx", "ts"):
        nulls = pc.sum(pc.is_null(batch[key]).cast(pa.int64())).as_py() or 0
        if nulls:
            raise ContractViolation(f"null_key:{key}:{nulls}_rows")
    if pc.any(pc.equal(batch["conv_id"], "")).as_py():
        raise ContractViolation("empty_conv_id")
    mm = pc.min_max(batch["turn_idx"])
    if mm["min"].as_py() is not None and mm["min"].as_py() < 0:
        raise ContractViolation("negative_turn_idx")
    if max_turn_idx is not None and (mm["max"].as_py() or 0) > max_turn_idx:
        # the per-series max_value bound of contracts.py:24-33
        raise ContractViolation(f"turn_idx_above_bound:{mm['max'].as_py()}")
    if check_roles:
        role = pc.fill_null(batch["role"], "user")
        bad = pc.sum(
            pc.invert(pc.is_in(role, value_set=pa.array(ALLOWED_ROLES))).cast(pa.int64())
        ).as_py()
        if bad:
            raise ContractViolation(f"unknown_role:{bad}_rows")
    return batch


def tag_validity(batch: pa.Table) -> pa.Table:
    """Non-raising variant: adds ``_valid``/``_reason`` columns so
    classification travels with the row (the tag-then-split pattern of
    ``ofl/streaming/bronze.py:109-142``); downstream filters split good rows
    from the dead-letter lane (``bronze.py:171-182``)."""
    batch = conform_batch(batch)
    n = batch.num_rows
    valid = pa.array([True] * n)
    reason = pa.nulls(n, type=pa.string())
    for key in ("conv_id", "turn_idx", "ts"):
        isnull = pc.is_null(batch[key])
        reason = pc.if_else(
            pc.and_(isnull, pc.is_null(reason)),
            pa.scalar(f"missing_required_fields:{key}"),
            reason,
        )
        valid = pc.and_(valid, pc.invert(isnull))
    neg = pc.fill_null(pc.less(batch["turn_idx"], 0), False)
    reason = pc.if_else(pc.and_(neg, pc.is_null(reason)), pa.scalar("negative_turn_idx"), reason)
    valid = pc.and_(valid, pc.invert(neg))
    return batch.append_column("_valid", valid).append_column("_reason", reason)
