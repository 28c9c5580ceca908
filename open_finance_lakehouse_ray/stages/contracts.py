"""Declarative per-table data contracts.

The reference declares one Pandera contract per landed series and gates
publication on it (``/root/reference/ofl/quality/contracts.py:11-33``,
``ofl/ingestion/landing.py:58-70``). :mod:`stages.validate` hard-codes the
transcript contract; this module is the declarative generalization: a
:class:`TableContract` is data (YAML/JSON-friendly — the registry's
``contracts:`` section), compiled once into a vectorized ``map_batches``
validator, so adding a table's contract is a config change, not code.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

from open_finance_lakehouse_ray.stages.validate import ContractViolation


def _parse_type(t: str) -> pa.DataType:
    t = t.strip()
    if t.startswith("list<") and t.endswith(">"):
        return pa.list_(_parse_type(t[5:-1]))
    return pa.type_for_alias(t)


@dataclass(frozen=True)
class TableContract:
    """Schema + row-level invariants for one table.

    ``allowed_values`` / ``bounds`` mirror the reference's per-series
    value-set and min/max bounds (``contracts.py:24-33``).
    """

    name: str
    schema: pa.Schema
    required_non_null: tuple[str, ...] = ()
    allowed_values: dict[str, tuple] = field(default_factory=dict)
    bounds: dict[str, tuple] = field(default_factory=dict)

    @staticmethod
    def from_dict(name: str, d: dict[str, Any]) -> "TableContract":
        schema = pa.schema(
            [(c, _parse_type(t)) for c, t in d["columns"].items()]
        )
        return TableContract(
            name=name,
            schema=schema,
            required_non_null=tuple(d.get("required_non_null", ())),
            allowed_values={
                c: tuple(v) for c, v in (d.get("allowed_values") or {}).items()
            },
            bounds={
                c: (v[0], v[1]) for c, v in (d.get("bounds") or {}).items()
            },
        )


def conform_to_contract(batch: pa.Table, contract: TableContract) -> pa.Table:
    """Cast to the contract schema; null-fill missing columns (the
    union-by-name behavior); drop extra columns."""
    cols = []
    for f in contract.schema:
        if f.name in batch.column_names:
            col = batch[f.name]
            if col.type != f.type:
                col = pc.cast(col, f.type)
        else:
            col = pa.nulls(batch.num_rows, type=f.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=contract.schema)


def make_contract_validator(contract: TableContract):
    """Compile the contract into a ``map_batches`` stage: conform, then
    raise :class:`ContractViolation` on the first invariant breach —
    BEFORE any commit can publish the batch."""

    allowed = {c: pa.array(v) for c, v in contract.allowed_values.items()}

    def _validate(batch: pa.Table) -> pa.Table:
        batch = conform_to_contract(batch, contract)
        if batch.num_rows == 0:
            return batch
        for c in contract.required_non_null:
            nulls = pc.sum(pc.is_null(batch[c]).cast(pa.int64())).as_py() or 0
            if nulls:
                raise ContractViolation(
                    f"{contract.name}: null_key:{c}:{nulls}_rows"
                )
        for c, vals in allowed.items():
            col = pc.drop_null(batch[c])
            if len(col) == 0:
                continue
            bad = pc.sum(
                pc.invert(pc.is_in(col, value_set=vals)).cast(pa.int64())
            ).as_py()
            if bad:
                raise ContractViolation(
                    f"{contract.name}: disallowed_value:{c}:{bad}_rows"
                )
        for c, (lo, hi) in contract.bounds.items():
            mm = pc.min_max(batch[c])
            cmin, cmax = mm["min"].as_py(), mm["max"].as_py()
            if cmin is None:
                continue
            if lo is not None and cmin < lo:
                raise ContractViolation(
                    f"{contract.name}: below_bound:{c}:{cmin}<{lo}"
                )
            if hi is not None and cmax > hi:
                raise ContractViolation(
                    f"{contract.name}: above_bound:{c}:{cmax}>{hi}"
                )
        return batch

    return _validate


def make_invariant_validator(name: str, spec: dict[str, Any]):
    """Compile a schema-less invariant set (the txlog-carried constraint
    form, ``pipelines/alter.py``) into a ``map_batches`` stage. Spec keys:
    ``required_non_null`` (list), ``allowed_values`` ({col: [..]}),
    ``bounds`` ({col: [lo, hi]}). Raises :class:`ContractViolation` with
    the constraint's name so the breach is attributable."""
    non_null = tuple(spec.get("required_non_null", ()))
    allowed = {c: pa.array(v) for c, v in (spec.get("allowed_values") or {}).items()}
    bounds = {c: (v[0], v[1]) for c, v in (spec.get("bounds") or {}).items()}

    def _validate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        for c in non_null:
            if c not in batch.column_names:
                raise ContractViolation(f"{name}: missing_column:{c}")
            nulls = pc.sum(pc.is_null(batch[c]).cast(pa.int64())).as_py() or 0
            if nulls:
                raise ContractViolation(f"{name}: null_key:{c}:{nulls}_rows")
        for c, vals in allowed.items():
            if c not in batch.column_names:
                continue
            col = pc.drop_null(batch[c])
            if len(col) == 0:
                continue
            bad = pc.sum(
                pc.invert(pc.is_in(col, value_set=vals)).cast(pa.int64())
            ).as_py()
            if bad:
                raise ContractViolation(f"{name}: disallowed_value:{c}:{bad}_rows")
        for c, (lo, hi) in bounds.items():
            if c not in batch.column_names:
                continue
            col = batch[c]
            if pa.types.is_timestamp(col.type):
                col = col.cast(pa.int64())
            mm = pc.min_max(col)
            cmin, cmax = mm["min"].as_py(), mm["max"].as_py()
            if cmin is None:
                continue
            if lo is not None and cmin < lo:
                raise ContractViolation(f"{name}: below_bound:{c}:{cmin}<{lo}")
            if hi is not None and cmax > hi:
                raise ContractViolation(f"{name}: above_bound:{c}:{cmax}>{hi}")
        return batch

    return _validate
