"""Schema evolution — union-by-name with widening promotions.

The reference's tables live on Delta, whose ``mergeSchema`` write option
lets an append add columns / widen types and readers see old files
null-filled at the evolved schema. This engine owns that verb: the
table's canonical schema travels in the commit summary
(``schema_b64``, an IPC-serialized Arrow schema — exact, not a lossy
string round-trip), an append with ``merge_schema=True`` unifies it
against the incoming file schema, and the scan conforms every batch to
the snapshot schema (missing columns null-filled, narrower types cast
up) — data files are NEVER rewritten by an evolution, exactly like the
Delta log.

Promotion rules (a superset is an error, never silent): NULL adopts the
other side; integers widen to the larger signed width; an int/float mix
or float32/float64 mix widens to float64 ONLY when lossless — int64 or
uint64 mixed with float raises (float64's 53 mantissa bits silently
corrupt larger integers); string/large_string widen to large_string.
Anything else (date vs timestamp, string vs int, …) raises
:class:`SchemaEvolutionError` — the caller must cast explicitly.
"""

from __future__ import annotations

import base64

import pyarrow as pa


class SchemaEvolutionError(Exception):
    """Incompatible schema change (non-widening type conflict)."""


_INT_RANK = {
    pa.int8(): 1,
    pa.int16(): 2,
    pa.int32(): 3,
    pa.int64(): 4,
}


def promote_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    a_int, b_int = a in _INT_RANK, b in _INT_RANK
    a_f = pa.types.is_floating(a)
    b_f = pa.types.is_floating(b)
    if a_int and b_int:
        return a if _INT_RANK[a] >= _INT_RANK[b] else b
    if (a_int or a_f) and (b_int or b_f):
        # int/float mix, or float32/float64: float64 loses nothing from
        # int32-or-smaller and either float. int64 × float is LOSSY —
        # float64 has 53 mantissa bits, so values beyond 2^53 (row
        # hashes, large ids) would silently corrupt through the cast;
        # the module contract is "a superset is an error, never silent",
        # so raise and make the caller cast explicitly. (uint64 never
        # reaches this branch — it is not in _INT_RANK, so any uint64
        # mix already raises at the fall-through below.)
        if pa.int64() in (a, b):
            raise SchemaEvolutionError(
                f"cannot promote {a} with {b}: int64 -> float64 loses "
                "integer precision beyond 2^53; cast explicitly"
            )
        return pa.float64()
    if {a, b} == {pa.string(), pa.large_string()}:
        return pa.large_string()
    raise SchemaEvolutionError(f"cannot promote {a} with {b}")


def evolve_schema(current: pa.Schema, incoming: pa.Schema) -> pa.Schema:
    """Union-by-name: current columns keep their order (types widened
    where the incoming side is wider), new incoming columns append at
    the end — the Delta ``mergeSchema`` column-ordering contract."""
    fields = []
    for f in current:
        if incoming.get_field_index(f.name) >= 0:
            t = promote_types(f.type, incoming.field(f.name).type)
            fields.append(pa.field(f.name, t))
        else:
            fields.append(f)
    have = {f.name for f in current}
    fields.extend(f for f in incoming if f.name not in have)
    return pa.schema(fields)


def schema_to_b64(schema: pa.Schema) -> str:
    """IPC-serialize a schema for commit summaries, STRIPPED of schema-
    and field-level metadata first. Recorded schemas are compared as raw
    b64 strings (ingest's block-heterogeneity dedup), and IPC bytes
    include custom/pandas metadata — without the strip, blocks with
    identical fields but different provenance metadata (``from_pandas``
    vs ``from_arrow``) would be flagged heterogeneous and flip the
    table to ``schema_evolved``, losing column pushdown for nothing
    (round-5 advice). ``pa.Schema.equals`` defaults to
    ``check_metadata=False``, so every structural comparison downstream
    is unaffected. (Metadata nested inside struct/list children is not
    stripped — Arrow field metadata does not recurse, and no writer here
    produces it.)"""
    schema = pa.schema([f.remove_metadata() for f in schema])
    return base64.b64encode(schema.serialize().to_pybytes()).decode("ascii")


def schema_from_b64(s: str) -> pa.Schema:
    return pa.ipc.read_schema(pa.BufferReader(base64.b64decode(s)))


def conform_table(t: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast/null-fill one Arrow table to the evolved schema. Zero work
    when it already matches (the un-evolved fast path)."""
    if t.schema.equals(schema):
        return t
    cols = []
    for f in schema:
        if f.name in t.column_names:
            c = t[f.name]
            if not c.type.equals(f.type):
                c = c.cast(f.type)
        else:
            c = pa.nulls(t.num_rows, f.type)
        cols.append(c)
    return pa.Table.from_arrays(cols, schema=schema)


def make_conformer(schema: pa.Schema):
    """``map_batches`` stage pinning every batch to the snapshot schema."""

    def _conform(t: pa.Table) -> pa.Table:
        return conform_table(t, schema)

    return _conform
