"""Schema evolution: widening promotions, mergeSchema appends with
null-filled reads, rejection of un-flagged drift, compaction across the
evolution boundary, time travel to the pre-evolution schema, and
overwrite resetting the schema."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from open_finance_lakehouse_ray.pipelines.compact import compact
from open_finance_lakehouse_ray.pipelines.ingest import ingest_dataset
from open_finance_lakehouse_ray.pipelines.scan import scan, validation_scan
from open_finance_lakehouse_ray.sources.transcripts import build_transcripts
from open_finance_lakehouse_ray.stages.evolution import (
    SchemaEvolutionError,
    evolve_schema,
    promote_types,
    schema_from_b64,
    schema_to_b64,
)
from open_finance_lakehouse_ray.state.txlog import TableLog


def test_promotions():
    assert promote_types(pa.int32(), pa.int64()) == pa.int64()
    assert promote_types(pa.int64(), pa.int8()) == pa.int64()
    assert promote_types(pa.float32(), pa.float64()) == pa.float64()
    assert promote_types(pa.int32(), pa.float32()) == pa.float64()
    assert promote_types(pa.null(), pa.string()) == pa.string()
    assert promote_types(pa.string(), pa.large_string()) == pa.large_string()
    # int64/uint64 × float is LOSSY beyond 2^53 — must raise, never
    # silently corrupt (the cdf._protect_ints corruption class)
    with pytest.raises(SchemaEvolutionError):
        promote_types(pa.int64(), pa.float32())
    with pytest.raises(SchemaEvolutionError):
        promote_types(pa.float64(), pa.uint64())
    with pytest.raises(SchemaEvolutionError):
        promote_types(pa.string(), pa.int64())
    with pytest.raises(SchemaEvolutionError):
        promote_types(pa.date32(), pa.timestamp("us"))


def test_evolve_schema_order_and_b64_roundtrip():
    cur = pa.schema([("a", pa.int32()), ("b", pa.string())])
    inc = pa.schema([("c", pa.float64()), ("a", pa.int64())])
    out = evolve_schema(cur, inc)
    # current order kept, widened; new columns appended
    assert out.names == ["a", "b", "c"]
    assert out.field("a").type == pa.int64()
    assert schema_from_b64(schema_to_b64(out)).equals(out)


def _with_score(t: pa.Table) -> pa.Table:
    return t.append_column(
        "score", pc.cast(pc.utf8_length(t["text"]), pa.float64())
    )


def test_merge_schema_lifecycle(ray_session, table_root):
    tx = build_transcripts(n_convs=40)
    n1 = tx.num_rows
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="ev-base")
    log = TableLog(table_root)
    v_pre = log.current_version()
    assert log.table_schema() is not None and not log.schema_is_evolved()

    # un-flagged drift is rejected before any commit
    extra = _with_score(build_transcripts(seed=7, n_convs=10))
    with pytest.raises(SchemaEvolutionError):
        ingest_dataset(
            rd.from_arrow(extra), table_root, job_id="ev-bad", validate=False
        )
    assert log.current_version() == v_pre

    ingest_dataset(
        rd.from_arrow(extra), table_root, job_id="ev-ok",
        validate=False, merge_schema=True,
    )
    assert log.schema_is_evolved()
    assert log.table_schema().names[-1] == "score"

    got = validation_scan(table_root)
    assert got.num_rows == n1 + extra.num_rows
    # pre-evolution rows read null-filled; appended rows keep their values
    assert got.num_rows - pc.count(got["score"]).as_py() == n1
    assert pc.sum(got["score"]).as_py() == pc.sum(extra["score"]).as_py()

    # column projection still works on the evolved table
    proj = scan(table_root, columns=["conv_id", "score"]).to_pandas()
    assert list(proj.columns) == ["conv_id", "score"]

    # time travel: the pre-evolution snapshot scans at the OLD schema
    old = scan(table_root, version=v_pre).take(1)[0]
    assert "score" not in old

    # compaction crosses the evolution boundary (mixed-schema bins)
    snap = compact(table_root, job_id="ev-compact", target_bytes=64 * 1024 * 1024)
    assert snap is not None
    after = validation_scan(table_root)
    assert after.num_rows == got.num_rows
    assert pc.sum(after["score"]).as_py() == pc.sum(extra["score"]).as_py()


def test_overwrite_resets_schema(ray_session, table_root):
    tx = build_transcripts(n_convs=20)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="ow-base")
    ingest_dataset(
        rd.from_arrow(_with_score(tx)), table_root, job_id="ow-ev",
        validate=False, merge_schema=True,
    )
    log = TableLog(table_root)
    assert log.schema_is_evolved()
    ingest_dataset(
        rd.from_arrow(tx), table_root, job_id="ow-reset", mode="overwrite"
    )
    assert not log.schema_is_evolved()
    assert "score" not in log.table_schema().names


def test_update_and_delete_on_evolved_table(ray_session, table_root):
    """update_where assigning an EVOLVED column must conform pre-evolution
    files (which lack the column on disk) before applying assignments —
    previously a KeyError mid-job (ADVICE r2, delete.py:396). A residual
    delete predicate over the evolved column must work the same way."""
    import pyarrow.compute as pc_

    from open_finance_lakehouse_ray.pipelines.delete import (
        delete_where,
        update_where,
    )

    tx = build_transcripts(n_convs=20)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="uev-base")
    extra = _with_score(build_transcripts(seed=9, n_convs=5))
    ingest_dataset(
        rd.from_arrow(extra), table_root, job_id="uev-ev",
        validate=False, merge_schema=True,
    )
    log = TableLog(table_root)
    assert log.schema_is_evolved()

    # assign the evolved column on rows living in PRE-evolution files
    snap = update_where(
        table_root, job_id="uev-upd",
        match=lambda t: pc_.is_null(t["score"]),
        assign={"score": 1.5},
    )
    assert snap is not None and snap.summary["updated_rows"] == tx.num_rows
    got = validation_scan(table_root)
    assert pc.count(got["score"]).as_py() == got.num_rows  # fully filled
    # residual delete over the evolved column (reads pre-evolution files too)
    snap2 = delete_where(
        table_root, job_id="uev-del",
        match=lambda t: pc_.equal(t["score"], 1.5),
    )
    assert snap2.summary["deleted_rows"] == tx.num_rows
    assert validation_scan(table_root).num_rows == extra.num_rows


def _scored(t: pa.Table, val: float, prefix: str = "convS") -> pa.Table:
    t = t.set_column(
        0, "conv_id", pc.utf8_replace_slice(t["conv_id"], 0, 4, prefix)
    )
    return t.append_column("score", pa.array([val] * t.num_rows, pa.float64()))


def test_merge_preserves_evolved_columns(ray_session, table_root):
    """MERGE into a schema-evolved table must conform rewrites to the
    table's EFFECTIVE schema — round-4 review: the transcript-pinned
    conform silently dropped evolved-column values from every rewritten
    file."""
    from open_finance_lakehouse_ray.pipelines.merge import merge_into

    base = build_transcripts(n_convs=8)
    ingest_dataset(
        rd.from_arrow(base), table_root, job_id="me-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    ext = _scored(build_transcripts(seed=3, n_convs=4), 2.5)
    ingest_dataset(
        rd.from_arrow(ext), table_root, job_id="me-ext",
        validate=False, merge_schema=True,
    )

    # updates touch BOTH evolved rows (convS..., their files carry score)
    # and pre-evolution rows (conv-..., their files LACK the column on
    # disk — the round-4 repro: the CDC diff indexed the raw old side by
    # the conformed new side's columns and crashed)
    upd_new = ext.slice(0, 5).set_column(
        3, "text", pa.array(["updated"] * 5, pa.string())
    )
    upd_old = base.slice(0, 3).set_column(
        3, "text", pa.array(["updated"] * 3, pa.string())
    )
    n_upd = upd_new.num_rows + upd_old.num_rows
    for strategy in ("broadcast", "shuffle"):
        merge_into(
            table_root, upd_new, job_id=f"me-up-{strategy}", strategy=strategy
        )
        merge_into(
            table_root, upd_old, job_id=f"me-upo-{strategy}", strategy=strategy
        )
        out = validation_scan(table_root).to_pandas()
        assert "score" in out.columns
        evolved = out[out["conv_id"].str.startswith("convS")]
        # every evolved row still carries its score — including the
        # rewrite-noise rows of the touched files
        assert len(evolved) == ext.num_rows
        assert (evolved["score"] == 2.5).all(), strategy
        # pre-evolution rows stay null-scored (the update carried none)
        assert out[~out["conv_id"].str.startswith("convS")]["score"].isna().all()
        assert (out["text"] == "updated").sum() == n_upd


def test_ingest_validate_keeps_extras_under_merge_schema(ray_session, table_root):
    """validate=True + merge_schema=True must validate the transcript core
    and CARRY extra columns — not silently conform them away (round-4
    review)."""
    base = build_transcripts(n_convs=4)
    ingest_dataset(rd.from_arrow(base), table_root, job_id="vx-base")
    ext = _scored(build_transcripts(seed=5, n_convs=3), 1.25, "convV")
    ingest_dataset(
        rd.from_arrow(ext), table_root, job_id="vx-ext",
        validate=True, merge_schema=True,
    )
    out = validation_scan(table_root).to_pandas()
    assert "score" in out.columns
    got = out[out["conv_id"].str.startswith("convV")]["score"]
    assert len(got) == ext.num_rows and (got == 1.25).all()
    # and the core contract still fires through the extras-keeping wrapper
    bad = ext.set_column(
        0, "conv_id", pa.array([""] * ext.num_rows, pa.string())
    )
    from open_finance_lakehouse_ray.stages.validate import ContractViolation

    with pytest.raises(ContractViolation):
        ingest_dataset(
            rd.from_arrow(bad), table_root, job_id="vx-bad",
            validate=True, merge_schema=True,
        )


def test_unvalidated_heterogeneous_ingest_rejected_or_unioned(
    ray_session, table_root
):
    """validate=False blocks can carry differing schemas; one footer
    proves nothing (round-4 review): without merge_schema the mismatch
    must raise, with it the union lands with the evolved flag set."""
    a = build_transcripts(n_convs=3)
    b = _scored(build_transcripts(seed=7, n_convs=3), 9.0, "convH")
    ds = rd.from_arrow(a).union(rd.from_arrow(b))
    with pytest.raises(SchemaEvolutionError):
        ingest_dataset(ds, table_root, job_id="ht-rej", validate=False)
    ingest_dataset(
        ds, table_root, job_id="ht-ok", validate=False, merge_schema=True
    )
    log = TableLog(table_root)
    assert log.schema_is_evolved()
    out = validation_scan(table_root).to_pandas()
    assert "score" in out.columns
    assert out[out["conv_id"].str.startswith("convH")]["score"].eq(9.0).all()
    assert out[~out["conv_id"].str.startswith("convH")]["score"].isna().all()


def test_restore_mirrors_schema_identity(ray_session, table_root):
    """RESTORE to a pre-evolution version must surface the TARGET's
    schema, not the bypassed evolution's — and a plain append of
    target-schema data must work again without merge_schema (round-4
    review)."""
    from open_finance_lakehouse_ray.pipelines.restore import restore

    tx = build_transcripts(n_convs=6)
    ingest_dataset(rd.from_arrow(tx), table_root, job_id="rs-base")
    log = TableLog(table_root)
    v1 = log.current_version()
    ingest_dataset(
        rd.from_arrow(_scored(build_transcripts(seed=4, n_convs=2), 3.0)),
        table_root, job_id="rs-ev", validate=False, merge_schema=True,
    )
    assert log.schema_is_evolved()
    restore(table_root, to_version=v1, job_id="rs-undo")
    assert not log.schema_is_evolved()
    assert "score" not in log.table_schema().names
    got = validation_scan(table_root)
    assert "score" not in got.column_names
    # a v1-schema append lands again without merge_schema
    extra2 = build_transcripts(seed=6, n_convs=2)
    ingest_dataset(
        rd.from_arrow(extra2), table_root, job_id="rs-app2", validate=False,
    )
    assert validation_scan(table_root).num_rows == tx.num_rows + extra2.num_rows

def test_schema_b64_is_metadata_insensitive():
    """Recorded schemas are compared as raw b64 strings (ingest's
    heterogeneity dedup), so schema_to_b64 must strip schema- and
    field-level metadata — from_pandas vs from_arrow provenance must not
    read as a schema change (round-5 advice)."""
    plain = pa.schema([("a", pa.int64()), ("b", pa.string())])
    noisy = pa.schema(
        [
            pa.field("a", pa.int64(), metadata={"origin": "pandas"}),
            pa.field("b", pa.string()),
        ],
        metadata={b"pandas": b"{\"columns\": []}"},
    )
    assert schema_to_b64(noisy) == schema_to_b64(plain)
    assert schema_from_b64(schema_to_b64(noisy)).metadata is None


def test_metadata_only_block_mix_is_not_heterogeneous(ray_session, table_root):
    """An ingest mixing blocks with identical fields but different schema
    metadata must neither demand merge_schema nor flip schema_evolved
    (round-5 advice: the raw-b64 dedup previously flagged it)."""
    a = build_transcripts(n_convs=3)
    b = build_transcripts(seed=11, n_convs=3).replace_schema_metadata(
        {b"pandas": b"{}"}
    )
    ds = rd.from_arrow(a).union(rd.from_arrow(b))
    ingest_dataset(ds, table_root, job_id="meta-mix", validate=False)
    log = TableLog(table_root)
    assert not log.schema_is_evolved()
    assert validation_scan(table_root).num_rows == a.num_rows + b.num_rows


def test_merge_preserves_unflagged_recorded_schema(ray_session, table_root):
    """A table can carry a non-transcript recorded schema WITHOUT the
    evolved flag (overwrite ingest of homogeneous extra-column blocks);
    MERGE must conform rewrites to the recorded schema unconditionally —
    gating on schema_is_evolved silently dropped the extra columns from
    every rewritten file (round-5 advice, merge.py)."""
    from open_finance_lakehouse_ray.pipelines.merge import merge_into

    ext = _scored(build_transcripts(n_convs=6), 4.0, "convO")
    ingest_dataset(
        rd.from_arrow(ext), table_root, job_id="mo-base", mode="overwrite",
        validate=False, merge_schema=True,
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    assert not log.schema_is_evolved()  # homogeneous: no flag
    assert "score" in log.table_schema().names  # but schema recorded
    for strategy in ("broadcast", "shuffle"):
        upd = ext.slice(0, 3).set_column(
            3, "text", pa.array([f"upd-{strategy}"] * 3, pa.string())
        )
        merge_into(table_root, upd, job_id=f"mo-up-{strategy}", strategy=strategy)
        out = validation_scan(table_root).to_pandas()
        assert "score" in out.columns, strategy
        assert len(out) == ext.num_rows
        assert out["score"].eq(4.0).all(), strategy
        assert out["text"].eq(f"upd-{strategy}").sum() == 3


def test_legacy_restore_without_mirror_resolves_target(ray_session, table_root):
    """Logs written before restore mirrored schema/key identity carry
    restore commits with NO schema keys; the walkers must resolve from
    the restored-to version instead of hard-barriering to None/False —
    a legacy restore of an EVOLVED table must keep conforming its mixed
    file set (round-5 advice, txlog.py)."""
    import json as _json

    from open_finance_lakehouse_ray.pipelines.restore import restore

    tx = build_transcripts(n_convs=6)
    ingest_dataset(
        rd.from_arrow(tx), table_root, job_id="lr-base",
        summary={"keys_unique": True, "key_cols": ["conv_id", "turn_idx"]},
    )
    log = TableLog(table_root)
    ev = _scored(build_transcripts(seed=4, n_convs=2), 3.0)
    ingest_dataset(
        rd.from_arrow(ev), table_root, job_id="lr-ev",
        validate=False, merge_schema=True,
    )
    v_evolved = log.current_version()
    ingest_dataset(
        rd.from_arrow(build_transcripts(seed=8, n_convs=2)), table_root,
        job_id="lr-more", validate=False, merge_schema=True,
    )
    snap = restore(table_root, to_version=v_evolved, job_id="lr-undo")
    # simulate a legacy log: strip the mirrored identity off the commit
    path = log._snapshot_path(snap.version)
    with open(path) as f:
        d = _json.load(f)
    for k in ("schema_b64", "schema_evolved", "key_cols"):
        d["summary"].pop(k, None)
    with open(path, "w") as f:
        _json.dump(d, f)
    # the walkers resolve the TARGET's identity through restored_to
    assert log.schema_is_evolved()
    assert "score" in log.table_schema().names
    assert log.table_key_cols() == ("conv_id", "turn_idx")
    got = validation_scan(table_root)
    assert "score" in got.column_names  # mixed file set still conforms
    assert got.num_rows == tx.num_rows + ev.num_rows  # base + evolved append
