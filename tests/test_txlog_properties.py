"""Property-based txlog tests (hypothesis): random commit/expire
interleavings must preserve the structural invariants — every live file
exists on disk, no live file is ever deleted, row totals match the sum of
live entries, and replayed job ids never double-apply."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from open_finance_lakehouse_ray.state import FileEntry, TableLog

# an action is one of:
#   ("add", n_files)          append-commit n new files
#   ("rewrite", k)            replace up to k live files with one new file
#   ("replay", i)             re-issue the i-th previous commit's job id
#   ("expire", keep_last)     force-expire
ACTIONS = st.lists(
    st.one_of(
        st.tuples(st.just("add"), st.integers(1, 3)),
        st.tuples(st.just("rewrite"), st.integers(1, 4)),
        st.tuples(st.just("replay"), st.integers(0, 10)),
        st.tuples(st.just("expire"), st.integers(1, 3)),
    ),
    min_size=1,
    max_size=12,
)


@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(actions=ACTIONS)
def test_random_interleavings_preserve_invariants(tmp_path_factory, actions):
    root = str(tmp_path_factory.mktemp("prop"))
    log = TableLog(root)
    log.create()
    counter = 0
    job_ids: list[str] = []

    def new_file(rows: int) -> FileEntry:
        nonlocal counter
        counter += 1
        rel = os.path.join("data", f"f{counter:05d}.parquet")
        with open(os.path.join(root, rel), "w") as f:
            f.write("x" * rows)
        return FileEntry(path=rel, rows=rows, bytes=rows)

    expected_rows = 0
    for act in actions:
        if act[0] == "add":
            entries = [new_file(10) for _ in range(act[1])]
            jid = f"job-{len(job_ids)}"
            log.commit(operation="ingest", job_id=jid, added=entries)
            job_ids.append(jid)
            expected_rows += 10 * act[1]
        elif act[0] == "rewrite":
            if log.current_version() is None:
                continue
            live = log.files()
            victims = live[: act[1]]
            if not victims:
                continue
            rows = sum(e.rows for e in victims)
            jid = f"job-{len(job_ids)}"
            log.commit(
                operation="compact",
                job_id=jid,
                added=[new_file(rows)],
                removed_paths={e.path for e in victims},
                read_paths={e.path for e in victims},
                base_version=log.current_version(),
            )
            job_ids.append(jid)
        elif act[0] == "replay":
            if not job_ids:
                continue
            jid = job_ids[act[1] % len(job_ids)]
            before = log.current_version()
            got = log.find_commit(jid)
            log.commit(operation="ingest", job_id=jid, added=[new_file(99)])
            assert log.current_version() == before  # replay is a no-op
            assert got is not None
        elif act[0] == "expire":
            log.expire_snapshots(keep_last=act[1], retain_seconds=0.0)

        # ---- invariants after every action ----
        if log.current_version() is not None:
            live = log.files()
            for e in live:
                assert os.path.exists(os.path.join(root, e.path)), e.path
            assert sum(e.rows for e in live) == expected_rows
            assert log.snapshot().summary["rows"] == expected_rows
