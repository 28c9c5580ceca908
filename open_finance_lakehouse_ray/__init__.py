"""open_finance_lakehouse_ray — a Ray-Data-native table-maintenance engine.

A from-scratch engine over Parquet tables of multi-turn conversation
transcripts ``(conv_id, turn_idx, role, text, tool, ts)`` providing:

- bin-packing small-file compaction
- Z-order / Hilbert clustering via 64-bit key interleave
- Avro-free manifest rewrite with per-file min/max stats
- reference-counted snapshot expire
- hash-partitioned MERGE INTO for late-arriving turn upserts

with the *semantics* (idempotent latest-wins upserts, transactional
resumable commits, scan invariance under maintenance) of
``rmonteiro-pereira/Open-Finance-LakeHouse`` (see SURVEY.md), re-expressed
as idiomatic Ray Data pipelines — never a port of its Spark/Polars/DuckDB
engines.
"""

__version__ = "0.1.0"

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
