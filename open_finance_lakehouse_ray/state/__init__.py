from .txlog import (  # noqa: F401
    CommitConflict,
    FileEntry,
    Snapshot,
    StaleTableError,
    TableLog,
)
