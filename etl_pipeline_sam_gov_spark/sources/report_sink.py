"""Custom report sink as a Spark Python DataSource WRITER — the
write-side counterpart of ``sources.paginated`` (reader), completing
the Python DataSource surface the engine exposes. Generalizes the
reference's "emit a report artifact" step (Athena CSV results +
console report, ``lambda_function.py:160-171,183-201``) into a proper
two-phase-commit sink.

Protocol (the part that matters at scale): each TASK writes an
uncommitted temp file and returns a commit message; only the DRIVER's
``commit`` promotes temp files to final names and writes the
``_SUCCESS`` manifest, and ``abort`` removes temps — so a job that
dies mid-write leaves no partial output visible, exactly the contract
file committers implement on object stores."""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)


class _ReportCommit(WriterCommitMessage):
    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class ReportSinkWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator) -> _ReportCommit:
        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _ReportCommit(tmp, n)

    def commit(self, messages) -> None:
        # Final names are commit-unique (job uuid), so an append commit
        # can never clobber a previous commit's part files, and the
        # overwrite path can promote new parts BEFORE deleting old ones
        # — a crash mid-commit leaves a readable superset, never zero
        # committed output.
        job = uuid.uuid4().hex[:8]
        mine: set[str] = set()
        total = 0
        for i, m in enumerate(messages):
            final = os.path.join(self.path, f"part-{job}-{i:05d}.jsonl")
            os.replace(m.tmp_path, final)
            mine.add(os.path.basename(final))
            total += m.n_rows
        if self.overwrite:
            # also sweep stale _tmp-* orphans left by a driver that died
            # before abort() could run
            for name in os.listdir(self.path):
                stale = (
                    name.startswith("part-") or name.startswith("_tmp-")
                ) and name not in mine
                if stale:
                    os.remove(os.path.join(self.path, name))
            success = {"n_rows": total, "n_files": len(mine)}
        else:
            prev = {"n_rows": 0, "n_files": 0}
            success_path = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(success_path):
                with open(success_path) as f:
                    prev = json.load(f)
            success = {
                "n_rows": prev["n_rows"] + total,
                "n_files": prev["n_files"] + len(mine),
            }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(success, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class ReportSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "report_sink"

    def writer(self, schema, overwrite: bool) -> ReportSinkWriter:
        return ReportSinkWriter(self.options, overwrite)


def register(spark) -> None:
    spark.dataSource.register(ReportSinkDataSource)
