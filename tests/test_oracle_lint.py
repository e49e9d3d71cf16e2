"""Oracle-portability lint as a GATE: no registered oracle may contain the
engine-version-sensitive constructs that produced every driver-red row in
rounds 1-5 (round(x,n) on compared doubles, HUGEINT/DECIMAL outputs, float
division feeding integer casts). tools/lint_oracles.py is the runner; this
test keeps it green at HEAD."""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_lint():
    spec = importlib.util.spec_from_file_location(
        "lint_oracles", os.path.join(_REPO, "tools", "lint_oracles.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["lint_oracles"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_all_oracles_lint_clean():
    lint = _load_lint()
    from fries_flink_spark.registry import load_all

    con = duckdb.connect()
    for t in lint.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{lint.SF_DIR}/{t}.parquet'"
        )
    flagged = {}
    n = 0
    for name, spec in sorted(load_all().items()):
        if not spec.oracle:
            continue
        n += 1
        flags = lint.lint_one(con, name, spec.oracle)
        if flags:
            flagged[name] = flags
    assert n > 200
    assert not flagged, f"oracle-portability flags: {flagged}"
