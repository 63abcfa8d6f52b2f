"""End-to-end spark-submit --py-files deployment test.

The north rule requires the engine to run "via spark-submit --py-files on a
multi-executor cluster"; this test exercises that exact surface in-sandbox:
build the deterministic zip with tools/make_pyfiles.py, then launch REAL
``spark-submit`` subprocesses (fresh JVM, the engine importable ONLY from the
zip — PYTHONPATH is scrubbed) against parquet inputs and assert the CLI's
exit-code contract and JSON summary.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spark_submit() -> str:
    exe = shutil.which("spark-submit")
    if exe:
        return exe
    import pyspark

    cand = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    if os.path.exists(cand):
        return cand
    pytest.skip("spark-submit not found")


def _submit(zip_path: str, cwd: str, args: list[str]) -> subprocess.CompletedProcess:
    # Scrub PYTHONPATH: the engine must resolve from the --py-files zip, not
    # from the checked-out repo — that is what proves the packaged artifact
    # is complete (a missing module in the zip fails HERE, not on a cluster).
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    return subprocess.run(
        [
            _spark_submit(),
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "tools", "submit_validate.py"),
            *args,
        ],
        capture_output=True,
        text=True,
        cwd=cwd,
        env=env,
        timeout=600,
    )


def test_pyfiles_zip_is_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)

    z1 = build(str(tmp_path / "a.zip"))
    z2 = build(str(tmp_path / "b.zip"))
    with open(z1, "rb") as f1, open(z2, "rb") as f2:
        assert f1.read() == f2.read(), "zip build is not deterministic"

    import zipfile

    names = set(zipfile.ZipFile(z1).namelist())
    # every .py under the package must be a member (completeness = the
    # cluster sees the same module tree the repo tests see)
    for dirpath, dirnames, filenames in os.walk(
        os.path.join(REPO, "safedata_validator_spark")
    ):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), REPO)
                assert rel.replace(os.sep, "/") in names, f"{rel} missing from zip"


def test_spark_submit_pyfiles_end_to_end(spark, dims, tmp_path):
    from safedata_validator_spark.data.synth import transcripts_bad, transcripts_good
    from safedata_validator_spark.rules.presets import transcript_ruleset

    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from make_pyfiles import build
    finally:
        sys.path.pop(0)
    zip_path = build(str(tmp_path / "sdv_spark.zip"))

    good = str(tmp_path / "good")
    bad = str(tmp_path / "bad")
    tools_path = str(tmp_path / "tools_dim")
    aliases_path = str(tmp_path / "aliases_dim")
    transcripts_good(spark, n_convs=10, mean_turns=10, hot_factor=5).write.parquet(good)
    transcripts_bad(spark, n_convs=20, mean_turns=10).write.parquet(bad)
    dims["tools"].write.parquet(tools_path)
    dims["tool_aliases"].write.parquet(aliases_path)
    rs_path = str(tmp_path / "rules.json")
    with open(rs_path, "w") as fh:
        json.dump(transcript_ruleset().to_dict(), fh)

    common = [
        "--ruleset", rs_path,
        "--dim", f"tools={tools_path}",
        "--dim", f"tool_aliases={aliases_path}",
        "--no-stats",
    ]

    res_good = _submit(
        zip_path, str(tmp_path),
        ["--table", good, "--out", str(tmp_path / "out_g"), *common],
    )
    assert res_good.returncode == 0, res_good.stderr[-2000:]

    summary_path = str(tmp_path / "summary.json")
    res_bad = _submit(
        zip_path, str(tmp_path),
        ["--table", bad, "--json", summary_path, *common],
    )
    assert res_bad.returncode == 1, res_bad.stderr[-2000:]
    with open(summary_path) as fh:
        summary = json.load(fh)
    assert summary["status"] == "failed" and summary["n_errors"] > 0
    assert summary["ruleset_hash"]

    # the passing run's outputs are loadable back in THIS session
    assert spark.read.parquet(str(tmp_path / "out_g/verdicts")).count() > 0
