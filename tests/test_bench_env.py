"""Env-parsing pins for the scaling-bench harnesses: empty or partial
SDV_BENCH_* values must parse (an empty SDV_BENCH_PAIRS crashed
bench_scaling.py at import until round 4). Subprocess imports only — no
Spark, no measurement."""

from __future__ import annotations

import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

SCRIPTS = [
    "bench_scaling",
    "bench_scaling_dedup",
    "bench_scaling_cc",
    "bench_scaling_hygiene",
]


def _import_ok(module: str, env_overrides: dict) -> None:
    env = dict(os.environ, **env_overrides)
    out = subprocess.run(
        [sys.executable, "-c",
         f"import {module}; print(len({module}.PAIRS), len({module}.LEVELS))"],
        capture_output=True, text=True, env=env, cwd=str(REPO), timeout=60,
    )
    assert out.returncode == 0, f"{module}: {out.stderr[-500:]}"


def test_empty_pairs_parse():
    for module in SCRIPTS:
        _import_ok(module, {"SDV_BENCH_PAIRS": "", "SDV_BENCH_LEVELS": "4"})


def test_pairs_filtered_to_levels():
    # pairs referencing absent levels are dropped, not an error
    for module in SCRIPTS:
        _import_ok(
            module,
            {"SDV_BENCH_PAIRS": "1-4,2-8", "SDV_BENCH_LEVELS": "1,4"},
        )
