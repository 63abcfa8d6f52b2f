"""Run-manifest validation — the driver-side Summary-block analogue
(reference summary.py:148-262; tests mirror test_summary.py's good/bad block
matrices at dict level)."""

from __future__ import annotations

from datetime import date

from safedata_validator_spark.rules.manifest import manifest_passed, validate_manifest

TODAY = date(2026, 8, 16)

GOOD = {
    "title": "Transcripts 2026-08",
    "description": "agent runs",
    "access": "embargo",
    "embargo_date": "2027-01-01",
    "authors": [{"name": "Darwin, Charles", "email": "cd@example.org",
                 "orcid": "0000-0002-1825-0097"}],
    "keywords": ["agents", "validation"],
    "doi": "https://doi.org/10.5281/zenodo.1234",
    "project_ids": [1, 7],
    "tables": ["transcripts"],
}


def test_good_manifest_passes():
    problems = validate_manifest(GOOD, today=TODAY)
    assert problems == []
    assert manifest_passed(problems)


def test_bad_manifest_reports_each_block():
    bad = {
        "title": "  ",                       # blank core title
        "access": "secret",                  # unknown access level
        "embargo_date": "2020-01-01",        # warn: embargo date w/o embargo access
        "authors": [{"name": "Charles Darwin",   # not 'last, first'
                     "email": "nope",            # not an email
                     "orcid": "123"}],           # not an ORCID
        "keywords": ["ok", "bad,keyword", " "],  # punctuation / blank
        "doi": "doi:10.1/x",                 # not a doi.org URL
        "project_ids": [1, "seven"],         # non-integer id
    }
    problems = validate_manifest(bad, today=TODAY)
    fields = {f for _, f, _ in problems}
    assert {
        "title", "access", "authors[0].name", "authors[0].email",
        "authors[0].orcid", "keywords[1]", "keywords[2]", "doi",
        "project_ids[1]",
    } <= fields
    assert not manifest_passed(problems)


def test_embargo_requires_future_date():
    m = dict(GOOD, embargo_date="2026-01-01")
    problems = validate_manifest(m, today=TODAY)
    assert any("not in the future" in msg for _, f, msg in problems if f == "embargo_date")
    m2 = dict(GOOD, embargo_date=None)
    assert any(f == "embargo_date" for _, f, _ in validate_manifest(m2, today=TODAY))


def test_cli_manifest_gate(tmp_path):
    """A manifest with ERRORs aborts the CLI (exit 2) before any Spark work."""
    import json

    from safedata_validator_spark import cli

    bad_path = str(tmp_path / "m.json")
    with open(bad_path, "w") as fh:
        json.dump({"title": "", "authors": []}, fh)
    rc = cli.main(["--table", "/nonexistent", "--run-manifest", bad_path])
    assert rc == 2
