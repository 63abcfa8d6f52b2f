"""Driver-side run-manifest validation — the engine analogue of the
reference's Summary sheet battery (summary.py:148-262 block definitions;
core/access/authors/keywords/doi/project-id blocks parsed and checked by
``_load_*`` methods, summary.py:264-336).

The Summary is O(10) rows of run metadata, so it is NOT a distributed
concern (SURVEY §1.1): a plain dict is validated on the driver before any
job is submitted, using the same format patterns the data rules use
(rules.patterns). Problems are returned as (severity, field, message)
tuples — ERRORs gate submission exactly like the reference's summary
errors count toward the dataset verdict (field.py:324-342); WARNINGs
mirror the reference's advisory checks.
"""

from __future__ import annotations

import re
from datetime import date, datetime
from typing import Any

from safedata_validator_spark.rules.model import ERROR, WARNING
from safedata_validator_spark.rules import patterns as P

ACCESS_LEVELS = ("open", "embargo", "restricted")

Problem = tuple[str, str, str]  # (severity, field, message)


def _blank(v: Any) -> bool:
    return v is None or (isinstance(v, str) and v.strip() == "")


def _parse_date(v: Any) -> date | None:
    if isinstance(v, datetime):
        return v.date()
    if isinstance(v, date):
        return v
    try:
        return date.fromisoformat(str(v))
    except ValueError:
        return None


def validate_manifest(
    manifest: dict[str, Any], today: date | None = None
) -> list[Problem]:
    """Validate a run manifest dict. Keys (all blocks optional except core):

    * ``title``, ``description`` — non-blank strings (core block);
    * ``access`` — one of open/embargo/restricted; ``embargo_date`` required
      and in the future when access='embargo' (reference summary.py access
      block; the reference checks now + embargo months);
    * ``authors`` — list of {name, email?, orcid?, affiliation?}: at least
      one; name must be 'last, first' (RE_NAME), email/orcid/doi formats per
      the shared pattern battery (summary.py:27-31);
    * ``keywords`` — non-blank, no [,;:] punctuation (the reference's
      NoPunctuation check on keywords);
    * ``doi`` — resolvable doi.org URL when present;
    * ``project_ids`` — list of ints (membership against the configured
      project dimension is a ref_integrity rule, not a manifest check);
    * ``tables`` — list of table names the run will validate (the analogue
      of the declared-worksheets block, checked against actual inputs by
      the caller).

    ``today`` is injectable for deterministic tests.
    """
    today = today or date.today()
    problems: list[Problem] = []

    def err(field: str, msg: str) -> None:
        problems.append((ERROR, field, msg))

    def warn(field: str, msg: str) -> None:
        problems.append((WARNING, field, msg))

    # -- core ----------------------------------------------------------------
    if _blank(manifest.get("title")):
        err("title", "title is required and must be non-blank")
    if _blank(manifest.get("description")):
        warn("description", "description is blank")

    # -- access / embargo ----------------------------------------------------
    access = manifest.get("access", "open")
    if access not in ACCESS_LEVELS:
        err("access", f"access must be one of {ACCESS_LEVELS}: {access!r}")
    if access == "embargo":
        emb = manifest.get("embargo_date")
        if _blank(emb):
            err("embargo_date", "embargo access requires embargo_date")
        else:
            d = _parse_date(emb)
            if d is None:
                err("embargo_date", f"not an ISO date: {emb!r}")
            elif d <= today:
                err("embargo_date", f"embargo date {d} is not in the future")
    elif not _blank(manifest.get("embargo_date")):
        warn("embargo_date", "embargo_date given but access is not 'embargo'")

    # -- authors -------------------------------------------------------------
    authors = manifest.get("authors") or []
    if not authors:
        err("authors", "at least one author is required")
    for i, a in enumerate(authors):
        fid = f"authors[{i}]"
        name = a.get("name")
        if _blank(name):
            err(f"{fid}.name", "author name is required")
        elif not re.match(P.RE_NAME, str(name)):
            err(f"{fid}.name", f"author name must be 'last, first': {name!r}")
        email = a.get("email")
        if not _blank(email) and not re.match(P.RE_EMAIL, str(email)):
            err(f"{fid}.email", f"not an email address: {email!r}")
        orcid = a.get("orcid")
        if not _blank(orcid) and not re.match(P.RE_ORCID, str(orcid)):
            err(f"{fid}.orcid", f"not an ORCID: {orcid!r}")

    # -- keywords ------------------------------------------------------------
    for i, k in enumerate(manifest.get("keywords") or []):
        if _blank(k):
            err(f"keywords[{i}]", "blank keyword")
        elif re.search(r"[,;:]", str(k)):
            err(f"keywords[{i}]", f"keyword contains punctuation [,;:]: {k!r}")

    # -- doi -----------------------------------------------------------------
    doi = manifest.get("doi")
    if not _blank(doi) and not re.match(P.RE_DOI, str(doi)):
        err("doi", f"not a doi.org URL: {doi!r}")

    # -- project ids ---------------------------------------------------------
    for i, pid in enumerate(manifest.get("project_ids") or []):
        if not isinstance(pid, int) or isinstance(pid, bool):
            err(f"project_ids[{i}]", f"project id must be an integer: {pid!r}")

    # -- tables --------------------------------------------------------------
    tables = manifest.get("tables")
    if tables is not None and not tables:
        warn("tables", "empty table list declared")
    return problems


def manifest_passed(problems: list[Problem]) -> bool:
    """Zero ERROR-severity problems — the reference's verdict rule applied
    to the manifest (field.py:324-342)."""
    return not any(sev == ERROR for sev, _, _ in problems)
