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
PERMIT_TYPES = {"research", "export", "ethics"}
#: the reference's reserved metadata sheet names (summary.py:716-718)
STANDARD_SHEETS = {"Summary", "GBIFTaxa", "NCBITaxa", "Taxa", "Locations"}

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
    * ``funding`` — list of {body, type, ref?, url?} (summary.py:599-615);
    * ``permits`` — list of {type, authority, number}; type restricted to
      research/export/ethics (summary.py:542-564);
    * ``external_files`` — list of {file, description}; names must not
      contain whitespace (summary.py:672-699);
    * ``temporal_extent`` {start, end} / ``geographic_extent``
      {west, east, south, north} — declared extents (summary.py:617-670);
      congruence against data-computed extents is the engine's
      extent_congruence rule (see ``declared_extent_rules``);
    * ``tables`` — the declared-worksheets block: names or
      {name, title, description, external?} dicts; checked against actual
      inputs by ``check_declared_tables`` (summary.py:699-775).

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

    # -- funding (reference summary.py:599-615: body + type mandatory,
    # reference number and URL optional) ---------------------------------------
    for i, fnd in enumerate(manifest.get("funding") or []):
        fid = f"funding[{i}]"
        if _blank(fnd.get("body")):
            err(f"{fid}.body", "funding body is required")
        if _blank(fnd.get("type")):
            err(f"{fid}.type", "funding type is required")
        url = fnd.get("url")
        if not _blank(url) and not re.match(r"^https?://\S+$", str(url)):
            warn(f"{fid}.url", f"funding link does not look like a URL: {url!r}")

    # -- permits (reference summary.py:542-564: type/authority/number all
    # mandatory; type restricted to research/export/ethics) --------------------
    for i, pm in enumerate(manifest.get("permits") or []):
        fid = f"permits[{i}]"
        ptype = pm.get("type")
        if _blank(ptype):
            err(f"{fid}.type", "permit type is required")
        elif str(ptype).lower() not in PERMIT_TYPES:
            err(f"{fid}.type", f"unknown permit type (allowed {sorted(PERMIT_TYPES)}): {ptype!r}")
        if _blank(pm.get("authority")):
            err(f"{fid}.authority", "permit authority is required")
        if _blank(pm.get("number")):
            err(f"{fid}.number", "permit number is required")

    # -- external files (reference summary.py:672-699: file + description
    # mandatory; file names must not contain whitespace) ------------------------
    external_names: set[str] = set()
    for i, ex in enumerate(manifest.get("external_files") or []):
        fid = f"external_files[{i}]"
        fname = ex.get("file")
        if _blank(fname):
            err(f"{fid}.file", "external file name is required")
        else:
            if re.search(r"\s", str(fname)):
                err(f"{fid}.file", f"external file names must not contain whitespace: {fname!r}")
            external_names.add(str(fname))
        if _blank(ex.get("description")):
            err(f"{fid}.description", "external file description is required")

    # -- declared extents (validated here; congruence against data-computed
    # extents is the engine's extent_congruence rule — reference summary
    # _load_temporal_extent / _load_geographic_extent, summary.py:617-670) -----
    te = manifest.get("temporal_extent")
    if te is not None:
        start, end = _parse_date(te.get("start")), _parse_date(te.get("end"))
        if start is None or end is None:
            err("temporal_extent", f"start/end must be ISO dates: {te!r}")
        elif start > end:
            err("temporal_extent", "start date is after end date")
    ge = manifest.get("geographic_extent")
    if ge is not None:
        vals = {k: ge.get(k) for k in ("west", "east", "south", "north")}
        if not all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in vals.values()):
            err("geographic_extent", f"west/east/south/north must all be numeric: {ge!r}")
        else:
            if vals["south"] > vals["north"]:
                err("geographic_extent", "south limit is greater than north limit")
            if vals["west"] > vals["east"]:
                err("geographic_extent", "west limit is greater than east limit")

    # -- tables (worksheet block analogue — reference summary.py:699-775):
    # entries are names or {name, title, description, external?} dicts ---------
    tables = manifest.get("tables")
    if tables is not None and not tables and not external_names:
        err("tables", "no tables or external files declared - no data")
    elif tables is not None and not tables:
        warn("tables", "only external file descriptions provided")
    for i, t in enumerate(tables or []):
        fid = f"tables[{i}]"
        entry = t if isinstance(t, dict) else {"name": t}
        name = entry.get("name")
        if _blank(name):
            err(f"{fid}.name", "table name is required")
        elif str(name) in STANDARD_SHEETS:
            err(f"{fid}.name", f"do not declare standard metadata sheets as data tables: {name!r}")
        if isinstance(t, dict):
            if _blank(entry.get("title")):
                err(f"{fid}.title", "table title is required")
            if _blank(entry.get("description")):
                err(f"{fid}.description", "table description is required")
        ext = entry.get("external")
        if not _blank(ext) and str(ext) not in external_names:
            err(f"{fid}.external", f"table linked to undeclared external file: {ext!r}")
    return problems


def declared_table_names(manifest: dict[str, Any]) -> set[str]:
    """Names declared in the manifest's tables block (string or dict form)."""
    return {
        str(t.get("name") if isinstance(t, dict) else t)
        for t in (manifest.get("tables") or [])
    }


def check_declared_tables(
    manifest: dict[str, Any], actual_tables: list[str]
) -> list[Problem]:
    """Cross-reference declared tables against the run's actual inputs —
    the engine form of the reference's worksheet checks (summary.py:699-775):
    declared-but-absent is an error ('Data worksheet X not found'), present-
    but-undocumented is an error ('Undocumented sheets found in workbook')."""
    problems: list[Problem] = []
    declared = declared_table_names(manifest)
    actual = set(actual_tables)
    for name in sorted(declared - actual):
        problems.append((ERROR, f"tables.{name}", f"declared table {name!r} not found in inputs"))
    for name in sorted(actual - declared - STANDARD_SHEETS):
        problems.append((ERROR, f"tables.{name}", f"undocumented input table: {name!r}"))
    return problems


_DATE_ONLY = re.compile(r"^\d{4}-\d{2}-\d{2}$")


def _inclusive_end(end: str) -> str:
    """Date-only declared ends are inclusive of the whole day (reference
    semantics: temporal extents are dates). '2024-12-31' → '2024-12-31
    23:59:59.999999'; anything carrying a time component passes through."""
    return f"{end} 23:59:59.999999" if _DATE_ONLY.match(end) else end


def declared_extent_rules(
    manifest: dict[str, Any],
    temporal_column: str | None = None,
    lat_column: str | None = None,
    lon_column: str | None = None,
    advisory: bool = False,
) -> list:
    """Compile the manifest's declared extents into extent_congruence rules
    over the named data columns — the bridge between the Summary-declared
    extents and the engine's data-computed ones (reference final_checks,
    field.py:283-318). Returns [] when the manifest declares nothing."""
    from safedata_validator_spark.rules.model import ERROR as SEV_ERROR
    from safedata_validator_spark.rules.model import Rule

    rules = []
    te = manifest.get("temporal_extent")
    if te is not None and temporal_column:
        start, end = te.get("start"), te.get("end")
        rules.append(
            Rule(
                f"{temporal_column}.extent_congruence",
                "extent_congruence",
                column=temporal_column,
                severity=SEV_ERROR,
                params={
                    "declared_lo": None if start is None else str(start),
                    # a date-only declared end ('2024-12-31') compared
                    # against a timestamp column would coerce to midnight and
                    # falsely flag data later on the declared end day — the
                    # reference's comparison is date-granular inclusive
                    # (summary.py temporal extents carry dates, not times),
                    # so extend a date-only end to the last instant of that
                    # day before it meets the timestamp min/max
                    "declared_hi": None if end is None else _inclusive_end(str(end)),
                    "advisory": advisory,
                },
            )
        )
    ge = manifest.get("geographic_extent")
    if ge is not None:
        for col, lo_k, hi_k in ((lat_column, "south", "north"), (lon_column, "west", "east")):
            if col:
                rules.append(
                    Rule(
                        f"{col}.extent_congruence",
                        "extent_congruence",
                        column=col,
                        severity=SEV_ERROR,
                        params={
                            "declared_lo": ge.get(lo_k),
                            "declared_hi": ge.get(hi_k),
                            "advisory": advisory,
                        },
                    )
                )
    return rules


def check_doi_resolves(doi: str, timeout: float = 5.0) -> Problem | None:
    """Network-bound DOI resolution check (reference summary.py:585-594,
    gated behind ``--validate_doi`` exactly like the reference CLI flag).
    Returns None when the DOI resolves; a WARNING problem when the network
    is unreachable (graceful skip — sandboxes and air-gapped clusters must
    not fail validation on connectivity); an ERROR problem when the resolver
    answers and the DOI does not exist."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(str(doi), method="HEAD")
    try:
        with urllib.request.urlopen(req, timeout=timeout):
            return None
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return (ERROR, "doi", f"DOI does not resolve: {doi}")
        return (WARNING, "doi", f"DOI check inconclusive (HTTP {e.code}): {doi}")
    except Exception as e:  # URLError, socket timeout, no DNS, …
        return (WARNING, "doi", f"DOI check skipped (network unavailable: {e}): {doi}")


def manifest_passed(problems: list[Problem]) -> bool:
    """Zero ERROR-severity problems — the reference's verdict rule applied
    to the manifest (field.py:324-342)."""
    return not any(sev == ERROR for sev, _, _ in problems)
