"""Format-check patterns + preset rule builders — the reference's Summary
regex battery (summary.py:27-31) and R-name grammar (validators.py:50-95)
re-expressed as engine rules (each compiles to a JVM-side predicate through
the 'pattern' / 'expr' rule types; SURVEY §2.2 F14-F16).
"""

from __future__ import annotations

from safedata_validator_spark.rules.model import ERROR, WARNING, Rule

#: 'last, first' author-name shape (reference RE_NAME, summary.py:30).
RE_NAME = r"^[^,]+, ?[^,]+$"

#: Loose email shape (reference RE_EMAIL, summary.py:29).
RE_EMAIL = r"^\S+@\S+\.\S+$"

#: ORCID: 4x4 digit groups, last char may be X (reference RE_ORCID,
#: summary.py:28 — unanchored there; anchored here so a rule rejects
#: trailing garbage too).
RE_ORCID = r"^\d{4}-\d{4}-\d{4}-\d{3}[\dX]$"

#: DOI as a resolvable URL prefix (reference RE_DOI, summary.py:27).
RE_DOI = r"^https?://(dx\.)?doi\.org/.+"

#: Degrees/minutes/seconds smell in coordinate strings (reference RE_DMS,
#: validators.py:21; used as a WARNING on failed lat/lon parses,
#: field.py:1814-1819).
RE_DMS_SMELL = "[°'\"dms’”]"

#: R reserved words (reference validators.py:53-74).
R_RESERVED = (
    "if", "else", "repeat", "while", "function", "for", "in", "next",
    "break", "TRUE", "FALSE", "NULL", "Inf", "NaN", "NA", "NA_integer_",
    "NA_real_", "NA_complex_", "NA_character_",
)


def name_format_rule(rule_id: str, column: str, severity: str = ERROR) -> Rule:
    return Rule(rule_id, "pattern", column=column, severity=severity,
                params={"regex": RE_NAME})


def email_format_rule(rule_id: str, column: str, severity: str = ERROR) -> Rule:
    return Rule(rule_id, "pattern", column=column, severity=severity,
                params={"regex": RE_EMAIL})


def orcid_format_rule(rule_id: str, column: str, severity: str = ERROR) -> Rule:
    return Rule(rule_id, "pattern", column=column, severity=severity,
                params={"regex": RE_ORCID})


def doi_format_rule(rule_id: str, column: str, severity: str = ERROR) -> Rule:
    return Rule(rule_id, "pattern", column=column, severity=severity,
                params={"regex": RE_DOI})


def dms_smell_rule(rule_id: str, column: str, severity: str = WARNING) -> Rule:
    """Coordinate-looking strings with DMS punctuation (negated pattern:
    matching IS the violation)."""
    return Rule(rule_id, "pattern", column=column, severity=severity,
                params={"regex": RE_DMS_SMELL, "negate": True})


def r_name_rule(rule_id: str, column: str, severity: str = ERROR) -> Rule:
    """Valid R object name (reference valid_r_name, validators.py:50-95):
    word/dot characters only, ≤ 10000 chars, not starting with '_' or
    '.<digit>', not a reserved word, not the ellipsis forms '...'/'..<n>'.
    (The reference's ellipsis regex RE_R_ELLIPSIS at validators.py:23 spells
    ``^\\\\.{2}`` — a literal backslash — which can never match an R name;
    the documented intent, R's reserved ``...``/``..1`` forms, is what this
    rule implements. Deliberate deviation, like the extent-init bug note.)"""
    reserved = ", ".join(f"'{w}'" for w in R_RESERVED)
    sql = (
        f"`{column}` IS NOT NULL AND length(`{column}`) <= 10000 "
        f"AND `{column}` RLIKE '^[\\\\w.]+$' "
        f"AND NOT `{column}` RLIKE '^_' AND NOT `{column}` RLIKE '^\\\\.[0-9]' "
        f"AND NOT `{column}` RLIKE '^\\\\.\\\\.[0-9]+$' AND `{column}` != '...' "
        f"AND `{column}` NOT IN ({reserved})"
    )
    return Rule(rule_id, "expr", column=column, severity=severity,
                params={"sql": sql, "message": f"{column} is not a valid R object name"})
