"""Declarative rule model — the analogue of the reference's in-band descriptor
rows and field-type registry.

The reference declares per-column checks via descriptor rows at the top of each
data worksheet (``field_type`` etc., reference field.py:48-58) and dispatches to
``BaseField`` subclasses found by walking ``__subclasses__()``
(reference field.py:1323-1350). Here the schema is out-of-band: a ``RuleSet`` is
a plain declarative document (JSON-serialisable) and rule types dispatch through
an explicit registry (see rules.registry).

Severity semantics follow the reference verdict rule: a run passes iff there
are zero ERROR-severity failures (reference field.py:324-342); WARNINGs are
reported but do not fail the run (reference extent.py:144-156 soft bounds).
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field as dc_field
from typing import Any

ERROR = "ERROR"
WARNING = "WARNING"

SEVERITIES = (ERROR, WARNING)

#: Excel error sentinel strings (reference validators.py:28-39). Kept as a
#: data-quality sentinel set: these leak into text exports from spreadsheet
#: round-trips.
EXCEL_ERRORS = (
    "#DIV/0!",
    "#NAME?",
    "#N/A",
    "#NUM!",
    "#VALUE!",
    "#NULL!",
    "#REF!",
    "#SPILL!",
    "#CALC!",
)


@dataclass(frozen=True)
class Rule:
    """One declarative validation rule.

    ``rule_type`` selects a compiler from the registry; ``params`` are
    compiler-specific. ``column`` is the primary column checked (None for
    table-level rules such as uniqueness over a composite key).
    """

    rule_id: str
    rule_type: str
    column: str | None = None
    severity: str = ERROR
    params: dict[str, Any] = dc_field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.severity not in SEVERITIES:
            raise ValueError(f"severity must be one of {SEVERITIES}: {self.severity}")

    def to_dict(self) -> dict[str, Any]:
        return {
            "rule_id": self.rule_id,
            "rule_type": self.rule_type,
            "column": self.column,
            "severity": self.severity,
            "params": self.params,
        }


@dataclass
class RuleSet:
    """A named collection of rules over one table.

    ``key_cols`` identify a row for violation reporting (the transcript
    engine uses ``[conv_id, turn_idx]``). ``scope`` is a SQL expression
    evaluated per-row that assigns each row to a verdict partition (the
    analogue of the reference's per-worksheet error scoping,
    reference field.py:508/804); default is a single global scope.
    """

    name: str
    rules: list[Rule]
    key_cols: list[str]
    scope: str = "'all'"

    def __post_init__(self) -> None:
        ids = [r.rule_id for r in self.rules]
        dupes = {i for i in ids if ids.count(i) > 1}
        if dupes:
            raise ValueError(f"duplicate rule_ids: {sorted(dupes)}")

    def to_dict(self) -> dict[str, Any]:
        return {
            "name": self.name,
            "key_cols": self.key_cols,
            "scope": self.scope,
            "rules": [r.to_dict() for r in self.rules],
        }

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> RuleSet:
        return cls(
            name=d["name"],
            key_cols=list(d["key_cols"]),
            scope=d.get("scope", "'all'"),
            rules=[
                Rule(
                    rule_id=r["rule_id"],
                    rule_type=r["rule_type"],
                    column=r.get("column"),
                    severity=r.get("severity", ERROR),
                    params=r.get("params", {}),
                )
                for r in d["rules"]
            ],
        )

    def content_hash(self) -> str:
        """Stable hash of the rule set — recorded in the checkpoint manifest
        so a resume only skips partitions validated under the same rules."""
        canon = json.dumps(self.to_dict(), sort_keys=True, default=str)
        return hashlib.sha256(canon.encode()).hexdigest()[:16]
