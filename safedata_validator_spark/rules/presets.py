"""Canonical transcript rule set — the engine's analogue of the reference's
full per-worksheet check battery, mapped onto the transcript schema
(conv_id, turn_idx, role, text, tool, ts) per FIXTURES.md §1.

Severity mapping follows the reference: structural/type/membership problems
are ERRORs; NA sentinels, aliases and soft-bound breaches are WARNINGs
(reference field.py:1435-1436 NA warning, locations.py:469 alias warning,
extent.py:144-156 soft bounds).
"""

from __future__ import annotations

from safedata_validator_spark.data.synth import ALLOWED_START, ALLOWED_TRANSITIONS, ROLES
from safedata_validator_spark.rules.model import ERROR, WARNING, Rule, RuleSet

HARD_TS_BOUNDS = ("2020-01-01 00:00:00", "2031-01-01 00:00:00")
SOFT_TS_BOUNDS = ("2022-01-01 00:00:00", "2030-01-01 00:00:00")


def transcript_ruleset(
    scope: str = "'all'",
    block_size: int = 4096,
    declared_ts_extent: tuple[str, str] | None = None,
    extent_advisory: bool = False,
) -> RuleSet:
    """``declared_ts_extent`` wires a manifest-declared temporal extent into a
    declared-vs-computed congruence rule (reference final_checks,
    field.py:283-318); ``extent_advisory`` additionally emits the reference's
    both-populated WARNING ("may be deliberate")."""
    extra = []
    if declared_ts_extent is not None:
        extra.append(
            Rule(
                "ts.extent_congruence",
                "extent_congruence",
                column="ts",
                severity=ERROR,
                params={
                    "declared_lo": declared_ts_extent[0],
                    "declared_hi": declared_ts_extent[1],
                    "advisory": extent_advisory,
                },
            )
        )
    return RuleSet(
        name="transcripts.default",
        key_cols=["conv_id", "turn_idx"],
        scope=scope,
        rules=[
            # --- row-level (fused into one scan) ---------------------------
            Rule("text.not_blank", "not_blank", column="text", severity=ERROR),
            Rule("text.not_na", "not_na", column="text", severity=WARNING),
            Rule("text.no_excel_error", "no_excel_error", column="text", severity=ERROR),
            Rule("role.not_padded", "not_padded", column="role", severity=ERROR),
            Rule("role.in_levels", "in_levels", column="role", severity=ERROR,
                 params={"levels": ROLES}),
            Rule("conv_id.not_blank", "not_blank", column="conv_id", severity=ERROR),
            Rule("turn_idx.positive", "expr", column="turn_idx", severity=ERROR,
                 params={"sql": "turn_idx IS NOT NULL AND turn_idx >= 1",
                         "message": "turn_idx must be a positive integer"}),
            Rule("tool.requires_tool_role", "expr", column="tool", severity=ERROR,
                 params={"sql": "tool IS NULL OR role IN ('tool','assistant')",
                         "message": "tool set on a non-tool/assistant turn"}),
            # reference F19 blank-row detection (field.py:685-709): a turn
            # whose value columns are ALL blank is structurally empty
            Rule("row.not_all_blank", "expr", column="text", severity=ERROR,
                 params={"sql": ("NOT (coalesce(trim(role),'') = '' AND "
                                 "coalesce(trim(text),'') = '' AND tool IS NULL)"),
                         "message": "all value columns blank (empty row)"}),
            # --- plan-level -------------------------------------------------
            Rule("key.unique", "unique_key", severity=ERROR,
                 params={"keys": ["conv_id", "turn_idx"]}),
            Rule("turn_idx.sequential", "sequential", column="turn_idx", severity=ERROR,
                 params={"group": "conv_id", "order": "turn_idx"}),
            Rule("ts.monotone", "monotone", column="ts", severity=ERROR,
                 params={"group": "conv_id", "order": "turn_idx",
                         "block_size": block_size}),
            Rule("role.grammar", "transition_grammar", column="role", severity=ERROR,
                 params={"group": "conv_id", "order": "turn_idx",
                         "transitions": ALLOWED_TRANSITIONS,
                         "allowed_start": ALLOWED_START,
                         "block_size": block_size}),
            Rule("role.levels_audit", "levels_audit", column="role", severity=ERROR,
                 params={"levels": ROLES, "unused_severity": WARNING}),
            Rule("tool.ref_integrity", "ref_integrity", column="tool", severity=ERROR,
                 params={"dim": "tools", "dim_key": "tool",
                         "alias_dim": "tool_aliases", "alias_key": "alias",
                         "alias_primary": "tool"}),
            Rule("ts.extent_hard", "extent", column="ts", severity=ERROR,
                 params={"lo": HARD_TS_BOUNDS[0], "hi": HARD_TS_BOUNDS[1]}),
            Rule("ts.extent_soft", "extent", column="ts", severity=WARNING,
                 params={"lo": SOFT_TS_BOUNDS[0], "hi": SOFT_TS_BOUNDS[1]}),
        ] + extra,
    )
