"""safedata_validator_spark — a PySpark-native schema + constraint validation engine.

A from-scratch, Spark-first re-expression of the validation capabilities of
ImperialCollegeLondon/safedata_validator (reference at /root/reference, v3.0.2):
field-type conformance, NA/blank handling, categorical-level membership,
referential integrity against dimension tables (broadcast joins), composite-key
uniqueness, sequential/monotone ordering rules (salted windows), extents/range
bounds, single-scan per-column stat sketches, and KS/PSI distribution-drift
checks — over tables of multi-turn conversation/agent transcripts
(conv_id, turn_idx, role, text, tool, ts).

Design: declarative rule sets compile to Spark Column expressions fused into a
single scan; dimension lookups are broadcast anti/semi joins; ordering rules
use two-phase block+boundary evaluation to defuse hot-conversation skew;
violations and verdicts are DataFrames, not logs (cf. reference
logger.py:68-107 where the log stream is the verdict mechanism).
"""

from safedata_validator_spark.rules.model import Rule, RuleSet, ERROR, WARNING
from safedata_validator_spark.engine.validator import ValidationEngine, RunResult

__version__ = "0.1.0"

__all__ = [
    "Rule",
    "RuleSet",
    "ValidationEngine",
    "RunResult",
    "ERROR",
    "WARNING",
]
