from safedata_validator_spark.rules.model import Rule, RuleSet, ERROR, WARNING

__all__ = ["Rule", "RuleSet", "ERROR", "WARNING"]
