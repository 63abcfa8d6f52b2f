from safedata_validator_spark.engine.validator import ValidationEngine, RunResult

__all__ = ["ValidationEngine", "RunResult"]
