"""spark-submit primary resource for the validation CLI.

spark-submit runs a FILE, not a module, so this shim is the submitted
application; the engine itself ships on ``--py-files``:

    spark-submit --master <cluster> \\
        --py-files dist/sdv_spark.zip \\
        tools/submit_validate.py \\
        --table iceberg:cat.db.transcripts --ruleset rules.json \\
        --dim tools=iceberg:cat.db.tools --out parquet:/out --manifest /ckpt

All arguments pass through to ``safedata_validator_spark.cli.main`` (exit 0
pass / 1 fail / 2 manifest abort). The session built inside the CLI defers to
spark-submit's ``--master`` and conf (see ``session.build_session``).
"""

from __future__ import annotations

import sys

from safedata_validator_spark.cli import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
