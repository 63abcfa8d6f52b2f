"""Streaming exact deduplication: first-seen-wins content dedup across
micro-batches.

The batch engine dedups a static corpus (functions.dedup); an ingest
pipeline needs the same decision AS DOCUMENTS ARRIVE — a doc is a duplicate
iff its content fingerprint was already seen in ANY earlier micro-batch (or
earlier in its own batch). Two surfaces:

* ``drop_exact_dups`` — the built-in operator route:
  ``dropDuplicates`` on the 64-bit fingerprint (unbounded state), or
  ``dropDuplicatesWithinWatermark`` when an event-time column + delay is
  given (state evicted past the watermark — the production shape for an
  endless stream, where "duplicate" only means "re-sent within the
  replay/retry horizon").
* ``stream_exact_dedup`` — keyed state via ``applyInPandasWithState``,
  emitting EVERY row with its verdict ``(id, is_dup, keep_id)`` instead of
  silently dropping: curation pipelines need the keeper lineage (which doc
  absorbed the dups) to update weights/provenance.

Scale shape: the fingerprint (normalize + xxhash64) is computed JVM-side
BEFORE the stateful operator — only 16-byte (fp, id) rows reach the Python
worker, and state per distinct fingerprint is one long. State volume is
bounded by distinct content; for unbounded retention pair with a compacted
state store or use the watermarked route. Deterministic: within a batch the
keeper is the minimum id, across batches the earlier batch wins —
independent of partitioning.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from safedata_validator_spark.functions.text import fingerprint64

#: output of the stateful dedup: per-arriving-row verdict
DEDUP_OUT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("is_dup", T.BooleanType()),
        T.StructField("keep_id", T.LongType()),
    ]
)

#: carried state per fingerprint: the keeper's id
DEDUP_STATE_SCHEMA = "keep_id long"


def drop_exact_dups(
    stream_df: DataFrame,
    text_col: str,
    ts_col: str | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Built-in streaming dedup: keep the first arrival of each normalized
    content fingerprint. With ``ts_col``, uses
    ``dropDuplicatesWithinWatermark`` so dedup state is evicted ``delay``
    past the watermark (bounded state — an endless stream must bound its
    replay horizon); without, ``dropDuplicates`` keeps state forever."""
    withfp = stream_df.withColumn("__fp", fingerprint64(F.col(text_col)))
    if ts_col is not None:
        return withfp.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(
            ["__fp"]
        ).drop("__fp")
    return withfp.dropDuplicates(["__fp"]).drop("__fp")


def stream_exact_dedup(
    stream_df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """First-seen-wins dedup verdicts across micro-batches →
    (id, is_dup, keep_id) for EVERY arriving row. The keeper of a
    fingerprint is the minimum id of the earliest micro-batch that carried
    it; all later arrivals (and same-batch larger ids) are duplicates of
    it. State (one long per distinct fingerprint) is checkpointed with the
    query — a restart resumes exactly."""

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if batch.empty:
            return
        ids = batch["id"].astype("int64").sort_values(ignore_index=True)
        if state.exists:
            (keep,) = state.get
        else:
            keep = int(ids.iloc[0])
            state.update((keep,))
        yield pd.DataFrame(
            {"id": ids, "is_dup": ids != keep, "keep_id": keep}
        )

    withfp = stream_df.select(
        fingerprint64(F.col(text_col)).alias("__fp"),
        F.col(id_col).cast("long").alias("id"),
    )
    return withfp.groupBy("__fp").applyInPandasWithState(
        fn,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
