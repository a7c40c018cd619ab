"""Custom stateful streaming operator via ``applyInPandasWithState``
(the round brief's "custom stateful operators" bullet; north rule is
batch, so this is the incremental-ingest surface, not the primary
path).

Operator: **streaming exact dedup with running per-key counts** — for
a stream of documents keyed by text hash, emit each first-seen
document and maintain a seen-count in state.  The same semantics in
batch form is ``textdedup.exact_dedup``; the pytest asserts the
streaming run over a staged file source (availableNow) matches the
batch result.

The state handle holds one row (n_seen, keep_doc_id) per text_md5
group; timeouts are disabled (corpus dedup state is permanent by
design — at 10¹² scale this state lives in the checkpoint store
sharded by the groupBy key, which is exactly how the engine's
bucketed manifest shards batch lineage).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "text_md5 string, keep_doc_id bigint, n_seen bigint"
STATE_SCHEMA = "n_seen bigint, keep_doc_id bigint"


def _dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    n_seen, keep = state.get if state.exists else (0, None)
    for pdf in pdfs:
        ids = pdf["doc_id"].astype("int64")
        n_seen += len(ids)
        batch_min = int(ids.min())
        keep = batch_min if keep is None else min(keep, batch_min)
    state.update((int(n_seen), int(keep)))
    yield pd.DataFrame({"text_md5": [key[0]], "keep_doc_id": [keep],
                        "n_seen": [n_seen]})


def streaming_dedup(stream_df: DataFrame) -> DataFrame:
    """documents stream → per-text_md5 (keep_doc_id, n_seen) state."""
    keyed = stream_df.select(F.md5("text").alias("text_md5"), "doc_id")
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
