"""Custom stateful streaming operator (SURVEY.md L: applyInPandasWithState).

A continuous per-host politeness gate: the stream of candidate fetches is
grouped by host; per-group state carries the last admitted fetch time and
an admitted counter; a candidate is admitted only if at least
``min_interval_s`` of *event time* passed since the group's last admit —
the streaming form of the reference's per-host rate limiter
(html_downloader.py:121-133), with the per-process wall-clock sleep
replaced by durable per-key state (checkpointable, partition-parallel,
rescales with shuffle partitions).

Works in both worlds: ``politeness_admit`` drives applyInPandasWithState
on a streaming frame; on a batch frame the identical policy is the G1
lag-window (plans/frontier_queries politeness_lag) — tests assert the two
agree.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "host_id int, url string, ts double, admitted boolean"
STATE_SCHEMA = "last_admit double, n_admitted long"


def _gate(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    min_interval_s: float,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        last_admit, n_admitted = state.get
    else:
        last_admit, n_admitted = float("-inf"), 0
    out = []
    rows = pd.concat(list(pdfs)).sort_values(["ts", "url"])
    for r in rows.itertuples(index=False):
        ok = r.ts - last_admit >= min_interval_s
        if ok:
            last_admit = float(r.ts)
            n_admitted += 1
        out.append((int(r.host_id), r.url, float(r.ts), bool(ok)))
    state.update((last_admit, n_admitted))
    yield pd.DataFrame(out, columns=["host_id", "url", "ts", "admitted"])


def politeness_admit(
    candidates: DataFrame, min_interval_s: float = 8.0
) -> DataFrame:
    """candidates(host_id int, url string, ts double) -> admitted stream.
    Streaming frames run with per-key durable state; update mode."""

    def fn(key, pdfs, state):
        return _gate(key, pdfs, state, min_interval_s)

    return candidates.groupBy("host_id").applyInPandasWithState(
        fn, OUT_SCHEMA, STATE_SCHEMA, "update",
        GroupStateTimeout.NoTimeout,
    )


def politeness_admit_batch(
    candidates: DataFrame, min_interval_s: float = 8.0
) -> DataFrame:
    """Batch reference of the same policy via applyInPandas (no state
    object; the fold runs over the whole group). Used to cross-check the
    streaming operator's cumulative behavior."""

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        last = float("-inf")
        out = []
        for r in pdf.sort_values(["ts", "url"]).itertuples(index=False):
            ok = r.ts - last >= min_interval_s
            if ok:
                last = float(r.ts)
            out.append((int(r.host_id), r.url, float(r.ts), bool(ok)))
        return pd.DataFrame(out, columns=["host_id", "url", "ts", "admitted"])

    return candidates.groupBy("host_id").applyInPandas(fold, OUT_SCHEMA)
