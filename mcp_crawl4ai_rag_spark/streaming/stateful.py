"""Stateful streaming politeness: per-host token buckets over a link
stream via ``applyInPandasWithState``.

The batch engine enforces politeness round-by-round (a ``hosts`` table of
token columns refilled/charged per round — operators/politeness.py). This
is the continuous-mode equivalent the input hint's streaming axis calls
for: candidate URLs arrive as a stream, each host's bucket lives in the
streaming state store, and admission decisions are emitted in-stream.

Determinism contract (mirrors the round-based bucket, so it is testable
without a wall clock): rows carry a logical ``epoch`` (the upstream round /
window id) and a ``seq`` order key. Within a host group rows process in
(epoch, seq) order; the bucket refills ``rate`` tokens per epoch step
(capped at ``capacity``), each admitted URL charges one token. The same
rows produce the same admissions whether they arrive in one micro-batch or
many — state carries (tokens, last_epoch) across batches.

Scale shape: state is keyed by host (the same key the batch pop shuffles
on); the state store holds two doubles per live host — 10^7 hosts ≈ a few
hundred MB across executors. Hot hosts are not a skew problem here: the
per-group work is O(rows of that host in the batch), and the admission
decision is a vectorizable scan (charging is sequential by definition —
it is a prefix sum over epoch segments).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LINK_EPOCH_SCHEMA = "host string, url string, epoch int, seq long"
ADMIT_SCHEMA = "host string, url string, epoch int, seq long, admitted boolean"
STATE_SCHEMA = "tokens double, last_epoch int"


def make_admit_fn(capacity: float, rate: float, host_rates: dict | None = None):
    """Build the applyInPandasWithState group function.

    ``host_rates``: optional {host: (capacity, rate)} overrides (e.g. from
    robots crawl_delay via hosts_from_robots); others use the defaults.
    """
    overrides = dict(host_rates or {})

    def admit(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        cap, r = overrides.get(host, (capacity, rate))
        if state.exists:
            tokens, last_epoch = state.get
        else:
            tokens, last_epoch = float(cap), None
        parts = list(pdfs)
        batch = (
            pd.concat(parts, ignore_index=True) if parts else pd.DataFrame()
        )
        if len(batch) == 0:
            yield pd.DataFrame(
                columns=["host", "url", "epoch", "seq", "admitted"]
            )
            return
        batch = batch.sort_values(["epoch", "seq"], kind="mergesort")
        admitted = []
        for epoch, seq_url in zip(batch["epoch"], batch["url"]):
            e = int(epoch)
            if last_epoch is None:
                last_epoch = e
            elif e > last_epoch:
                tokens = min(float(cap), tokens + r * (e - last_epoch))
                last_epoch = e
            ok = tokens >= 1.0
            if ok:
                tokens -= 1.0
            admitted.append(ok)
        state.update((float(tokens), int(last_epoch)))
        out = batch[["host", "url", "epoch", "seq"]].copy()
        out["admitted"] = admitted
        yield out

    return admit


def token_bucket_admission(
    links: DataFrame,
    capacity: float = 4.0,
    rate: float = 2.0,
    host_rates: dict | None = None,
) -> DataFrame:
    """links (streaming, LINK_EPOCH_SCHEMA) → ADMIT_SCHEMA stream with
    per-host stateful token-bucket admission."""
    return links.groupBy("host").applyInPandasWithState(
        make_admit_fn(capacity, rate, host_rates),
        outputStructType=ADMIT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
