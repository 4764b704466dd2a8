"""Custom stateful streaming operators via ``applyInPandasWithState``.

These are the Structured-Streaming twins of the engine's two stateful crawl
primitives (SURVEY §2.2 F3/F8):

* ``stateful_politeness_schedule`` — per-host fetch pacing whose state
  (last scheduled fetch + sequence counter) carries ACROSS micro-batches.
  The batch engine computes the same schedule with window functions inside
  one epoch (operators/politeness.py); a stream has no epoch boundary, so
  the host's pacing clock must live in the state store. One state row per
  host (~16 bytes) — at 10^8 hosts this is RocksDB-backed and partitioned
  by the same host key the shuffle already uses.

* ``stateful_seen_filter`` — first-occurrence-only URL admission: the
  streaming seen-set. One boolean state row per url_hash; unbounded by
  design (it IS the seen-set). The batch engine's persistent ``seen``
  table + anti-join stays the cross-restart source of truth; this operator
  serves the continuously-fed frontier case the reference's in-memory
  dedup dict (processor.py:349-361) handles for a single run.

Both emit in append mode and are deterministic given per-batch input
(rows within a (host, batch) are ordered by (priority, url) before pacing).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

POLITENESS_OUT_SCHEMA = (
    "host string, url string, seq int, scheduled_ts timestamp"
)
_POLITENESS_STATE_SCHEMA = "last_sched double, seq int"


def stateful_politeness_schedule(
    urls: DataFrame,
    delay_seconds: float = 2.0,
    host_col: str = "host",
    url_col: str = "url",
    arrival_col: str = "arrival_ts",
    priority_col: str = "priority",
) -> DataFrame:
    """F3 as a stateful stream: ``scheduled_ts = max(arrival, last + delay)``
    per host, with ``last``/``seq`` persisted in the state store so pacing
    continues seamlessly from one micro-batch to the next."""
    delay = float(delay_seconds)

    def pace(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (host,) = key
        last_sched: Any
        if state.exists:
            last_sched, seq = state.get
        else:
            last_sched, seq = None, 0
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values([priority_col, url_col], kind="mergesort")
            for u, t in zip(pdf[url_col], pdf[arrival_col]):
                ts = t.timestamp() if hasattr(t, "timestamp") else float(t)
                sched = ts if last_sched is None else max(ts, last_sched + delay)
                seq += 1
                last_sched = sched
                rows.append((host, u, seq, pd.Timestamp(sched, unit="s")))
        state.update((last_sched, seq))
        if rows:
            yield pd.DataFrame(
                rows, columns=["host", "url", "seq", "scheduled_ts"]
            )

    return urls.groupBy(host_col).applyInPandasWithState(
        pace,
        POLITENESS_OUT_SCHEMA,
        _POLITENESS_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def stateful_seen_filter(urls: DataFrame, key_col: str = "url_hash") -> DataFrame:
    """F8 as a stateful stream: admit each key exactly once across the whole
    stream lifetime (state = one boolean per key). Within-batch duplicates
    collapse to the first row (deterministic: groups arrive sorted by the
    shuffle, and only ``iloc[[0]]`` of the first non-empty chunk is kept)."""
    out_schema = urls.schema

    def first_only(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain (already admitted)
                pass
            return
        emitted = False
        for pdf in pdfs:
            if not emitted and len(pdf):
                state.update((True,))
                emitted = True
                yield pdf.iloc[[0]]

    return urls.groupBy(key_col).applyInPandasWithState(
        first_only,
        out_schema,
        "seen boolean",
        "append",
        GroupStateTimeout.NoTimeout,
    )


HH_OUT_SCHEMA = "shard int, item string, est bigint, delta bigint, batch_n bigint"
_HH_STATE_SCHEMA = "items array<string>, counts array<bigint>, delta bigint, batch_n bigint"


def stateful_heavy_hitters(
    items: DataFrame,
    capacity: int = 256,
    shard_col: str = "shard",
    item_col: str = "item",
    order_col: str | None = None,
) -> DataFrame:
    """Misra-Gries heavy hitters as a stateful stream — the streaming twin
    of ``operators/sketches.py::mg_heavy_hitters``. State per shard is the
    capacity-bounded (items, counts, delta) summary, carried ACROSS
    micro-batches in the state store; after each batch the shard re-emits
    its full summary stamped with ``batch_n`` (readers take the max
    batch_n per shard — the append-mode version of "current value").

    Shard = any stable partition of the item space (e.g. hash(item) % k)
    so every occurrence of an item lands on ONE state row and the merged
    estimate keeps the MG bound est ≤ true ≤ est + Σ shard deltas. State
    is ≤ capacity entries per shard regardless of stream length — the
    bounded-memory property is exactly why this runs where a streaming
    exact groupBy cannot.

    Determinism: rows within a (shard, batch) are processed in
    ``order_col`` order (falls back to item order) so the decrement
    sequence — and therefore the summary — is a pure function of the
    stream content, not of partition arrival races.
    """

    def step(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        if state.exists:
            its, cnts, delta, batch_n = state.get
            counters = dict(zip(list(its), [int(c) for c in cnts]))
            delta = int(delta)
            batch_n = int(batch_n)
        else:
            counters, delta, batch_n = {}, 0, 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            sort_by = (
                [order_col] if order_col and order_col in pdf.columns
                else [item_col]
            )
            pdf = pdf.sort_values(sort_by, kind="mergesort")
            for item in pdf[item_col]:
                if item is None:
                    continue
                c = counters.get(item)
                if c is not None:
                    counters[item] = c + 1
                elif len(counters) < capacity:
                    counters[item] = 1
                else:
                    m = min(counters.values())
                    counters = {
                        k: v - m for k, v in counters.items() if v > m
                    }
                    delta += m
                    counters[item] = 1
        batch_n += 1
        state.update(
            (list(counters.keys()),
             [int(v) for v in counters.values()],
             int(delta),
             int(batch_n))
        )
        yield pd.DataFrame(
            {
                "shard": [int(shard)] * len(counters),
                "item": list(counters.keys()),
                "est": [int(v) for v in counters.values()],
                "delta": [int(delta)] * len(counters),
                "batch_n": [int(batch_n)] * len(counters),
            }
        )

    return items.groupBy(shard_col).applyInPandasWithState(
        step,
        HH_OUT_SCHEMA,
        _HH_STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )

def stateful_seen_filter_ttl(
    urls: DataFrame,
    ttl_seconds: float,
    key_col: str = "url_hash",
) -> DataFrame:
    """F8 as a stateful stream with BOUNDED state: admit a key, then drop
    re-arrivals for ``ttl_seconds`` of processing-time inactivity, after
    which the state row is evicted and the key admits again.

    Two things fall out of the one TTL knob:

    * **State-store bound.** ``stateful_seen_filter`` holds one row per
      key forever — correct for a finite frontier, unbounded for an
      infinite stream. Here state size is the working set of keys seen
      within the last TTL window, not the stream lifetime; at 10^10
      URLs/day with a 7-day TTL that is the difference between a state
      store that grows without limit and one that plateaus.
    * **Recrawl semantics.** Re-admission after TTL IS the refresh crawl:
      a URL that goes quiet for the TTL is due again. The batch twin is
      the seen-table anti-join with a staleness predicate
      (``fetched_at > now - ttl``).

    Mechanics: ``GroupStateTimeout.ProcessingTimeTimeout`` — every
    arrival refreshes the key's timeout (sliding window of inactivity);
    Spark invokes the function once more for an expired key with
    ``state.hasTimedOut`` set, where the state row is removed. Expiry
    fires on the first micro-batch after the deadline, so eviction is
    eventual (never early) — the admission decision itself is exact.
    """
    out_schema = urls.schema
    ttl_ms = max(1, int(float(ttl_seconds) * 1000))

    def first_only(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()  # evict; next arrival of this key re-admits
            return
        fresh = not state.exists
        emitted = False
        for pdf in pdfs:
            if fresh and not emitted and len(pdf):
                emitted = True
                yield pdf.iloc[[0]]
        state.update((True,))
        state.setTimeoutDuration(ttl_ms)

    return urls.groupBy(key_col).applyInPandasWithState(
        first_only,
        out_schema,
        "seen boolean",
        "append",
        GroupStateTimeout.ProcessingTimeTimeout,
    )
