"""Custom stateful streaming operator: cross-batch capture assembly via
``applyInPandasWithState``.

The reference assembles a 5-band MicaSense capture only when all 5 band
files are present in one directory scan (src/pipeline/main.py:91-99 —
incomplete sets are demoted to regular processing and re-scanned next
poll). In a stream, a capture's bands arrive across micro-batches and out
of order; "wait until the set is complete" is per-key mutable state —
exactly what Structured Streaming's ``applyInPandasWithState`` models
(SURVEY §2.9 / build-brief custom stateful operators):

- key: ``capture_id``; state: the bitmask of bands seen so far + first/last
  arrival timestamps;
- a capture EMITS exactly once, in the micro-batch where its 5th band
  lands; every emitted key (complete OR timed out) keeps a TOMBSTONE
  state for one further timeout period so late/replayed band rows cannot
  resurrect it and emit a second row;
- stale incomplete captures time out via ``GroupStateTimeout.
  ProcessingTimeTimeout`` and emit a ``status='timeout'`` row carrying the
  bands they did get (the reference's "incomplete set" warning,
  main.py:98-99); the tombstone then expires silently, bounding the store.
  Exactly-once holds for any late data arriving within the tombstone
  window; beyond it (hours-late replays) semantics degrade to
  at-least-once, as with any bounded dedup state.

Scale shape: state is shuffled by uniform high-cardinality ``capture_id``
(the same skew-free key the batch assembly groups on), one tiny bitmask
per in-flight capture — store size ∝ incomplete captures, not corpus.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "capture_id string, n_bands int, bands string, status string"
)
STATE_SCHEMA = "mask int, n int"
FULL_MASK = 0b11111  # bands 1..5
TOMBSTONE = -1  # n-sentinel: key already emitted (complete or timeout)


def _assemble(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    # state: (mask, n); n == TOMBSTONE marks an already-emitted key
    # (complete OR timed out) whose state lingers one timeout period so
    # late/replayed bands cannot resurrect it and emit a second row
    if state.hasTimedOut:
        mask, n = state.get
        if n == TOMBSTONE:
            state.remove()  # quiet tombstone expires silently — state freed
            return
        bands = ",".join(str(b) for b in range(1, 6) if mask & (1 << (b - 1)))
        # emit the timeout row, then tombstone (NOT remove) the key
        state.update((mask, TOMBSTONE))
        state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame(
            {
                "capture_id": [key[0]],
                "n_bands": [n],
                "bands": [bands],
                "status": ["timeout"],
            }
        )
        return
    mask, n = state.get if state.exists else (0, 0)
    if n == TOMBSTONE:
        # late data on an emitted key: swallow, extend the tombstone
        state.update((mask, TOMBSTONE))
        state.setTimeoutDuration(60 * 60 * 1000)
        return
    for pdf in pdfs:
        for b in pdf["band"]:
            b = int(b)
            if 1 <= b <= 5 and not mask & (1 << (b - 1)):
                mask |= 1 << (b - 1)
                n += 1
    if mask == FULL_MASK:
        state.update((FULL_MASK, TOMBSTONE))
        state.setTimeoutDuration(60 * 60 * 1000)
        yield pd.DataFrame(
            {
                "capture_id": [key[0]],
                "n_bands": [5],
                "bands": ["1,2,3,4,5"],
                "status": ["complete"],
            }
        )
    else:
        state.update((mask, n))
        state.setTimeoutDuration(60 * 60 * 1000)  # 1 h — reference poll ×120


def stateful_capture_assembly(band_stream: DataFrame) -> DataFrame:
    """band rows (capture_id string, band int, …) → one completion row per
    capture, emitted in the micro-batch its 5th band arrives."""
    return (
        band_stream.groupBy("capture_id")
        .applyInPandasWithState(
            _assemble,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
