"""Streaming sketch maintenance — distinct-count (HLL) and frequency
(count-min) sketches folded per micro-batch through the shared
exactly-once commit protocol (streaming/commit.py).

Because both sketches merge EXACTLY (register-wise max / element-wise
sum, proven in batch tests), the committed streaming sketch equals the
batch sketch of every row ever seen — no approximation is introduced by
streaming, only by the sketch itself. Per-batch cost is one map-side
combined aggregation of the batch + a merge keyed on the bounded
register/counter table; raw history is never re-read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..functions import countmin as _cm
from ..functions import sketch as _hll
from .commit import read_table, start_merge_stream

read_sketch = read_table


def start_hll_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    col: str,
    p: int = 8,
):
    """Maintain `table_dir` as the HLL register table of every value ever
    seen on `col`; returns the StreamingQuery."""

    def merge_batch(committed, batch_df):
        delta = _hll.hll_registers(batch_df, col, p)
        if committed is None:
            return delta
        return _hll.hll_merge(committed, delta)

    return start_merge_stream(stream_df, table_dir, checkpoint_dir, merge_batch)


def start_cms_stream(
    stream_df: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    col: str,
    w: int = _cm.DEFAULT_W,
    d: int = _cm.DEFAULT_D,
):
    """Maintain `table_dir` as the count-min counter table over `col`."""

    def merge_batch(committed, batch_df):
        delta = _cm.cms_build(batch_df, col, w, d)
        if committed is None:
            return delta
        return _cm.cms_merge(committed, delta)

    return start_merge_stream(stream_df, table_dir, checkpoint_dir, merge_batch)
