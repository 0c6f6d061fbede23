"""Micro-batch / incremental execution.

The reference is a batch engine; its closest streaming analogs are the
interactive REPL that re-queries a resident index
(/root/reference/src/mode_query.cpp:269-315) and the
``queryLimit × numThreads`` micro-batch loop
(/root/reference/src/querying.h:1361-1385).  The graft therefore ships
**incremental batch dedup** (new pages folded into persisted
signature/edge/cluster state) rather than event-time streaming — a
``foreachBatch`` driver can feed :class:`IncrementalDedup` directly
from a Structured Streaming source.
"""

from .incremental import IncrementalDedup
from .stateful import streaming_exact_dedup, windowed_page_stats

__all__ = [
    "IncrementalDedup",
    "streaming_exact_dedup",
    "windowed_page_stats",
]
