"""Caller-owned lifetime for DataFrames an operator persists internally.

Operators like ``tf_idf_top_terms`` and ``exact_substring_duplication``
persist an intermediate frame so one explode feeds two consumers. The
persist must outlive the returned (lazy) result, so the OPERATOR cannot
unpersist — the CALLER owns the lifetime. The legacy channel for that
handoff was a Python attribute on the returned DataFrame
(``out._tfidf_pairs_cache``), which silently vanishes on the first
``.filter()``/``.select()`` — Spark DataFrames do not propagate Python
attributes through transformations (r9/r10 ADVICE).

``CacheHandle`` is the explicit API: the caller constructs one, passes
it to the operator, and unpersists through it — valid no matter how the
result was transformed, usable as a context manager::

    with CacheHandle() as caches:
        out = tf_idf_top_terms(df, cache=caches).filter("rank = 1")
        out.collect()
    # the internal pairs frame is unpersisted here

A long-lived session issuing many such queries should scope each one;
one-shot jobs may skip the handle and let the persist die with the
session.
"""

from __future__ import annotations


class CacheHandle:
    """Collects operator-persisted DataFrames; unpersists them on demand
    or on context-manager exit. Idempotent: a second ``unpersist()`` is
    a no-op."""

    def __init__(self) -> None:
        self._frames: list = []

    def register(self, df):
        """Record a persisted frame (None is ignored); returns it."""
        if df is not None:
            self._frames.append(df)
        return df

    def unpersist(self, blocking: bool = False) -> None:
        frames, self._frames = self._frames, []
        for f in frames:
            f.unpersist(blocking)

    def __enter__(self) -> "CacheHandle":
        return self

    def __exit__(self, *exc) -> bool:
        self.unpersist()
        return False

    def __len__(self) -> int:
        return len(self._frames)
