"""Shared lazy, copy-safe row iterator for directory-tail stream sources.

PySpark's ``SimpleDataSourceStreamReader`` prefetch cache ``copy.copy()``s
the iterator returned by ``read()`` at planPartitions time (a plain
generator cannot be copied), and the cached original is never consumed
directly — so a copy that restarts the lazy scan over the same files
yields exactly the batch's rows while holding at most ONE file's parse
state in driver memory. A prebuilt list would materialize a whole
delivery (a multi-GB ``.fastq`` or ``.vcf.gz`` drop) on the driver.

``row_fn`` must be a module-level function (picklable by reference):
``row_fn(path, *extra) -> Iterator[tuple]``.
"""

from __future__ import annotations

from typing import Callable, Iterator


class LazyFileRows:
    def __init__(
        self,
        paths: list[str],
        row_fn: Callable[..., Iterator[tuple]],
        extra: tuple = (),
    ):
        self._paths = paths
        self._row_fn = row_fn
        self._extra = extra
        self._iter: Iterator[tuple] | None = None

    def __iter__(self) -> "LazyFileRows":
        return self

    def __next__(self) -> tuple:
        if self._iter is None:
            self._iter = (
                rec
                for p in self._paths
                for rec in self._row_fn(p, *self._extra)
            )
        return next(self._iter)

    def __copy__(self) -> "LazyFileRows":
        return LazyFileRows(self._paths, self._row_fn, self._extra)
