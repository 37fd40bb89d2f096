"""Pure-Python file-format codecs (no JVM, no external genomics libs).

Each module provides driver-side planning helpers and executor-side
parse/encode functions used by the DataSource V2 readers in ``sources/`` and
the sinks in ``sinks/``.
"""
