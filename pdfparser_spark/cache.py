"""Registry for persisted intermediates (ADVICE r01: long-lived drivers).

Operators that ``persist()`` a subplan so both sides of a self-join share
one computation (``dedup.lsh_candidate_pairs``, ``dedup.embedding_neardup``,
``Pipeline`` with ``work_dir=None``) cannot unpersist before returning —
the caller's *action* runs after the builder function, and dropping the
cache first would recompute the subplan once per join side.  Instead every
persisted handle is registered here, and a long-lived driver (the bench
harness between timed runs, a notebook session running many pipelines)
calls :func:`release_cached` once the results it needs are materialized —
bounding cache growth without breaking the single-execution guarantee.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def register_persisted(df: DataFrame) -> DataFrame:
    _PERSISTED.append(df)
    return df


def unregister(df: DataFrame) -> None:
    """Remove a handle released elsewhere (e.g. Pipeline.release()) so the
    registry stays bounded and never re-unpersists a dead handle."""
    try:
        _PERSISTED.remove(df)
    except ValueError:
        pass


def release_cached() -> int:
    """Unpersist every registered handle; returns how many were released."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
