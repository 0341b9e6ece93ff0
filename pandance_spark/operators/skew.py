"""Skew-mitigation utilities.

AQE's skew-join splitting (on by default in this engine's sessions)
handles most batch sort-merge skew at runtime.  ``salted_join`` is the
explicit tool for the cases AQE cannot rewrite: stream-stream and
stream-static shuffle joins, skewed keys feeding stateful operators,
or engines/pipelines where AQE is off.

Mechanics: the probe side's hot keys get a deterministic salt in
[0, n_salts) derived from the whole row, splitting one hot key's rows
across ``n_salts`` reducers; the build side replicates each row
``n_salts`` times (once per salt value).  The join key becomes
(key, salt) — same result set, bounded per-partition fan-in, build-side
cost multiplied by ``n_salts`` (so salt the SMALLER side's replication
against the LARGER side's skew).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Union[str, Sequence[str]],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys: identical results to
    ``left.join(right, on, how)``, with the left side's hot keys spread
    over ``n_salts`` partitions and the right side replicated to match.

    ``how`` supports ``inner``/``left``: the replicated side is the
    right one, so right-row multiplicity must not leak — inner/left
    joins on (key, salt) keep exactly the original pair multiplicity
    because each left row carries ONE salt value.
    """
    if n_salts < 1:
        raise ValueError("n_salts must be >= 1")
    if how not in ("inner", "left"):
        raise ValueError("how must be 'inner' or 'left'")
    keys = [on] if isinstance(on, str) else list(on)
    for k in keys:
        if k not in left.columns or k not in right.columns:
            raise ValueError(f"join column {k!r} missing from an input")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError("inputs must not already contain a __salt column")
    # deterministic per-row salt from the full left row: hot-key rows
    # with varying payloads spread uniformly; identical full rows
    # colliding on one salt is correct (they are the same row)
    lsalted = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salts)),
    )
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = lsalted.join(rsalted, keys + ["__salt"], how)
    return out.drop("__salt")
