"""Deterministic corpus shuffling for training epochs (beyond-reference:
the ordering side of the data pipeline — mixing breaks source clumping).

Training wants each epoch to visit documents in a fixed pseudo-random order
that (a) is reproducible bit-for-bit across reruns and cluster layouts,
(b) changes between epochs, (c) never funnels data through one node. The
standard construction: order by a salted content hash — ORDER BY
md5(salt || key). Epoch e uses salt e, giving independent-looking orders
from the same inputs with zero stored state.

Scale: one range exchange on the hash (the exchange ANY global order must
pay — cf. pipeline/ids.py); the hash is uniform by construction, so range
partitions are balanced regardless of key skew — this is exactly the
salting trick of operators/skew.py applied to ordering. Positions come from
the same two-pass offset scheme as ids.assign_consecutive_ids (no global
window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .ids import assign_consecutive_ids


def epoch_shuffle_key(key_col: str, epoch: int) -> F.Column:
    """The salted order key: md5('<epoch>|<key>'). Deterministic, uniform,
    engine-portable (md5 hex is identical everywhere)."""
    return F.md5(F.concat_ws("|", F.lit(str(epoch)), F.col(key_col).cast("string")))


def deterministic_shuffle(
    df: DataFrame, key_col: str, epoch: int = 0, pos_name: str = "shuffle_pos"
) -> DataFrame:
    """Assign each row its position 0..N-1 in the epoch's shuffled order.

    The order key appends the raw key (fixed-width) to the hash so hash
    collisions break ties deterministically. Positions are dense and unique
    (ids.assign_consecutive_ids); writing the output range-partitioned by
    position yields shuffled shards ready for sequential reads.
    """
    keyed = df.withColumn(
        "__ord",
        F.concat_ws(
            "|",
            epoch_shuffle_key(key_col, epoch),
            F.lpad(F.col(key_col).cast("string"), 20, "0"),
        ),
    )
    return assign_consecutive_ids(keyed, "__ord", id_name=pos_name).drop("__ord")
