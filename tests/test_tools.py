"""Contract tests for the harness tools — chiefly the synthetic-twin
ROW-IDENTITY contract of tools/scaling_curve.py (the r10 verdict's
ask #3: the event_id unshifted-primary-key bug as a test, not a
memory). The twin builders double tables by unioning key-shifted
copies; an identity key left unshifted duplicates "primary keys"
across copies with identical attributes, making pick-one-per-key
queries legitimately ambiguous across engines (SCALE.md §30.10)."""

from __future__ import annotations

import sys
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.scaling_curve import (  # noqa: E402
    PRIMARY_KEYS,
    TABLES,
    synth_table,
)

SF_DIR = "/root/testdata/sf0.001"


def test_every_scaling_table_declares_an_identity_key():
    """Adding a table to the twin (TABLES) without declaring its
    row-identity key (PRIMARY_KEYS) must fail loudly — the class of
    omission that let event_id ship unshifted for a round."""
    assert set(TABLES) == set(PRIMARY_KEYS), (
        "TABLES and PRIMARY_KEYS out of lockstep: "
        f"{set(TABLES) ^ set(PRIMARY_KEYS)}"
    )
    for table, pk in PRIMARY_KEYS.items():
        assert pk, f"{table}: empty identity key"


def test_every_doubled_table_shifts_an_identity_key_column():
    """Structural half of the contract: each doubled table's shift
    list must include at least one identity-key column — otherwise
    every copy reuses the base identity values verbatim and the
    empirical check below could only catch it after a rebuild."""
    for table, keys in TABLES.items():
        if keys is None:
            continue  # fixed dim: copied once, identity untouched
        assert set(keys) & set(PRIMARY_KEYS[table]), (
            f"{table}: shift list {keys} misses identity key "
            f"{PRIMARY_KEYS[table]} — copies would collide"
        )


def test_synth_copies_keep_identity_keys_disjoint(spark):
    """Empirical half: build each table's 3-copy twin with the REAL
    builder block (synth_table — the same code build_sf10/build_sf02
    write to disk) and assert distinct-identity count is exactly
    n_copies × the base count, i.e. the copies' identity sets are
    pairwise DISJOINT. Phrased as copy-disjointness rather than
    absolute uniqueness because the driver's base lineitem is itself
    not unique on any column subset — the twin must not ADD
    collisions, base-internal duplicates are the base data's
    business."""
    n_copies = 3
    for table, keys in TABLES.items():
        pk = [F.col(c) for c in PRIMARY_KEYS[table]]
        base = spark.read.parquet(f"{SF_DIR}/{table}.parquet")
        base_distinct = base.select(
            F.countDistinct(*pk).alias("d")
        ).first()["d"]
        twin = synth_table(spark, SF_DIR, table, n_copies=n_copies)
        twin_distinct = twin.select(
            F.countDistinct(*pk).alias("d")
        ).first()["d"]
        want = base_distinct if keys is None else n_copies * base_distinct
        assert twin_distinct == want, (
            f"{table}: {twin_distinct} distinct identities in the "
            f"{n_copies}-copy twin, expected {want} — cross-copy "
            "identity collision (an unshifted key?)"
        )
