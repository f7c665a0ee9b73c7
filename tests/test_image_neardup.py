"""pHash image near-dup join vs a numpy brute-force twin."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from metric_search_spark.operators.dedupe import image_neardup_pairs
from metric_search_spark.sources.synth import (
    decode_image,
    full_rows_for_ids,
    generate_rows,
    phash64,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


_IMG_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)


def _img_df(spark, rows):
    return spark.createDataFrame(
        [
            tuple(r[c] for c in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash"))
            for r in rows
        ],
        _IMG_SCHEMA,
    )


def test_image_neardup_matches_bruteforce(spark):
    """The banded join finds EXACTLY the brute-force pairs at every
    max_hamming < bands (pigeonhole completeness + bit_count exactness)."""
    rows = generate_rows(300, seed=42)
    h = np.array(
        [
            phash64(decode_image(r["bytes"], r["w"], r["h"], r["fmt"]))
            for r in rows
        ],
        dtype=np.uint64,
    )
    ids = [r["image_id"] for r in rows]
    df = _img_df(spark, rows)
    for max_hamming, bands in ((1, 4), (3, 8)):
        got = {
            (a, b, hm)
            for a, b, hm in image_neardup_pairs(
                df, max_hamming=max_hamming, bands=bands
            ).collect()
        }
        want = set()
        for i in range(len(rows)):
            ham = np.array(
                [bin(int(h[i] ^ h[j])).count("1") for j in range(len(rows))]
            )
            for j in range(i + 1, len(rows)):
                if ham[j] <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    want.add((a, b, int(ham[j])))
        assert got == want
        if max_hamming == 3:
            assert want, "fixture should contain at least one near-dup pair"


def test_full_rows_partition_independent():
    """full_rows_for_ids is chunking-independent: any id subset reproduces
    the rows generate_rows makes for those ids (the distributed-generator
    contract spark_images_full relies on)."""
    base = {r["image_id"]: r for r in generate_rows(20, seed=7)}
    sub = full_rows_for_ids(np.array([3, 17, 0, 9]), seed=7)
    for r in sub:
        b = base[r["image_id"]]
        assert r["bytes"] == b["bytes"]
        assert r["phash"] == b["phash"]
        assert r["caption"] == b["caption"]
        assert (r["w"], r["h"], r["fmt"]) == (b["w"], b["h"], b["fmt"])
