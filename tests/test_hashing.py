"""Property tests: hashing.py (the driver-side xxhash64 twin) must agree
EXACTLY with Spark's ``xxhash64``/``pmod`` expressions — bucket routing of
pruned layout reads depends on it (termindex._buckets_for)."""

import random
import string

import pytest
from pyspark.sql import functions as F

from gazetteer_spark.hashing import spark_xxhash64_str, term_bucket, xxh64


def _words():
    words = [
        "", "a", "ab", "abc", "abcd", "spark", "the", "customer",
        "x" * 7, "x" * 8, "x" * 9, "x" * 15, "x" * 16, "x" * 31,
        "y" * 32, "z" * 33, "w" * 63, "w" * 64, "w" * 65,
        "key\x1forder", "src\x1fspark", "naïve", "日本語", "émigré",
    ]
    rng = random.Random(12345)
    alphabet = string.ascii_lowercase + string.digits
    words += [
        "".join(rng.choices(alphabet, k=rng.randint(1, 80)))
        for _ in range(300)
    ]
    return words


def test_xxh64_matches_spark_exactly(spark):
    words = _words()
    df = spark.createDataFrame([(w,) for w in words], "w string")
    rows = df.select(
        "w",
        F.xxhash64("w").alias("h"),
        F.pmod(F.xxhash64("w"), F.lit(16)).cast("int").alias("b16"),
        F.pmod(F.xxhash64("w"), F.lit(7)).cast("int").alias("b7"),
    ).collect()
    for r in rows:
        assert spark_xxhash64_str(r["w"]) == r["h"], r["w"]
        assert term_bucket(r["w"], 16) == r["b16"], r["w"]
        assert term_bucket(r["w"], 7) == r["b7"], r["w"]


def test_buckets_for_is_pure_driver_arithmetic(spark):
    """_buckets_for must agree with the JVM bucket expression (and runs
    no Spark job — it is pure Python now)."""
    from gazetteer_spark.index import termindex

    terms = ["spark", "join", "merge", "the", "src\x1fspark"]
    got = termindex._buckets_for(spark, terms, 16)
    df = spark.createDataFrame(
        [(t.split("\x1f")[-1],) for t in terms], "term string"
    )
    want = sorted({
        r["b"] for r in df.select(
            termindex.term_bucket_expr(F.col("term"), 16).alias("b")
        ).collect()
    })
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 13])
def test_xxh64_known_lengths_stable(n):
    # regression pin: pure-Python path is deterministic across runs
    assert xxh64(b"a" * n) == xxh64(b"a" * n)
