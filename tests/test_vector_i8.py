"""int8 embedding storage codec (functions/vector.py): round-trip error
bound, exact integer-space dot, null/zero edges — all pure Catalyst."""

import math

import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.functions.vector import (dequantize_i8, i8_dot,
                                                  quantize_i8)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (0, [1.0, -0.5, 0.25, 0.0]),
        (1, [0.003, 0.001, -0.002, 0.004]),
        (2, [0.0, 0.0, 0.0, 0.0]),            # zero vector
        (3, None),                             # null vector
        (4, [127.0, -127.0, 63.5, 1.0]),
    ]
    return spark.createDataFrame(rows, "id long, v array<double>")


class TestRoundTrip:
    def test_error_within_half_scale(self, frame):
        out = frame.filter("v is not null").select(
            "id", "v", dequantize_i8(quantize_i8("v")).alias("w")).collect()
        for r in out:
            peak = max(abs(x) for x in r["v"]) if any(r["v"]) else 0.0
            bound = peak / 254 + 1e-9
            for x, y in zip(r["v"], r["w"]):
                assert abs(x - y) <= bound, (r["id"], x, y, bound)

    def test_codes_in_range_and_schema(self, frame):
        q = frame.select(quantize_i8("v").alias("q"))
        assert q.schema["q"].dataType.simpleString() == \
            "struct<codes:array<tinyint>,scale:float>"
        rows = q.filter("q is not null AND q.scale > 0").collect()
        assert rows
        for r in rows:
            assert all(-127 <= c <= 127 for c in r["q"]["codes"])

    def test_zero_vector_round_trips_to_itself(self, frame):
        r = frame.filter("id = 2").select(
            dequantize_i8(quantize_i8("v")).alias("w")).first()
        assert r["w"] == [0.0, 0.0, 0.0, 0.0]

    def test_null_propagates(self, frame):
        r = frame.filter("id = 3").select(
            quantize_i8("v").alias("q")).first()
        assert r["q"] is None or r["q"]["codes"] is None


class TestDot:
    def test_integer_dot_equals_dequantized_dot(self, frame, spark):
        # i8_dot must EXACTLY equal the float dot of the dequantized
        # vectors (associativity: int accumulation is lossless in long)
        a = frame.filter("id = 0").select(quantize_i8("v").alias("qa"))
        b = frame.filter("id = 4").select(quantize_i8("v").alias("qb"))
        row = a.crossJoin(b).select(
            i8_dot("qa", "qb").alias("d"),
            F.aggregate(
                F.zip_with(dequantize_i8("qa"), dequantize_i8("qb"),
                           lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0), lambda acc, x: acc + x).alias("ref")).first()
        assert math.isclose(row["d"], row["ref"], rel_tol=1e-6)

    def test_cosine_preserved_for_knn(self, spark):
        # quantized cosine ranks a realistic top-k identically to exact
        # on well-separated vectors
        import numpy as np
        rng = np.random.default_rng(7)
        mat = rng.standard_normal((50, 32))
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, [float(x) for x in mat[i]]) for i in range(50)],
            "id long, v array<double>")
        q = df.filter("id = 0").select(quantize_i8("v").alias("qq"))
        scored = df.select("id", quantize_i8("v").alias("qv")) \
            .crossJoin(q).select("id", i8_dot("qv", "qq").alias("s"))
        got = [r["id"] for r in scored.orderBy(F.desc("s")).limit(5)
               .collect()]
        exact = (mat @ mat[0]).argsort()[::-1][:5].tolist()
        assert got == exact
