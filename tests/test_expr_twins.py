"""Round-11 optimization guards: the parser-built (selectExpr/expr
string) twins introduced to cut driver py4j round-trips must stay
value-identical to the node-built Column forms they replaced, and the
from_json literal-array carrier must both fold to a constant and
carry exact values.

These are the engine-side equivalence pins for the round-11
construction diet (OPTIMIZATION_r11.md): the oracle diff already
hash-checks every registered query end-to-end; these tests localize a
future drift to the specific twin that caused it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tpch_spark.exprs import json_array_lit, json_array_sql


def test_json_array_lit_exact_values(spark):
    """Ints, doubles (shortest-repr round-trip) and strings survive
    the from_json carrier bit-exactly."""
    ints = [0, 1, -1, (1 << 63) - 1, -(1 << 63), 1_000_000_007]
    dbls = [0.1, -3.25, 1e-17, 123456789.123456789, 2.5, 0.7213]
    strs = ["a b", "it's", 'quo"te', "back\\slash", "ünicode"]
    row = spark.range(1).select(
        json_array_lit(ints, "long").alias("i"),
        json_array_lit(dbls, "double").alias("d"),
        json_array_lit(strs, "string").alias("s"),
    ).first()
    assert list(row["i"]) == ints
    assert list(row["d"]) == dbls
    assert list(row["s"]) == strs


def test_json_array_lit_constant_folds(spark):
    """The optimized plan must carry a folded Literal — from_json may
    never survive to per-row evaluation."""
    df = spark.range(3).select(
        F.element_at(
            json_array_lit(list(range(100)), "long"),
            (F.col("id") + 1).cast("int"),
        ).alias("v")
    )
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "from_json" not in opt
    assert [r["v"] for r in df.collect()] == [0, 1, 2]


def test_json_array_lit_matches_f_lit(spark):
    """Same values as the F.lit(list) construction it replaced."""
    vals = [x * 0.1 for x in range(-50, 50)]
    row = spark.range(1).select(
        json_array_lit(vals, "double").alias("a"),
        F.lit(vals).cast("array<double>").alias("b"),
    ).first()
    assert list(row["a"]) == list(row["b"])


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from etl_tpch_spark.catalog import Tables

    return Tables(spark, sf_dir).documents.select("doc_id", "text")


def test_minhash_pipeline_twin_equals_column_form(spark, docs):
    """tokens → shingles → shingle hashes → minhash signature → band
    keys: the selectExpr pipeline (dedup/operators.py
    _banded_signatures) must equal the original Column builders
    row-for-row."""
    from etl_tpch_spark.dedup.hashing import (
        band_keys,
        minhash_signature,
        shingle_hashes,
        spark_sql_band_keys,
        spark_sql_minhash_signature,
        spark_sql_shingle_hashes,
    )
    from etl_tpch_spark.dedup.operators import (
        NGRAM,
        spark_sql_word_shingles_from_tokens,
        word_shingles_from_tokens,
    )
    from etl_tpch_spark.functions.text import spark_sql_tokens, tokens

    old = (
        docs.select("doc_id", tokens(F.col("text")).alias("_toks"))
        .filter(F.size("_toks") >= NGRAM)
        .select(
            "doc_id",
            word_shingles_from_tokens(F.col("_toks")).alias("sh"),
        )
        .select(
            "doc_id",
            "sh",
            band_keys(
                minhash_signature(shingle_hashes(F.col("sh")))
            ).alias("bands"),
        )
    )
    new = (
        docs.selectExpr("doc_id", f"{spark_sql_tokens('text')} AS _toks")
        .filter(f"size(_toks) >= {NGRAM}")
        .selectExpr(
            "doc_id",
            f"{spark_sql_word_shingles_from_tokens('_toks')} AS sh",
        )
        .selectExpr(
            "doc_id",
            "sh",
            f"{spark_sql_band_keys(spark_sql_minhash_signature(spark_sql_shingle_hashes('sh')))}"
            " AS bands",
        )
    )
    a = {r["doc_id"]: (list(r["sh"]), list(r["bands"])) for r in old.collect()}
    b = {r["doc_id"]: (list(r["sh"]), list(r["bands"])) for r in new.collect()}
    assert a == b


def test_simhash_band_explode_sql_twin(spark):
    """simhash_band_explode_sql (third-session conversion) must emit
    the same (band_idx, band_val) rows as the F.struct wrapping of
    simhash_band_cols it replaced — per signature, per band."""
    from etl_tpch_spark.dedup.operators import (
        SIMHASH_BITS,
        simhash_band_cols,
        simhash_band_explode_sql,
    )

    sigs = spark.range(200).selectExpr(
        "xxhash64(id) & 1152921504606846975 AS h"  # 60-bit positive
    )
    for max_hamming in (1, 3):
        old = sigs.select(
            "h",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band_idx"),
                            c.alias("band_val"),
                        )
                        for i, c in enumerate(
                            simhash_band_cols(
                                F.col("h"), max_hamming, SIMHASH_BITS
                            )
                        )
                    ]
                )
            ).alias("band"),
        ).select("h", "band.band_idx", "band.band_val")
        new = sigs.selectExpr(
            "h", simhash_band_explode_sql("h", max_hamming, SIMHASH_BITS)
        ).selectExpr("h", "band.band_idx", "band.band_val")
        assert sorted(map(tuple, old.collect())) == sorted(
            map(tuple, new.collect())
        )


def test_block_explode_sql_twin(spark):
    """_block_explode_sql must replicate the F.struct/least/greatest
    block-pair-key explode of the cells/blocked pair kernels."""
    from etl_tpch_spark.similarity.ann import _block_explode_sql

    n_blocks = 4
    base = spark.range(100).selectExpr(
        "id AS vec_id", f"pmod(xxhash64(id), {n_blocks}) AS b"
    )
    pairs_keys = F.array(
        *[
            F.struct(
                F.least(F.col("b"), F.lit(o)).alias("p"),
                F.greatest(F.col("b"), F.lit(o)).alias("q"),
            )
            for o in range(n_blocks)
        ]
    )
    old = base.select(
        "vec_id", F.explode(F.array_distinct(pairs_keys)).alias("pk")
    ).select("vec_id", "pk.p", "pk.q")
    new = base.selectExpr(
        "vec_id", _block_explode_sql(n_blocks)
    ).selectExpr("vec_id", "pk.p", "pk.q")
    assert sorted(map(tuple, old.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_media_meta_sql_twin(spark, sf_dir):
    """_meta_from_content_sql must parse the binary header to the same
    struct the node-built little-endian form produced, across all
    three media kinds."""
    from etl_tpch_spark.multimodal.media import (
        image_media_from_documents,
        media_from_documents,
        video_media_from_documents,
    )

    def _le(offset: int, nbytes: int):
        b = [
            F.conv(F.hex(F.substring("content", offset + i, 1)), 16, 10)
            .cast("int") * (256 ** i)
            for i in range(nbytes)
        ]
        out = b[0]
        for x in b[1:]:
            out = out + x
        return out

    old_meta = F.struct(
        _le(6, 2).alias("height"),
        _le(8, 2).alias("width"),
        _le(10, 1).alias("channels"),
        _le(11, 4).alias("sample_rate"),
        _le(15, 2).alias("n_frames"),
        F.lit("rawm").alias("format"),
    ).alias("meta")
    for builder in (
        image_media_from_documents,
        media_from_documents,
        video_media_from_documents,
    ):
        media = builder(spark, sf_dir)
        redone = media.select("media_id", "content").select(
            "media_id", old_meta
        )
        a = {r["media_id"]: r["meta"] for r in media.select("media_id", "meta").collect()}
        b = {r["media_id"]: r["meta"] for r in redone.collect()}
        assert a == b


def test_dot_fold_and_quantize_twins(spark, sf_dir):
    """spark_sql_dot_fold / SPARK_SQL_QUANTIZE vs the Column forms on
    the embeddings fixture (sequential fold ⇒ order-sensitive, so
    equality is bitwise, not approximate)."""
    from etl_tpch_spark.catalog import Tables
    from etl_tpch_spark.dedup.hashing import (
        _as_double_array,
        dot_fold,
        spark_sql_as_double_array,
        spark_sql_dot_fold,
    )
    from etl_tpch_spark.similarity.kmeans import SPARK_SQL_QUANTIZE

    emb = Tables(spark, sf_dir).embeddings
    old = emb.select(
        "vec_id",
        dot_fold(
            _as_double_array(F.col("embedding")),
            _as_double_array(F.col("embedding")),
        ).alias("n"),
        F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                (x.cast("double") + F.lit(1.0)) * 1_000_000 + F.lit(0.5)
            ).cast("long"),
        ).alias("qv"),
    )
    d = spark_sql_as_double_array("embedding")
    new = emb.selectExpr(
        "vec_id",
        f"{spark_sql_dot_fold(d, d)} AS n",
        f"{SPARK_SQL_QUANTIZE} AS qv",
    )
    a = {r["vec_id"]: (r["n"], list(r["qv"])) for r in old.collect()}
    b = {r["vec_id"]: (r["n"], list(r["qv"])) for r in new.collect()}
    assert a == b
