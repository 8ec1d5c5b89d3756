from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.functions import text as TX


def _vals(spark, rows, col_expr):
    df = spark.createDataFrame([(r,) for r in rows], ["text"])
    return [r.out for r in df.select(col_expr.alias("out")).collect()]


def test_token_counts(spark):
    out = _vals(spark, ["one two  three", "solo"], TX.token_count(F.col("text")))
    assert out == [3, 1]
    out = _vals(spark, ["ab 12, cd!"], TX.bpe_ish_token_count(F.col("text")))
    assert out == [5]  # ab, 12, ',', cd, '!'


def test_quality_ratios(spark):
    punct = _vals(spark, ["abcd!!!!!!", "clean text here"], TX.punct_ratio(F.col("text")))
    assert punct[0] == 0.6 and punct[1] == 0.0
    stop = _vals(
        spark,
        ["the cat sat on the mat", "xyzzy qwerty"],
        TX.stopword_ratio(F.col("text"), "en"),
    )
    assert stop[0] > 0.3 and stop[1] == 0.0


def test_detect_language(spark):
    samples = {
        "en": "the cat is on the mat and it is happy",
        "fr": "le chat est sur le tapis et il est content",
        "es": "el gato es feliz y la casa es grande",
        "de": "der hund und die katze sind ein team",
        "zh": "我 有 一 只 猫 它 是 我 的 朋友",
    }
    df = spark.createDataFrame(
        [(lang, txt) for lang, txt in samples.items()], ["lang", "text"]
    )
    out = df.select("lang", TX.detect_language(F.col("text")).alias("det")).collect()
    for r in out:
        assert r.det == r.lang, f"{r.lang} detected as {r.det}"


def test_fingerprint_invariant_to_case_and_punct(spark):
    fp = _vals(
        spark,
        ["Hello,   World!", "hello world", "different doc"],
        TX.fingerprint(F.col("text")),
    )
    assert fp[0] == fp[1] != fp[2]


def test_word_shingles(spark):
    out = _vals(spark, ["a b c d", "x y"], TX.word_shingles(F.col("text"), k=3))
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["x y"]  # shorter than k → whole text


def test_quality_score_bounds(spark):
    out = _vals(
        spark,
        ["the quick brown fox jumps over the lazy dog and runs away fast", "!!"],
        TX.quality_score(F.col("text")),
    )
    assert out[0] == 1.0
    assert out[1] < 0.5
