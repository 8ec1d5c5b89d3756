import pytest
from pyspark.sql import functions as F

from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import multimodal


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine"), (3, "")],
        "doc_id long, text string",
    )


def test_attach_binary_metadata(spark):
    out = multimodal.attach_binary(_docs(spark), "text")
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 11
    assert rows[3].n_bytes == 0
    assert bytes(rows[1].payload) == b"hello world"
    assert len(rows[1].content_hash) == 64
    assert rows[1].media_type == "text/plain"


def test_extract_features_plumbing(spark):
    with_bin = multimodal.attach_binary(_docs(spark), "text")
    feats = multimodal.extract_features(with_bin)
    rows = {r.doc_id: r for r in feats.collect()}
    assert set(rows) == {1, 2, 3}
    assert len(rows[1].features) == multimodal.FEATURE_DIM
    assert rows[3].features == [0.0] * multimodal.FEATURE_DIM
    # deterministic
    again = {r.doc_id: r for r in multimodal.extract_features(with_bin).collect()}
    assert again[1].features == rows[1].features


def test_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG fake")


def test_parse_media_headers_stdlib_formats():
    import io
    import struct
    import wave

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import multimodal

    # P6 PPM (with a comment line) + full decode
    ppm = b"P6\n# a comment\n4 3\n255\n" + bytes(range(36))
    hdr = multimodal.parse_media_header(ppm)
    assert hdr == {"media_type": "image/x-portable-pixmap", "width": 4, "height": 3}
    w, h, body = multimodal.decode_ppm(ppm)
    assert (w, h, body) == (4, 3, bytes(range(36)))

    # P5 PGM
    assert multimodal.parse_media_header(b"P5\n2 2\n255\n\x00\x01\x02\x03") == {
        "media_type": "image/x-portable-graymap", "width": 2, "height": 2,
    }

    # BMP header (minimal: magic + offsets up to width/height at 18)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 10
    assert multimodal.parse_media_header(bmp) == {
        "media_type": "image/bmp", "width": 640, "height": 480,
    }

    # PNG IHDR
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 32, 16)
    assert multimodal.parse_media_header(png) == {
        "media_type": "image/png", "width": 32, "height": 16,
    }

    # WAV via the stdlib wave module
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"\x00\x00" * 2 * 100)
    assert multimodal.parse_media_header(buf.getvalue()) == {
        "media_type": "audio/wav", "width": 100, "height": 2,
    }

    # unknown magic -> None
    assert multimodal.parse_media_header(b"hello world") is None


def test_encode_decode_ppm_roundtrip_distributed(spark):
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import multimodal

    rows = []
    for d in range(20):
        w, h = 1 + d % 4, 1 + d % 3
        rows.append((d, multimodal.encode_ppm(w, h, bytes(3 * w * h))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: (r.media_type, r.width, r.height)
           for r in multimodal.media_metadata(df).collect()}
    for d in range(20):
        assert out[d] == ("image/x-portable-pixmap", 1 + d % 4, 1 + d % 3)


def test_resize_ppm_box_average():
    # 4x2 image, left half 10s, right half 30s -> 2x1 output of tile means
    row = bytes([10] * 6 + [30] * 6)
    p = multimodal.encode_ppm(4, 2, row + row)
    out = multimodal.resize_ppm(p, 2)
    w, h, body = multimodal.decode_ppm(out)
    assert (w, h) == (2, 1)
    assert list(body) == [10, 10, 10, 30, 30, 30]


def test_resize_factor_larger_than_image_collapses_to_one_pixel():
    p = multimodal.encode_ppm(2, 1, bytes([8, 8, 8, 12, 12, 12]))
    out = multimodal.resize_ppm(p, 4)
    w, h, body = multimodal.decode_ppm(out)
    assert (w, h) == (1, 1)
    assert list(body) == [10, 10, 10]


def test_split_and_sample_frames():
    vid = b"".join(multimodal.encode_ppm(4, 2, bytes([i] * 24)) for i in range(5))
    frames = multimodal.split_ppm_frames(vid)
    assert [multimodal.decode_ppm(f)[2][0] for f in frames] == [0, 1, 2, 3, 4]
    assert [multimodal.decode_ppm(f)[2][0] for f in multimodal.sample_frames(vid, 2)] == [0, 2, 4]


def test_split_frames_rejects_malformed_payload():
    vid = multimodal.encode_ppm(4, 2, bytes(24)) + b"garbage-not-a-frame"
    with pytest.raises(ValueError):
        multimodal.split_ppm_frames(vid)


# --- image perceptual-hash near-dup (dedup_image_phash) ---------------------


def _phash_py(d: int) -> int:
    """Pure-Python mirror of the dedup_image_phash test pattern +
    aHash — used to PLANT pairs at known hamming distances, so the
    test checks the Spark pipeline against an independent
    implementation (no Spark code reused)."""
    import hashlib

    base, parity = d // 2, d % 2
    rows = [
        hashlib.md5(f"{base}:{y}".encode()).hexdigest() for y in range(8)
    ]

    def gray(x, y):
        g = (int(rows[y][2 * x], 16) * 16 + int(rows[y][2 * x + 1], 16)) % 251
        if parity == 1 and x == 0 and y == 0:
            g = (g + 100) % 251
        return g

    cells = []
    for cy in range(4):
        for cx in range(8):
            s = (
                gray(2 * cx, 2 * cy)
                + gray(2 * cx + 1, 2 * cy)
                + gray(2 * cx, 2 * cy + 1)
                + gray(2 * cx + 1, 2 * cy + 1)
            )
            cells.append(s // 4)
    tot = sum(cells)
    return sum(1 << k for k, c in enumerate(cells) if c * 32 > tot)


def test_image_phash_finds_planted_near_identical_images(spark, tmp_path):
    from itertools import combinations

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        streamq,
    )

    # scan the doc_id space for planted twins at hamming exactly 1 and 2
    k1 = k2 = None
    for k in range(500):
        ham = bin(_phash_py(2 * k) ^ _phash_py(2 * k + 1)).count("1")
        if ham == 1 and k1 is None:
            k1 = k
        if ham == 2 and k2 is None:
            k2 = k
        if k1 is not None and k2 is not None:
            break
    assert k1 is not None and k2 is not None
    ids = [2 * k1, 2 * k1 + 1, 2 * k2, 2 * k2 + 1]
    spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in streamq.dedup_image_phash(spark, str(tmp_path)).collect()
    }
    expected = {
        (a, b): bin(_phash_py(a) ^ _phash_py(b)).count("1")
        for a, b in combinations(sorted(ids), 2)
        if bin(_phash_py(a) ^ _phash_py(b)).count("1") <= 2
    }
    # the planted twins are in, at their exact distances...
    assert expected[(2 * k1, 2 * k1 + 1)] == 1
    assert expected[(2 * k2, 2 * k2 + 1)] == 2
    # ...and the probing emits exactly the brute-force pair set
    assert out == expected


def _dhash_py(d: int) -> int:
    """Pure-Python mirror of the 64-bit dHash (gradient sign over the
    9x8 left window of the 16x8 raster) — independent of the Spark
    kernel (no shared code), UNSIGNED form."""
    import hashlib

    base, parity = d // 2, d % 2
    rows = [
        hashlib.md5(f"{base}:{y}".encode()).hexdigest() for y in range(8)
    ]

    def gray(x, y):
        g = (int(rows[y][2 * x], 16) * 16 + int(rows[y][2 * x + 1], 16)) % 251
        if parity == 1 and x == 0 and y == 0:
            g = (g + 100) % 251
        return g

    fp = 0
    for y in range(8):
        for x in range(8):
            if gray(x + 1, y) > gray(x, y):
                fp |= 1 << (y * 8 + x)
    return fp


def test_image_dhash_is_64_bit_and_probing_matches_brute_force(
    spark, tmp_path
):
    from itertools import combinations

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        streamq,
    )

    # 64-bit width must be real: some fingerprint in the first few
    # docs sets a bit >= 32 (gradient signs are ~coin flips, so this
    # holds with overwhelming margin — a regression to 32 bits fails)
    assert any(_dhash_py(d) >> 32 for d in range(8))
    # a planted twin flips at most the (0,0)->(1,0) gradient bit
    for k in range(20):
        assert bin(_dhash_py(2 * k) ^ _dhash_py(2 * k + 1)).count("1") <= 1

    # one twin pair whose perturbation DID flip the gradient (ham 1),
    # one where it didn't (ham 0), plus an unrelated far doc
    k1 = next(
        k
        for k in range(500)
        if bin(_dhash_py(2 * k) ^ _dhash_py(2 * k + 1)).count("1") == 1
    )
    k0 = next(
        k
        for k in range(500)
        if bin(_dhash_py(2 * k) ^ _dhash_py(2 * k + 1)).count("1") == 0
    )
    ids = [2 * k1, 2 * k1 + 1, 2 * k0, 2 * k0 + 1, 7001]
    spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in streamq.dedup_image_dhash(spark, str(tmp_path)).collect()
    }
    expected = {
        (a, b): bin(_dhash_py(a) ^ _dhash_py(b)).count("1")
        for a, b in combinations(sorted(ids), 2)
        if bin(_dhash_py(a) ^ _dhash_py(b)).count("1") <= 2
    }
    assert expected[(2 * k1, 2 * k1 + 1)] == 1
    assert expected[(2 * k0, 2 * k0 + 1)] == 0
    assert out == expected


def test_streaming_image_phash_flags_planted_twin(spark, tmp_path):
    # the planted odd twin sits within hamming <= 2 of its even base
    # for most bases — pick one via the mirror, then the stream must
    # flag exactly the higher doc_id as duplicate (min-id rule)
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        streamq,
    )

    k = next(
        k
        for k in range(500)
        if bin(_phash_py(2 * k) ^ _phash_py(2 * k + 1)).count("1") <= 2
    )
    far = next(
        i
        for i in range(3000, 4000)
        if i // 2 != k
        and all(
            bin(_phash_py(i) ^ _phash_py(d)).count("1") > 2
            for d in (2 * k, 2 * k + 1)
        )
    )
    ids = [2 * k, 2 * k + 1, far]
    # the documents stream globs for a FILE named documents.parquet
    # (the testdata layout), so stage a single part file under that name
    import glob
    import shutil

    stage = tmp_path / "stage"
    spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    ).coalesce(1).write.parquet(str(stage))
    shutil.move(
        glob.glob(str(stage / "part-*.parquet"))[0],
        str(tmp_path / "documents.parquet"),
    )
    out = {
        r.doc_id: r.is_dup
        for r in streamq.streaming_image_phash_dedup(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {2 * k: 0, 2 * k + 1: 1, far: 0}


def test_image_phash_groups_collapse_planted_twins(spark, tmp_path):
    # two planted twin pairs -> exactly two 2-doc components keyed by
    # the smaller id, plus singletons for any far doc
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries import (
        streamq,
    )

    ks = [
        k
        for k in range(500)
        if bin(_phash_py(2 * k) ^ _phash_py(2 * k + 1)).count("1") <= 2
    ][:2]
    ids = [2 * ks[0], 2 * ks[0] + 1, 2 * ks[1], 2 * ks[1] + 1]
    # guard: the two pairs must not collide with each other
    assert all(
        bin(_phash_py(a) ^ _phash_py(b)).count("1") > 2
        for a in ids[:2]
        for b in ids[2:]
    )
    spark.createDataFrame(
        [(i, f"doc {i}") for i in ids], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.component: (r.keeper, r.n_docs)
        for r in streamq.dedup_image_phash_groups(
            spark, str(tmp_path)
        ).collect()
    }
    assert out == {
        2 * ks[0]: (2 * ks[0], 2),
        2 * ks[1]: (2 * ks[1], 2),
    }


def test_synth_gray_ppm_vectorization_is_byte_identical():
    """r13 optimization guard: the numpy-vectorized synthesizer must
    produce byte-identical PPM payloads to the original per-pixel
    definition (md5 hex-digit grays, odd twin's (0,0) perturbed)."""
    import hashlib

    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.operators import (
        multimodal,
    )
    from mgl870_tp02_project_01_hadoopmapreducelogs_spark.queries.streamq import (
        _synth_gray_ppm,
    )

    def reference(d: int) -> bytes:
        base, parity = d // 2, d % 2
        body = bytearray()
        for y in range(8):
            hv = hashlib.md5(f"{base}:{y}".encode()).hexdigest()
            for x in range(16):
                g = (int(hv[2 * x], 16) * 16 + int(hv[2 * x + 1], 16)) % 251
                if parity == 1 and x == 0 and y == 0:
                    g = (g + 100) % 251
                body += bytes((g, g, g))
        return multimodal.encode_ppm(16, 8, bytes(body))

    # even/odd twins, cache-hit ordering both ways, and a large id
    for d in [0, 1, 3, 2, 17, 16, 99998, 99999]:
        assert _synth_gray_ppm(d) == reference(d), f"doc {d} diverged"
