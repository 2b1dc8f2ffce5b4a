"""Multimodal plumbing: the Arrow-batched mapInPandas path must be
deterministic and produce the declared schema. The codec is the
documented fake kernel (no image libs in this container); the Spark-side
plumbing — schema, batching, UDF signature — is the thing under test."""

from __future__ import annotations

import pytest

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import multimodal


def test_feature_extraction_deterministic(spark, sf_dir):
    t = load(spark, sf_dir)
    media = multimodal.media_from_documents(t.documents.limit(100))
    a = sorted(
        (r.media_id, r.n_bytes, tuple(r.feature))
        for r in multimodal.extract_features(media).collect()
    )
    b = sorted(
        (r.media_id, r.n_bytes, tuple(r.feature))
        for r in multimodal.extract_features(media).collect()
    )
    assert a == b
    assert len(a) == 100


def test_feature_schema_and_shape(spark, sf_dir):
    t = load(spark, sf_dir)
    media = multimodal.media_from_documents(t.documents.limit(10))
    feats = multimodal.extract_features(media)
    assert feats.schema == multimodal.FEATURE_SCHEMA
    for r in feats.collect():
        assert r.kind == "image"
        assert len(r.feature) == 8
        assert r.n_bytes > 0


def test_unknown_container_rejected_with_clear_error():
    # a PNG signature prefix that is NOT a full signature (and not a
    # known container) must fail loudly, not decode garbage
    with pytest.raises(ValueError):
        multimodal.decode_image(b"\x89PNG")


def test_fake_kernel_handles_empty_payload():
    assert multimodal.fake_feature_kernel(b"") == [0.0] * 8


def test_resize_updates_payload_and_meta(spark, sf_dir):
    t = load(spark, sf_dir)
    media = multimodal.media_from_documents(t.documents.limit(50))
    resized = multimodal.resize_media(media, width=4, height=4)
    assert resized.schema == multimodal.MEDIA_SCHEMA
    rows = resized.collect()
    assert len(rows) == 50
    for r in rows:
        assert len(r.payload) <= 16
        assert r.meta.width == 4 and r.meta.height == 4


def test_sample_frames_fan_out(spark, sf_dir):
    t = load(spark, sf_dir)
    media = multimodal.media_from_documents(t.documents.limit(20))
    frames = multimodal.sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 80
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    for idxs in by_media.values():
        assert sorted(idxs) == [0, 1, 2, 3]
    # deterministic
    again = frames.collect()
    assert sorted((r.media_id, r.frame_idx, bytes(r.frame)) for r in rows) == sorted(
        (r.media_id, r.frame_idx, bytes(r.frame)) for r in again
    )


def test_phash_detects_perturbed_payload(spark):
    """A payload with a tiny byte perturbation hashes within the
    Hamming budget of its original (pair reported); an unrelated
    random payload does not pair with either."""
    import os
    import random

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from beauty_lakehouse_spark.operators import multimodal as mm

    rnd = random.Random(7)
    base = bytes(rnd.randrange(256) for _ in range(4096))
    near = bytearray(base)
    near[100] ^= 0x01  # one-bit corruption of one byte
    other = bytes(rnd.randrange(256) for _ in range(4096))
    rows = [
        (1, "image", bytes(base), None),
        (2, "image", bytes(near), None),
        (3, "image", other, None),
    ]
    media = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    pairs = {
        (r.media_a, r.media_b)
        for r in mm.media_phash_pairs(media).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_phash_bands_cover_hamming_budget(spark):
    """Pigeonhole guarantee: any two hashes within PHASH_HAMMING_MAX
    share >= 1 exact band (bands > budget), so banding misses nothing
    the verifier would accept."""
    from beauty_lakehouse_spark.operators import multimodal as mm

    assert mm.PHASH_BANDS > mm.PHASH_HAMMING_MAX


def test_dct_phash_invariant_to_reencoding(spark):
    """The DCT kernel is the real pHash transform: an affine
    brightness/contrast 're-encode' of the payload (b -> b//2 + 40)
    scales/shifts the raster, which scales the AC coefficients and
    moves only the DC — the sign-vs-mean bit pattern survives, so the
    pair is reported within the Hamming budget. The byte-histogram
    stand-in this replaced had no such invariance."""
    import random

    from beauty_lakehouse_spark.operators import multimodal as mm

    rnd = random.Random(13)
    base = bytes(rnd.randrange(256) for _ in range(4096))
    reencoded = bytes(b // 2 + 40 for b in base)
    other = bytes(rnd.randrange(256) for _ in range(4096))
    media = spark.createDataFrame(
        [
            (1, "image", base, None),
            (2, "image", reencoded, None),
            (3, "image", other, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    pairs = {(r.media_a, r.media_b) for r in mm.media_phash_pairs(media).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_dct_phash_kernel_math():
    """Kernel-level checks of the DCT transform itself: constant
    payloads have zero AC energy; the coefficient count and
    determinism hold; affine byte transforms preserve AC signs."""
    from beauty_lakehouse_spark.operators import multimodal as mm

    flat = mm.dct_phash_kernel(bytes([128]) * 4096)
    assert len(flat) == mm.PHASH_BITS
    assert all(abs(c) < 1e-9 for c in flat)  # no structure -> no AC

    import random

    rnd = random.Random(5)
    payload = bytes(rnd.randrange(256) for _ in range(2048))
    a = mm.dct_phash_kernel(payload)
    assert a == mm.dct_phash_kernel(payload)  # deterministic
    scaled = bytes(b // 2 for b in payload)
    b = mm.dct_phash_kernel(scaled)
    # halving every byte halves every AC coefficient (floor noise aside)
    for x, y in zip(a, b):
        assert abs(y - x / 2) < 1.0, (x, y)


def test_fft_fingerprint_invariant_to_gain(spark):
    """The spectral fingerprint is the real audio-fingerprint math: a
    gain-scaled copy of a waveform (b -> (b-128)//2 + 128, i.e. half
    volume) scales every band energy uniformly, so the sign-vs-mean
    bit pattern survives and the pair is reported; an unrelated
    waveform is not."""
    import random

    from beauty_lakehouse_spark.operators import multimodal as mm

    rnd = random.Random(21)
    base = bytes(rnd.randrange(256) for _ in range(4096))
    half_gain = bytes((b - 128) // 2 + 128 for b in base)
    other = bytes(rnd.randrange(256) for _ in range(4096))
    media = spark.createDataFrame(
        [
            (1, "audio", base, None),
            (2, "audio", half_gain, None),
            (3, "audio", other, None),
        ],
        mm.MEDIA_SCHEMA,
    )
    pairs = {
        (r.media_a, r.media_b)
        for r in mm.media_phash_pairs(
            media, codec=mm.fft_fingerprint_kernel
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_fft_fingerprint_kernel_shape():
    from beauty_lakehouse_spark.operators import multimodal as mm

    assert mm.fft_fingerprint_kernel(b"") == [0.0] * mm.PHASH_BITS
    v = mm.fft_fingerprint_kernel(bytes(range(256)) * 8)
    assert len(v) == mm.PHASH_BITS
    assert v == mm.fft_fingerprint_kernel(bytes(range(256)) * 8)  # deterministic


def test_ppm_codec_round_trip():
    """encode_ppm -> decode_ppm recovers the raster exactly (grayscale
    via luma of an (r,g,b)=(v,v,v) image is v itself)."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    v = np.arange(32 * 48 % 256, dtype=np.uint8)
    gray = np.resize(np.arange(256, dtype=np.uint8), (32, 48))
    rgb = np.stack([gray, gray, gray], axis=-1)
    payload = mm.encode_ppm(rgb)
    assert payload.startswith(b"P6\n48 32\n255\n")
    out = mm.decode_ppm(payload)
    assert out.shape == (32, 48)
    # luma(v,v,v) = (0.299+0.587+0.114)·v = v
    assert np.allclose(out, gray.astype(np.float64))


def test_ppm_decoder_handles_netpbm_header_grammar():
    """Comments and arbitrary whitespace between header tokens are
    legal Netpbm; the parser must skip them."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    raster = bytes(np.arange(18, dtype=np.uint8))
    payload = b"P6 # magic\n# a comment line\n  3\t2 # dims\n255\n" + raster
    out = mm.decode_ppm(payload)
    assert out.shape == (2, 3)
    with pytest.raises(ValueError, match="not a binary PPM"):
        mm.decode_ppm(b"BM0000")
    with pytest.raises(ValueError, match="maxval"):
        mm.decode_ppm(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")


def test_wav_codec_round_trip():
    """encode_wav -> decode_wav recovers int16 PCM samples and the
    sample rate exactly (stdlib wave, real RIFF container)."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    pcm = ((np.arange(1000) * 37) % 4096 - 2048).astype(np.int16)
    payload = mm.encode_wav(pcm, 8000)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    data, rate = mm.decode_wav(payload)
    assert rate == 8000
    assert np.array_equal(data, pcm.astype(np.float64))


def test_ppm_phash_pairs_on_real_containers(spark):
    """media_phash_pairs over genuinely-encoded-and-decoded PPM files:
    a near-duplicate document pairs with its original, an unrelated
    one does not — through the full container round trip."""
    import random

    from beauty_lakehouse_spark.operators import multimodal as mm

    rnd = random.Random(11)
    base = "".join(rnd.choice("abcdefgh ") for _ in range(4000))
    near = base[:2000] + "x" + base[2001:]  # one-char edit
    other = "".join(rnd.choice("stuvwxyz ") for _ in range(4000))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    media = mm.ppm_from_documents(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert all(p.startswith(b"P6\n") for p in payloads.values())
    pairs = {
        (r.media_a, r.media_b)
        for r in mm.media_phash_pairs(
            media, codec=mm.ppm_phash_kernel
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_wav_fingerprint_pairs_on_real_containers(spark):
    """media_phash_pairs over genuinely-encoded-and-decoded WAV files:
    near-duplicate audio pairs, unrelated audio does not."""
    import random

    from beauty_lakehouse_spark.operators import multimodal as mm

    rnd = random.Random(13)
    base = "".join(rnd.choice("abcdefgh ") for _ in range(4000))
    near = base[:2000] + "x" + base[2001:]
    other = "".join(rnd.choice("stuvwxyz ") for _ in range(4000))
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    media = mm.wav_from_documents(docs)
    payloads = {r.media_id: bytes(r.payload) for r in media.collect()}
    assert all(p[:4] == b"RIFF" for p in payloads.values())
    pairs = {
        (r.media_a, r.media_b)
        for r in mm.media_phash_pairs(
            media, codec=mm.wav_fingerprint_kernel
        ).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_decode_image_dispatches_ppm_png_jpeg():
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    gray = np.resize(np.arange(256, dtype=np.uint8), (4, 4))
    rgb = np.stack([gray, gray, gray], axis=-1)
    assert mm.decode_image(mm.encode_ppm(rgb)).shape == (4, 4)
    assert mm.decode_image(mm.encode_png(rgb)).shape == (4, 4)
    assert mm.decode_image(mm.encode_jpeg(rgb)).shape == (4, 4)
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a" + b"\x00" * 16)  # unsupported container


def test_png_round_trip_exercises_all_five_filters():
    """encode_png cycles scanline filters row % 5, so any raster with
    >= 5 rows proves every reconstruction branch (None/Sub/Up/Average/
    Paeth) — the decoded luma must equal the PPM decode of the SAME
    raster bit-for-bit."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    rng = np.arange(7 * 6 * 3, dtype=np.uint64)
    rgb = ((rng * 2654435761) % 251).astype(np.uint8).reshape(7, 6, 3)
    png = mm.encode_png(rgb)
    assert png[:8] == mm.PNG_SIGNATURE
    # all five filter types really are present in the filtered stream
    import struct
    import zlib

    i, idat = 8, bytearray()
    while i + 8 <= len(png):
        (ln,) = struct.unpack(">I", png[i : i + 4])
        if png[i + 4 : i + 8] == b"IDAT":
            idat.extend(png[i + 8 : i + 8 + ln])
        i += 12 + ln
    raw = zlib.decompress(bytes(idat))
    stride = 6 * 3 + 1
    assert {raw[r * stride] for r in range(7)} == {0, 1, 2, 3, 4}
    got = mm.decode_png(png)
    want = mm.decode_ppm(mm.encode_ppm(rgb))
    assert np.array_equal(got, want)


def test_png_decoder_validates_crc_and_variants():
    import numpy as np
    import pytest as _pytest

    from beauty_lakehouse_spark.operators import multimodal as mm

    rgb = np.zeros((5, 4, 3), dtype=np.uint8)
    png = bytearray(mm.encode_png(rgb))
    png[-5] ^= 0xFF  # corrupt the IEND CRC
    with _pytest.raises(ValueError, match="CRC"):
        mm.decode_png(bytes(png))
    with _pytest.raises(ValueError, match="not a PNG"):
        mm.decode_png(b"P6\n1 1\n255\n\x00\x00\x00")


def test_image_phash_kernel_container_invariant():
    """The same raster in PPM and PNG containers must produce the
    IDENTICAL pHash coefficient vector through the signature-
    dispatching kernel — container-invariance is the property that
    makes cross-format media dedup sound."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    b = np.frombuffer(b"the quick brown fox jumps over it", dtype=np.uint8)
    rgb = np.resize(b, (mm.PPM_H, mm.PPM_W, 3))
    a = mm.image_phash_kernel(mm.encode_ppm(rgb))
    c = mm.image_phash_kernel(mm.encode_png(rgb))
    assert a == c


def test_mixed_container_phash_pairs(spark):
    """media_phash_pairs over the mixed PPM/PNG/JPEG media table:
    planted near-duplicate docs (one byte changed) must pair up
    ACROSS containers (doc_id % 3 → PPM / PNG / JPEG)."""
    from beauty_lakehouse_spark.operators import multimodal as mm

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta " * 20),
            (1, "alpha beta gamma delta epsilon zeta eta thetA " * 20),
            (2, "completely different content with other words " * 20),
        ],
        "doc_id long, text string",
    )
    media = mm.mixed_image_from_documents(docs)
    kinds = {
        r.media_id: r.payload[:8]
        for r in media.select("media_id", "payload").collect()
    }
    assert kinds[0][:2] == b"P6" and kinds[1] == mm.PNG_SIGNATURE
    assert kinds[2][:2] == b"\xff\xd8"
    pairs = {
        (r.media_a, r.media_b)
        for r in mm.media_phash_pairs(
            media, codec=mm.image_phash_kernel
        ).collect()
    }
    assert (0, 1) in pairs
    assert all({a, b} != {0, 2} and {a, b} != {1, 2} for a, b in pairs)


def _py_phash_exactint(text: str | None) -> int:
    """Full pure-Python reimplementation of `phash_exactint` (the
    family convention: every exact-int oracle entry carries an
    independent third implementation)."""
    basis = multimodal.phash_int_basis()
    n = multimodal.PHASH_GRID
    w = multimodal.PPM_W
    npix = multimodal.PPM_H * w
    bits = multimodal.PHASH_BITS
    bt = list((text or "").encode("utf-8")) or [0]
    L = len(bt)
    lum = [
        299 * bt[(3 * p) % L] + 587 * bt[(3 * p + 1) % L] + 114 * bt[(3 * p + 2) % L]
        for p in range(npix)
    ]
    pooled = []
    for q in range(n * n):
        i, j = q // n, q % n
        start, end = (j * w) // n, ((j + 1) * w) // n
        seg = lum[i * w + start : i * w + end]
        pooled.append(2 * seg[0] if len(seg) == 1 else seg[0] + seg[1])
    g = [
        sum(basis[gi // n][i] * pooled[i * n + gi % n] for i in range(n))
        for gi in range(len(basis) * n)
    ]
    coefs = [
        sum(
            basis[l][j] * g[k * n + j]
            for j in range(n)
        )
        for k, l in multimodal._ZIGZAG_AC
    ]
    tot = sum(coefs)
    return sum(1 << b for b in range(bits) if coefs[b] * bits >= tot)


def test_phash_exactint_matches_pure_python(spark, sf_dir):
    """The Spark expression pipeline (hex lift, integer luma, factor-2
    pooling, two integer matmuls, mean-sign pack) must equal the pure
    Python reimplementation bit-for-bit on every fixture document."""
    t = load(spark, sf_dir)
    got = {
        r.doc_id: r.phash
        for r in multimodal.phash_exactint(t.documents).collect()
    }
    texts = {
        r.doc_id: r.text for r in t.documents.select("doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    mismatches = {
        d: (got[d], _py_phash_exactint(texts[d]))
        for d in texts
        if got[d] != _py_phash_exactint(texts[d])
    }
    assert not mismatches, dict(list(mismatches.items())[:3])


def test_phash_exactint_pairs_contract(spark, sf_dir):
    """Top-20 pair output: sorted by (hamming, media_a, media_b),
    hamming <= PHASH_HAMMING_MAX, media_a < media_b, and every listed
    hamming equals the true bit distance of the two docs' hashes."""
    h = {
        r.doc_id: r.phash
        for r in multimodal.phash_exactint(
            load(spark, sf_dir).documents
        ).collect()
    }
    rows = [
        (r.media_a, r.media_b, r.hamming)
        for r in multimodal.q_media_phash_pairs_exactint(spark, sf_dir).collect()
    ]
    assert len(rows) <= multimodal.PHASH_EXACT_TOPK
    assert rows == sorted(rows, key=lambda x: (x[2], x[0], x[1]))
    for a, b, ham in rows:
        assert a < b
        assert ham <= multimodal.PHASH_HAMMING_MAX
        assert ham == bin(h[a] ^ h[b]).count("1")


def _py_afp_exactint(text: str | None) -> int:
    """Pure-Python reimplementation of `afp_exactint` (third
    independent implementation, family convention)."""
    cosb, sinb = multimodal.afp_int_basis()
    bits = multimodal.PHASH_BITS
    frame = multimodal.AFP_FRAME
    hop = multimodal.AFP_HOP
    bins = multimodal.AFP_BINS
    bt = list((text or "").encode("utf-8")) or [0]
    L = len(bt)
    nsamp = hop * (bits + 1)
    wv = [bt[t % L] - 128 for t in range(nsamp)]
    energies = []
    for f in range(bits):
        seg = wv[f * hop : f * hop + frame]
        e = 0
        for k in range(bins):
            dc = sum(cosb[k][t] * seg[t] for t in range(frame))
            ds = sum(sinb[k][t] * seg[t] for t in range(frame))
            e += dc * dc + ds * ds
        energies.append(e)
    deltas = [
        energies[f] - (energies[f - 1] if f else 0) for f in range(bits)
    ]
    tot = sum(deltas)
    return sum(1 << b for b in range(bits) if deltas[b] * bits >= tot)


def test_afp_exactint_matches_pure_python(spark, sf_dir):
    """The Spark expression pipeline (hex lift, centered tiled wave,
    integer DFT band energies, delta-sign pack) must equal the pure
    Python reimplementation bit-for-bit on every fixture document."""
    t = load(spark, sf_dir)
    got = {
        r.doc_id: r.phash
        for r in multimodal.afp_exactint(t.documents).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in t.documents.select("doc_id", "text").collect()
    }
    assert set(got) == set(texts)
    mismatches = {
        d: (got[d], _py_afp_exactint(texts[d]))
        for d in texts
        if got[d] != _py_afp_exactint(texts[d])
    }
    assert not mismatches, dict(list(mismatches.items())[:3])


def test_afp_exactint_gain_offset_sensitivity(spark):
    """Fingerprint sanity on constructed waves: identical texts hash
    identically; a doc differing only in its final token lands within
    a small Hamming distance (shared frames dominate); unrelated texts
    differ. Exercises the operator off the fixture path."""
    base = " ".join(f"tok{i}" for i in range(60))
    near = " ".join(f"tok{i}" for i in range(59)) + " tokX"
    other = " ".join(f"zzz{i * 7}" for i in range(60))
    df = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, other)], "doc_id long, text string"
    )
    h = {r.doc_id: r.phash for r in multimodal.afp_exactint(df).collect()}
    assert h[0] == h[1]
    assert bin(h[0] ^ h[2]).count("1") <= multimodal.PHASH_BITS // 2
    assert h[0] != h[3]


def test_media_dedup_clusters_pure_python(spark, sf_dir):
    """Cluster labels are the exact transitive closure of the (already
    oracle-verified) flagged pair set: union-find recomputation,
    canonical = min id, sizes consistent."""
    from beauty_lakehouse_spark.operators.multimodal import (
        q_media_dedup_clusters,
        q_media_phash_pairs_exactint,
    )

    pairs = [
        (r.media_a, r.media_b)
        for r in q_media_phash_pairs_exactint(spark, sf_dir).collect()
    ]
    rows = q_media_dedup_clusters(spark, sf_dir).collect()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in parent}
    got = {r.media_id: r.cluster_id for r in rows}
    assert got == want
    from collections import Counter

    sizes = Counter(want.values())
    for r in rows:
        assert r.cluster_size == sizes[r.cluster_id]
        assert r.is_canonical == (r.media_id == r.cluster_id)
    # every cluster has exactly one canonical representative and at
    # least one cluster is non-trivial on the fixture
    canon = [r for r in rows if r.is_canonical]
    assert len(canon) == len(sizes)
    assert max(sizes.values()) >= 2


# ---------------------------------------------------------------------------
# Baseline JPEG codec (r13, VERDICT r12 ask #1)
# ---------------------------------------------------------------------------


def test_jpeg_gray_roundtrip_is_exactly_the_arithmetic_twin():
    """decode(encode(gray)) must be BIT-IDENTICAL to running the
    exact integer DCT/quantize/IDCT core directly — i.e. the Huffman
    entropy layer is verified lossless through real JFIF bytes."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    rng = np.random.default_rng(13)
    for h, w in [(32, 48), (8, 8), (24, 40), (16, 16)]:
        gray = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        dec = mm.decode_jpeg(mm.encode_jpeg(gray), luma=False)
        q = mm.jpeg_forward_blocks(gray.astype(np.int64), mm.JPEG_QT_LUMA)
        ref = mm.jpeg_inverse_blocks(q, mm.JPEG_QT_LUMA)[:h, :w]
        assert np.array_equal(dec, ref)


def test_jpeg_is_spec_shaped_and_deterministic():
    """Marker skeleton (SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI), byte
    stuffing inside the entropy segment, determinism."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    gray = np.resize(np.arange(2048, dtype=np.uint8), (32, 48))
    p = mm.encode_jpeg(gray)
    assert p[:2] == b"\xff\xd8" and p[-2:] == b"\xff\xd9"
    assert p[2:4] == b"\xff\xe0" and p[6:11] == b"JFIF\x00"
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in p
    assert mm.encode_jpeg(gray) == p  # deterministic
    # the entropy segment never contains a bare 0xFF (always stuffed)
    sos = p.index(b"\xff\xda")
    seg = p[sos + 2 + 12 : -2]
    i = 0
    while i < len(seg):
        if seg[i] == 0xFF:
            assert seg[i + 1] == 0x00, "unstuffed 0xFF in entropy segment"
            i += 2
        else:
            i += 1


def test_jpeg_lossy_fidelity_on_smooth_raster():
    """A smooth gradient must survive the quantization round trip
    within a small error band (the lossy-codec sanity check)."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    xs = np.linspace(0, 255, 48)
    smooth = np.tile(xs, (32, 1)).astype(np.uint8)
    dec = mm.decode_jpeg(mm.encode_jpeg(smooth), luma=False)
    assert int(np.abs(dec.astype(int) - smooth.astype(int)).max()) <= 12


def test_jpeg_color_444_and_420_decode():
    """Three-component scans in both subsampling layouts decode to
    the right shapes (including non-multiple-of-8/16 dims) and the Y
    plane tracks the true integer luma."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    rng = np.random.default_rng(7)
    for h, w in [(32, 48), (13, 21), (17, 33)]:
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        for sub in ("4:4:4", "4:2:0"):
            p = mm.encode_jpeg(rgb, subsampling=sub)
            y = mm.decode_jpeg(p, luma=True)
            assert y.shape == (h, w)
            full = mm.decode_jpeg(p, luma=False)
            assert full.shape == (h, w, 3)
            yy = mm._hround_int(
                299000 * rgb[:, :, 0].astype(np.int64)
                + 587000 * rgb[:, :, 1]
                + 114000 * rgb[:, :, 2],
                1_000_000,
            )
            rmse = float(np.sqrt(((y - yy) ** 2).mean()))
            assert rmse < 40.0  # noise image: coarse but bounded


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: the encoder emits restart markers and the decoder
    resets DC predictors — the decoded raster must equal the
    no-restart encoding's."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(32, 48), dtype=np.uint8)
    p0, p1 = mm.encode_jpeg(gray), mm.encode_jpeg(gray, dri=3)
    assert b"\xff\xdd" in p1 and b"\xff\xdd" not in p0
    assert any(bytes([0xFF, 0xD0 + i]) in p1 for i in range(8))
    assert np.array_equal(
        mm.decode_jpeg(p0, luma=False), mm.decode_jpeg(p1, luma=False)
    )


def test_jpeg_decoder_validates_and_rejects():
    import numpy as np
    import pytest

    from beauty_lakehouse_spark.operators import multimodal as mm

    gray = np.zeros((8, 8), dtype=np.uint8)
    p = mm.encode_jpeg(gray)
    with pytest.raises(ValueError):
        mm.decode_jpeg(b"\x89PNG")  # not a JPEG
    with pytest.raises(ValueError):
        mm.decode_jpeg(p[:2] + p[2:160])  # truncated tables
    with pytest.raises(ValueError):
        # progressive (SOF2) declared unsupported, loudly
        mm.decode_jpeg(p.replace(b"\xff\xc0", b"\xff\xc2", 1))


def _py_phash_exactint_jpeg(text: str | None) -> int:
    """Pure-Python reimplementation of `phash_exactint_jpeg` (raster
    -> integer gray -> REAL JFIF bytes -> decode -> exact-int pHash),
    sharing only the public constants with the kernel."""
    import numpy as np

    from beauty_lakehouse_spark.operators import multimodal as mm

    b = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if b.size == 0:
        b = np.zeros(1, dtype=np.uint8)
    rgb = (
        np.resize(b, mm.PPM_H * mm.PPM_W * 3)
        .reshape(mm.PPM_H, mm.PPM_W, 3)
        .astype(np.int64)
    )
    gray = mm._hround_int(
        299 * rgb[:, :, 0] + 587 * rgb[:, :, 1] + 114 * rgb[:, :, 2], 1000
    ).astype(np.uint8)
    lum = mm.decode_jpeg(mm.encode_jpeg(gray), luma=False).astype(int)
    C = mm.phash_int_basis()
    n = mm.PHASH_GRID
    pooled = [[0] * n for _ in range(mm.PPM_H)]
    for y in range(mm.PPM_H):
        for qcol in range(n):
            s = (qcol * mm.PPM_W) // n
            e = ((qcol + 1) * mm.PPM_W) // n
            seg = [int(lum[y][x]) for x in range(s, e)]
            pooled[y][qcol] = 2 * seg[0] if len(seg) == 1 else sum(seg)
    coefs = []
    for k, l in mm._ZIGZAG_AC:
        g = [
            sum(C[k][i] * pooled[i][j] for i in range(n)) for j in range(n)
        ]
        coefs.append(sum(C[l][j] * g[j] for j in range(n)))
    tot = sum(coefs)
    return sum(
        (1 << bb)
        for bb in range(mm.PHASH_BITS)
        if coefs[bb] * mm.PHASH_BITS >= tot
    )


def test_phash_exactint_jpeg_matches_pure_python(spark, sf_dir):
    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators import multimodal as mm

    docs = load(spark, sf_dir).documents.limit(6)
    got = {
        r.doc_id: r.phash
        for r in mm.phash_exactint_jpeg(docs).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    assert len(got) == 6
    for did, text in texts.items():
        assert got[did] == _py_phash_exactint_jpeg(text), did
