"""Perceptual image hashing (multimodal.image_ahash / image_near_dup):
the real-decode hash pinned against a numpy recomputation from the
synthetic pixel formula, near-dup pairs against O(n²) brute force
(complete at threshold < n_bands by pigeonhole), and the occupancy-cap
star degradation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import ngff_zarr_spark.gate as gate
from ngff_zarr_spark.functions.multimodal import (
    AHASH_SIZE,
    H_BASE,
    H_MOD,
    PIX_A,
    PIX_MOD,
    PIX_X,
    PIX_Y,
    W_BASE,
    W_MOD,
    image_ahash,
    image_near_dup,
)


def _brute_hash(doc_id):
    h = H_BASE + doc_id % H_MOD
    w = W_BASE + doc_id % W_MOD
    yi, xi = np.indices((h, w))
    arr = (doc_id * PIX_A + yi * PIX_Y + xi * PIX_X) % PIX_MOD
    s8 = AHASH_SIZE
    ys = (np.arange(s8) * h) // s8
    xs = (np.arange(s8) * w) // s8
    px = arr[np.ix_(ys, xs)].astype(np.int64)
    total = int(px.sum())
    bits = (px.reshape(-1) * (s8 * s8) > total).astype(int)
    hi = sum(int(b) << (31 - i) for i, b in enumerate(bits[:32]))
    lo = sum(int(b) << (31 - i) for i, b in enumerate(bits[32:]))
    return hi, lo


def _dist(a, b):
    return bin((a[0] ^ b[0])).count("1") + bin((a[1] ^ b[1])).count("1")


def test_ahash_matches_formula(spark, sf_dir):
    docs = gate._docs(spark, sf_dir)
    got = {
        r["doc_id"]: (r["h_hi"], r["h_lo"]) for r in image_ahash(docs).collect()
    }
    assert got  # non-empty corpus
    for doc_id, hv in got.items():
        assert hv == _brute_hash(doc_id), doc_id
        assert 0 <= hv[0] < 1 << 32 and 0 <= hv[1] < 1 << 32


@pytest.mark.parametrize("t", [0, 1, 3])
def test_near_dup_complete_below_band_count(spark, t):
    """At Hamming threshold < 4 bands, banded candidates are complete
    (pigeonhole) — pairs must equal the O(n²) brute force exactly."""
    ids = list(range(0, 120))
    docs = spark.createDataFrame(
        [(i, "t") for i in ids], "doc_id long, text string"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], r["dist"])
        for r in image_near_dup(docs, max_hamming=t).collect()
    )
    hs = {i: _brute_hash(i) for i in ids}
    want = sorted(
        (a, b, _dist(hs[a], hs[b]))
        for a in ids
        for b in ids
        if a < b and _dist(hs[a], hs[b]) <= t
    )
    assert got == want
    assert want, "corpus must contain near-dup pairs at this threshold"


def test_occupancy_cap_degrades_to_star(spark):
    """Force the cap with max_bucket=2 on a corpus whose hashes cluster:
    oversized buckets emit hub-star edges only, so the pair count drops
    below brute force while every capped bucket's members stay
    reachable through the hub (spot-checked via hub membership)."""
    ids = list(range(0, 90))
    docs = spark.createDataFrame(
        [(i, "t") for i in ids], "doc_id long, text string"
    )
    full = image_near_dup(docs, max_hamming=1).collect()
    capped = image_near_dup(docs, max_hamming=1, max_bucket=2).collect()
    assert len(capped) < len(full)
    # star arms: every capped pair at dist<=1 is a real near-dup pair
    hs = {i: _brute_hash(i) for i in ids}
    for r in capped:
        assert _dist(hs[r["doc_a"]], hs[r["doc_b"]]) == r["dist"] <= 1


def test_audio_fingerprint_matches_formula(spark):
    """Decode-path audio fingerprints pinned against a numpy
    recomputation from the synthetic waveform formula, and the dedup
    grouping against its brute-force groups."""
    from collections import Counter

    from ngff_zarr_spark.functions.multimodal import (
        AUD_A,
        AUD_FP_FRAMES,
        AUD_I,
        AUD_LEN_BASE,
        AUD_LEN_MOD,
        AUD_MOD,
        audio_fingerprint,
        audio_fingerprint_dedup,
    )

    ids = list(range(0, 200))
    docs = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")

    def brute_fp(d):
        k = AUD_FP_FRAMES
        n = AUD_LEN_BASE + d % AUD_LEN_MOD
        wave = [(d * AUD_A + i * AUD_I) % AUD_MOD for i in range(n)]
        energy = [0] * k
        for i, w in enumerate(wave):
            energy[(i * k) // n] += w * w
        fp = 0
        for f in range(1, k):
            if energy[f] > energy[f - 1]:
                fp |= 1 << (k - 1 - f)
        return n, fp

    got = {
        r["doc_id"]: (r["n_samples"], r["fp"])
        for r in audio_fingerprint(docs).collect()
    }
    want = {i: brute_fp(i) for i in ids}
    assert got == want
    # grouping
    groups = Counter(fp for _, fp in want.values())
    reps = {}
    for i in ids:
        fp = want[i][1]
        reps[fp] = min(reps.get(fp, i), i)
    got_g = {
        r["fp"]: (r["n_docs"], r["representative"])
        for r in audio_fingerprint_dedup(docs).collect()
    }
    assert got_g == {fp: (c, reps[fp]) for fp, c in groups.items()}
    assert any(c > 1 for c, _ in got_g.values()), "corpus must contain dup groups"


def test_video_clip_detection(spark):
    """Frame tokens pinned against the formula (and injective over all
    256 possible frame contents); the shared-clip table pinned against
    an O(n²) brute force; exactly one canonical keeper per clip."""
    from collections import Counter

    from ngff_zarr_spark.functions.multimodal import (
        FRAME_H,
        FRAME_W,
        N_FRAMES_BASE,
        N_FRAMES_MOD,
        VID_A,
        VID_CLIP_W,
        VID_F,
        VID_MOD,
        VID_TOKEN_BASE,
        VID_TOKEN_MOD,
        VID_X,
        VID_Y,
        video_frame_tokens,
        video_shared_clips,
    )

    def brute_token(d, f):
        acc = 0
        for i in range(FRAME_H * FRAME_W):
            px = (d * VID_A + f * VID_F + (i // FRAME_W) * VID_Y
                  + (i % FRAME_W) * VID_X) % VID_MOD
            acc = (acc * VID_TOKEN_BASE + px) % VID_TOKEN_MOD
        return acc

    # injectivity over every possible frame content (content key mod 256)
    assert len({brute_token(0, f) for f in range(256)}) == 256

    ids = list(range(0, 150))
    docs = spark.createDataFrame([(i, "t") for i in ids], "doc_id long, text string")
    got_t = {
        (r["doc_id"], r["frame"]): r["token"]
        for r in video_frame_tokens(docs).collect()
    }
    want_t = {
        (d, f): brute_token(d, f)
        for d in ids
        for f in range(N_FRAMES_BASE + d % N_FRAMES_MOD)
    }
    assert got_t == want_t

    w = VID_CLIP_W
    occ = {}
    for d in ids:
        nf = N_FRAMES_BASE + d % N_FRAMES_MOD
        toks = [brute_token(d, f) for f in range(nf)]
        for p in range(nf - w + 1):
            occ.setdefault(tuple(toks[p : p + w]), []).append((d, p))
    want = {}
    for sites in occ.values():
        if len(sites) < 2:
            continue
        wit = min(sites)
        for d, p in sites:
            want[(d, p)] = (len(sites), wit[0], wit[1], (d, p) == wit)
    got = {
        (r["doc_id"], r["pos"]): (
            r["n_occ"], r["rep_doc"], r["rep_pos"], r["is_canonical"]
        )
        for r in video_shared_clips(docs).collect()
    }
    assert got == want
    # one keeper per clip
    canon = Counter(
        (v[1], v[2]) for v in got.values() if v[3]
    )
    assert all(c == 1 for c in canon.values())
    assert want, "corpus must contain shared clips"


def test_multimodal_dedup_verdict(spark):
    """Cross-modal verdict pinned against brute-force per-modality
    groups with precedence text > image > audio; representatives keep,
    non-canonical dups drop with the right reason."""
    from ngff_zarr_spark.functions.multimodal import multimodal_dedup_verdict

    # doc 3 repeats doc 0's TEXT; every doc's image/audio derive from
    # its own id, so image/audio dups arise only from hash collisions
    rows = [
        (0, "same text content here"),
        (1, "unique one"),
        (2, "unique two"),
        (3, "same text content here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["reason"], r["keep"])
        for r in multimodal_dedup_verdict(docs).collect()
    }
    assert got[3] == ("text_dup", "no")  # non-canonical text copy drops
    assert got[0][1] == "yes" or got[0][0] in ("image_dup", "audio_dup")
    assert len(got) == 4
    # reasons limited to the defined vocabulary
    assert set(r for r, _ in got.values()) <= {
        "text_dup", "image_dup", "audio_dup", "unique"
    }
    # larger corpus: verdict consistent with the standalone group ops
    from ngff_zarr_spark.functions.multimodal import (
        audio_fingerprint,
        image_ahash,
    )
    from ngff_zarr_spark.functions.dedup import exact_dedup

    ids = list(range(80))
    big = spark.createDataFrame(
        [(i, f"text {i % 30}") for i in ids], "doc_id long, text string"
    )
    v = {r["doc_id"]: (r["reason"], r["keep"]) for r in multimodal_dedup_verdict(big).collect()}
    # brute: text groups by i%30; image/audio groups from hashes
    tgrp = {}
    for i in ids:
        tgrp.setdefault(i % 30, []).append(i)
    ah = {r["doc_id"]: (r["h_hi"], r["h_lo"]) for r in image_ahash(big).collect()}
    fp = {r["doc_id"]: r["fp"] for r in audio_fingerprint(big).collect()}
    def rep(groups, i, key):
        return min(j for j in ids if key(j) == key(i))
    for i in ids:
        text_dup = i != min(tgrp[i % 30])
        image_dup = i != rep(None, i, lambda j: ah[j])
        audio_dup = i != rep(None, i, lambda j: fp[j])
        want_reason = (
            "text_dup" if text_dup else
            "image_dup" if image_dup else
            "audio_dup" if audio_dup else "unique"
        )
        want_keep = "no" if (text_dup or image_dup or audio_dup) else "yes"
        assert v[i] == (want_reason, want_keep), i
