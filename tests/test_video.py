"""Y4M video path (operators/multimodal.py): codec-free parser
round-trip, exact per-frame features, shared dHash definition, and
aligned-frame near-dup pairs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from faisssearcher_spark.operators.multimodal import (
    _dhash_from_gray, _parse_y4m, build_y4m, dhash_int,
    video_frame_features, video_frame_hashes, video_near_dup_pairs)


def _frames(seed: int, n: int = 3, h: int = 8, w: int = 9) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)


class TestParser:
    def test_roundtrip(self):
        fr = _frames(0)
        w, h, back = _parse_y4m(build_y4m(fr))
        assert (w, h) == (9, 8) and (back == fr).all()

    def test_header_extras_and_empty(self):
        w, h, fr = _parse_y4m(
            b"YUV4MPEG2 W4 H2 F30:1 Ip A1:1 Cmono\nFRAME\n" + bytes(8))
        assert (w, h, fr.shape) == (4, 2, (1, 2, 4))
        w, h, fr = _parse_y4m(b"YUV4MPEG2 W4 H2 Cmono\n")
        assert fr.shape == (0, 2, 4)

    def test_chroma_is_the_stub_boundary(self):
        with pytest.raises(NotImplementedError, match="Cmono"):
            _parse_y4m(b"YUV4MPEG2 W2 H2 F25:1 C420\nFRAME\n" + bytes(6))

    @pytest.mark.parametrize("payload", [
        b"nope", b"YUV4MPEG2 F25:1 Cmono\n",
        b"YUV4MPEG2 W2 H2 Cmono\nFRAME\n" + bytes(3),   # truncated
        b"YUV4MPEG2 W2 H2 Cmono\nBOGUS\n" + bytes(4),   # bad marker
    ])
    def test_corrupt_payloads_fail_loudly(self, payload):
        with pytest.raises(ValueError):
            _parse_y4m(payload)


class TestFrameFeatures:
    def test_exact_integers_match_numpy(self, spark):
        fr = _frames(1)
        df = spark.createDataFrame([(7, bytearray(build_y4m(fr)))],
                                   "asset_id long, payload binary")
        rows = {r["frame_idx"]: r for r in
                video_frame_features(df).collect()}
        assert sorted(rows) == [0, 1, 2]
        s = fr.astype(np.int64)
        for i in range(3):
            assert rows[i]["luma_sum"] == int(s[i].sum())
            assert rows[i]["luma_max"] == int(s[i].max())
            want = int(np.abs(s[i] - s[i - 1]).sum()) if i else 0
            assert rows[i]["motion"] == want

    def test_null_payload_and_frame_cap(self, spark):
        fr = _frames(2, n=5)
        df = spark.createDataFrame(
            [(1, bytearray(build_y4m(fr))), (2, None)],
            "asset_id long, payload binary")
        got = video_frame_features(df, max_frames=2).collect()
        assert {(r["asset_id"], r["frame_idx"]) for r in got} \
            == {(1, 0), (1, 1)}


class TestFrameHashes:
    def test_shared_dhash_definition(self, spark):
        """A video frame and a PPM image with the SAME 9×8 pixels must
        fingerprint identically — one dHash definition across
        modalities is what lets them share the dedup kernel."""
        fr = _frames(3, n=2)
        df = spark.createDataFrame([(5, bytearray(build_y4m(fr)))],
                                   "asset_id long, payload binary")
        got = {r["frame_idx"]: r["fhash"]
               for r in video_frame_hashes(df).collect()}
        for i in range(2):
            ppm = (b"P6\n9 8\n255\n"
                   + bytes(int(v) for v in np.repeat(fr[i].ravel(), 3)))
            assert got[i] == dhash_int(ppm, decoder="native")
            assert got[i] == _dhash_from_gray(fr[i], 8)


class TestNearDupPairs:
    def test_planted_aligned_twins(self, spark):
        """Videos 0/1 share all pixels except one on frame 1 (≤ 1 dHash
        bit per frame); video 2 is unrelated. min_matching_frames=2
        must return exactly the planted pair."""
        base = _frames(4, n=2)
        twin = base.copy()
        twin[1, 0, 0] = 0
        other = _frames(5, n=2)
        df = spark.createDataFrame(
            [(0, bytearray(build_y4m(base))),
             (1, bytearray(build_y4m(twin))),
             (2, bytearray(build_y4m(other)))],
            "asset_id long, payload binary")
        got = video_near_dup_pairs(df, max_hamming=1,
                                   min_matching_frames=2).collect()
        assert [(r["id_a"], r["id_b"], r["n_matching_frames"])
                for r in got] == [(0, 1, 2)]

    def test_misaligned_frames_do_not_match(self, spark):
        """The twin's frames shifted by one index share no ALIGNED
        frame — alignment is by frame_idx, the documented contract."""
        base = _frames(6, n=2)
        shifted = np.stack([_frames(7, n=1)[0], base[0]])
        df = spark.createDataFrame(
            [(0, bytearray(build_y4m(base))),
             (1, bytearray(build_y4m(shifted)))],
            "asset_id long, payload binary")
        assert video_near_dup_pairs(df, max_hamming=0).count() == 0

    def test_shifted_matcher_catches_misaligned_copy(self, spark):
        """The shift-tolerant set matcher finds the frame-shifted copy
        the aligned matcher (previous test) rejects — the split the
        two operators exist for."""
        from faisssearcher_spark.operators.multimodal import \
            video_shifted_near_dup_pairs

        base = _frames(6, n=2)
        shifted = np.stack([_frames(7, n=1)[0], base[0]])
        other = _frames(8, n=2)
        df = spark.createDataFrame(
            [(0, bytearray(build_y4m(base))),
             (1, bytearray(build_y4m(shifted))),
             (2, bytearray(build_y4m(other)))],
            "asset_id long, payload binary")
        got = video_shifted_near_dup_pairs(df).collect()
        assert [(r["id_a"], r["id_b"], r["n_shared_hashes"])
                for r in got] == [(0, 1, 1)]
        with pytest.raises(ValueError, match="min_shared_hashes"):
            video_shifted_near_dup_pairs(df, min_shared_hashes=0)

    def test_hash_size_validated(self, spark):
        df = spark.createDataFrame([(0, None)],
                                   "asset_id long, payload binary")
        with pytest.raises(ValueError, match="hash_size"):
            video_frame_hashes(df, hash_size=9)


class TestAudioBandEnergies:
    def test_matches_numpy_fft_bins(self, spark):
        """p_dc/p_mid/p_nyq are EXACTLY |X_0|², |X_2|², |X_4|² of the
        8-point DFT — checked against np.fft on random int16 frames."""
        from faisssearcher_spark.operators.multimodal import (
            audio_band_energies, build_wav)

        rng = np.random.default_rng(9)
        mono = rng.integers(-32768, 32768, size=24).astype(np.int16)
        df = spark.createDataFrame(
            [(1, bytearray(build_wav(mono, 8000)))],
            "asset_id long, payload binary")
        got = {r["frame_idx"]: r for r in
               audio_band_energies(df).collect()}
        assert sorted(got) == [0, 1, 2]
        for f in range(3):
            X = np.fft.fft(mono[f * 8:(f + 1) * 8].astype(np.float64))
            assert got[f]["p_dc"] == round(abs(X[0]) ** 2)
            assert got[f]["p_mid"] == round(abs(X[2]) ** 2)
            assert got[f]["p_nyq"] == round(abs(X[4]) ** 2)

    def test_frame_cap_and_null(self, spark):
        from faisssearcher_spark.operators.multimodal import (
            audio_band_energies, build_wav)

        mono = np.zeros(64, dtype=np.int16)
        df = spark.createDataFrame(
            [(1, bytearray(build_wav(mono, 8000))), (2, None)],
            "asset_id long, payload binary")
        got = audio_band_energies(df, max_frames=2).collect()
        assert {(r["asset_id"], r["frame_idx"]) for r in got} \
            == {(1, 0), (1, 1)}
        with pytest.raises(ValueError, match="max_frames"):
            audio_band_energies(df, max_frames=0)


class TestMinhashMatcher:
    def test_minhash_matcher_catches_shifted_noisy_copy(self, spark):
        """The fourth quadrant of the (aligned?, noisy?) matrix: a copy
        both SHIFTED by one frame and PER-FRAME PERTURBED. Every shared
        frame's dHash provably changes (pixel (0,0) flips its one
        comparison bit), so the exact-hash set matcher finds nothing;
        the band-token MinHash matcher must find the pair — each
        perturbed frame still shares its unchanged low band."""
        from faisssearcher_spark.operators.multimodal import (
            video_minhash_near_dup_pairs, video_shifted_near_dup_pairs)

        base = _frames(11, n=4)
        # force comparison j=0 deterministic: p(0,1)=128, p(0,0)=0
        base[:, 0, 0], base[:, 0, 1] = 0, 128
        noisy_shift = base[1:].copy()
        noisy_shift[:, 0, 0] = 255       # flips ONLY bit j=0 per frame
        other = _frames(12, n=4)
        df = spark.createDataFrame(
            [(0, bytearray(build_y4m(base))),
             (1, bytearray(build_y4m(noisy_shift))),
             (2, bytearray(build_y4m(other)))],
            "asset_id long, payload binary")
        # exact-hash set matching: all shared frames perturbed -> no hit
        assert video_shifted_near_dup_pairs(df).count() == 0
        got = video_minhash_near_dup_pairs(
            df, max_hamming=1, num_hashes=16, bands=16,
            verify_threshold=0.1).collect()
        assert [(r["id_a"], r["id_b"]) for r in got] == [(0, 1)]
        # jaccard over band tokens: 3 shared low bands of
        # union(4*2, 3*2) - 3 = 11 tokens
        assert abs(got[0]["jaccard"] - 3 / 11) < 1e-9

    def test_minhash_matcher_null_payload_skips(self, spark):
        from faisssearcher_spark.operators.multimodal import \
            video_minhash_near_dup_pairs

        df = spark.createDataFrame([(0, None), (1, None)],
                                   "asset_id long, payload binary")
        assert video_minhash_near_dup_pairs(df).count() == 0
