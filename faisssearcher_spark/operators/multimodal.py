"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star surface (BASELINE.json): a 100 TB training-data pipeline
carries images/audio/video as ``binary`` columns with structured metadata
alongside. The *Spark-side* machinery here is real and tested — schemas,
Arrow-batched ``mapInPandas`` decode/feature/resize/frame-sample stages,
partition-size guidance — while the media codecs are IMPORT-GATED
(the optional-FAISS pattern, operators/ann.py): ``decode_media``'s real
path lights up when Pillow is importable (grayscale intensity features
for images) and raises NotImplementedError cleanly when it is not, or
for compressed audio/video (soundfile/ffmpeg out of scope in this
container); the deterministic fake decoder always works, so the
engine's semantics never depend on a codec being present. AUDIO has a
real dependency-free route of its own — canonical PCM16 WAV parses
with pure numpy (:func:`_parse_wav`), feeding windowed integer
feature extraction (:func:`audio_features`: per-frame energy /
zero-crossings / peak) and exact decimation resampling
(:func:`audio_decimate`) — the same pattern as the PPM/BMP image path.

Scale notes:
- binary payloads dominate row size: cap ``spark.sql.files.maxPartitionBytes``
  so a task's Arrow batches fit executor memory, and keep metadata in
  separate (pruned) columns so metadata-only queries never touch bytes;
- decode stages are CPU-bound Python: ``mapInPandas`` with modest
  ``maxRecordsPerBatch`` (payloads are large) and one task per core is the
  right shape; never ``collect`` media to the driver.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               LongType, StringType, StructField, StructType)

#: canonical multimodal asset schema
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("modality", StringType()),      # image | audio | video
    StructField("mime_type", StringType()),
    StructField("payload", BinaryType()),       # opaque encoded bytes
    StructField("width", IntegerType()),        # media metadata (nullable)
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

FEATURE_DIM = 16


def asset_stats(df: DataFrame) -> DataFrame:
    """Metadata-only profile — must never read payload bytes beyond the
    length: per modality count, total/avg payload size."""
    return (df.groupBy("modality")
            .agg(F.count("*").alias("n_assets"),
                 F.sum(F.length("payload")).alias("total_bytes"),
                 F.round(F.avg(F.length("payload")), 2).alias("avg_bytes")))


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: md5-seeded pseudo
    features. Stable across processes/engines — used by tests."""
    h = hashlib.md5(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype(np.float32)


def pillow_available() -> bool:
    """True when Pillow can be imported — the same import-gating pattern
    as the optional FAISS kernels (operators/ann.py): the engine never
    hard-depends on codec libraries, it lights up the real path when the
    environment provides one."""
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def _real_decode_image(payload: bytes, dim: int) -> np.ndarray:
    """Real image decode via Pillow: grayscale → ``dim×1`` resize →
    [0, 1] floats. Deterministic (no RNG, bilinear on fixed input) and
    engine-independent — the simplest honest 'decode + feature-extract'
    a real pipeline would replace with a learned encoder."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return (np.asarray(img, dtype=np.float32).ravel() / 255.0)[:dim]


def _parse_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (h, w, 3) uint8. Pure numpy —
    PPM is a whitespace-delimited header plus raw RGB bytes, no codec
    needed. Comments (#…) are legal anywhere in the header."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1   # single whitespace after maxval, then raw pixels
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError(f"16-bit PPM unsupported (maxval={maxval})")
    n = w * h * 3
    pix = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return pix.reshape(h, w, 3)


def _parse_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP → (h, w, 3) uint8 RGB. Pure numpy — the
    format is a fixed little-endian header plus padded BGR rows
    (bottom-up unless height is negative)."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported "
                         f"(got bpp={bpp}, compression={comp})")
    stride = ((abs(w) * 3 + 3) // 4) * 4
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * abs(h),
                         offset=off).reshape(abs(h), stride)
    img = rows[:, :abs(w) * 3].reshape(abs(h), abs(w), 3)[..., ::-1]  # BGR→RGB
    if h > 0:   # positive height = bottom-up row order
        img = img[::-1]
    return np.ascontiguousarray(img)


def _native_decode_image(payload: bytes, dim: int) -> np.ndarray:
    """Dependency-free decode + feature-extract for the formats a plain
    numpy parser can read (P6 PPM, 24-bit BMP): grayscale = mean(RGB),
    features = per-segment means of the row-major flattened image split
    into ``dim`` near-equal runs, scaled to [0, 1]. Exact, seedless, and
    identical on every platform — a REAL decode path with zero codec
    dependencies (Pillow stays the route for compressed formats)."""
    if payload[:2] == b"P6":
        img = _parse_ppm(payload)
    elif payload[:2] == b"BM":
        img = _parse_bmp(payload)
    else:
        magic = bytes(payload[:4]) if payload else b""
        raise NotImplementedError(
            f"native decode reads P6 PPM and 24-bit BMP only (magic "
            f"{magic!r}); compressed formats need Pillow "
            f"(decoder='real')")
    gray = img.astype(np.float64).mean(axis=2).ravel()
    segs = np.array_split(gray, dim)
    return np.array([s.mean() if len(s) else 0.0 for s in segs],
                    dtype=np.float32) / np.float32(255.0)


def decode_media(df: DataFrame, *, decoder: str = "real",
                 feature_dim: int = FEATURE_DIM) -> DataFrame:
    """Decode payloads into fixed-size feature vectors via mapInPandas.

    ``decoder="real"`` is import-gated on Pillow (the FAISS pattern,
    operators/ann.py): when Pillow is present, image payloads decode to
    grayscale ``feature_dim``-pixel intensity vectors in [0, 1]; when it
    is absent — or a non-image modality reaches the real path (audio/
    video codecs are out of scope for this container) — the call raises
    NotImplementedError CLEANLY at plan-build time, before any job runs.
    ``decoder="fake"`` uses the deterministic md5-seeded stub so the full
    pipeline (schema, batching, downstream k-NN over features) is
    testable with no codec libraries at all.

    ``decoder="native"`` is the dependency-free REAL path: a pure-numpy
    parser for P6 PPM and uncompressed 24-bit BMP image payloads —
    always available, no Pillow, no codecs; unsupported magics raise
    NotImplementedError per batch (format is a data property, not a
    plan property).
    """
    if decoder not in ("real", "fake", "native"):
        raise ValueError("decoder must be 'real', 'fake', or 'native'")
    if decoder == "real" and not pillow_available():
        raise NotImplementedError(
            "real media decoding requires Pillow, which is not installed "
            "in this environment; use decoder='fake' for pipeline testing "
            "or install Pillow (PCM WAV audio has a dependency-free path "
            "via audio_features/audio_decimate; compressed audio/video "
            "need soundfile/ffmpeg and remain out of scope)")

    out_schema = StructType([
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("features", ArrayType(FloatType())),
    ])

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder in ("real", "native"):
                bad = pdf.loc[pdf["modality"] != "image", "modality"]
                if len(bad):
                    raise NotImplementedError(
                        f"{decoder} decoding implemented for modality="
                        f"'image' only (got {sorted(set(bad))}); PCM WAV "
                        f"audio has its own native path (audio_features/"
                        f"audio_decimate); compressed audio/video need "
                        f"soundfile/ffmpeg")
                fn = _real_decode_image if decoder == "real" \
                    else _native_decode_image
                feats = [fn(p, feature_dim).tolist()
                         for p in pdf["payload"]]
            else:
                feats = [_fake_decode(p, feature_dim).tolist()
                         for p in pdf["payload"]]
            yield pd.DataFrame({"asset_id": pdf["asset_id"],
                                "modality": pdf["modality"],
                                "features": feats})

    return df.select("asset_id", "modality", "payload").mapInPandas(
        _decode, out_schema)


def _decode_gray(payload: bytes, decoder: str) -> np.ndarray:
    """Payload → 2-D float64 grayscale pixel array, per decoder route
    (shared by the perceptual-hash path, which needs spatial structure
    rather than the 1-D feature vector :func:`decode_media` emits)."""
    if decoder == "native":
        if payload[:2] == b"P6":
            img = _parse_ppm(payload)
        elif payload[:2] == b"BM":
            img = _parse_bmp(payload)
        else:
            magic = bytes(payload[:4]) if payload else b""
            raise NotImplementedError(
                f"native decode reads P6 PPM and 24-bit BMP only "
                f"(magic {magic!r})")
        return img.astype(np.float64).mean(axis=2)
    if decoder == "real":
        import io

        from PIL import Image

        return np.asarray(Image.open(io.BytesIO(payload)).convert("L"),
                          dtype=np.float64)
    # fake: md5-seeded pseudo-image, stable across processes
    h = hashlib.md5(payload or b"").digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "big"))
    return rng.uniform(0.0, 255.0, size=(16, 17))


def _block_mean_resize(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Area-mean downsample to (out_h, out_w): partition rows/cols into
    near-equal runs and average each block. Deterministic, seedless, and
    decoder-independent — unlike interpolating resizers, every platform
    computes the identical result."""
    h, w = gray.shape
    if h < out_h or w < out_w:
        raise ValueError(
            f"image {h}x{w} smaller than target grid {out_h}x{out_w}")
    r_bounds = (np.arange(out_h) * h) // out_h
    c_bounds = (np.arange(out_w) * w) // out_w
    sums = np.add.reduceat(np.add.reduceat(gray, r_bounds, axis=0),
                           c_bounds, axis=1)
    r_sizes = np.diff(np.append(r_bounds, h))
    c_sizes = np.diff(np.append(c_bounds, w))
    return sums / np.outer(r_sizes, c_sizes)


def dhash_int(payload: bytes, *, decoder: str = "native",
              hash_size: int = 8) -> int:
    """Difference hash (dHash) of an image payload as a SIGNED 64-bit int
    (two's complement — Spark LongType): grayscale → area-mean resize to
    ``hash_size × (hash_size+1)`` → bit j = 1 iff pixel[i, k+1] > pixel[i, k],
    packed row-major MSB-first. Near-duplicate images (re-encodes, small
    crops, brightness shifts) land within a few bits; unrelated images are
    ~32 bits apart (the classic image-dedup fingerprint)."""
    if not 1 <= hash_size <= 8:
        raise ValueError(
            f"hash_size must be in [1, 8] ({hash_size * hash_size} bits "
            f"must fit the signed-64 LongType fingerprint)")
    return _dhash_from_gray(_decode_gray(payload, decoder), hash_size)


def _dhash_from_gray(gray: np.ndarray, hash_size: int) -> int:
    """dHash packing of an already-decoded grayscale array — shared by
    the image payload path (:func:`dhash_int`) and the per-frame video
    path (:func:`video_frame_hashes`), so both modalities carry ONE
    fingerprint definition into the banded-hamming dedup kernel."""
    small = _block_mean_resize(gray, hash_size, hash_size + 1)
    bits = (small[:, 1:] > small[:, :-1]).ravel()
    val = 0
    for b in bits:
        val = (val << 1) | int(b)
    n_bits = hash_size * hash_size
    if val >= 1 << (n_bits - 1) and n_bits == 64:
        val -= 1 << 64
    return val


def perceptual_hash(df: DataFrame, *, decoder: str = "native",
                    hash_size: int = 8) -> DataFrame:
    """Per-asset dHash fingerprints: ``(asset_id, phash: long)``.

    One vectorized ``mapInPandas`` stage — payloads never leave their
    partition, only 8-byte fingerprints come out, so the downstream
    near-dup join shuffles fingerprints, not images (the property that
    makes image dedup feasible at 100 TB of media).

    ``decoder`` routes like :func:`decode_media`: ``"native"`` (pure-numpy
    PPM/BMP, always available), ``"real"`` (Pillow, import-gated),
    ``"fake"`` (md5-seeded pseudo-image — pipeline tests without images).
    """
    if decoder not in ("real", "fake", "native"):
        raise ValueError("decoder must be 'real', 'fake', or 'native'")
    if not 1 <= hash_size <= 8:
        raise ValueError(
            f"hash_size must be in [1, 8] ({hash_size * hash_size} bits "
            f"must fit the signed-64 LongType fingerprint)")
    if decoder == "real" and not pillow_available():
        raise NotImplementedError(
            "decoder='real' requires Pillow; use decoder='native' for "
            "PPM/BMP payloads or decoder='fake' for pipeline testing")
    out_schema = StructType([
        StructField("asset_id", LongType()),
        StructField("phash", LongType()),
    ])

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder in ("real", "native"):
                bad = pdf.loc[pdf["modality"] != "image", "modality"]
                if len(bad):
                    raise NotImplementedError(
                        f"perceptual hashing is image-only "
                        f"(got {sorted(set(bad))})")
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "phash": [dhash_int(p, decoder=decoder, hash_size=hash_size)
                          for p in pdf["payload"]],
            })

    return df.select("asset_id", "modality", "payload").mapInPandas(
        _hash, out_schema)


def image_near_dup_pairs(df: DataFrame, *, decoder: str = "native",
                         hash_size: int = 8,
                         max_hamming: int = 4) -> DataFrame:
    """Near-duplicate image pairs: dHash fingerprints within
    ``max_hamming`` bits, via the shared banded-hamming kernel
    (:func:`~faisssearcher_spark.operators.dedup.hamming_pairs` — the
    same maximal-width pigeonhole band equi-join + popcount verify that
    backs SimHash text dedup; at the default 64-bit / hamming≤4 config
    that's 5 bands of 13/12 bits, a ~2^13 key space per band). Returns
    ``(id_a, id_b, hamming)``; the pair space is explored through
    band-bucket equi-joins over 8-byte fingerprints, so nothing
    image-sized ever shuffles or broadcasts."""
    from faisssearcher_spark.operators.dedup import hamming_pairs

    if not 1 <= hash_size <= 8:
        # surface dhash_int's own domain here, before the expensive
        # decode stage is planned (r5 ADVICE: a bad hash_size died
        # later with a confusing error from dedup; banding itself now
        # accepts any bit width)
        raise ValueError(
            f"hash_size must be in [1, 8] (hash_size² fingerprint bits "
            f"must fit a signed long); got {hash_size}")
    fps = perceptual_hash(df, decoder=decoder, hash_size=hash_size)
    return hamming_pairs(fps, id_col="asset_id", fp_col="phash",
                         bits=hash_size * hash_size,
                         max_hamming=max_hamming)


def _parse_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 → ``(sample_rate, samples (n, channels) int16)``.

    Pure numpy — canonical WAV is a little-endian chunk walk (``fmt ``
    carries format/channels/rate, ``data`` carries raw samples), no codec
    needed: the audio analog of :func:`_parse_ppm`/:func:`_parse_bmp`.
    Compressed/float/8-bit variants raise; Pillow-style optional codec
    libraries stay out of the dependency set."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = int.from_bytes(payload[pos + 4:pos + 8], "little")
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = (int.from_bytes(body[0:2], "little"),    # audio format
                   int.from_bytes(body[2:4], "little"),    # channels
                   int.from_bytes(body[4:8], "little"),    # sample rate
                   int.from_bytes(body[14:16], "little"))  # bits/sample
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)          # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV payload missing fmt/data chunk")
    audio_format, n_ch, rate, bits = fmt
    if audio_format != 1 or bits != 16:
        raise NotImplementedError(
            f"only PCM 16-bit WAV is supported (format={audio_format}, "
            f"bits={bits}); compressed/float audio needs soundfile/ffmpeg")
    if n_ch < 1:
        raise ValueError("WAV fmt chunk declares zero channels")
    samples = np.frombuffer(data, dtype="<i2",
                            count=(len(data) // (2 * n_ch)) * n_ch)
    return rate, samples.reshape(-1, n_ch)


def build_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """Inverse of :func:`_parse_wav`: int16 samples ``(n,)`` or
    ``(n, channels)`` → canonical PCM16 RIFF bytes. Used by tests and
    synthetic corpora; exact round-trip with the parser is pinned."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_ch = arr.shape[1]
    data = arr.tobytes()
    hdr = (b"RIFF" + (36 + len(data)).to_bytes(4, "little") + b"WAVE"
           + b"fmt " + (16).to_bytes(4, "little")
           + (1).to_bytes(2, "little") + n_ch.to_bytes(2, "little")
           + sample_rate.to_bytes(4, "little")
           + (sample_rate * 2 * n_ch).to_bytes(4, "little")
           + (2 * n_ch).to_bytes(2, "little") + (16).to_bytes(2, "little")
           + b"data" + len(data).to_bytes(4, "little"))
    return hdr + data


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType()),
    StructField("frame_idx", IntegerType()),
    StructField("sample_rate", IntegerType()),
    StructField("energy", LongType()),      # Σ s² over the frame (exact)
    StructField("zcr", IntegerType()),      # sign transitions in the frame
    StructField("peak", IntegerType()),     # max |s| in the frame
])


def audio_features(df: DataFrame, *, frame_samples: int = 512,
                   max_frames: int = 64) -> DataFrame:
    """Windowed audio feature extraction: one row per
    ``frame_samples``-sample frame of each PCM16 WAV payload.

    The real audio 'feature-extract' stage of the multimodal pipeline:
    payloads decode with the dependency-free RIFF parser inside ONE
    vectorized ``mapInPandas`` stage (audio bytes never shuffle — only
    the few-ints-per-frame feature rows come out), the signal frames
    into non-overlapping ``frame_samples`` windows (a trailing partial
    frame is dropped; frames are capped at ``max_frames``), and each
    frame emits EXACT integer features on the int16 samples: energy
    (Σ s², the loudness proxy), zero-crossing count (the classic
    voiced/unvoiced + spectral-coarseness heuristic, counted as
    ``sign(s[i-1]) != sign(s[i])`` with ``s >= 0`` positive), and peak
    amplitude (clipping detector). Multi-channel payloads use channel 0
    (documented; a learned encoder would replace this stage wholesale).

    Exactness is the point: integer features cross engines without any
    float-rounding caveats, so the decode→frame→feature path is
    oracle-checkable end-to-end (the ``audio`` leg of
    ``dedup_simhash_pairs`` builds WAV bytes in pure SQL, parses them
    back HERE, and DuckDB replays the arithmetic)."""
    if frame_samples < 2:
        raise ValueError(f"frame_samples must be >= 2 (got {frame_samples})")
    if max_frames < 1:
        raise ValueError(f"max_frames must be >= 1 (got {max_frames})")

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad = pdf.loc[pdf["modality"] != "audio", "modality"]
            if len(bad):
                raise NotImplementedError(
                    f"audio_features reads modality='audio' PCM WAV only "
                    f"(got {sorted(set(bad))})")
            out: dict[str, list] = {f.name: [] for f in AUDIO_FEATURE_SCHEMA}
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                rate, samples = _parse_wav(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                n_frames = min(len(mono) // frame_samples, max_frames)
                for f in range(n_frames):
                    w = mono[f * frame_samples:(f + 1) * frame_samples]
                    nonneg = w >= 0
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(f)
                    out["sample_rate"].append(rate)
                    out["energy"].append(int((w * w).sum()))
                    out["zcr"].append(int((nonneg[1:] != nonneg[:-1]).sum()))
                    out["peak"].append(int(np.abs(w).max()))
            yield pd.DataFrame(out)

    return df.select("asset_id", "modality", "payload").mapInPandas(
        _feats, AUDIO_FEATURE_SCHEMA)


def audio_decimate(df: DataFrame, *, factor: int) -> DataFrame:
    """Integer decimation resample: keep every ``factor``-th sample and
    divide the declared rate — the 'resize' stage for audio, exact by
    construction (no interpolation, no filter state, engine-independent).
    Emits the same asset schema with re-encoded PCM16 WAV payloads, so
    the output feeds :func:`audio_features` or any downstream stage
    unchanged. Payloads transform in place per partition (mapInPandas);
    nothing audio-sized shuffles."""
    if factor < 1:
        raise ValueError(f"factor must be >= 1 (got {factor})")

    out_schema = StructType([
        StructField("asset_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("sample_rate", IntegerType()),
    ])

    def _dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bad = pdf.loc[pdf["modality"] != "audio", "modality"]
            if len(bad):
                raise NotImplementedError(
                    f"audio_decimate reads modality='audio' PCM WAV only "
                    f"(got {sorted(set(bad))})")
            payloads, rates = [], []
            for payload in pdf["payload"]:
                rate, samples = _parse_wav(bytes(payload))
                if rate % factor:
                    raise ValueError(
                        f"decimation factor {factor} must divide the "
                        f"sample rate {rate} (fractional resampling needs "
                        f"an interpolating resampler)")
                payloads.append(build_wav(samples[::factor],
                                          rate // factor))
                rates.append(rate // factor)
            yield pd.DataFrame({"asset_id": pdf["asset_id"],
                                "modality": pdf["modality"],
                                "payload": payloads,
                                "sample_rate": rates})

    return df.select("asset_id", "modality", "payload").mapInPandas(
        _dec, out_schema)


def audio_fingerprint(df: DataFrame, *, frame_samples: int = 512,
                      n_bits: int = 32) -> DataFrame:
    """Acoustic fingerprint: ``n_bits``-bit energy-delta-sign signature
    per PCM16 WAV asset — bit ``f`` is set iff frame ``f+1`` is louder
    than frame ``f`` (the shape-of-the-envelope idea behind
    Chromaprint-family audio IDs, reduced to the exact-integer energy
    feature so it crosses engines with zero float caveats).

    Decode happens once in the :func:`audio_features` mapInPandas stage
    (audio bytes never shuffle); the bit packing on top is pure Catalyst
    — a ``lead`` window over the per-frame energies (frames past the end
    of the signal count as silence/energy 0) and a ``shiftleft`` sum.
    Returns ``(asset_id, fp)`` with ``fp`` a signed long (``n_bits`` ≤
    64; bit 63 lands in the sign bit, which the downstream banded kernel
    handles). Assets shorter than one frame emit no row — there is no
    signal to key on. Invariant to trailing silence only insofar as
    missing frames read as 0-energy; same-length requirement is the
    caller's (decimate first to normalize rates)."""
    if not 1 <= n_bits <= 64:
        raise ValueError(f"n_bits must be in [1, 64]; got {n_bits}")
    from pyspark.sql import Window

    feats = audio_features(df, frame_samples=frame_samples,
                           max_frames=n_bits + 1)
    w = Window.partitionBy("asset_id").orderBy("frame_idx")
    bit = (F.lead("energy", 1, 0).over(w) > F.col("energy")).cast("long")
    # Python F.shiftleft only takes a literal shift — the SQL form takes
    # any expression, and frame_idx is the shift here
    weight = F.expr("shiftleft(CAST(1 AS BIGINT), frame_idx)")
    return (feats
            .withColumn("__bit", bit * weight)
            .filter(F.col("frame_idx") < n_bits)
            .groupBy("asset_id")
            .agg(F.sum("__bit").alias("fp")))


def audio_near_dup_pairs(df: DataFrame, *, frame_samples: int = 512,
                         n_bits: int = 32, max_hamming: int = 3
                         ) -> DataFrame:
    """Near-duplicate audio pairs: :func:`audio_fingerprint` signatures
    within ``max_hamming`` bits of each other, via the same
    maximal-width pigeonhole band kernel as SimHash text pairs and dHash
    image pairs (``dedup.hamming_pairs``) — the audio leg of the
    modality matrix. Only (asset_id, fp) longs ever shuffle; candidates
    are a banded equi-join, verification is XOR + popcount. Returns
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``."""
    from faisssearcher_spark.operators.dedup import hamming_pairs

    fps = audio_fingerprint(df, frame_samples=frame_samples, n_bits=n_bits)
    return hamming_pairs(fps, id_col="asset_id", fp_col="fp",
                         bits=n_bits, max_hamming=max_hamming)


def frame_sample(df: DataFrame, *, every_ms: int = 1000,
                 max_frames: int = 16) -> DataFrame:
    """Video frame-sampling plan: one output row per sampled frame offset.

    The *frame extraction* itself is part of the stubbed decode; what is
    real here is the row-explosion semantics a frame pipeline needs —
    offsets derived from duration metadata, bounded by ``max_frames``."""
    offsets = F.sequence(
        F.lit(0),
        F.least(((F.coalesce(F.col("duration_ms"), F.lit(0)) - 1) / every_ms)
                .cast("long"),
                F.lit(max_frames - 1)))
    return (df.filter(F.col("modality") == "video")
            .withColumn("frame_idx", F.explode(offsets))
            .withColumn("frame_offset_ms", F.col("frame_idx") * every_ms)
            .select("asset_id", "frame_idx", "frame_offset_ms"))


# ---------------------------------------------------------------------------
# video: Y4M (YUV4MPEG2) — the codec-free real decode path
# ---------------------------------------------------------------------------
# The video analog of the PPM/BMP image and RIFF/WAVE audio parsers:
# YUV4MPEG2 is a public uncompressed container (plain-ASCII stream
# header + per-frame "FRAME\n" markers + raw plane bytes), so a pure-
# numpy parser covers it with zero codec dependencies. Only the Cmono
# (8-bit grayscale) colorspace is implemented — chroma-subsampled
# (C420/C422/C444) and any compressed container remain the documented
# NotImplementedError stub boundary, exactly like compressed audio.


def _parse_y4m(payload: bytes) -> "tuple[int, int, np.ndarray]":
    """Parse a YUV4MPEG2 ``Cmono`` stream → ``(w, h, frames)`` with
    ``frames`` a ``(n, h, w)`` uint8 luma array."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream (missing signature)")
    w = h = None
    colorspace = "420"                       # the spec's default
    for tok in payload[9:nl].split(b" "):
        if not tok:
            continue
        key, val = tok[:1], tok[1:]
        if key == b"W":
            w = int(val)
        elif key == b"H":
            h = int(val)
        elif key == b"C":
            colorspace = val.decode("ascii", "replace")
    if not w or not h or w < 1 or h < 1:
        raise ValueError("YUV4MPEG2 header missing W/H")
    if not colorspace.startswith("mono"):
        raise NotImplementedError(
            f"only the Cmono (grayscale) Y4M colorspace is implemented; "
            f"C{colorspace} needs chroma-plane handling — the documented "
            "stub boundary (decode compressed/chroma video upstream)")
    frames = []
    pos = nl + 1
    size = w * h
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload.startswith(b"FRAME", pos):
            raise ValueError("corrupt Y4M: expected FRAME marker")
        plane = payload[fnl + 1:fnl + 1 + size]
        if len(plane) != size:
            raise ValueError("corrupt Y4M: truncated frame plane")
        frames.append(np.frombuffer(plane, dtype=np.uint8)
                      .reshape(h, w))
        pos = fnl + 1 + size
    return w, h, (np.stack(frames) if frames
                  else np.zeros((0, h, w), dtype=np.uint8))


def build_y4m(frames: np.ndarray, *, fps: int = 25) -> bytes:
    """Serialize a ``(n, h, w)`` uint8 array as a ``Cmono`` YUV4MPEG2
    stream (the synthesis half, like :func:`build_wav`)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise ValueError(f"frames must be (n, h, w); got {frames.shape}")
    n, h, w = frames.shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps}:1 Cmono\n".encode("ascii")]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(frames[i].tobytes())
    return b"".join(out)


_VIDEO_FEATURES_SCHEMA = ("asset_id long, frame_idx int, luma_sum long, "
                          "luma_max int, motion long")


def video_frame_features(df: DataFrame, *, max_frames: int = 64,
                         id_col: str = "asset_id",
                         payload_col: str = "payload") -> DataFrame:
    """Exact integer per-frame features of ``Cmono`` Y4M payloads: one
    row per (video, frame) with ``luma_sum`` (Σ pixel — brightness),
    ``luma_max``, and ``motion`` (Σ |pixel − previous frame's pixel| —
    the frame-difference energy; 0 for frame 0). All integers, so the
    whole decode→frame→feature arc crosses engines with zero float
    caveats (the audio_features discipline). Frames cap at
    ``max_frames`` (sample longer videos upstream via
    :func:`frame_sample` offsets). NULL payloads are SKIPPED (they
    emit no rows) — the deliberate contract for the whole Y4M/spectrum
    family: a decode-failure row is an upstream data issue, and a
    100 TB pass should not die on one asset; count them with
    asset_stats or a payload-isNotNull audit if loss must be loud
    (audio_features, by contrast, raises — the older convention)."""
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("__p"))

    def _feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["__p"]):
                if payload is None:
                    continue
                _, _, frames = _parse_y4m(bytes(payload))
                fr = frames[:max_frames].astype(np.int64)
                for i in range(len(fr)):
                    motion = (int(np.abs(fr[i] - fr[i - 1]).sum())
                              if i else 0)
                    rows.append((int(aid), i, int(fr[i].sum()),
                                 int(fr[i].max()), motion))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx",
                                              "luma_sum", "luma_max",
                                              "motion"])

    return src.mapInPandas(_feats, schema=_VIDEO_FEATURES_SCHEMA)


def video_frame_hashes(df: DataFrame, *, hash_size: int = 8,
                       max_frames: int = 64,
                       id_col: str = "asset_id",
                       payload_col: str = "payload") -> DataFrame:
    """Per-frame perceptual dHash of ``Cmono`` Y4M payloads — the video
    fingerprint table ``(asset_id, frame_idx, fhash)``: each frame runs
    the SAME area-mean resize + difference-hash as the image path
    (:func:`dhash_int`), so image and video fingerprints share one
    definition and one banded-hamming dedup kernel."""
    if not 1 <= hash_size <= 8:
        raise ValueError(
            f"hash_size must be in [1, 8] ({hash_size * hash_size} bits "
            "must fit the signed-64 LongType fingerprint)")
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("__p"))

    def _hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["__p"]):
                if payload is None:
                    continue
                _, _, frames = _parse_y4m(bytes(payload))
                for i, fr in enumerate(frames[:max_frames]):
                    rows.append((int(aid), i,
                                 _dhash_from_gray(fr, hash_size)))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx",
                                              "fhash"])

    return src.mapInPandas(_hashes,
                           schema="asset_id long, frame_idx int, "
                                  "fhash long")


def video_near_dup_pairs(df: DataFrame, *, hash_size: int = 8,
                         max_frames: int = 64, max_hamming: int = 4,
                         min_matching_frames: int = 1,
                         id_col: str = "asset_id",
                         payload_col: str = "payload") -> DataFrame:
    """Video pairs sharing ≥ ``min_matching_frames`` ALIGNED frames
    whose dHashes are within ``max_hamming`` bits — re-encodes, small
    brightness shifts, and watermark overlays land here; temporally
    shifted cuts do not (alignment is by frame index; resample to a
    common rate upstream via :func:`frame_sample` offsets first).

    Scale shape: candidates come from the maximal-width pigeonhole
    band plan (dedup.hamming_band_widths) with ``frame_idx`` FOLDED
    into the equi-join key, so band collisions only ever pair aligned
    frames and the join stays linear exactly like
    :func:`image_near_dup_pairs`; the per-pair frame-match count is
    one map-side-combinable groupBy. Returns ``(id_a, id_b,
    n_matching_frames)`` with ``id_a < id_b``."""
    from faisssearcher_spark.operators.dedup import hamming_band_rows

    fh = video_frame_hashes(df, hash_size=hash_size,
                            max_frames=max_frames, id_col=id_col,
                            payload_col=payload_col)
    # the SHARED banding kernel (one definition with hamming_pairs and
    # the FingerprintStore), frame_idx carried through so the join can
    # fold alignment into the band key equality below
    banded = hamming_band_rows(fh, id_col="asset_id", fp_col="fhash",
                               bits=hash_size * hash_size,
                               max_hamming=max_hamming,
                               extra_cols=("frame_idx",))
    a, b = banded.alias("a"), banded.alias("b")
    frame_pairs = (
        a.join(b, (F.col("a.frame_idx") == F.col("b.frame_idx"))
               & (F.col("a.band_idx") == F.col("b.band_idx"))
               & (F.col("a.band_val") == F.col("b.band_val"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
                F.col("a.frame_idx").alias("frame_idx"),
                F.col("a.fp").alias("fp_a"),
                F.col("b.fp").alias("fp_b"))
        .distinct()
        .filter(F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
                <= max_hamming)
    )
    return (frame_pairs.groupBy("id_a", "id_b")
            .agg(F.count("*").alias("n_matching_frames"))
            .filter(F.col("n_matching_frames") >= min_matching_frames))


def video_shifted_near_dup_pairs(df: DataFrame, *, hash_size: int = 8,
                                 max_frames: int = 64,
                                 min_shared_hashes: int = 1,
                                 id_col: str = "asset_id",
                                 payload_col: str = "payload"
                                 ) -> DataFrame:
    """Shift-TOLERANT video near-dup: videos sharing ≥
    ``min_shared_hashes`` distinct frame dHashes at ANY alignment —
    the trimmed-intro / re-cut case :func:`video_near_dup_pairs`'s
    frame-index alignment deliberately excludes. Each video is treated
    as the SET of its frame fingerprints; candidates come from one
    equi-join on the 64-bit hash value itself (exact-hash matching —
    a shifted copy's unaltered frames hash identically; per-frame
    pixel noise is the aligned matcher's banded-hamming job, temporal
    shift is this one's).

    Scale shape: the hash table is (videos × frames) rows of 16 B; the
    self-join is a plain equi-join on ``fhash`` whose output is
    ∝ true matches + birthday collisions (64-bit keys: negligible),
    then one map-side-combinable distinct-count per pair. Returns
    ``(id_a, id_b, n_shared_hashes)`` with ``id_a < id_b``."""
    if min_shared_hashes < 1:
        raise ValueError(
            f"min_shared_hashes must be >= 1, got {min_shared_hashes}")
    fh = video_frame_hashes(df, hash_size=hash_size,
                            max_frames=max_frames, id_col=id_col,
                            payload_col=payload_col) \
        .select("asset_id", "fhash").distinct()
    a, b = fh.alias("a"), fh.alias("b")
    return (a.join(b, (F.col("a.fhash") == F.col("b.fhash"))
                   & (F.col("a.asset_id") < F.col("b.asset_id")))
            .groupBy(F.col("a.asset_id").alias("id_a"),
                     F.col("b.asset_id").alias("id_b"))
            .agg(F.count("*").alias("n_shared_hashes"))
            .filter(F.col("n_shared_hashes") >= min_shared_hashes))


def video_minhash_near_dup_pairs(df: DataFrame, *, hash_size: int = 8,
                                 max_frames: int = 64,
                                 max_hamming: int = 4,
                                 num_hashes: int = 16,
                                 bands: "int | None" = None,
                                 seed: int = 42,
                                 verify_threshold: float | None = 0.15,
                                 id_col: str = "asset_id",
                                 payload_col: str = "payload"
                                 ) -> DataFrame:
    """Shift-AND-noise-tolerant video near-dup — the fourth quadrant of
    the (aligned?, noisy?) matrix the other three matchers leave open:

    - aligned + noisy → :func:`video_near_dup_pairs` (banded hamming,
      frame_idx folded into the key);
    - shifted + clean → :func:`video_shifted_near_dup_pairs` (exact
      64-bit hash set intersection);
    - shifted + NOISY → a trimmed/re-cut copy that was ALSO re-encoded
      perturbs every frame hash, so exact-hash equality finds nothing
      and frame alignment doesn't exist. This matcher closes it.

    Construction: each video becomes the SET of pigeonhole band tokens
    of its frame dHashes — :func:`dedup.hamming_band_rows`, the ONE
    shared banding kernel, WITHOUT frame_idx (shift tolerance) — and
    the sets go through the standard banded MinHash LSH
    (:func:`dedup.minhash_lsh_join` via its pre-tokenized path). Per
    the pigeonhole guarantee, a frame whose copy differs by ≤
    ``max_hamming`` bits shares at least one of its ``max_hamming+1``
    band tokens, so a shifted noisy twin sharing m of n frames has
    band-token Jaccard ≥ m / ((max_hamming+1)·n) even when EVERY
    shared frame was perturbed. Verification is exact Jaccard over the
    band-token sets; LSH recall is the usual 1-(1-j^r)^b — size
    ``bands`` to the target Jaccard. ``bands`` DEFAULTS to
    ``num_hashes`` (r=1): the shifted+noisy-twin scenario this
    function exists for produces band-token Jaccard around 0.2, where
    r=4 banding recalls under 1% (r10 advice) — r=1 is the
    small-set/high-recall screening setting; lower ``bands`` only to
    trade recall for candidate volume on huge corpora.

    Why MinHash instead of joining band tokens directly: a direct
    equi-join on band tokens has key space 2^(bits/(max_hamming+1)) —
    at max_hamming=4 that is 2^12..2^13, which goes quadratic once the
    corpus dwarfs it (the fixed-resolution-LSH cliff, scalebench
    module docstring). The MinHash signature re-keys candidates into
    the 64-bit band-value space regardless of max_hamming, keeping the
    join linear; the aligned matcher never needed this because folding
    frame_idx into the key already shattered the collisions.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``; jaccard is
    over band-token sets (a lower bound proxy for frame overlap, not a
    frame count). NULL payloads emit no frame hashes and therefore no
    pairs (the Y4M-family skip contract)."""
    from faisssearcher_spark.operators.dedup import (hamming_band_rows,
                                                     minhash_lsh_join)

    if bands is None:
        bands = num_hashes
    fh = video_frame_hashes(df, hash_size=hash_size,
                            max_frames=max_frames, id_col=id_col,
                            payload_col=payload_col)
    banded = hamming_band_rows(fh, id_col="asset_id", fp_col="fhash",
                               bits=hash_size * hash_size,
                               max_hamming=max_hamming)
    toks = banded.groupBy("id").agg(
        F.collect_set(F.concat_ws(
            ":", F.col("band_idx").cast("string"),
            F.col("band_val").cast("string"))).alias("__btoks"))
    return minhash_lsh_join(toks, id_col="id", tokens_col="__btoks",
                            num_hashes=num_hashes, bands=bands,
                            seed=seed,
                            verify_threshold=verify_threshold)


def audio_band_energies(df: DataFrame, *, max_frames: int = 64,
                        id_col: str = "asset_id",
                        payload_col: str = "payload") -> DataFrame:
    """Integer-EXACT coarse power spectrum per 8-sample frame of a
    PCM16 WAV payload: the three DFT bins whose twiddles are all in
    {0, ±1} — DC (k=0: (Σs)²), quarter-band (k=2: (s0−s2+s4−s6)² +
    (s1−s3+s5−s7)²), and Nyquist (k=4: (Σ(−1)ⁿs)²). Together they
    read as bass / mid / treble balance — the spectral-tilt signal an
    audio quality filter wants — while staying pure integer arithmetic
    on int16 samples (every power < 2⁴⁰), so the whole
    decode→frame→spectrum path crosses engines with ZERO float
    caveats, exactly like :func:`audio_features`. Fuller spectra need
    irrational twiddles (√2/2 at k=1,3) and live outside the
    integer-oracle discipline — compose a real FFT stage downstream
    for those.

    Output: ``(asset_id, frame_idx, p_dc, p_mid, p_nyq)`` longs, one
    row per non-overlapping 8-sample frame (trailing partial frame
    dropped; frames capped at ``max_frames``). NULL payloads emit no
    rows (the Y4M-family skip contract — see video_frame_features)."""
    if max_frames < 1:
        raise ValueError(f"max_frames must be >= 1 (got {max_frames})")
    src = df.select(F.col(id_col).alias("asset_id"),
                    F.col(payload_col).alias("__p"))

    def _spec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["__p"]):
                if payload is None:
                    continue
                _, samples = _parse_wav(bytes(payload))
                mono = samples[:, 0].astype(np.int64)
                n_frames = min(len(mono) // 8, max_frames)
                for f in range(n_frames):
                    w = mono[f * 8:(f + 1) * 8]
                    dc = int(w.sum())
                    re2 = int(w[0] - w[2] + w[4] - w[6])
                    im2 = int(w[1] - w[3] + w[5] - w[7])
                    nyq = int((w[::2] - w[1::2]).sum())
                    rows.append((int(aid), f, dc * dc,
                                 re2 * re2 + im2 * im2, nyq * nyq))
            yield pd.DataFrame(rows, columns=["asset_id", "frame_idx",
                                              "p_dc", "p_mid", "p_nyq"])

    return src.mapInPandas(_spec,
                           schema="asset_id long, frame_idx int, "
                                  "p_dc long, p_mid long, p_nyq long")
