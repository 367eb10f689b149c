"""Multimodal-column plumbing: image/audio/video as opaque binary columns.

The Spark-side design is real and tested — schema, partition-aware
mapInPandas over Arrow batches, typed metadata extraction — while the
actual media decode is selectable: `decode_stub=True` (the registered
queries' mode) produces a deterministic fake feature vector from the
bytes; `decode_stub=False` decodes IMAGE payloads for real (PIL when
importable for full format coverage, else a pure-Python PNG decoder —
stdlib zlib + numpy, all five scanline filters — so image decode is
real even codec-free, r12), AUDIO payloads for real with zero extra
dependencies (PCM WAV via stdlib wave + numpy log-mel energy strip,
r12), and VIDEO payloads for real when the container is
uncompressed-DIB AVI (pure RIFF parse, mean-pooled per-frame strips,
r12). Compressed audio/video and PIL-less non-PNG images raise
NotImplementedError (ffmpeg is not gated in — nothing pretends to
decode what it can't); errors='reject' isolates such failures to the
row for streaming arrival.

At 100 TB the pattern is: binary payloads in their own parquet column
(parquet keeps them out of unrelated scans via column pruning), small
typed metadata columns alongside for pruning/filtering, and all
per-item CPU work in Arrow-batched mapInPandas so bytes cross the
JVM<->Python boundary exactly once per batch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), nullable=False),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),  # opaque encoded bytes
        StructField("width", IntegerType()),  # typed metadata (nullable per type)
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload_bytes", IntegerType()),
        StructField("content_hash", StringType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)

# errors="reject" mode: FEATURE_SCHEMA plus the per-row failure reason
# (new column appended at the END — the metrics-schema discipline)
FEATURE_SCHEMA_LENIENT = StructType(
    FEATURE_SCHEMA.fields + [StructField("decode_error", StringType())]
)


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decode+embed: bytes -> sha256 ->
    dim floats in [0, 1). Keeps tests meaningful (stable, content-
    sensitive) without codec libraries."""
    out = []
    h = hashlib.sha256(payload or b"").digest()
    for i in range(dim):
        chunk = h[(i * 4) % 28 : (i * 4) % 28 + 4]
        out.append(int.from_bytes(chunk, "big") / 2**32)
    return out


# MPEG audio frame-header tables (public ISO/IEC 11172-3 / 13818-3
# layout): Layer III bitrates (kbps) per version family, sample rates
# per version. Version field: 0=MPEG2.5, 1=reserved, 2=MPEG2, 3=MPEG1.
_MP3_BITRATES_V1 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_MP3_BITRATES_V2 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, 0]
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _mp3_parse(payload: bytes) -> dict:
    """Pure-Python MPEG Layer III FRAME PARSE (headers only, no PCM):
    skip an ID3v2 preamble, then walk sync-aligned frame headers —
    version/bitrate/samplerate/padding decode per the public spec,
    frame length 144*bitrate/samplerate(+pad) for MPEG1 and half-rate
    for MPEG2/2.5 (576-sample granules) — accumulating frame count and
    exact stream duration. A trailing 128-byte ID3v1 'TAG' block is
    consumed; anything else that breaks sync raises fail-loud.

    This is the VALIDATION half of mp3 support (r14, VERDICT r13 #7):
    it proves a payload IS a well-formed MPEG stream and measures its
    geometry without any codec library, which lets the decode gate
    distinguish 'valid mp3, PCM decode needs a codec lib' (a
    CodecMissingError deployment condition, counted in
    n_codec_missing) from 'corrupt/unknown bytes' (a data reject) —
    the same two-tier taxonomy MJPG-in-AVI got in r13. Actual PCM
    decode (huffman + IMDCT + synthesis filterbank) stays deliberately
    out: it needs a real codec, and a fake would poison dedup."""
    b = bytes(payload)
    pos = 0
    if b[:3] == b"ID3" and len(b) >= 10:
        size = (
            ((b[6] & 0x7F) << 21) | ((b[7] & 0x7F) << 14)
            | ((b[8] & 0x7F) << 7) | (b[9] & 0x7F)
        )
        pos = 10 + size + (10 if b[5] & 0x10 else 0)  # + footer if flagged
    n_frames = 0
    duration = 0.0
    rates: set[int] = set()
    bitrates: list[int] = []
    while pos + 4 <= len(b):
        if b[pos : pos + 3] == b"TAG" and len(b) - pos == 128:
            pos += 128  # ID3v1 trailer
            continue
        h = b[pos : pos + 4]
        if h[0] != 0xFF or (h[1] & 0xE0) != 0xE0:
            raise NotImplementedError(
                f"mp3 parse: lost frame sync at byte {pos} — corrupt stream "
                "or not MPEG audio"
            )
        version = (h[1] >> 3) & 0x3
        layer = (h[1] >> 1) & 0x3
        if version == 1 or layer != 1:
            raise NotImplementedError(
                "mp3 parse supports MPEG-1/2/2.5 Layer III frames only "
                f"(version bits {version}, layer bits {layer})"
            )
        br_idx = h[2] >> 4
        sr_idx = (h[2] >> 2) & 0x3
        padding = (h[2] >> 1) & 1
        if br_idx in (0, 15) or sr_idx == 3:
            raise NotImplementedError(
                "mp3 parse: free-format/invalid bitrate or reserved sample "
                "rate — not a conforming stream"
            )
        bitrate = (
            _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
        )[br_idx] * 1000
        sr = _MP3_RATES[version][sr_idx]
        spf = 1152 if version == 3 else 576
        flen = (spf // 8) * bitrate // sr + padding
        if flen <= 4 or pos + flen > len(b):
            raise NotImplementedError(
                f"truncated mp3: frame at byte {pos} claims {flen} bytes "
                f"with {len(b) - pos} remaining"
            )
        n_frames += 1
        duration += spf / sr
        rates.add(sr)
        bitrates.append(bitrate)
        pos += flen
    if pos != len(b):
        # 1-3 bytes past the last whole frame header slot: too short to
        # even start a header, but still a sync break under the
        # fail-loud contract (a stream truncated mid-header by <=3
        # bytes must not validate; ADVICE r14 #2)
        raise NotImplementedError(
            f"mp3 parse: {len(b) - pos} trailing bytes after the last "
            "frame — truncated header or junk suffix"
        )
    if n_frames == 0:
        raise NotImplementedError("mp3 parse: no MPEG frames in payload")
    if len(rates) != 1:
        raise NotImplementedError(
            f"mp3 parse: mixed sample rates {sorted(rates)} — malformed splice"
        )
    return {
        "n_frames": n_frames,
        "sample_rate": rates.pop(),
        "duration_ms": int(round(duration * 1000)),
        "bitrate_kbps": sum(bitrates) // len(bitrates) // 1000,
        "vbr": len(set(bitrates)) > 1,
    }


def _mp3_encode_headers(
    n_frames: int = 5, sample_rate: int = 44100, bitrate_kbps: int = 128,
    id3: bool = False,
) -> bytes:
    """Fixture generator: a conforming MPEG-1 Layer III frame-header
    stream (zero-filled frame bodies — the parser reads headers only;
    a real encoder fills huffman data the parse never touches)."""
    sr_idx = {44100: 0, 48000: 1, 32000: 2}[sample_rate]
    br_idx = _MP3_BITRATES_V1.index(bitrate_kbps)
    flen = 144 * bitrate_kbps * 1000 // sample_rate
    header = bytes(
        [0xFF, 0xFB, (br_idx << 4) | (sr_idx << 2), 0x00]
    )  # MPEG1 L3, no padding, no CRC
    frame = header + b"\x00" * (flen - 4)
    out = frame * n_frames
    if id3:
        body = b"\x00" * 100
        out = (
            b"ID3\x04\x00\x00"
            + bytes([(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F,
                     (len(body) >> 7) & 0x7F, len(body) & 0x7F])
            + body + out
        )
    return out


def _wav_pcm_mono(payload: bytes):
    """Decode a PCM WAV payload to (mono float64 signal in [-1, 1],
    sample rate) — the shared decode half of _wav_audio_feature and
    the fingerprint path (_wav_band_argmax_seq, r15): 8/16/24/32-bit
    PCM, channel mean, with the full two-tier error taxonomy (a
    payload that parses as a conforming MPEG/FLAC stream raises
    CodecMissingError; corrupt bytes stay a data reject; a null
    payload is a ValueError)."""
    import struct
    import wave
    from io import BytesIO

    import numpy as np

    if payload is None:
        raise ValueError("null media payload reached the real audio decode path")
    try:
        with wave.open(BytesIO(bytes(payload))) as w:
            n_ch = w.getnchannels()
            sampwidth = w.getsampwidth()
            sr = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        # stdlib wave leaks a BARE RuntimeError from its internal chunk
        # seek on a corrupted chunk size (wave.py Chunk.seek) — found by
        # the r13 corruption fuzz; it is a corrupt-container condition
        # exactly like wave.Error and must keep the fail-loud contract.
        # r14 two-tier taxonomy (the MJPG move for audio): a payload
        # that PARSES as a conforming MPEG Layer III stream is a
        # missing-codec DEPLOYMENT condition (CodecMissingError ->
        # n_codec_missing), proven by the pure frame-header walk —
        # anything else stays a corrupt/unsupported data reject.
        try:
            probe = _mp3_parse(payload)
            kind = (
                f"MPEG Layer III stream ({probe['n_frames']} frames, "
                f"{probe['sample_rate']} Hz, {probe['duration_ms']} ms, "
                f"~{probe['bitrate_kbps']} kbps"
                f"{', VBR' if probe['vbr'] else ''})"
            )
        except Exception:
            try:
                probe = _flac_probe(payload)
                kind = (
                    f"FLAC stream ({probe['n_frames']} samples, "
                    f"{probe['sample_rate']} Hz, {probe['duration_ms']} ms)"
                )
            except Exception:
                probe = None
        if probe is not None:
            raise CodecMissingError(
                f"valid {kind} — PCM decode needs a codec lib "
                "(ffmpeg/librosa); transcode upstream or use "
                "decode_stub=True"
            ) from e
        raise NotImplementedError(
            "real audio decode is implemented for PCM WAV payloads "
            "(stdlib wave); compressed or corrupt containers "
            "(ogg, corrupt mp3/flac, truncated/bit-flipped RIFF) need "
            "ffmpeg/librosa — transcode upstream or use decode_stub=True"
        ) from e
    if sampwidth == 1:  # WAV 8-bit is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 3:
        b3 = np.frombuffer(raw, dtype=np.uint8)
        b3 = b3[: len(b3) - len(b3) % 3].reshape(-1, 3).astype(np.int32)
        v = b3[:, 0] | (b3[:, 1] << 8) | (b3[:, 2] << 16)
        x = np.where(v >= 1 << 23, v - (1 << 24), v).astype(np.float64) / float(1 << 23)
    elif sampwidth == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"unsupported WAV sample width: {sampwidth}")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, sr


def _mel_energies(x, sr: int, dim: int):
    """Mel-band energies of a mono float signal — the spectral half of
    _wav_audio_feature, shared with the fingerprint path: Hann-windowed
    512-sample power spectra averaged over 256-hop frames, an HTK-mel
    triangular filterbank (dim bands, 0..sr/2). Returns the LINEAR
    band energies (callers log1p for the feature strip, argmax for the
    fingerprint — argmax is monotone-invariant so both views agree on
    the dominant band)."""
    import numpy as np

    n_fft, hop = 512, 256
    if len(x) == 0:
        return np.zeros(dim)
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]
    power = (np.abs(np.fft.rfft(frames * np.hanning(n_fft), axis=1)) ** 2).mean(axis=0)
    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    pts = imel(np.linspace(mel(0.0), mel(sr / 2.0), dim + 2))
    bins = np.floor((n_fft + 1) * pts / sr).astype(int).clip(0, n_fft // 2)
    fb = np.zeros((dim, n_fft // 2 + 1))
    for j in range(dim):
        lo, c, hi = bins[j], bins[j + 1], bins[j + 2]
        if lo == hi:  # degenerate triangle (tiny sr / large dim)
            fb[j, c] = 1.0
            continue
        for k in range(lo, c):
            fb[j, k] = (k - lo) / (c - lo)
        for k in range(c, hi):
            fb[j, k] = (hi - k) / (hi - c)
    return fb @ power


def _wav_audio_feature(payload: bytes, dim: int) -> list[float]:
    """Real audio feature from a PCM WAV payload — stdlib `wave` +
    numpy, no codec library needed: a log-mel energy strip of length
    `dim` (decode via _wav_pcm_mono, spectra via _mel_energies — the
    shape librosa's melspectrogram would give, computed from
    primitives so the real path works in codec-free containers).
    Compressed formats raise fail-loud per the two-tier taxonomy on
    _wav_pcm_mono; empty/silent audio yields all-zero features
    (log1p(0))."""
    import numpy as np

    x, sr = _wav_pcm_mono(payload)
    return [float(v) for v in np.log1p(_mel_energies(x, sr, dim))]


def _pil_image_feature(payload: bytes, dim: int) -> list[float]:
    """Real image feature via PIL: grayscale, NEAREST-resample to a
    (dim, 1) strip, pixels scaled to [0, 1]. NEAREST (not BILINEAR) so
    the values are bit-reproducible across PIL versions — this feeds
    dedup/ANN paths where determinism is part of the contract."""
    from io import BytesIO

    from PIL import Image

    img = Image.open(BytesIO(payload)).convert("L")
    strip = img.resize((dim, 1), resample=Image.Resampling.NEAREST)
    return [p / 255.0 for p in strip.getdata()]


def _png_decode(payload: bytes):
    """Pure-Python PNG decode (stdlib zlib + numpy) — the codec-free
    fallback that makes image decode REAL in containers without PIL
    (r12): non-interlaced 8-bit gray / gray+alpha / RGB / RGBA /
    palette, all five scanline filters reconstructed per the PNG spec.
    Returns uint8 pixels (h, w, channels). Anything else (JPEG/WebP,
    16-bit or interlaced PNG, corrupt streams) raises
    NotImplementedError fail-loud — install PIL for the long tail."""
    import struct
    import zlib

    import numpy as np

    if payload is None:
        raise ValueError("null media payload reached the real image decode path")
    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n":
        # reached only when PIL import already failed upstream
        # (_image_feature tries PIL first), so a non-PNG payload here
        # IS the missing-codec deployment case — structured class, not
        # a data-shape NotImplementedError (ADVICE r14)
        raise CodecMissingError(
            "codec-free real image decode supports PNG only; other formats "
            "(JPEG/WebP/...) need PIL — install it or use decode_stub=True"
        )
    pos, ihdr, idat, plte = 8, None, [], None
    while pos + 8 <= len(b):
        (ln,) = struct.unpack(">I", b[pos : pos + 4])
        tag = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            if len(data) < 13:  # truncated IHDR must not struct.error
                raise NotImplementedError("corrupt PNG: truncated IHDR chunk")
            ihdr = struct.unpack(">IIBBBBB", data[:13])
        elif tag == b"PLTE":
            plte = data
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise NotImplementedError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or interlace != 0 or comp != 0 or filt != 0 or nch is None:
        raise NotImplementedError(
            f"unsupported PNG variant (depth={depth}, color_type={ctype}, "
            f"interlace={interlace}); install PIL for the long tail"
        )
    stride = w * nch
    expected = h * (stride + 1)
    # cap the inflate at the geometry the header claims: a decompression
    # bomb (tiny IDAT inflating to gigabytes) must fail loud instead of
    # exhausting executor memory — one adversarial payload in a media
    # crawl cannot be allowed to take a worker down (review r13)
    if expected > 1 << 30:
        raise NotImplementedError(
            f"PNG geometry {w}x{h}x{nch} exceeds the 1 GiB decode cap — "
            "tile upstream or use PIL/decode_stub"
        )
    try:
        d = zlib.decompressobj()
        raw = d.decompress(b"".join(idat), expected + 1)
    except zlib.error as e:
        raise NotImplementedError(f"corrupt PNG stream: {e}") from e
    if len(raw) != expected or (d.unconsumed_tail or not d.eof):
        raise NotImplementedError("corrupt PNG: scanline size mismatch")
    arr = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), np.int32)
    bpp = nch
    for y in range(h):
        f = int(ftypes[y])
        row = rows[y]
        prev = out[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            out[y] = row
        elif f == 2:  # Up — fully vectorized
            out[y] = (row + prev) & 255
        elif f == 1:  # Sub — per-channel cumulative sum mod 256
            c = row.reshape(w, bpp).cumsum(axis=0) & 255
            out[y] = c.reshape(stride)
        else:  # Average (3) / Paeth (4): left-dependent, sequential in x
            cur = out[y]
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                up = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                if f == 3:
                    v = row[x] + (a + up) // 2
                elif f == 4:
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    v = row[x] + pred
                else:
                    raise NotImplementedError(f"PNG filter type {f}")
                cur[x] = v & 255
    px = out.astype(np.uint8).reshape(h, w, nch)
    if ctype == 3:
        if plte is None:
            raise NotImplementedError("palette PNG without PLTE chunk")
        pal = np.frombuffer(plte, np.uint8)
        pal = pal[: len(pal) - len(pal) % 3].reshape(-1, 3)
        idx = px[:, :, 0]
        # a truncated PLTE must fail the documented contract
        # (NotImplementedError/ValueError), not a raw numpy IndexError
        if idx.size and len(pal) and int(idx.max()) >= len(pal):
            raise NotImplementedError(
                "corrupt PNG: palette index out of range "
                f"(max index {int(idx.max())}, {len(pal)} PLTE entries)"
            )
        if not len(pal):
            raise NotImplementedError("corrupt PNG: empty PLTE chunk")
        px = pal[idx]
    return px


def _png_encode(px) -> bytes:
    """Pure-Python PNG encode (filter 0 per scanline) for the resize
    fallback — same chunk layout as any baseline encoder."""
    import struct
    import zlib

    h, w, nch = px.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nch]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _png_gray(px):
    """Pillow's convert('L') arithmetic (ITU-R 601-2 with the L24
    rounding shift) so the fallback's grayscale values agree with the
    PIL path on the same pixels."""
    if px.shape[2] in (1, 2):  # gray / gray+alpha: L is the gray channel
        return px[:, :, 0]
    r = px[:, :, 0].astype("int64")
    g = px[:, :, 1].astype("int64")
    b = px[:, :, 2].astype("int64")
    return ((r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16).astype("uint8")


def _nearest_indices(src: int, dst: int) -> list[int]:
    """Center-sampled NEAREST index map (Pillow's resampling grid):
    output pixel j reads source pixel floor((j + 0.5) * src / dst)."""
    return [min(int((j + 0.5) * src / dst), src - 1) for j in range(dst)]


def _pure_png_feature(payload: bytes, dim: int) -> list[float]:
    """The _pil_image_feature contract computed codec-free: grayscale
    via Pillow's L arithmetic, center-sampled NEAREST (dim, 1) strip,
    scaled to [0, 1]."""
    px = _png_decode(payload)
    gray = _png_gray(px)
    h, w = gray.shape
    ys = _nearest_indices(h, 1)[0]
    return [float(gray[ys, x]) / 255.0 for x in _nearest_indices(w, dim)]


def _image_feature(payload: bytes, dim: int) -> list[float]:
    """Real image feature: PIL when importable (full format coverage),
    else the pure-PNG fallback — real decode either way."""
    try:
        return _pil_image_feature(payload, dim)
    except ImportError:
        return _pure_png_feature(payload, dim)


class CodecMissingError(NotImplementedError):
    """A required codec LIBRARY is absent in this deployment (PIL, for
    JPEG-family pixels) — a deployment error, not a data-shape reject:
    installing the named library would make the payload decodable.
    Decoders raise this subclass (instead of bare NotImplementedError)
    at exactly those sites, so the streaming metrics can count
    n_codec_missing by the structured class name in the reject reason
    ('CodecMissingError: ...') rather than substring-matching 'PIL' —
    which also matched the pure PNG decoder's per-file 'unsupported
    PNG variant ... install PIL for the long tail' data-shape reject
    and let a handful of exotic PNGs spike the deployment-error metric
    (ADVICE r14)."""


_MJPG_FOURCC = 0x47504A4D  # struct.unpack('<I', b'MJPG')


def _avi_decode(payload: bytes):
    """Pure-Python decode of AVI (RIFF 'AVI ') video — the codec-free
    fallback that makes video decode REAL (r12): returns (frames uint8
    (n, h, w, 3) RGB top-down, frame_period_ms). Two stream codecs:

    - uncompressed BI_RGB DIB (the baseline every capture tool can
      emit): bottom-up BGR scanlines with 4-byte row padding, 24-bit
      only — decoded with zero codec libraries;
    - MJPG (r13): each '00dc' chunk is a standalone JPEG frame, decoded
      via PIL WHEN IMPORTABLE — a PIL-less environment raises
      NotImplementedError naming PIL at parse time (per-row isolated
      into the rejects stream by errors='reject', counted in the
      n_codec_missing metric).

    Any other codec (H.264/...) raises NotImplementedError fail-loud —
    transcoding needs ffmpeg, and a silent fake would poison
    downstream dedup."""
    import struct

    import numpy as np

    if payload is None:
        raise ValueError("null media payload reached the real video decode path")
    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError(
            "codec-free real video decode supports uncompressed-DIB AVI "
            "only; other containers/codecs need ffmpeg — transcode "
            "upstream or use decode_stub=True"
        )
    width = height = None
    usec_per_frame = None
    codec = "DIB"
    stream_type = None  # fccType of the most recent strh ('vids'/'auds'/...)
    chunks_in_order: list[tuple[bytes, bytes]] = []  # (frame kind, data)

    # iterative DOCUMENT-ORDER walk, NOT recursion: a crafted payload
    # of deeply nested LIST headers must parse bounded, never
    # RecursionError past the fail-loud contract (review r13).  Order
    # is load-bearing: real interleaved AVIs wrap each frame (plus its
    # audio) in a 'rec ' LIST inside 'movi', so the walk must descend
    # into a LIST immediately and RESUME the parent afterwards — the
    # prior pop-whole-sibling-buffers LIFO reversed consecutive rec
    # groups, silently scrambling temporal frame order and therefore
    # frame_idx / frame_ts_ms / every_ms sampling (ADVICE r13).  The
    # stack holds (parent end, resume pos) offset pairs into the one
    # payload buffer — O(depth) ints, no per-level slice copies for a
    # LIST bomb to amplify.
    stack: list[tuple[int, int]] = []
    pos, end = 12, len(b)
    while True:
        if pos + 8 > end:
            if not stack:
                break
            end, pos = stack.pop()
            continue
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        data_start = pos + 8
        data_end = min(data_start + ln, end)  # truncated chunk clamps
        pos = data_start + ln + (ln & 1)  # RIFF chunks are word-aligned
        if tag == b"LIST":
            stack.append((end, pos))  # resume the parent after the list
            pos, end = data_start + 4, data_end  # skip the list type fourcc
            continue
        data = b[data_start:data_end]
        if tag == b"avih" and len(data) >= 40:
            usec_per_frame = struct.unpack("<I", data[0:4])[0]
            width = struct.unpack("<I", data[32:36])[0]
            height = struct.unpack("<I", data[36:40])[0]
        elif tag == b"strh" and len(data) >= 4:
            stream_type = data[:4]
        elif tag == b"strf" and len(data) >= 20 and stream_type == b"vids":
            # only a VIDEO stream's strf is a BITMAPINFOHEADER — an
            # audio strl's WAVEFORMATEX would parse as garbage here
            # (a standard MJPG+PCM capture has both; found by review
            # r13)
            compression = struct.unpack("<I", data[16:20])[0]
            bitcount = struct.unpack("<H", data[14:16])[0]
            if (compression | 0x20202020) == (_MJPG_FOURCC | 0x20202020):
                # fourcc match is case-insensitive per the RIFF
                # convention ('MJPG'/'mjpg'/'Mjpg' all mean MJPG)
                codec = "MJPG"
                try:
                    import PIL  # noqa: F401
                except ImportError:
                    raise CodecMissingError(
                        "MJPG-in-AVI frames are JPEG — decoding them "
                        "needs PIL; install it, transcode via ffmpeg, "
                        "or use decode_stub=True"
                    ) from None
            elif compression != 0 or bitcount != 24:
                raise NotImplementedError(
                    f"AVI stream is not uncompressed 24-bit DIB or MJPG "
                    f"(biCompression={compression}, biBitCount={bitcount}); "
                    "install/transcode via ffmpeg"
                )
        elif tag[2:] in (b"db", b"dc"):
            # '00db' = uncompressed frame, '00dc' = compressed —
            # EXCEPT under MJPG, where some muxers mark the
            # all-keyframe JPEG stream '00db' too (review r13)
            chunks_in_order.append((tag[2:], data))

    # frame selection happens AFTER the walk completes, so the walk
    # order cannot race the codec decision. MJPG consumes BOTH
    # chunk kinds in encounter order (JPEG frames may be marked db or
    # dc); DIB consumes only db — a stray '00dc' in a DIB file is
    # ignored as before r13's MJPG support, never reinterpreted as raw
    # pixels.
    if codec == "MJPG":
        frames_raw = [d for _, d in chunks_in_order]
    else:
        frames_raw = [d for k, d in chunks_in_order if k == b"db"]
    if width is None or not frames_raw:
        raise NotImplementedError("truncated AVI (missing avih header or frames)")
    period_ms = (usec_per_frame or 40000) / 1000.0
    if codec == "MJPG":
        from io import BytesIO

        from PIL import Image

        out = []
        for raw in frames_raw:
            try:
                out.append(
                    np.asarray(Image.open(BytesIO(raw)).convert("RGB"), np.uint8)
                )
            except NotImplementedError:
                raise
            except Exception as e:
                raise NotImplementedError(f"corrupt MJPG frame: {e}") from e
        if any(f.shape != out[0].shape for f in out):
            raise NotImplementedError("corrupt MJPG AVI: frame size mismatch")
        return np.stack(out), period_ms
    stride = (width * 3 + 3) & ~3
    out = []
    for raw in frames_raw:
        if len(raw) < stride * height:
            raise NotImplementedError("corrupt AVI: frame shorter than its DIB size")
        rows = np.frombuffer(raw[: stride * height], np.uint8).reshape(height, stride)
        bgr = rows[:, : width * 3].reshape(height, width, 3)
        out.append(bgr[::-1, :, ::-1])  # bottom-up BGR -> top-down RGB
    return np.stack(out), period_ms


def _avi_encode(frames, fps: float = 25.0) -> bytes:
    """Pure-Python uncompressed-DIB AVI encode (fixtures and the synth
    corpus; the write-side twin of _avi_decode)."""
    import struct

    n, h, w, _c = frames.shape
    stride = (w * 3 + 3) & ~3
    usec = int(round(1_000_000 / fps))

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    avih = struct.pack(
        "<14I", usec, stride * h * int(fps), 0, 0x10, n, 0, 1, stride * h, w, h,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"DIB " + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        int(fps), 0, n, stride * h, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    dib_frames = []
    for f in range(n):
        bgr = frames[f, ::-1, :, ::-1]  # top-down RGB -> bottom-up BGR
        rows = b"".join(
            bgr[y].tobytes() + b"\x00" * (stride - w * 3) for y in range(h)
        )
        dib_frames.append(chunk(b"00db", rows))
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", b"".join(dib_frames))
    )
    return chunk(b"RIFF", body)


def _avi_encode_mjpg(frames, fps: float = 25.0, quality: int = 92) -> bytes:
    """MJPG AVI encode (the write-side twin of _avi_decode's MJPG
    path, r13): same RIFF layout as _avi_encode, but each frame is a
    standalone JPEG in a '00dc' chunk and strf carries the 'MJPG'
    fourcc. Needs PIL to PRODUCE the JPEG frames — fixture/synth use
    only; raises NotImplementedError without it (mirroring the decode
    gate)."""
    import struct
    from io import BytesIO

    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "encoding MJPG-in-AVI needs PIL to produce the JPEG frames"
        ) from None

    n, h, w, _c = frames.shape
    usec = int(round(1_000_000 / fps))

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    jpeg_frames = []
    for f in range(n):
        buf = BytesIO()
        Image.fromarray(frames[f]).save(buf, "JPEG", quality=quality)
        jpeg_frames.append(chunk(b"00dc", buf.getvalue()))
    avih = struct.pack(
        "<14I", usec, 0, 0, 0x10, n, 0, 1, w * h * 3, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1,
                                        int(fps), 0, n, w * h * 3, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, _MJPG_FOURCC, w * h * 3, 0, 0, 0, 0
    )
    body = (
        b"AVI "
        + lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
        + lst(b"movi", b"".join(jpeg_frames))
    )
    return chunk(b"RIFF", body)


def _avi_video_feature(payload: bytes, dim: int) -> list[float]:
    """Real video feature: decode the uncompressed-DIB AVI and average
    the per-frame grayscale NEAREST strips (the image feature applied
    to every frame, mean-pooled over time — a production tier would
    sample frames first for long clips; fixture/ingest clips here are
    short by construction)."""
    import numpy as np

    frames, _ = _avi_decode(payload)
    n, h, w, _c = frames.shape
    xs = _nearest_indices(w, dim)
    y = _nearest_indices(h, 1)[0]
    r = frames[:, y, xs, 0].astype("int64")
    g = frames[:, y, xs, 1].astype("int64")
    b = frames[:, y, xs, 2].astype("int64")
    gray = (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16
    return [float(v) for v in np.asarray(gray, dtype="float64").mean(axis=0) / 255.0]


def extract_features(
    media: DataFrame,
    decode_stub: bool = True,
    dim: int = 8,
    errors: str = "raise",
) -> DataFrame:
    """Decode/feature-extract over binary payloads via mapInPandas.

    Arrow-batched: each partition streams pandas batches; output rows are
    1:1 with input (a frame-sampling variant would return >1 row per
    video — same plumbing, different yield).

    errors: "raise" (default) aborts the job on the first undecodable
    row — right for curated batch corpora, where a bad payload means a
    broken upstream that should be fixed, not skipped. "reject"
    isolates failures PER ROW (schema gains a trailing decode_error
    column, FEATURE_SCHEMA_LENIENT): a failed row keeps its identity
    columns, carries feature=NULL and the exception text, and the
    batch survives — the mode a continuous media stream needs, where
    one truncated file in a million must not kill the pipeline.

    decode_stub=False is the REAL path, dispatched per row by
    media_type inside the same Arrow batches (bytes still cross the
    JVM<->Python boundary exactly once): 'image' decodes with PIL when
    importable, else the pure-PNG fallback (grayscale pixel-strip
    feature); 'audio' decodes PCM WAV with stdlib wave + numpy
    (log-mel energy strip); 'video' decodes uncompressed-DIB AVI
    (mean-pooled per-frame grayscale strips, _avi_video_feature) — all
    three media types decode REAL content with zero codec libraries.
    Compressed formats (mp3/ogg, JPEG-without-PIL, MJPG/H.264) raise
    NotImplementedError fail-loud: transcoding needs real codecs,
    which are deliberately not gated in, and a silent fake-fallback
    would poison downstream dedup."""

    def _real_feature(media_type: str, payload: bytes) -> list[float]:
        if media_type == "image":
            return _image_feature(payload, dim)
        if media_type == "audio":
            return _wav_audio_feature(payload, dim)
        if media_type == "video":
            return _avi_video_feature(payload, dim)
        raise NotImplementedError(
            f"real decode: unknown media_type {media_type!r} (expected "
            "image/audio/video) — use decode_stub=True"
        )

    if errors not in ("raise", "reject"):
        raise ValueError(f"errors must be 'raise' or 'reject', got {errors!r}")
    lenient = errors == "reject"

    def _feature_or_error(mt: str, b: bytes) -> tuple[list[float] | None, str | None]:
        if decode_stub:
            # a NULL payload propagates as NULL metadata (bytes/hash/
            # feature all None below) — hashing it as b"" would make a
            # missing payload indistinguishable from a present empty
            # one (found by the documents edge-parity fixture, r12)
            return (None if b is None else _fake_feature(b, dim)), None
        if not lenient:
            return _real_feature(mt, b), None
        try:
            return _real_feature(mt, b), None
        except Exception as e:  # per-row data error: isolate and report
            return None, f"{type(e).__name__}: {e}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            pairs = [
                _feature_or_error(mt, b)
                for mt, b in zip(pdf["media_type"], payloads)
            ]
            out = {
                "media_id": pdf["media_id"],
                "media_type": pdf["media_type"],
                "payload_bytes": payloads.map(
                    lambda b: len(b) if b is not None else None
                ),
                "content_hash": payloads.map(
                    lambda b: None if b is None else hashlib.sha256(bytes(b)).hexdigest()
                ),
                "feature": pd.Series(
                    [p[0] for p in pairs], index=pdf.index, dtype="object"
                ),
            }
            if lenient:
                out["decode_error"] = pd.Series(
                    [p[1] for p in pairs], index=pdf.index, dtype="object"
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(
        run, schema=FEATURE_SCHEMA_LENIENT if lenient else FEATURE_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_ts_ms", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)

# errors='reject': the extract_features lenient contract applied to
# frame sampling — identity survives, frame_hash is NULL, the exception
# text lands in a trailing decode_error column (ADVICE r14)
FRAME_SCHEMA_LENIENT = StructType(
    FRAME_SCHEMA.fields + [StructField("decode_error", StringType())]
)

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
    ]
)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    decode_stub: bool = True,
    errors: str = "raise",
) -> DataFrame:
    """Frame sampling: the 1:N mapInPandas expansion — each item yields
    ceil(duration_ms / every_ms) frame rows (one row for images / null
    durations: the item itself is its only frame).

    decode_stub=True (the registered query's mode) derives frame_hash
    as a deterministic md5 of (media_id, frame_idx) so the full
    expansion is hash-checkable against a SQL oracle without codecs;
    the input scan prunes `payload` (only duration_ms drives the
    expansion). decode_stub=False decodes video payloads FOR REAL
    (uncompressed-DIB AVI, r12): the sampled timestamps map to actual
    frames via the container's own frame period (index = ts //
    period, clamped to the last frame), frame_hash is the sha256 of
    the decoded RGB frame bytes, and each clip's row count is
    ceil(n_frames * period / every_ms) — the container's true
    duration, not the metadata column. Non-video rows keep one
    payload-hash row; compressed video raises NotImplementedError
    (the extract_features contract).

    errors: "raise" (default) aborts the job on the first undecodable
    payload — the curated-corpus contract. "reject" isolates failures
    PER ROW (schema gains a trailing decode_error column,
    FRAME_SCHEMA_LENIENT): a failed row keeps its identity columns
    with frame_idx=0 / frame_hash=NULL and the exception text, and the
    batch survives — what a crawl-scale corpus needs, where one
    truncated or codec-unsupported file must not kill the job
    (ADVICE r14). Only meaningful with decode_stub=False; the stub
    path never decodes, so 'reject' there just appends an all-NULL
    decode_error column."""
    import math

    if errors not in ("raise", "reject"):
        raise ValueError(f"errors must be 'raise' or 'reject', got {errors!r}")
    lenient = errors == "reject"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, tss, hashes = [], [], [], [], []
            for media_id, media_type, duration in zip(
                pdf["media_id"], pdf["media_type"], pdf["duration_ms"]
            ):
                n = (
                    1
                    if duration is None or pd.isna(duration) or duration <= 0
                    else max(1, math.ceil(duration / every_ms))
                )
                for i in range(n):
                    ids.append(media_id)
                    types.append(media_type)
                    idxs.append(i)
                    tss.append(i * every_ms)
                    hashes.append(hashlib.md5(f"{media_id}:{i}".encode()).hexdigest())
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "media_type": pd.Series(types, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_ts_ms": pd.Series(tss, dtype="int32"),
                "frame_hash": pd.Series(hashes, dtype="object"),
            }
            if lenient:
                out["decode_error"] = pd.Series(
                    [None] * len(ids), dtype="object"
                )
            yield pd.DataFrame(out)

    def run_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, types, idxs, tss, hashes, errs = [], [], [], [], [], []

            def _reject(media_id, media_type, exc):
                ids.append(media_id)
                types.append(media_type)
                idxs.append(0)
                tss.append(0)
                hashes.append(None)
                errs.append(f"{type(exc).__name__}: {exc}")

            for media_id, media_type, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                if payload is None:
                    # NULL payload propagates as a NULL frame_hash (the
                    # r12 extract_features contract) — never conflated
                    # with a present-but-empty payload's real digest
                    ids.append(media_id)
                    types.append(media_type)
                    idxs.append(0)
                    tss.append(0)
                    hashes.append(None)
                    errs.append(None)
                elif media_type == "video":
                    try:
                        frames, period_ms = _avi_decode(payload)
                    except Exception as e:
                        if not lenient:
                            raise
                        _reject(media_id, media_type, e)
                        continue
                    clip_ms = len(frames) * period_ms
                    n = max(1, math.ceil(clip_ms / every_ms))
                    for i in range(n):
                        ts = i * every_ms
                        fi = min(int(ts // period_ms), len(frames) - 1)
                        ids.append(media_id)
                        types.append(media_type)
                        idxs.append(fi)
                        tss.append(ts)
                        hashes.append(
                            hashlib.sha256(frames[fi].tobytes()).hexdigest()
                        )
                        errs.append(None)
                else:  # image/audio: the item is its only frame
                    ids.append(media_id)
                    types.append(media_type)
                    idxs.append(0)
                    tss.append(0)
                    hashes.append(hashlib.sha256(bytes(payload)).hexdigest())
                    errs.append(None)
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "media_type": pd.Series(types, dtype="object"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_ts_ms": pd.Series(tss, dtype="int32"),
                "frame_hash": pd.Series(hashes, dtype="object"),
            }
            if lenient:
                out["decode_error"] = pd.Series(errs, dtype="object")
            yield pd.DataFrame(out)

    schema = FRAME_SCHEMA_LENIENT if lenient else FRAME_SCHEMA
    if decode_stub:
        return media.select("media_id", "media_type", "duration_ms").mapInPandas(
            run, schema=schema
        )
    return media.select("media_id", "media_type", "payload").mapInPandas(
        run_real, schema=schema
    )


def resize_images(
    media: DataFrame, target_w: int = 256, target_h: int = 256, decode_stub: bool = True
) -> DataFrame:
    """Resize plumbing for image payloads: filters to media_type='image'
    (typed-metadata pruning — audio/video partitions never reach
    Python), then rewrites payload per Arrow batch. The stub emits
    sha256(payload || 'WxH') bytes as the deterministic stand-in for
    re-encoded pixels; decode_stub=False decodes, NEAREST-resizes, and
    re-encodes as PNG — via PIL when it is importable, else the
    pure-PNG fallback (_png_decode / _png_encode; real pixels either
    way, though the two encoders' PNG BYTES differ — compare decoded
    pixels, not payloads, across environments)."""

    def _pil_resize(payload: bytes, w: int, h: int) -> bytes:
        from io import BytesIO

        from PIL import Image

        img = Image.open(BytesIO(payload)).resize(
            (w, h), resample=Image.Resampling.NEAREST
        )
        buf = BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    def _real_resize(payload: bytes, w: int, h: int) -> bytes:
        try:
            return _pil_resize(payload, w, h)
        except ImportError:
            px = _png_decode(payload)
            xs = _nearest_indices(px.shape[1], w)
            ys = _nearest_indices(px.shape[0], h)
            return _png_encode(px[ys][:, xs])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        tag = f"{target_w}x{target_h}".encode()
        for pdf in batches:
            if decode_stub:
                out_payload = pdf["payload"].map(
                    lambda b: hashlib.sha256((b or b"") + tag).digest()
                )
            else:
                out_payload = pdf["payload"].map(
                    lambda b: _real_resize(b, target_w, target_h)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "height": pd.Series([target_h] * len(pdf), dtype="int32"),
                    "payload": out_payload,
                }
            )

    return (
        media.where(F.col("media_type") == "image")
        .select("media_id", "payload")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def mel_band_centers(sr: int, dim: int) -> list[float]:
    """Center frequencies (Hz) of the `dim` HTK-mel bands
    _wav_audio_feature lays over 0..sr/2 — the interior points of the
    same mel-spaced grid, exposed so callers (and oracles) can reason
    about which band a known tone lands in."""
    import numpy as np

    mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)  # noqa: E731
    imel = lambda m: 700.0 * (10.0 ** (m / 2595.0) - 1.0)  # noqa: E731
    return [float(v) for v in imel(np.linspace(mel(0.0), mel(sr / 2.0), dim + 2))[1:-1]]


def synth_tone_corpus(
    docs: DataFrame, sr: int = 4000, seconds: float = 0.25, dim: int = 8
) -> DataFrame:
    """Deterministic REAL-audio corpus derived from `documents`: each
    row becomes a genuine PCM WAV payload (stdlib wave encoder,
    executor-side in Arrow batches) holding a pure sine at the center
    frequency of mel band (doc_id % dim) — so the band a downstream
    _wav_audio_feature peak lands in is a CLOSED-FORM function of
    doc_id, and the whole synth -> encode -> decode -> FFT -> mel
    chain is checkable against a SQL oracle that never touches audio.
    The input scan prunes to doc_id only (payload derives from the id,
    not the text)."""
    import math
    import struct
    import wave
    from io import BytesIO

    centers = mel_band_centers(sr, dim)
    n = int(sr * seconds)
    duration_ms = int(seconds * 1000)

    def _tone_wav(doc_id: int) -> bytes:
        freq = centers[doc_id % dim]
        buf = BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(
                b"".join(
                    struct.pack(
                        "<h", int(0.5 * 32767 * math.sin(2 * math.pi * freq * i / sr))
                    )
                    for i in range(n)
                )
            )
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["audio"] * len(pdf), dtype="object"),
                    "mime": pd.Series(["audio/wav"] * len(pdf), dtype="object"),
                    "payload": pdf["doc_id"].map(_tone_wav),
                    "duration_ms": pd.Series([duration_ms] * len(pdf), dtype="int32"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", IntegerType()),
        ]
    )
    # r15: the tone corpus inherits the documents scan's split count —
    # ONE split locally, which serialized the downstream FFT/mel decode
    # onto one core (measured 2.13 s -> 1.10 s on media_audio_features
    # with the fan-out; no-op at scale). The video/image/mp3 synths
    # deliberately do NOT fan out: their doc slices are ~10x smaller
    # and their consumers chain many Python stages, where 32-way tasks
    # of ~8 rows cost more in per-task overhead than the decode saves
    # (media_neardup_recall_report measured 2.87 s -> 4.44 s when they
    # did).
    from ..functions.partitioning import fan_out_scan

    # r16 width cap (VERDICT r15 #1/#2): the synth+decode cost is a few
    # hundred microseconds per row, so full-parallelism tasks over the
    # local ~1.7k-row slice paid more in per-task overhead than the
    # decode saved — the r16 isolated ladder measured width 8-16 at
    # 0.71-0.81 s vs 0.90/1.07 s at width 32 and 1.97/1.54 s unfanned
    # (media_audio_features / media_container_probe). rows_per_task=768
    # puts the ESTIMATED local width at ~10 and still reaches the
    # parallelism cap by ~25k input rows — scale-adaptive, no local
    # constant.
    return fan_out_scan(docs.select("doc_id"), rows_per_task=768).mapInPandas(
        run, schema=schema
    )


def synth_video_corpus(
    docs: DataFrame, width: int = 4, height: int = 3, n_frames: int = 2
) -> DataFrame:
    """Deterministic REAL-video corpus derived from `documents`: each
    row becomes a genuine uncompressed-DIB AVI whose frames are the
    constant gray level (doc_id * 37) % 256 — so the mean-pooled
    grayscale feature _avi_video_feature computes is a CLOSED-FORM
    function of doc_id (the synth_tone_corpus move for video), and the
    whole synth -> AVI encode -> decode -> gray -> mean chain is
    checkable against a SQL oracle that never touches video. The input
    scan prunes to doc_id only."""
    import numpy as np

    def _clip(doc_id: int) -> bytes:
        v = (doc_id * 37) % 256
        return _avi_encode(
            np.full((n_frames, height, width, 3), v, dtype=np.uint8)
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["video"] * len(pdf), dtype="object"),
                    "mime": pd.Series(["video/avi"] * len(pdf), dtype="object"),
                    "payload": pdf["doc_id"].map(_clip),
                    "duration_ms": pd.Series(
                        [n_frames * 40] * len(pdf), dtype="int32"
                    ),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", IntegerType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


def synth_video_sequence_corpus(
    docs: DataFrame, width: int = 4, height: int = 3, n_frames: int = 6
) -> DataFrame:
    """Deterministic real-video corpus with OVERLAPPING frame content
    (the synth_video_corpus move, one level richer): frame f of doc d's
    AVI is the constant gray ((d + f) * 37) % 256, so two videos share
    exactly max(0, n - delta) + max(0, n - (256 - delta)) decoded
    frames where delta = (d_b - d_a) mod 256 — the closed form a SQL
    oracle computes without touching video. Built for the
    frame-fingerprint near-dup operator: overlap, wraparound overlap,
    and full duplication (delta = 0 at distance 256k) all occur
    naturally in a large id range. Input scan prunes to doc_id only."""
    import numpy as np

    def _clip(doc_id: int) -> bytes:
        frames = np.stack(
            [
                np.full((height, width, 3), ((doc_id + f) * 37) % 256, dtype=np.uint8)
                for f in range(n_frames)
            ]
        )
        return _avi_encode(frames)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["video"] * len(pdf), dtype="object"),
                    "mime": pd.Series(["video/avi"] * len(pdf), dtype="object"),
                    "payload": pdf["doc_id"].map(_clip),
                    "duration_ms": pd.Series(
                        [n_frames * 40] * len(pdf), dtype="int32"
                    ),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", IntegerType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


def fingerprint_set_pairs(
    prints: DataFrame,
    min_shared: int = 1,
    max_df: int | None = 1000,
    fp_col: str = "frame_hash",
    shared_col: str = "shared_frames",
) -> DataFrame:
    """Set-Jaccard pair search over distinct (media_id, fingerprint)
    rows — the post-fingerprint half shared by the video (frame hash)
    and audio (band-shingle) near-dup tiers (r15; one plan shape, one
    plan-gate row class). `prints` must already be distinct per
    (media_id, fp_col) and SHOULD be materialized (localCheckpoint) by
    the caller, since sizes + df-cut + pair join all read it.

    Scale shape: the pair search joins on the fingerprint, so cost
    follows shared-fingerprint density, not corpus size squared;
    fingerprints appearing in more than max_df items are excluded
    before the self-join (the LSH hot-bucket cap applied to
    fingerprints — ubiquitous prints carry no identity signal), while
    the per-item set sizes feeding the Jaccard denominator are
    computed BEFORE the cap so the score stays honest when a capped
    print drops. max_df=None disables the cut (and skips its
    aggregate + semi-join entirely)."""
    sizes = prints.groupBy("media_id").agg(F.count(F.lit(1)).alias("_n"))
    if max_df is None:
        pruned = prints
    else:
        df_cut = (
            prints.groupBy(fp_col)
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_df)
            .select(fp_col)
        )
        pruned = prints.join(df_cut, fp_col, "left_semi")
    a = pruned.select(F.col("media_id").alias("media_a"), fp_col)
    b = pruned.select(F.col("media_id").alias("media_b"), fp_col)
    shared = (
        a.join(b, fp_col)
        .where(F.col("media_a") < F.col("media_b"))
        .groupBy("media_a", "media_b")
        .agg(F.count(F.lit(1)).cast("long").alias(shared_col))
        .where(F.col(shared_col) >= min_shared)
    )
    na = sizes.select(F.col("media_id").alias("media_a"), F.col("_n").alias("_na"))
    nb = sizes.select(F.col("media_id").alias("media_b"), F.col("_n").alias("_nb"))
    return (
        shared.join(na, "media_a")
        .join(nb, "media_b")
        .select(
            "media_a",
            "media_b",
            shared_col,
            F.round(
                F.col(shared_col)
                / (F.col("_na") + F.col("_nb") - F.col(shared_col)),
                6,
            ).alias("jaccard"),
        )
    )


def video_frame_near_dup(
    media: DataFrame,
    every_ms: int = 40,
    min_shared: int = 1,
    max_frame_df: int | None = 1000,
    errors: str = "reject",
    with_rejects: bool = False,
):
    """Near-duplicate VIDEO detection by decoded-frame fingerprints —
    the media tier's analog of n-gram Jaccard for text: sample_frames'
    real path hashes each decoded RGB frame (sha256 of pixel bytes, so
    re-containered/re-muxed copies of the same footage collide), then
    videos are paired by shared fingerprints and scored by Jaccard over
    their distinct-frame sets. Output: (media_a, media_b,
    shared_frames, jaccard) for media_a < media_b with >= min_shared
    shared frames, jaccard rounded to 6 decimals.

    Scale shape: the pair search joins on frame_hash, so cost follows
    shared-fingerprint density, not corpus size squared; ubiquitous
    frames (black/white slates, test cards) are the hot keys that WOULD
    make it quadratic, so fingerprints appearing in more than
    max_frame_df videos are excluded before the self-join (the LSH
    hot-bucket cap / the jaccard-prefix df-cut, applied to frames) —
    they carry no identity signal. max_frame_df=None disables the cut
    (and skips its aggregate + semi-join entirely) — for bounded
    corpora where every fingerprint must count. The per-video
    distinct-frame counts that feed the Jaccard denominator are
    computed BEFORE the cap, so the score stays honest when a capped
    frame drops.

    errors: 'reject' (default — this is a crawl-scale operator): a
    corrupt or codec-unsupported payload is isolated PER ROW by
    sample_frames' lenient path and simply contributes no
    fingerprints (its NULL frame_hash is filtered with the NULL-payload
    rows), instead of one bad file killing the whole pair-search job
    (ADVICE r14). 'raise' restores the curated-corpus fail-loud
    contract.

    with_rejects=True returns (pairs, rejects) where rejects is one
    row per EXCLUDED video — (media_id, decode_error) for per-row
    decode failures, decode_error=NULL for NULL payloads — so a
    near-dup sweep over a partially-corrupt corpus carries its own
    exclusion accounting instead of silently looking complete
    (ADVICE r14 #3). The rejects come from the same decode pass as
    the fingerprints (the pre-filter frame is checkpointed first, and
    the distinct-fingerprint checkpoint reads it): no second decode,
    and the pair plan downstream keeps its pinned 3-exchange shape."""
    sampled = sample_frames(
        media, every_ms=every_ms, decode_stub=False, errors=errors
    ).select(
        "media_id",
        "frame_hash",
        *(["decode_error"] if errors == "reject" else []),
    )
    if with_rejects:
        # materialize the decode ONCE including the rejected rows; the
        # fingerprint checkpoint below then reads these local blocks
        sampled = sampled.localCheckpoint()
    frames = (
        sampled.where(F.col("frame_hash").isNotNull())
        .select("media_id", "frame_hash")
        .distinct()
    )
    frames = frames.localCheckpoint()  # one decode pass feeds sizes + pairs
    pairs = fingerprint_set_pairs(
        frames, min_shared, max_frame_df, fp_col="frame_hash",
        shared_col="shared_frames",
    )
    if not with_rejects:
        return pairs
    rejects = (
        sampled.where(F.col("frame_hash").isNull())
        .select(
            "media_id",
            (
                F.col("decode_error")
                if errors == "reject"
                else F.lit(None).cast("string").alias("decode_error")
            ),
        )
        .distinct()
    )
    return pairs, rejects


def media_fingerprints(
    media: DataFrame,
    every_ms: int = 40,
    window_ms: int = 250,
    dim: int = 32,
    shingle: int = 2,
) -> DataFrame:
    """Unified near-dup fingerprints for a MIXED media frame (r15 —
    the arrival-time form both registered near-dup tiers share):
    video rows yield decoded-frame sha256 hashes (sample_frames'
    real path), audio rows yield band-argmax shingles
    (audio_fingerprints), image rows yield their 64-bit perceptual
    dHash (image_hashes) as a single print; each print is namespaced
    'v:'/'a:'/'i:' so the tiers can never collide in a shared fp
    column. Decode failures are isolated per row and simply
    contribute NO prints — in the streaming gate those rows fall
    through to the feature decode, which owns the reject accounting
    (one reject per row, exactly once). The image tier's single-print
    sets make the Jaccard screen an EXACT-dHash match (a
    brightness-shifted or re-encoded copy hashes identically and is
    caught; a hamming>0 neighbor is not — Hamming-tolerant sweeps are
    image_hash_near_dup's banded batch job, not an arrival gate).
    Audio defaults to shingle=2 — deliberately HIGHER than the
    registered oracle key's shingle=1: a single-band print space has
    only `dim` values, so at any realistic store size every value
    crosses the hot-print df-cut and the audio screen silently turns
    itself off (PROBE_r15 §e measured exactly this at the 10x
    fixture); shingled prints give a dim^shingle space where
    ubiquitous prints are the exception the cut exists for.
    Output: distinct (media_id, fp)."""
    vids = media.where(F.col("media_type") == "video")
    auds = media.where(F.col("media_type") == "audio")
    imgs = media.where(F.col("media_type") == "image")
    vp = (
        sample_frames(vids, every_ms=every_ms, decode_stub=False, errors="reject")
        .where(F.col("frame_hash").isNotNull())
        .select(
            "media_id",
            F.concat(F.lit("v:"), F.col("frame_hash")).alias("fp"),
        )
    )
    ap = (
        audio_fingerprints(
            auds, window_ms=window_ms, dim=dim, shingle=shingle, errors="reject"
        )
        .where(F.col("fp").isNotNull())
        .select("media_id", F.concat(F.lit("a:"), F.col("fp")).alias("fp"))
    )
    ip = (
        image_hashes(imgs, errors="reject")
        .where(F.col("dhash").isNotNull())
        .select(
            "media_id",
            F.concat(F.lit("i:"), F.col("dhash").cast("string")).alias("fp"),
        )
    )
    return vp.unionByName(ap).unionByName(ip).distinct()


def fingerprint_cross_near_dup(
    new_prints: DataFrame,
    index_prints: DataFrame,
    threshold: float = 0.9,
    min_shared: int = 1,
    max_fp_df: int | None = 1000,
) -> DataFrame:
    """Cross-corpus half of fingerprint_set_pairs (r15): which NEW
    items near-duplicate an item already in the standing index?
    `new_prints` / `index_prints` are distinct (media_id, fp) frames;
    returns the distinct new-side media_ids whose Jaccard against any
    index item reaches `threshold`. Same df-cut discipline as the
    self-join form — ubiquitous prints (computed over the UNION of
    both sides, so a print that is ubiquitous in the store also stops
    pairing against arrivals) are excluded from the pair join while
    both sides' set sizes are computed before the cut, keeping the
    score honest. The join is fingerprint-keyed: cost follows shared
    print density, never |new| x |store|."""
    sizes_a = new_prints.groupBy("media_id").agg(F.count(F.lit(1)).alias("_na"))
    sizes_b = index_prints.groupBy("media_id").agg(F.count(F.lit(1)).alias("_nb"))
    a = new_prints.select(F.col("media_id").alias("_ma"), "fp")
    b = index_prints.select(F.col("media_id").alias("_mb"), "fp")
    if max_fp_df is not None:
        df_cut = (
            a.select("fp")
            .unionAll(b.select("fp"))
            .groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_fp_df)
            .select("fp")
        )
        a = a.join(df_cut, "fp", "left_semi")
        b = b.join(df_cut, "fp", "left_semi")
    shared = (
        a.join(b, "fp")
        .groupBy("_ma", "_mb")
        .agg(F.count(F.lit(1)).cast("long").alias("_shared"))
        .where(F.col("_shared") >= min_shared)
    )
    return (
        shared.join(sizes_a.withColumnRenamed("media_id", "_ma"), "_ma")
        .join(sizes_b.withColumnRenamed("media_id", "_mb"), "_mb")
        .where(
            F.col("_shared")
            / (F.col("_na") + F.col("_nb") - F.col("_shared"))
            >= F.lit(threshold)
        )
        .select(F.col("_ma").alias("media_id"))
        .distinct()
    )


def _avi_probe(payload: bytes) -> dict:
    """Header-level AVI probe (no pixel reconstruction): width/height/
    frame period from avih, frame count from the db/dc chunk census —
    the same document-order offset walk as _avi_decode, reading zero
    frame bytes."""
    import struct

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("avi probe: not a RIFF AVI payload")
    width = height = usec = None
    n_frames = 0
    stack: list[tuple[int, int]] = []
    pos, end = 12, len(b)
    while True:
        if pos + 8 > end:
            if not stack:
                break
            end, pos = stack.pop()
            continue
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack_from("<I", b, pos + 4)
        data_start = pos + 8
        data_end = min(data_start + ln, end)
        pos = data_start + ln + (ln & 1)
        if tag == b"LIST":
            stack.append((end, pos))
            pos, end = data_start + 4, data_end
            continue
        if tag == b"avih" and data_end - data_start >= 40:
            usec = struct.unpack_from("<I", b, data_start)[0]
            width = struct.unpack_from("<I", b, data_start + 32)[0]
            height = struct.unpack_from("<I", b, data_start + 36)[0]
        elif tag[2:] in (b"db", b"dc"):
            n_frames += 1
    if width is None or n_frames == 0:
        raise NotImplementedError("avi probe: truncated AVI (no avih/frames)")
    period_ms = (usec or 40000) / 1000.0
    return {
        "container": "avi",
        "n_frames": n_frames,
        "sample_rate": None,
        "width": int(width),
        "height": int(height),
        "duration_ms": int(round(n_frames * period_ms)),
    }


def _wav_probe(payload: bytes) -> dict:
    """Header-level WAV probe via stdlib wave (getparams only — the
    PCM data chunk is never read)."""
    import struct
    import wave
    from io import BytesIO

    try:
        with wave.open(BytesIO(bytes(payload))) as w:
            sr = w.getframerate()
            n = w.getnframes()
    except (wave.Error, EOFError, RuntimeError, struct.error) as e:
        raise NotImplementedError(f"wav probe: corrupt RIFF/WAVE: {e}") from e
    return {
        "container": "wav",
        "n_frames": n,
        "sample_rate": sr,
        "width": None,
        "height": None,
        "duration_ms": int(round(n / sr * 1000)) if sr else 0,
    }


def _png_probe(payload: bytes) -> dict:
    """Header-level PNG probe: IHDR geometry only."""
    import struct

    b = bytes(payload)
    if b[:8] != b"\x89PNG\r\n\x1a\n" or len(b) < 24 or b[12:16] != b"IHDR":
        raise NotImplementedError("png probe: not a PNG (or IHDR not first)")
    w, h = struct.unpack(">II", b[16:24])
    return {
        "container": "png",
        "n_frames": 1,
        "sample_rate": None,
        "width": int(w),
        "height": int(h),
        "duration_ms": None,
    }


def _flac_probe(payload: bytes) -> dict:
    """Header-level FLAC probe: walk the metadata-block chain (the
    public format spec — 'fLaC' magic, then 1-byte last-flag+type and
    3-byte big-endian length per block), require STREAMINFO first
    (type 0, 34 bytes), and unpack its bit-packed geometry: sample
    rate (20 bits), channels-1 (3), bits-per-sample-1 (5), total
    samples (36) -> exact duration. Frame data must exist past the
    chain. Like the mp3 tier, a payload that passes is a PROVEN valid
    container whose PCM decode needs a codec lib."""
    import struct

    b = bytes(payload)
    if b[:4] != b"fLaC" or len(b) < 4 + 4 + 34:
        raise NotImplementedError("flac probe: not a FLAC stream")
    hdr = b[4]
    if hdr & 0x7F:  # type bits: STREAMINFO is 0 and MUST come first
        raise NotImplementedError("flac probe: STREAMINFO not first")
    (ln,) = struct.unpack(">I", b"\x00" + b[5:8])
    if ln != 34:
        raise NotImplementedError(f"flac probe: STREAMINFO length {ln} != 34")
    si = b[8 : 8 + 34]
    # bytes 10..17: sr(20) | ch-1(3) | bps-1(5) | total_samples(36)
    packed = int.from_bytes(si[10:18], "big")
    sr = packed >> 44
    total = packed & ((1 << 36) - 1)
    if sr == 0:
        raise NotImplementedError("flac probe: invalid sample rate 0")
    # skip remaining metadata blocks to confirm frame data exists
    pos, last = 8 + 34, bool(b[4] & 0x80)
    while not last:
        if pos + 4 > len(b):
            raise NotImplementedError("flac probe: truncated metadata chain")
        last = bool(b[pos] & 0x80)
        (blen,) = struct.unpack(">I", b"\x00" + b[pos + 1 : pos + 4])
        pos += 4 + blen
    if pos > len(b) or (total > 0 and pos >= len(b)):
        raise NotImplementedError("flac probe: no frame data past metadata")
    return {
        "container": "flac",
        "n_frames": int(total),
        "sample_rate": int(sr),
        "width": None,
        "height": None,
        "duration_ms": int(round(total / sr * 1000)),
    }


def _flac_encode_header(
    total_samples: int = 4000, sample_rate: int = 8000
) -> bytes:
    """Fixture generator: a conforming fLaC STREAMINFO (+ a VORBIS_COMMENT
    block and a dummy frame byte) — the probe reads metadata only."""
    import struct

    packed = (sample_rate << 44) | (0 << 41) | (15 << 36) | total_samples
    si = (
        struct.pack(">HH", 4096, 4096)  # min/max blocksize
        + b"\x00" * 6                   # min/max framesize (24-bit each)
        + packed.to_bytes(8, "big")
        + b"\x00" * 16                  # md5
    )
    vc = b"\x00\x00\x00\x00\x00\x00\x00\x00"  # empty vorbis comment body
    return (
        b"fLaC"
        + b"\x00" + struct.pack(">I", len(si))[1:] + si          # STREAMINFO
        + b"\x84" + struct.pack(">I", len(vc))[1:] + vc          # last: VC
        + b"\xff\xf8"                                            # frame sync
    )


def _mp4_probe(payload: bytes) -> dict:
    """ISO-BMFF (MP4) box-walk probe (r15, VERDICT r14 #6 — the most
    common real-world video container joins the decode-free dispatch):
    pure struct parsing of the box tree, zero sample bytes read.

    Spec shape (ISO/IEC 14496-12): a file is a sequence of boxes —
    u32 big-endian size + 4-char type; size==1 means a u64 largesize
    follows; size==0 means 'to end of enclosing container' and is
    only legal for the LAST top-level box. The walk validates that
    boxes TILE their container exactly (a declared size past the
    parent end, a sub-8-byte size, or trailing bytes all raise — the
    same fail-loud contract as the AVI/MP3 walks), requires ftyp as
    the first box and exactly one moov, then reads:
    - mvhd (v0/v1): movie timescale + duration -> duration_ms;
    - the first video trak's tkhd (v0/v1): 16.16 fixed-point
      presentation width/height;
    - that trak's stbl/stsz (or stz2): sample_count -> n_frames.
    sample_rate stays NULL (that is an audio-track mdhd notion; the
    geometry this probe sizes a decode job with is frames x pixels).
    CodecMissingError is NOT raised here — probing is exactly the
    part that needs no codec."""
    import struct

    b = bytes(payload)

    def _boxes(start: int, end: int, top: bool):
        pos = start
        while pos < end:
            if pos + 8 > end:
                raise NotImplementedError(
                    f"mp4 probe: {end - pos} trailing bytes at {pos} — "
                    "not a whole box header"
                )
            (size,) = struct.unpack_from(">I", b, pos)
            typ = b[pos + 4 : pos + 8]
            data = pos + 8
            if size == 1:
                if data + 8 > end:
                    raise NotImplementedError(
                        "mp4 probe: truncated largesize box header"
                    )
                (size,) = struct.unpack_from(">Q", b, data)
                data += 8
            elif size == 0:
                if not top:
                    raise NotImplementedError(
                        "mp4 probe: size-0 box inside a container — only "
                        "legal at top level"
                    )
                size = end - pos
            if size < data - pos or pos + size > end:
                raise NotImplementedError(
                    f"mp4 probe: box {typ!r} at {pos} claims {size} bytes "
                    f"with {end - pos} remaining"
                )
            yield typ, data, pos + size
            pos += size

    if len(b) < 12 or b[4:8] != b"ftyp":
        raise NotImplementedError("mp4 probe: not an ISO-BMFF payload (no ftyp)")
    try:
        return _mp4_probe_walk(b, _boxes)
    except struct.error as e:
        # a corrupted length field can steer a fixed-offset unpack past
        # EOF — a corrupt-container condition, same contract as the
        # AVI/MP3 walks (never a raw struct.error out of the fuzz)
        raise NotImplementedError(f"mp4 probe: truncated box body ({e})") from e


def _mp4_probe_walk(b: bytes, _boxes) -> dict:
    import struct

    moov_span = None
    saw_ftyp = False
    for i, (typ, data, box_end) in enumerate(_boxes(0, len(b), top=True)):
        if i == 0:
            if typ != b"ftyp":
                raise NotImplementedError("mp4 probe: first box is not ftyp")
            saw_ftyp = True
        elif typ == b"moov":
            if moov_span is not None:
                raise NotImplementedError("mp4 probe: duplicate moov box")
            moov_span = (data, box_end)
    if not saw_ftyp or moov_span is None:
        raise NotImplementedError("mp4 probe: no moov box")

    def _full(data: int):
        version = b[data]
        return version, data + 4  # past version + 24-bit flags

    timescale = duration = None
    width = height = None
    n_frames = None
    for typ, data, box_end in _boxes(*moov_span, top=False):
        if typ == b"mvhd":
            v, p = _full(data)
            if v == 1:
                timescale, duration = struct.unpack_from(">IQ", b, p + 16)
            else:
                timescale, duration = struct.unpack_from(">II", b, p + 8)
        elif typ == b"trak" and width is None:
            t_w = t_h = t_n = None
            for t2, d2, e2 in _boxes(data, box_end, top=False):
                if t2 == b"tkhd":
                    v, p = _full(d2)
                    off = p + (32 if v == 1 else 20) + 52
                    w_fx, h_fx = struct.unpack_from(">II", b, off)
                    t_w, t_h = w_fx >> 16, h_fx >> 16
                elif t2 == b"mdia":
                    for t3, d3, e3 in _boxes(d2, e2, top=False):
                        if t3 != b"minf":
                            continue
                        for t4, d4, e4 in _boxes(d3, e3, top=False):
                            if t4 != b"stbl":
                                continue
                            for t5, d5, e5 in _boxes(d4, e4, top=False):
                                if t5 == b"stsz":
                                    _, p5 = _full(d5)
                                    (t_n,) = struct.unpack_from(">I", b, p5 + 4)
                                elif t5 == b"stz2":
                                    _, p5 = _full(d5)
                                    (t_n,) = struct.unpack_from(">I", b, p5 + 4)
            if t_w:  # first VIDEO track (audio tkhd has 0x0 dimensions)
                width, height, n_frames = t_w, t_h, t_n
    if timescale in (None, 0):
        raise NotImplementedError("mp4 probe: no mvhd timescale")
    return {
        "container": "mp4",
        "n_frames": n_frames,
        "sample_rate": None,
        "width": width,
        "height": height,
        "duration_ms": int(round(duration * 1000 / timescale)),
    }


def _mp4_encode_headers(
    n_frames: int = 48,
    width: int = 640,
    height: int = 360,
    timescale: int = 1000,
    duration_ms: int = 1920,
    version: int = 0,
) -> bytes:
    """Fixture generator: a conforming ftyp + moov(mvhd, trak(tkhd,
    mdia(minf(stbl(stsz))))) + mdat skeleton — the probe reads box
    headers only, so the mdat body is inert filler."""
    import struct

    def box(typ: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + typ + body

    if version == 1:
        mvhd = box(
            b"mvhd",
            b"\x01\x00\x00\x00" + b"\x00" * 16
            + struct.pack(">IQ", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80,
        )
        tkhd_times = b"\x01\x00\x00\x00" + b"\x00" * 32
    else:
        mvhd = box(
            b"mvhd",
            b"\x00" * 12
            + struct.pack(">II", timescale, duration_ms * timescale // 1000)
            + b"\x00" * 80,
        )
        tkhd_times = b"\x00" * 24
    tkhd = box(
        b"tkhd",
        tkhd_times + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    stsz = box(b"stsz", b"\x00" * 8 + struct.pack(">I", n_frames))
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat = box(b"mdat", b"\x00" * 16)
    return ftyp + moov + mdat


_JPEG_SOF_MARKERS = frozenset(
    # SOF0..SOF15 minus DHT (C4), JPG (C8), DAC (CC) per ITU T.81 — any
    # of these carries the frame geometry segment
    {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}
)


def _jpeg_probe(payload: bytes) -> dict:
    """Decode-free JPEG/JFIF probe (r15 — the dominant still-image
    wire format joins the magic-byte dispatch): a pure marker-segment
    walk per ITU T.81. SOI, then marker segments (0xFF + code +
    big-endian u16 length including itself) until SOS; the SOF segment
    (any of the 13 frame types — baseline C0, progressive C2, ...)
    yields precision, height, width, component count, and its length
    must tile exactly (8 + 3*n_components). Entropy-coded scan data is
    then walked honoring byte stuffing (FF 00) and restart markers
    (FF D0-D7) until EOI, which must land EXACTLY at end-of-payload —
    truncated scans, trailing junk, lost marker sync, length fields
    past EOF, SOS before SOF, and duplicate SOF all raise the
    documented fail-loud class. Pixel decode (huffman + IDCT) stays
    deliberately out — this is the header tier, same contract as the
    MP3/FLAC/MP4 walks; a payload that passes is a PROVEN well-formed
    JPEG whose pixel decode needs a codec lib."""
    import struct

    b = bytes(payload)
    if b[:3] != b"\xff\xd8\xff":
        raise NotImplementedError("jpeg probe: no SOI marker — not a JPEG")
    pos = 2
    width = height = None
    while True:
        if pos + 2 > len(b):
            raise NotImplementedError(
                f"jpeg probe: truncated at byte {pos} — no EOI marker"
            )
        if b[pos] != 0xFF:
            raise NotImplementedError(
                f"jpeg probe: lost marker sync at byte {pos}"
            )
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1  # fill bytes before a marker are legal
        if pos + 2 > len(b):
            raise NotImplementedError(
                "jpeg probe: payload ends inside marker fill bytes"
            )
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if width is None:
                raise NotImplementedError("jpeg probe: EOI before any SOF")
            if pos != len(b):
                raise NotImplementedError(
                    f"jpeg probe: {len(b) - pos} trailing bytes after EOI"
                )
            return {
                "container": "jpeg",
                "n_frames": 1,
                "sample_rate": None,
                "width": width,
                "height": height,
                "duration_ms": None,
            }
        if marker == 0xD8:
            raise NotImplementedError("jpeg probe: duplicate SOI marker")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            raise NotImplementedError(
                f"jpeg probe: standalone marker {marker:#x} outside scan data"
            )
        if pos + 2 > len(b):
            raise NotImplementedError(
                f"jpeg probe: truncated segment header at byte {pos}"
            )
        (seg_len,) = struct.unpack_from(">H", b, pos)
        if seg_len < 2 or pos + seg_len > len(b):
            raise NotImplementedError(
                f"jpeg probe: segment {marker:#x} at byte {pos} claims "
                f"{seg_len} bytes with {len(b) - pos} remaining"
            )
        if marker in _JPEG_SOF_MARKERS:
            if width is not None:
                raise NotImplementedError("jpeg probe: duplicate SOF segment")
            if seg_len < 8:
                raise NotImplementedError(
                    f"jpeg probe: SOF segment too short ({seg_len} bytes)"
                )
            h_px, w_px = struct.unpack_from(">HH", b, pos + 3)
            n_comp = b[pos + 7]
            if seg_len != 8 + 3 * n_comp:
                raise NotImplementedError(
                    f"jpeg probe: SOF length {seg_len} does not tile "
                    f"{n_comp} components"
                )
            if w_px == 0 or h_px == 0:
                raise NotImplementedError(
                    "jpeg probe: zero frame dimension in SOF"
                )
            width, height = int(w_px), int(h_px)
        pos += seg_len
        if marker == 0xDA:  # SOS — walk entropy-coded data
            if width is None:
                raise NotImplementedError("jpeg probe: SOS before SOF")
            while True:
                nxt = b.find(b"\xff", pos)
                if nxt < 0 or nxt + 1 >= len(b):
                    raise NotImplementedError(
                        "jpeg probe: scan data ran out before EOI"
                    )
                code = b[nxt + 1]
                if code == 0x00 or 0xD0 <= code <= 0xD7:
                    pos = nxt + 2  # stuffed byte / restart marker
                    continue
                pos = nxt  # a real marker ends the scan (EOI, or the
                break      # next header segment of a progressive scan)


def _jpeg_encode_headers(
    width: int = 640,
    height: int = 480,
    progressive: bool = False,
    n_components: int = 3,
) -> bytes:
    """Fixture generator: a conforming SOI + APP0/JFIF + DQT + SOF +
    DHT + SOS + stuffed/restart-bearing entropy filler + EOI skeleton —
    the probe reads marker structure only, so scan bytes are inert."""
    import struct

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body

    app0 = seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, b"\x00" + bytes(64))
    comps = b"".join(
        bytes([i + 1, 0x11 if i else 0x22, 0]) for i in range(n_components)
    )
    sof = seg(
        0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, height, width, n_components) + comps,
    )
    dht = seg(0xC4, b"\x00" + bytes(16) + b"")
    sos = seg(
        0xDA,
        bytes([n_components])
        + b"".join(bytes([i + 1, 0]) for i in range(n_components))
        + b"\x00\x3f\x00",
    )
    scan = b"\x12\x34\xff\x00\x56" + b"\xff\xd3" + b"\x78\x9a"
    return b"\xff\xd8" + app0 + dqt + sof + dht + sos + scan + b"\xff\xd9"


def _webp_probe(payload: bytes) -> dict:
    """Decode-free WebP probe (r15 cont.): RIFF/WEBP chunk walk for
    all three public layouts — 'VP8 ' (lossy: 3-byte frame tag +
    start code 9D 01 2A + 14-bit dims), 'VP8L' (lossless: 0x2F
    signature + 14-bit-packed dims-1), and 'VP8X' (extended: 24-bit
    canvas dims-1). The RIFF size must tile the payload exactly, the
    first chunk must be one of the three, and truncated chunk bodies
    fail loud — the same contract as the sibling walks. Pixel decode
    (VP8 prediction/ANS) stays out: header tier only."""
    import struct

    b = bytes(payload)
    if len(b) < 16 or b[:4] != b"RIFF" or b[8:12] != b"WEBP":
        raise NotImplementedError("webp probe: not a RIFF/WEBP payload")
    (riff_size,) = struct.unpack_from("<I", b, 4)
    if 8 + riff_size != len(b):
        raise NotImplementedError(
            f"webp probe: RIFF declares {8 + riff_size} bytes, payload "
            f"has {len(b)}"
        )
    fourcc = b[12:16]
    if len(b) < 20:
        raise NotImplementedError("webp probe: truncated chunk header")
    (chunk_len,) = struct.unpack_from("<I", b, 16)
    body = 20
    if body + chunk_len > len(b):
        raise NotImplementedError(
            f"webp probe: chunk {fourcc!r} claims {chunk_len} bytes "
            f"with {len(b) - body} remaining"
        )
    if fourcc == b"VP8 ":
        if chunk_len < 10 or b[body + 3 : body + 6] != b"\x9d\x01\x2a":
            raise NotImplementedError(
                "webp probe: VP8 key-frame start code missing"
            )
        w_raw, h_raw = struct.unpack_from("<HH", b, body + 6)
        width, height = w_raw & 0x3FFF, h_raw & 0x3FFF
    elif fourcc == b"VP8L":
        if chunk_len < 5 or b[body] != 0x2F:
            raise NotImplementedError("webp probe: VP8L signature missing")
        (bits,) = struct.unpack_from("<I", b, body + 1)
        width = (bits & 0x3FFF) + 1
        height = ((bits >> 14) & 0x3FFF) + 1
    elif fourcc == b"VP8X":
        if chunk_len < 10:
            raise NotImplementedError("webp probe: VP8X chunk too short")
        width = int.from_bytes(b[body + 4 : body + 7], "little") + 1
        height = int.from_bytes(b[body + 7 : body + 10], "little") + 1
    else:
        raise NotImplementedError(
            f"webp probe: first chunk {fourcc!r} is not VP8 /VP8L/VP8X"
        )
    if width == 0 or height == 0:
        raise NotImplementedError("webp probe: zero canvas dimension")
    return {
        "container": "webp",
        "n_frames": 1,
        "sample_rate": None,
        "width": int(width),
        "height": int(height),
        "duration_ms": None,
    }


def _webp_encode_headers(
    width: int = 160, height: int = 90, layout: str = "vp8"
) -> bytes:
    """Fixture generator: a conforming RIFF/WEBP skeleton in any of the
    three layouts with inert compressed-data filler — the probe reads
    chunk headers + the dimension fields only."""
    import struct

    if layout == "vp8":
        body = (
            b"\x00\x00\x00"              # frame tag (inert for the probe)
            + b"\x9d\x01\x2a"            # key-frame start code
            + struct.pack("<HH", width, height)
            + b"\x00" * 8
        )
        fourcc = b"VP8 "
    elif layout == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        body = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 6
        fourcc = b"VP8L"
    elif layout == "vp8x":
        body = (
            b"\x00\x00\x00\x00"
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        fourcc = b"VP8X"
    else:
        raise ValueError(f"unknown layout {layout!r}")
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _gif_probe(payload: bytes) -> dict:
    """Decode-free GIF probe (r15 cont.): pure block walk per the
    GIF87a/89a spec — logical screen descriptor geometry, global/local
    color tables skipped by their declared sizes, image descriptors
    counted as frames, graphic-control delays summed into duration,
    length-prefixed sub-block chains walked without LZW decode, and
    the trailer (0x3B) must land exactly at end-of-payload. Truncated
    sub-blocks, unknown block introducers, a missing trailer, and
    trailing junk all raise the documented fail-loud class."""
    import struct

    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("gif probe: no GIF87a/89a signature")
    if len(b) < 13:
        raise NotImplementedError("gif probe: truncated screen descriptor")
    width, height = struct.unpack_from("<HH", b, 6)
    if width == 0 or height == 0:
        raise NotImplementedError("gif probe: zero logical screen dimension")
    packed = b[10]
    pos = 13
    if packed & 0x80:  # global color table
        pos += 3 * (2 << (packed & 0x07))

    def _sub_blocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise NotImplementedError(
                    "gif probe: truncated sub-block chain"
                )
            n = b[p]
            p += 1 + n
            if n == 0:
                return p
            if p > len(b):
                raise NotImplementedError(
                    f"gif probe: sub-block claims {n} bytes past EOF"
                )

    n_frames = 0
    delay_cs = 0
    while True:
        if pos >= len(b):
            raise NotImplementedError("gif probe: no trailer byte")
        intro = b[pos]
        pos += 1
        if intro == 0x3B:  # trailer
            if pos != len(b):
                raise NotImplementedError(
                    f"gif probe: {len(b) - pos} trailing bytes after trailer"
                )
            if n_frames == 0:
                raise NotImplementedError("gif probe: no image descriptor")
            return {
                "container": "gif",
                "n_frames": n_frames,
                "sample_rate": None,
                "width": int(width),
                "height": int(height),
                "duration_ms": delay_cs * 10 if n_frames > 1 else None,
            }
        if intro == 0x2C:  # image descriptor
            if pos + 9 > len(b):
                raise NotImplementedError(
                    "gif probe: truncated image descriptor"
                )
            ipacked = b[pos + 8]
            pos += 9
            if ipacked & 0x80:  # local color table
                pos += 3 * (2 << (ipacked & 0x07))
            pos += 1  # LZW minimum code size
            if pos > len(b):
                raise NotImplementedError(
                    "gif probe: image data starts past EOF"
                )
            pos = _sub_blocks(pos)
            n_frames += 1
        elif intro == 0x21:  # extension
            if pos + 1 > len(b):
                raise NotImplementedError("gif probe: truncated extension")
            label = b[pos]
            pos += 1
            if label == 0xF9 and pos + 5 <= len(b) and b[pos] == 4:
                (d,) = struct.unpack_from("<H", b, pos + 2)
                delay_cs += d
            pos = _sub_blocks(pos)
        else:
            raise NotImplementedError(
                f"gif probe: unknown block introducer {intro:#x} at "
                f"byte {pos - 1}"
            )


def _gif_encode_headers(
    width: int = 12,
    height: int = 7,
    n_frames: int = 1,
    delay_cs: int = 8,
) -> bytes:
    """Fixture generator: a conforming GIF89a skeleton (screen
    descriptor + 2-entry GCT + per-frame GCE/image descriptor with
    inert LZW sub-blocks + trailer) — the probe walks structure only."""
    import struct

    out = b"GIF89a" + struct.pack("<HH", width, height) + b"\x80\x00\x00"
    out += b"\x00\x00\x00\xff\xff\xff"  # 2-entry global color table
    for _ in range(n_frames):
        if n_frames > 1:
            out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += (
            b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
            + b"\x02"            # LZW min code size
            + b"\x02\x4c\x01"    # one 2-byte data sub-block (inert)
            + b"\x00"            # chain terminator
        )
    return out + b"\x3b"


def _bmp_probe(payload: bytes) -> dict:
    """Decode-free BMP probe (r15 cont.): BITMAPFILEHEADER + DIB header
    geometry — the declared file size must equal the payload length
    (the format's own integrity field), the pixel-array offset must
    land inside the payload, and a BITMAPCOREHEADER (12-byte) or
    BITMAPINFOHEADER-family (40+) is unpacked for dimensions. A
    negative height (top-down rows) reports its magnitude."""
    import struct

    b = bytes(payload)
    if b[:2] != b"BM" or len(b) < 26:
        raise NotImplementedError("bmp probe: not a BMP payload")
    declared, _, _, data_off = struct.unpack_from("<IHHI", b, 2)
    if declared != len(b):
        raise NotImplementedError(
            f"bmp probe: header declares {declared} bytes, payload has "
            f"{len(b)} — truncated or padded"
        )
    (dib,) = struct.unpack_from("<I", b, 14)
    if dib == 12:  # BITMAPCOREHEADER: u16 dims
        w, h = struct.unpack_from("<HH", b, 18)
    elif dib >= 40:  # BITMAPINFOHEADER family (entry check covers len)
        w, h = struct.unpack_from("<ii", b, 18)
    else:
        raise NotImplementedError(f"bmp probe: unsupported DIB header size {dib}")
    if w <= 0 or h == 0:
        raise NotImplementedError("bmp probe: non-positive bitmap dimension")
    if not 14 <= data_off <= len(b):
        raise NotImplementedError(
            f"bmp probe: pixel array offset {data_off} outside payload"
        )
    return {
        "container": "bmp",
        "n_frames": 1,
        "sample_rate": None,
        "width": int(w),
        "height": abs(int(h)),
        "duration_ms": None,
    }


def _bmp_encode_headers(width: int = 11, height: int = 5) -> bytes:
    """Fixture generator: a conforming 24-bit BITMAPINFOHEADER BMP with
    inert pixel rows — the probe reads headers + the size field only."""
    import struct

    row = (width * 3 + 3) & ~3  # 4-byte aligned rows
    data = b"\x00" * (row * height)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(data), 2835, 2835, 0, 0)
    total = 14 + len(info) + len(data)
    head = b"BM" + struct.pack("<IHHI", total, 0, 0, 14 + len(info))
    return head + info + data


_OGG_CRC_TABLE: list[int] | None = None


def _ogg_crc(data: bytes) -> int:
    """CRC-32 as the Ogg page checksum defines it (RFC 3533 §6):
    polynomial 0x04C11DB7, init 0, no bit reflection, no final XOR —
    deliberately NOT zlib.crc32, which reflects. Table-driven; the
    pytest pins it against an independent naive bitwise loop."""
    global _OGG_CRC_TABLE
    if _OGG_CRC_TABLE is None:
        table = []
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7 if r & 0x80000000 else r << 1) & 0xFFFFFFFF
            table.append(r)
        _OGG_CRC_TABLE = table
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[((crc >> 24) ^ byte) & 0xFF]
    return crc


def _ogg_probe(payload: bytes) -> dict:
    """Decode-free Ogg container probe (r15): a pure page walk per
    RFC 3533 with REAL integrity — every page's CRC is recomputed
    (poly 0x04C11DB7, field zeroed) and verified, so a passing payload
    is proven intact, not sniffed. Validates version 0, a BOS first
    page, monotonically incrementing page sequence numbers, a single
    logical bitstream (one serial — multiplexed streams fail loud),
    an EOS final page, and exact end-of-payload tiling. The codec is
    identified from the BOS packet head: Vorbis ('\\x01vorbis' — rate
    from the id header, granule = PCM samples) or Opus ('OpusHead' —
    granule at 48 kHz minus pre-skip per RFC 7845). Duration comes
    from the last finishing granule; PCM decode stays out (codec lib),
    same two-tier contract as the MP3/FLAC tiers."""
    import struct

    b = bytes(payload)
    if b[:4] != b"OggS":
        raise NotImplementedError("ogg probe: no OggS capture pattern")
    pos = 0
    serial0 = None
    prev_seq = None
    sr = None
    codec = None
    preskip = 0
    last_granule = None
    saw_eos = False
    while pos < len(b):
        if pos + 27 > len(b):
            raise NotImplementedError(
                f"ogg probe: truncated page header at byte {pos}"
            )
        if b[pos : pos + 4] != b"OggS":
            raise NotImplementedError(
                f"ogg probe: lost page sync at byte {pos}"
            )
        version, htype = b[pos + 4], b[pos + 5]
        if version != 0:
            raise NotImplementedError(
                f"ogg probe: unsupported stream structure version {version}"
            )
        granule, serial, seq, crc, n_segs = struct.unpack_from(
            "<qIIIB", b, pos + 6
        )
        body_start = pos + 27 + n_segs
        if body_start > len(b):
            raise NotImplementedError(
                f"ogg probe: truncated segment table at byte {pos}"
            )
        body_len = sum(b[pos + 27 : body_start])
        page_end = body_start + body_len
        if page_end > len(b):
            raise NotImplementedError(
                f"ogg probe: page at byte {pos} claims {body_len} body "
                f"bytes with {len(b) - body_start} remaining"
            )
        page = bytearray(b[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise NotImplementedError(
                f"ogg probe: CRC mismatch on page at byte {pos}"
            )
        if serial0 is None:
            serial0 = serial
            if not htype & 0x02:
                raise NotImplementedError(
                    "ogg probe: first page is not beginning-of-stream"
                )
            head = b[body_start:page_end]
            if head[:7] == b"\x01vorbis":
                codec = "vorbis"
                if len(head) < 16:
                    raise NotImplementedError(
                        "ogg probe: truncated vorbis id header"
                    )
                (sr,) = struct.unpack_from("<I", head, 12)
            elif head[:8] == b"OpusHead":
                codec = "opus"
                if len(head) < 12:
                    raise NotImplementedError(
                        "ogg probe: truncated OpusHead"
                    )
                (preskip,) = struct.unpack_from("<H", head, 10)
                sr = 48000  # opus granules are always 48 kHz (RFC 7845 §4)
            else:
                raise NotImplementedError(
                    "ogg probe: unrecognized codec id packet "
                    "(supported: Vorbis, Opus)"
                )
            if not sr:
                raise NotImplementedError("ogg probe: invalid sample rate 0")
        elif serial != serial0:
            raise NotImplementedError(
                "ogg probe: multiplexed logical bitstreams unsupported"
            )
        if prev_seq is not None and seq != prev_seq + 1:
            raise NotImplementedError(
                f"ogg probe: page sequence gap ({prev_seq} -> {seq})"
            )
        prev_seq = seq
        if granule >= 0:
            last_granule = granule
        saw_eos = bool(htype & 0x04)
        pos = page_end
    if not saw_eos:
        raise NotImplementedError("ogg probe: no end-of-stream page")
    if last_granule is None:
        raise NotImplementedError("ogg probe: no finishing granule position")
    samples = max(0, int(last_granule) - preskip)
    return {
        "container": f"ogg-{codec}",
        "n_frames": samples,
        "sample_rate": int(sr),
        "width": None,
        "height": None,
        "duration_ms": int(round(samples / sr * 1000)),
    }


def _ogg_encode(
    total_samples: int = 4000,
    sample_rate: int = 8000,
    codec: str = "vorbis",
) -> bytes:
    """Fixture generator: a conforming two-page Ogg stream (BOS page
    carrying the codec id header, EOS page carrying inert packet
    bytes at the final granule) with REAL page CRCs — the probe
    verifies them, and the pytest pins _ogg_crc against an independent
    bitwise implementation so fixture and verifier cannot co-drift."""
    import struct

    def page(htype: int, granule: int, seq: int, body: bytes) -> bytes:
        segs = []
        n = len(body)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        head = (
            b"OggS\x00"
            + bytes([htype])
            + struct.pack("<qIII", granule, 0x6D657472, seq, 0)
            + bytes([len(segs)])
            + bytes(segs)
        )
        crc = _ogg_crc(head + body)
        return head[:22] + struct.pack("<I", crc) + head[26:] + body

    if codec == "vorbis":
        ident = (
            b"\x01vorbis"
            + struct.pack("<IB I", 0, 1, sample_rate)
            + struct.pack("<iii", -1, 96000, -1)
            + b"\xb8\x01"
        )
        granule = total_samples
    elif codec == "opus":
        ident = (
            b"OpusHead\x01\x01"
            + struct.pack("<H", 312)       # pre-skip
            + struct.pack("<I", sample_rate)  # input rate (informational)
            + b"\x00\x00\x00"
        )
        granule = total_samples + 312  # granule includes pre-skip
    else:
        raise ValueError(f"unknown fixture codec {codec!r}")
    return page(0x02, 0, 0, ident) + page(0x04, granule, 1, b"\x00" * 20)


PROBE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("container", StringType()),
        StructField("n_frames", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)


def _probe_payload(payload: bytes) -> dict:
    """Per-payload magic-byte dispatch for probe_media (module level so
    the corruption fuzz drives it directly)."""
    if payload is None:
        raise ValueError("null media payload reached probe_media")
    b = bytes(payload)
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return _wav_probe(b)
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return _avi_probe(b)
    if b[:4] == b"RIFF" and b[8:12] == b"WEBP":
        return _webp_probe(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_probe(b)
    if b[:3] == b"\xff\xd8\xff":
        return _jpeg_probe(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return _gif_probe(b)
    if b[:2] == b"BM":
        return _bmp_probe(b)
    if b[:4] == b"OggS":
        return _ogg_probe(b)
    if b[:4] == b"fLaC":
        return _flac_probe(b)
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return _mp4_probe(b)
    if b[:3] == b"ID3" or (
        len(b) >= 2 and b[0] == 0xFF and (b[1] & 0xE0) == 0xE0
    ):
        p = _mp3_parse(b)
        return {
            "container": "mp3",
            "n_frames": p["n_frames"],
            "sample_rate": p["sample_rate"],
            "width": None,
            "height": None,
            "duration_ms": p["duration_ms"],
        }
    raise NotImplementedError(
        "probe_media: unrecognized container (supported: WAV, AVI, "
        "PNG, JPEG, GIF, BMP, WebP, Ogg Vorbis/Opus, FLAC, "
        "MP4/ISO-BMFF, MPEG Layer III)"
    )


def probe_media(media: DataFrame) -> DataFrame:
    """Container PROBE over binary payloads — validate and measure
    WITHOUT decoding (r14): dispatch on MAGIC BYTES (never the
    metadata column — the probe's job is to check the bytes against
    what the catalog claims), parse headers only, return per-item
    geometry: container, frame/sample count, sample rate, pixel
    dimensions, duration. WAV (stdlib wave params), AVI (avih +
    db/dc census via the document-order walk), PNG (IHDR), MPEG
    Layer III (the pure frame-header walk — full sync-to-sync
    validation, so a 'valid mp3' answer is proven, not sniffed).
    Map-only over the same Arrow batches the decode path uses; at
    100 TB this is the cheap pre-pass that sizes the decode job and
    quarantines malformed uploads before any codec spends a cycle.
    Unknown/corrupt containers raise fail-loud (probe a dirty crawl
    through the streaming rejects path instead)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            probes = [_probe_payload(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "container": pd.Series(
                        [p["container"] for p in probes], index=pdf.index, dtype="object"
                    ),
                    "n_frames": pd.Series(
                        [p["n_frames"] for p in probes], index=pdf.index, dtype="int64"
                    ),
                    "sample_rate": pd.Series(
                        [p["sample_rate"] for p in probes], index=pdf.index, dtype="object"
                    ),
                    "width": pd.Series(
                        [p["width"] for p in probes], index=pdf.index, dtype="object"
                    ),
                    "height": pd.Series(
                        [p["height"] for p in probes], index=pdf.index, dtype="object"
                    ),
                    "duration_ms": pd.Series(
                        [p["duration_ms"] for p in probes], index=pdf.index, dtype="object"
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(run, schema=PROBE_SCHEMA)


def synth_mp3_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic COMPRESSED-audio container corpus derived from
    `documents` (the synth_tone_corpus move for compressed audio):
    even doc d becomes a conforming (d % 5) + 1-frame MPEG-1 Layer III
    stream at 44100 Hz / 128 kbps; odd d a conforming FLAC whose
    STREAMINFO declares (d % 7 + 1) * 100 samples at 1000 Hz (so
    duration_ms is exactly that sample count) — every probe column a
    CLOSED-FORM function of doc_id, and both header-walk chains
    checkable against a SQL oracle that never touches audio. Frame
    bodies are filler: the probe tier reads headers only, and PCM
    decode of these streams correctly raises CodecMissingError
    (pinned in tests)."""

    def _clip(d: int) -> bytes:
        if d % 2 == 0:
            return _mp3_encode_headers(n_frames=int(d % 5) + 1)
        return _flac_encode_header(
            total_samples=(int(d % 7) + 1) * 100, sample_rate=1000
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["audio"] * len(pdf), dtype="object"),
                    "mime": pdf["doc_id"].map(
                        lambda d: "audio/mpeg" if d % 2 == 0 else "audio/flac"
                    ),
                    "payload": pdf["doc_id"].map(_clip),
                    "duration_ms": pd.Series([None] * len(pdf), dtype="object"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", IntegerType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


def recontainer_avi(payload: bytes) -> bytes:
    """Byte-level re-container of an AVI WITHOUT decoding: every frame
    chunk inside 'movi' is rewrapped in its own 'rec ' LIST (the
    standard interleaved-capture layout) and a vendor JUNK chunk is
    appended at top level. The payload bytes — and therefore any exact
    payload digest — change, while the decoded frames are
    bit-identical: exactly the copy class exact dedup MISSES and
    frame-fingerprint near-dup must CATCH. The planted-copy generator
    for the media near-dup recall audit (VERDICT r13 #6); it also
    drives the r14 document-order RIFF walk through a registered query
    (a LIFO walk would decode these copies with scrambled frames and
    the recall audit would read 0)."""
    import struct

    b = bytes(payload)
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("recontainer_avi expects a RIFF AVI payload")

    def chunk(tag: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return tag + struct.pack("<I", len(data)) + data + pad

    # top-level walk to the movi LIST (never string-search: frame pixel
    # bytes may contain any byte pattern)
    pos, movi_at, movi_len = 12, None, 0
    while pos + 8 <= len(b):
        tag = b[pos : pos + 4]
        (ln,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if tag == b"LIST" and b[pos + 8 : pos + 12] == b"movi":
            movi_at, movi_len = pos, ln
        pos += 8 + ln + (ln & 1)
    if movi_at is None:
        raise NotImplementedError("recontainer_avi: AVI has no movi LIST")
    body = b[movi_at + 8 : movi_at + 8 + movi_len]
    frames = []
    p = 4
    while p + 8 <= len(body):
        (ln,) = struct.unpack("<I", body[p + 4 : p + 8])
        frames.append(body[p : p + 8 + ln + (ln & 1)])
        p += 8 + ln + (ln & 1)
    wrapped = b"movi" + b"".join(
        chunk(b"LIST", b"rec " + fc) for fc in frames
    )
    movi_end = movi_at + 8 + movi_len + (movi_len & 1)
    out = (
        b[:movi_at]
        + chunk(b"LIST", wrapped)
        + b[movi_end:]
        + chunk(b"JUNK", b"recontainered copy")
    )
    return b"RIFF" + struct.pack("<I", len(out) - 8) + out[8:]


# planted copies sit far above any real doc_id so a copy-pair is
# recognizable as (a, a + OFFSET) on both engines at any scale factor
RECONTAINER_ID_OFFSET = 1 << 40


def media_recontainered_copies(
    media: DataFrame, id_offset: int = RECONTAINER_ID_OFFSET
) -> DataFrame:
    """One byte-different, frame-identical copy per video item, with
    media_id shifted by id_offset — the planted ground truth for the
    near-dup recall audit. Map-only (mapInPandas over the same Arrow
    batches the decode path uses); non-video rows are passed through
    recontainer_avi's fail-loud gate, so feed it a video corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media_id"] = out["media_id"] + id_offset
            out["payload"] = out["payload"].map(recontainer_avi)
            yield out

    return media.mapInPandas(run, schema=media.schema)


def video_neardup_recall_report(
    media: DataFrame,
    id_offset: int = RECONTAINER_ID_OFFSET,
    every_ms: int = 40,
) -> DataFrame:
    """Recall audit of frame-fingerprint video near-dup against planted
    re-containered copies — the media tier's minhash_recall_report /
    knn_recall_report symmetry (VERDICT r13 #6): every video gets one
    recontainer_avi copy (same decoded frames, different container
    bytes), the doubled corpus goes through video_frame_near_dup, and
    the report states:

    - n_planted: planted copy pairs (= video count),
    - n_detected: planted pairs recovered at jaccard 1.0 — full
      frame-set identity, the score a true re-container copy MUST get,
    - recall: n_detected / n_planted (1.0 unless the max_frame_df cut
      swallows a whole frame set — honest on both engines),
    - n_pairs: total reported pairs over the doubled corpus,
    - n_byte_identical: copies whose payload digest equals their
      original's — 0 by construction, PROVING exact payload dedup
      would miss every planted pair (digest-only join, payloads never
      shuffle)."""
    copies = media_recontainered_copies(media, id_offset)
    corpus = media.unionByName(copies)
    pairs = video_frame_near_dup(corpus, every_ms=every_ms)
    pair_stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(
            (F.col("media_b") - F.col("media_a") == id_offset)
            & (F.col("jaccard") == 1.0)
        ).alias("n_detected"),
    )
    orig_digest = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("_d")
    )
    copy_digest = copies.select(
        (F.col("media_id") - id_offset).alias("media_id"),
        F.sha2(F.col("payload"), 256).alias("_dc"),
    )
    base_stats = orig_digest.join(copy_digest, "media_id").agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.count_if(F.col("_d") == F.col("_dc")).alias("n_byte_identical"),
    )
    return base_stats.crossJoin(pair_stats).select(
        "n_planted",
        "n_detected",
        F.round(F.col("n_detected") / F.col("n_planted"), 6).alias("recall"),
        "n_pairs",
        "n_byte_identical",
    )


def synth_tone_sequence_corpus(
    docs: DataFrame,
    sr: int = 4000,
    seg_seconds: float = 0.25,
    n_segments: int = 4,
    dim: int = 32,
    band_step: int = 37,
) -> DataFrame:
    """Deterministic TONE-SEQUENCE corpus — the audio analog of
    synth_video_sequence_corpus (r15): each document becomes a real
    PCM WAV of n_segments concatenated pure sines, segment s at the
    center frequency of mel band ((doc_id + s) * band_step) % dim, so
    two clips share exactly the closed-form band overlap
    max(0, n_segments - d) + max(0, n_segments - (dim - d)) where
    d = (id_b - id_a) * band_step mod dim — overlap, wraparound, and
    full duplication all occur naturally in a large id range (the
    * band_step spread mirrors the video corpus's * 37 gray walk).
    Each segment starts at phase 0, so a segment's PCM is a pure
    function of its band — which is exactly what makes the
    band-argmax fingerprint downstream closed-form checkable. Input
    scan prunes to doc_id only."""
    import wave
    from io import BytesIO

    import numpy as np

    centers = mel_band_centers(sr, dim)
    n = int(sr * seg_seconds)
    duration_ms = int(n_segments * seg_seconds * 1000)
    # one vectorized int16 segment per BAND, synthesized once per Arrow
    # worker and concatenated per doc — the per-sample pack loop was
    # the dominant cost of the whole near-dup chain (truncation toward
    # zero matches int(); only dim distinct segments exist by design)
    seg_pcm = {
        b: (
            0.5 * 32767 * np.sin(2 * np.pi * centers[b] * np.arange(n) / sr)
        ).astype(np.int16).tobytes()
        for b in range(dim)
    }

    def _seq_wav(doc_id: int) -> bytes:
        buf = BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            for s in range(n_segments):
                w.writeframes(seg_pcm[((doc_id + s) * band_step) % dim])
        return buf.getvalue()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["audio"] * len(pdf), dtype="object"),
                    "mime": pd.Series(["audio/wav"] * len(pdf), dtype="object"),
                    "payload": pdf["doc_id"].map(_seq_wav),
                    "duration_ms": pd.Series([duration_ms] * len(pdf), dtype="int32"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("duration_ms", IntegerType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


def _wav_band_argmax_seq(payload: bytes, dim: int, window_ms: int) -> list[int]:
    """The audio fingerprint kernel: decode PCM (full _wav_pcm_mono
    taxonomy), cut the signal into non-overlapping window_ms windows,
    and emit each window's dominant mel band (argmax of
    _mel_energies — the same filterbank as the feature strip, so the
    fingerprint and the feature can never disagree on the dominant
    band). A trailing partial window is dropped: a fragment shorter
    than the analysis window would smear across bands and fingerprint
    unstably under re-framing — exactly what a re-encoded copy must
    NOT do."""
    import numpy as np

    x, sr = _wav_pcm_mono(payload)
    win = max(1, int(sr * window_ms / 1000))
    return [
        int(np.argmax(_mel_energies(x[i * win : (i + 1) * win], sr, dim)))
        for i in range(len(x) // win)
    ]


def audio_fingerprints(
    media: DataFrame,
    window_ms: int = 250,
    dim: int = 32,
    shingle: int = 1,
    errors: str = "reject",
) -> DataFrame:
    """Distinct (media_id, fp) audio fingerprints: per-window dominant
    mel band sequences, shingled `shingle` windows at a time and
    rendered as the '-'-joined band string (shingle=1 -> the band
    itself) — the Shazam-family landmark idea reduced to its
    band-argmax core, computed from primitives. errors='reject'
    isolates undecodable payloads per row (fp NULL + decode_error
    text, the sample_frames lenient contract); 'raise' restores
    fail-loud. One Arrow pass; the scan prunes to (media_id,
    payload)."""
    if errors not in ("raise", "reject"):
        raise ValueError(f"errors must be 'raise' or 'reject', got {errors!r}")
    lenient = errors == "reject"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, errs = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    bands = _wav_band_argmax_seq(payload, dim, window_ms)
                    prints = {
                        "-".join(str(b) for b in bands[i : i + shingle])
                        for i in range(len(bands) - shingle + 1)
                    }
                    for p in sorted(prints):
                        ids.append(media_id)
                        fps.append(p)
                        errs.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row isolation
                    if not lenient:
                        raise
                    ids.append(media_id)
                    fps.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "fp": pd.Series(fps, dtype="object"),
            }
            if lenient:
                out["decode_error"] = pd.Series(errs, dtype="object")
            yield pd.DataFrame(out)

    schema = "media_id long, fp string" + (
        ", decode_error string" if lenient else ""
    )
    return media.select("media_id", "payload").mapInPandas(run, schema=schema)


def audio_fingerprint_near_dup(
    media: DataFrame,
    window_ms: int = 250,
    dim: int = 32,
    shingle: int = 1,
    min_shared: int = 1,
    max_fp_df: int | None = 1000,
    errors: str = "reject",
    with_rejects: bool = False,
):
    """Near-duplicate AUDIO detection by band-argmax fingerprints —
    the audio tier of the media near-dup symmetry (VERDICT r14 #5,
    closing the gap video_frame_near_dup closed for video): decode ->
    per-window dominant-band shingles -> the SAME
    fingerprint_set_pairs pair search (df-cut on ubiquitous prints,
    sizes before the cut, Jaccard over distinct print sets). A
    re-encoded copy (same PCM at a different bit depth / container
    framing) decodes to the identical float signal, so its print set
    is identical and the pair scores jaccard 1.0 — while its BYTES
    differ, which is why exact payload dedup misses it (pinned by
    audio_neardup_recall_report). Output: (media_a, media_b,
    shared_prints, jaccard); with_rejects=True adds the excluded-row
    frame from the same decode pass (the video tier's ADVICE r14 #3
    accounting)."""
    fp = audio_fingerprints(
        media, window_ms=window_ms, dim=dim, shingle=shingle, errors=errors
    )
    if with_rejects:
        fp = fp.localCheckpoint()
    prints = (
        fp.where(F.col("fp").isNotNull()).select("media_id", "fp").distinct()
    )
    prints = prints.localCheckpoint()  # one decode pass feeds sizes + pairs
    pairs = fingerprint_set_pairs(
        prints, min_shared, max_fp_df, fp_col="fp", shared_col="shared_prints"
    )
    if not with_rejects:
        return pairs
    rejects = (
        fp.where(F.col("fp").isNull())
        .select(
            "media_id",
            (
                F.col("decode_error")
                if errors == "reject"
                else F.lit(None).cast("string").alias("decode_error")
            ),
        )
        .distinct()
    )
    return pairs, rejects


def reencode_wav(payload: bytes, sampwidth: int = 3) -> bytes:
    """Byte-different, signal-identical WAV copy — the planted-copy
    primitive for the audio near-dup recall audit (the recontainer_avi
    of the audio tier): re-encode a 16-bit PCM WAV at 24-bit width.
    The widening is EXACT (int24 = int16 << 8, and the decoder divides
    by 2^23, so (v << 8) / 2^23 == v / 2^15 — the decoded float signal
    is bit-identical), while every frame byte and the fmt header
    change, so exact payload dedup can never match the copy. Fail-loud
    on anything but 16-bit input (the synth corpora are 16-bit; a
    lossy narrowing would break the identity this primitive exists to
    guarantee)."""
    import wave
    from io import BytesIO

    import numpy as np

    if sampwidth != 3:
        raise NotImplementedError(
            "reencode_wav supports the exact 16->24-bit widening only"
        )
    with wave.open(BytesIO(bytes(payload))) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"reencode_wav needs 16-bit PCM input, got "
                f"{8 * w.getsampwidth()}-bit"
            )
        n_ch, sr = w.getnchannels(), w.getframerate()
        raw = w.readframes(w.getnframes())
    v = (np.frombuffer(raw, dtype="<i2").astype(np.int32) << 8) & 0xFFFFFF
    b3 = np.empty((len(v), 3), dtype=np.uint8)
    b3[:, 0] = v & 0xFF
    b3[:, 1] = (v >> 8) & 0xFF
    b3[:, 2] = (v >> 16) & 0xFF
    buf = BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(3)
        w.setframerate(sr)
        w.writeframes(b3.tobytes())
    return buf.getvalue()


def media_reencoded_copies(
    media: DataFrame, id_offset: int = RECONTAINER_ID_OFFSET
) -> DataFrame:
    """One byte-different, signal-identical 24-bit copy per audio item,
    media_id shifted by id_offset — the planted ground truth for the
    audio near-dup recall audit (media_recontainered_copies for
    audio). Map-only; non-16-bit rows hit reencode_wav's fail-loud
    gate, so feed it a 16-bit corpus."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media_id"] = out["media_id"] + id_offset
            out["payload"] = out["payload"].map(reencode_wav)
            yield out

    return media.mapInPandas(run, schema=media.schema)


def audio_neardup_recall_report(
    media: DataFrame,
    id_offset: int = RECONTAINER_ID_OFFSET,
    window_ms: int = 250,
    dim: int = 32,
) -> DataFrame:
    """Recall audit of the audio near-dup tier against planted
    RE-ENCODED copies — the audio row of the media recall symmetry
    (video_neardup_recall_report, minhash_recall_report,
    knn_recall_report): every clip gets one reencode_wav copy (same
    decoded signal, different bytes at 24-bit), the doubled corpus
    goes through audio_fingerprint_near_dup, and the report pins:
    n_planted, n_detected (planted pairs at jaccard 1.0 — identical
    print sets, the score an exact re-encode MUST get), recall,
    n_pairs, and n_byte_identical (0 by construction: digest-only
    join proves exact payload dedup would miss every planted pair)."""
    copies = media_reencoded_copies(media, id_offset)
    corpus = media.unionByName(copies)
    pairs = audio_fingerprint_near_dup(corpus, window_ms=window_ms, dim=dim)
    pair_stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(
            (F.col("media_b") - F.col("media_a") == id_offset)
            & (F.col("jaccard") == 1.0)
        ).alias("n_detected"),
    )
    orig_digest = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("_d")
    )
    copy_digest = copies.select(
        (F.col("media_id") - id_offset).alias("media_id"),
        F.sha2(F.col("payload"), 256).alias("_dc"),
    )
    base_stats = orig_digest.join(copy_digest, "media_id").agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.count_if(F.col("_d") == F.col("_dc")).alias("n_byte_identical"),
    )
    return base_stats.crossJoin(pair_stats).select(
        "n_planted",
        "n_detected",
        F.round(F.col("n_detected") / F.col("n_planted"), 6).alias("recall"),
        "n_pairs",
        "n_byte_identical",
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Typed-metadata rollup — never touches the payload column, so the
    parquet scan prunes the heavy bytes entirely (check ReadSchema)."""
    return media.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("item_count"),
        F.avg(F.length("payload")).alias("avg_payload_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from `documents`: the text bytes
    play the opaque payload, media_type cycles by doc_id, and typed
    metadata (width/height/duration_ms) is derived per type — the same
    derivation the oracle twin performs in SQL, so the plumbing is
    hash-checkable without real codecs in the container."""
    mt = (F.col("doc_id") % 3).cast("int")
    is_img = mt == 0
    is_aud = mt == 1
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(is_img, "image").when(is_aud, "audio").otherwise("video").alias("media_type"),
        F.when(is_img, "image/png").when(is_aud, "audio/wav").otherwise("video/mp4").alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.when(is_img, (F.col("n_chars") % 1024).cast("int")).alias("width"),
        F.when(is_img, ((F.col("n_chars") * 3) % 768).cast("int")).alias("height"),
        F.when(~is_img, ((F.col("n_chars") * 7) % 60000).cast("int")).alias("duration_ms"),
    )


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact dedup of binary payloads by content digest — the multimodal
    twin of dedup.exact_dedup (the same image/audio byte-for-byte
    duplicate removal every crawl pipeline runs before feature
    extraction). The wide payload column reduces to a fixed-width
    sha256 digest BEFORE the shuffle, grouped per media_type so an
    image and an audio clip with identical bytes stay distinct
    records."""
    return (
        media.select(
            "media_type",
            F.sha2(F.col("payload"), 256).alias("content_hash"),
            "media_id",
        )
        .groupBy("media_type", "content_hash")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.min("media_id").alias("keep_media_id"))
    )


# --- image near-dup tier (r15 cont.) ----------------------------------------
# The perceptual-hash tier the streaming gate's docstring deferred for
# stills: video near-dups by frame hash (r14), audio by band shingles
# (r15), images by difference hash + multi-index Hamming banding. A
# brightness-shifted or re-encoded copy has different bytes AND
# different pixels, but identical horizontal-gradient SIGNS — exactly
# the copy class a byte digest and even a pixel sha both miss.


def image_dhash(payload: bytes) -> int:
    """64-bit difference hash (dHash) of an image payload, computed
    codec-free: pure-PNG decode -> Pillow-equivalent grayscale
    (_png_gray) -> center-sampled NEAREST resample to 9x8 (the
    classic dHash geometry; identity when the source is already 9x8)
    -> bit i (= row*8 + col, LSB first) set iff gray[row, col+1] >
    gray[row, col]. Gradient SIGNS are invariant under uniform
    brightness shift and any monotone per-pixel re-encode, which is
    what makes this a near-dup identity signal rather than a byte
    digest. Returns a SIGNED 64-bit int (two's complement view) so
    the value lands in a Spark/DuckDB BIGINT column unchanged."""
    import numpy as np

    px = _png_decode(payload)
    gray = _png_gray(px)
    h, w = gray.shape
    rows = _nearest_indices(h, 8)
    cols = _nearest_indices(w, 9)
    g = gray[np.ix_(rows, cols)].astype("int64")
    bits = (g[:, 1:] > g[:, :-1]).astype("uint64")  # 8x8, row-major
    weights = (np.uint64(1) << np.arange(64, dtype="uint64")).reshape(8, 8)
    s = int((bits.reshape(8, 8) * weights).sum(dtype="uint64"))
    # explicit two's-complement fold (bit 63 set -> negative BIGINT);
    # np.int64(big_uint) would rely on a silent wrap NumPy 2.x rejects
    return s - (1 << 64) if s >= (1 << 63) else s


def synth_gradient_image_corpus(docs: DataFrame) -> DataFrame:
    """Deterministic REAL-image corpus whose dHash is CLOSED-FORM: each
    document becomes a genuine 9x8 gray PNG built so that the
    horizontal gradient sign at (row, col) is bit row*8+col of doc_id
    — i.e. image_dhash(payload) == doc_id exactly (for doc_id <
    2^63). Pixel walk per row starts at 128 and steps +-8, so values
    stay in [64, 192] and a +delta brightness copy stays in range.
    The synth_tone_corpus move for the image tier: the whole synth ->
    PNG encode -> decode -> gray -> gradient -> pack chain is
    checkable against a SQL oracle that never touches an image (the
    oracle just uses doc_id as the hash). Input scan prunes to
    doc_id."""
    import numpy as np

    def _img(doc_id: int) -> bytes:
        g = np.empty((8, 9), dtype="int64")
        g[:, 0] = 128
        for r in range(8):
            for c in range(8):
                bit = (doc_id >> (r * 8 + c)) & 1
                g[r, c + 1] = g[r, c] + (8 if bit else -8)
        px = np.repeat(g.astype("uint8")[:, :, None], 3, axis=2)
        return _png_encode(px)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": pd.Series(["image"] * len(pdf), dtype="object"),
                    "mime": pd.Series(["image/png"] * len(pdf), dtype="object"),
                    "payload": pdf["doc_id"].map(_img),
                    "width": pd.Series([9] * len(pdf), dtype="int32"),
                    "height": pd.Series([8] * len(pdf), dtype="int32"),
                }
            )

    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("media_type", StringType()),
            StructField("mime", StringType()),
            StructField("payload", BinaryType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
        ]
    )
    return docs.select("doc_id").mapInPandas(run, schema=schema)


def image_hashes(media: DataFrame, errors: str = "reject") -> DataFrame:
    """(media_id, dhash) per image payload via image_dhash — one Arrow
    pass, scan pruned to (media_id, payload). errors='reject'
    isolates undecodable payloads per row (NULL dhash + decode_error
    text, the sample_frames lenient contract); 'raise' restores
    fail-loud."""
    if errors not in ("raise", "reject"):
        raise ValueError(f"errors must be 'raise' or 'reject', got {errors!r}")
    lenient = errors == "reject"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs, errs = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                try:
                    if payload is None:
                        raise ValueError("null media payload")
                    # compute BEFORE any append: a raise between the
                    # id append and the hash append would shift every
                    # subsequent row's hash onto the wrong media_id
                    h = image_dhash(payload)
                    ids.append(media_id)
                    hs.append(h)
                    errs.append(None)
                except Exception as exc:  # noqa: BLE001 - per-row isolation
                    if not lenient:
                        raise
                    ids.append(media_id)
                    hs.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
            out = {
                "media_id": pd.Series(ids, dtype="int64"),
                "dhash": pd.Series(hs, dtype="object"),
            }
            if lenient:
                out["decode_error"] = pd.Series(errs, dtype="object")
            yield pd.DataFrame(out)

    schema = "media_id long, dhash long" + (
        ", decode_error string" if lenient else ""
    )
    return media.select("media_id", "payload").mapInPandas(run, schema=schema)


def image_hash_near_dup(
    media: DataFrame,
    max_hamming: int = 3,
    bands: int = 4,
    max_bucket_df: int | None = 1000,
    errors: str = "reject",
) -> DataFrame:
    """Near-duplicate IMAGE detection by dHash + MULTI-INDEX HAMMING
    BANDING — the image tier of the media near-dup symmetry (video =
    frame sets r14, audio = band shingles r15): each 64-bit hash
    splits into `bands` contiguous 16-bit bands; by pigeonhole, two
    hashes within Hamming distance max_hamming < bands MUST agree
    exactly on at least one band, so an equi-join on (band_idx,
    band_value) finds every qualifying pair with recall 1.0 — no
    64-bit cross join, no LSH probabilism — and a JVM-side
    bit_count(xor) verify gives precision 1.0. max_hamming >= bands
    would silently break the guarantee, so it raises with the law in
    the message.

    Everything after the one Arrow hash pass is whole-stage codegen:
    band expansion is shiftrightunsigned + mask, the verify is
    bitwiseXOR + bit_count. Hot buckets (a band value shared by more
    than max_bucket_df images — e.g. the all-zero band of
    small-valued hashes, or flat-image bands in a real crawl) are
    excluded from the candidate join, the same df-cut discipline as
    the video/audio tiers; a pair whose every shared band is hot is
    then missed, which is the documented cost of the cap — callers
    needing the unconditional guarantee set max_bucket_df=None.
    Output: (media_a, media_b, hamming) for media_a < media_b."""
    if max_hamming >= bands:
        raise ValueError(
            f"image_hash_near_dup: max_hamming={max_hamming} >= bands="
            f"{bands} breaks the pigeonhole guarantee (a pair may "
            "differ in every band); raise bands or lower max_hamming"
        )
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    width = 64 // bands
    hashes = (
        image_hashes(media, errors=errors)
        .where(F.col("dhash").isNotNull())
        .select("media_id", "dhash")
    ).localCheckpoint()  # one decode pass feeds band expansion twice
    banded = hashes.select(
        "media_id",
        "dhash",
        F.posexplode(
            F.array(
                *[
                    (
                        F.shiftrightunsigned(F.col("dhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    if max_bucket_df is not None:
        hot = (
            banded.groupBy("band_idx", "band_val")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_bucket_df)
            .select("band_idx", "band_val")
        )
        banded = banded.join(hot, ["band_idx", "band_val"], "left_semi")
    a = banded.select(
        F.col("media_id").alias("media_a"),
        F.col("dhash").alias("_ha"),
        "band_idx",
        "band_val",
    )
    b = banded.select(
        F.col("media_id").alias("media_b"),
        F.col("dhash").alias("_hb"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("media_a") < F.col("media_b"))
        .select("media_a", "media_b", "_ha", "_hb")
        .distinct()  # a pair may agree on several bands
        .withColumn(
            "hamming",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("int"),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("media_a", "media_b", "hamming")
    )


def media_brightness_copies(
    media: DataFrame, id_offset: int = RECONTAINER_ID_OFFSET, delta: int = 4
) -> DataFrame:
    """One byte-different, pixel-different, GRADIENT-identical copy per
    image item (uniform +delta brightness, re-encoded PNG), media_id
    shifted by id_offset — the planted ground truth for the image
    near-dup recall audit (recontainer_avi / reencode_wav for the
    image tier). A brightness shift changes every pixel and every
    byte, so BOTH the payload digest AND a pixel sha miss the copy,
    while every horizontal gradient sign — and therefore the dHash —
    is unchanged. Fails loud if the shift would clip (clipping WOULD
    change gradients); the gradient synth corpus stays within
    [64, 192] by construction."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["media_id"] = out["media_id"] + id_offset

            def _shift(payload: bytes) -> bytes:
                px = _png_decode(payload)
                if px.max() + delta > 255:
                    raise ValueError(
                        f"brightness copy would clip (max {px.max()} + "
                        f"{delta} > 255) and change gradient signs"
                    )
                return _png_encode((px.astype("int64") + delta).astype("uint8"))

            out["payload"] = out["payload"].map(_shift)
            yield out

    return media.mapInPandas(run, schema=media.schema)


def image_neardup_recall_report(
    media: DataFrame, id_offset: int = RECONTAINER_ID_OFFSET
) -> DataFrame:
    """Recall audit of dHash image near-dup against planted
    brightness-shifted copies — the video/audio recall-report symmetry
    for the image tier: every image gets one +4-brightness copy
    (different bytes, different pixels, identical dHash), the doubled
    corpus goes through image_hash_near_dup, and the report states
    n_planted / n_detected (planted pairs recovered at hamming 0 —
    full hash identity, what a brightness copy MUST score) / recall /
    n_pairs / n_byte_identical (pinned 0: exact payload dedup would
    miss every planted pair; digest-only join, payloads never
    shuffle)."""
    copies = media_brightness_copies(media, id_offset)
    corpus = media.unionByName(copies)
    pairs = image_hash_near_dup(corpus)
    pair_stats = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(
            (F.col("media_b") - F.col("media_a") == id_offset)
            & (F.col("hamming") == 0)
        ).alias("n_detected"),
    )
    orig_digest = media.select(
        "media_id", F.sha2(F.col("payload"), 256).alias("_d")
    )
    copy_digest = copies.select(
        (F.col("media_id") - id_offset).alias("media_id"),
        F.sha2(F.col("payload"), 256).alias("_dc"),
    )
    base_stats = orig_digest.join(copy_digest, "media_id").agg(
        F.count(F.lit(1)).alias("n_planted"),
        F.count_if(F.col("_d") == F.col("_dc")).alias("n_byte_identical"),
    )
    return base_stats.crossJoin(pair_stats).select(
        "n_planted",
        "n_detected",
        F.round(F.col("n_detected") / F.col("n_planted"), 6).alias("recall"),
        "n_pairs",
        "n_byte_identical",
    )
