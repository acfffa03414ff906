"""Dependency-free media codecs for the multimodal operators.

Real, spec-compliant encoders/decoders for formats whose containers
are simple enough to implement with the stdlib + numpy only — no
PIL/ffmpeg/soundfile in this environment:

* **PNG** (``zlib`` + ``struct``): 8-bit greyscale / grey+alpha /
  RGB / RGBA, non-interlaced; the decoder handles all five scanline
  filters (None/Sub/Up/Average/Paeth), the encoder can emit any fixed
  filter type so round-trip tests exercise every decode path.
* **BMP** (``struct``): 24-bit uncompressed BITMAPINFOHEADER,
  bottom-up rows, 4-byte row padding, BGR channel order.
* **WAV** (stdlib ``wave``): PCM16 mono/stereo.
* **Y4M** (YUV4MPEG2, plain text header): uncompressed C444 video —
  constant frame size makes frame extraction an O(1) seek, which is
  exactly why it is the archival interchange format ffmpeg pipes use.

``decode_payload`` is the registry the multimodal operators call for
``decoder="real"``; codecs that genuinely need a native library
(JPEG, H.264, MP3, ...) raise ``NotImplementedError`` there with the
injection instructions — that is the only remaining stub seam.

Feature extraction (``media_feature_vector``) is deterministic pure
numpy over the decoded samples, so the DuckDB-side oracle can
recompute it bit-for-bit (tools/local_oracle.py).

Reference parity note: the reference engine
(/root/reference, e.g. package bigdata/) is text-only; this module
serves the LLM-training-pipeline brief (multimodal columns), not a
reference operator.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# colour type -> channels
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}  # channels -> colour type


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))


def png_encode(arr: np.ndarray, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """Encode a (H, W) or (H, W, C) uint8 array as a spec-compliant
    PNG. ``filter_type`` (0..4) selects the per-scanline filter —
    filter 0 is the fast default; 1-4 exist so tests can force every
    unfilter branch of the decoder."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in _PNG_COLOR_TYPE:
        raise ValueError(f"png_encode: unsupported shape {arr.shape}")
    if not 0 <= filter_type <= 4:
        raise ValueError(f"png_encode: bad filter type {filter_type}")
    h, w, ch = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _PNG_COLOR_TYPE[ch], 0, 0, 0)

    a16 = arr.astype(np.int16)
    left = np.zeros_like(a16)
    left[:, 1:, :] = a16[:, :-1, :]
    up = np.zeros_like(a16)
    up[1:, :, :] = a16[:-1, :, :]
    ul = np.zeros_like(a16)
    ul[1:, 1:, :] = a16[:-1, :-1, :]
    if filter_type == 0:
        filt = arr
    elif filter_type == 1:
        filt = ((a16 - left) & 0xFF).astype(np.uint8)
    elif filter_type == 2:
        filt = ((a16 - up) & 0xFF).astype(np.uint8)
    elif filter_type == 3:
        filt = ((a16 - (left + up) // 2) & 0xFF).astype(np.uint8)
    else:  # Paeth
        pa = np.abs(up - ul)
        pb = np.abs(left - ul)
        pc = np.abs(left + up - 2 * ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        filt = ((a16 - pred) & 0xFF).astype(np.uint8)
    raw = np.empty((h, 1 + w * ch), dtype=np.uint8)
    raw[:, 0] = filter_type
    raw[:, 1:] = filt.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), compress_level)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr) + _png_chunk(b"IDAT", idat)
            + _png_chunk(b"IEND", b""))


def png_decode(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG to a (H, W, C) uint8 array.
    Handles all five scanline filters; rejects (clearly) palette,
    16-bit, and interlaced images."""
    if payload[:8] != _PNG_SIG:
        raise ValueError("png_decode: bad signature")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat.append(data)
        elif tag == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("png_decode: missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or ctype not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png_decode: only 8-bit non-interlaced gray/RGB/alpha PNGs "
            f"(got depth={depth} colour={ctype} interlace={interlace})")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + stride):
        raise ValueError("png_decode: truncated pixel data")
    raw = raw.reshape(h, 1 + stride)
    return _png_defilter(raw, ch).reshape(h, w, ch)


def _png_defilter(raw: np.ndarray, ch: int) -> np.ndarray:
    """Reconstruct filtered scanlines (filters 0-4).  The x recurrence
    of Sub/Average/Paeth is sequential, so the hot path is the C kernel
    in ``kernels_native`` (bit-identical integer math — uint8 wrap ==
    & 0xFF, (a+b)>>1 == //2, same Paeth tie-break; A/B-tested in
    tests/test_codecs.py); the Python loop below is the
    compiler-less fallback."""
    from . import kernels_native

    if kernels_native.available:
        return kernels_native.png_defilter(raw, ch)
    return _png_defilter_py(raw, ch)


def _png_defilter_py(raw: np.ndarray, ch: int) -> np.ndarray:
    h, stride = raw.shape[0], raw.shape[1] - 1
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        f = raw[y, 0]
        line = raw[y, 1:].astype(np.int16)
        if f == 0:
            rec = line
        elif f == 1:  # Sub: cumulative sum per channel offset
            rec = line.copy()
            for c in range(ch):
                rec[c::ch] = np.cumsum(rec[c::ch]) & 0xFF
        elif f == 2:
            rec = (line + prev) & 0xFF
        elif f == 3:  # Average: sequential in x (left dependency)
            rec = line
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                rec[x] = (rec[x] + (left + prev[x]) // 2) & 0xFF
        elif f == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - ch]) if x >= ch else 0
                b = int(prev[x])
                c = int(prev[x - ch]) if x >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                rec[x] = (rec[x] + pred) & 0xFF
        else:
            raise ValueError(f"png_decode: bad filter byte {f}")
        out[y] = rec.astype(np.uint8)
        prev = out[y].astype(np.int16)
    return out


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)

def bmp_encode(arr: np.ndarray) -> bytes:
    """Encode (H, W, 3) uint8 RGB as a 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up, BGR, 4-byte padded rows)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"bmp_encode: need (H, W, 3), got {arr.shape}")
    h, w, _ = arr.shape
    row_sz = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_sz), dtype=np.uint8)
    rows[:, :w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pix = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


def bmp_decode(payload: bytes) -> np.ndarray:
    """Decode a 24-bit uncompressed BMP to (H, W, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("bmp_decode: bad signature")
    (offset,) = struct.unpack_from("<I", payload, 10)
    hdr_sz, w, h = struct.unpack_from("<Iii", payload, 14)
    bpp, compression = struct.unpack_from("<HI", payload, 28)
    if hdr_sz < 40 or bpp != 24 or compression != 0:
        raise NotImplementedError(
            f"bmp_decode: only 24-bit BI_RGB (got bpp={bpp} "
            f"compression={compression})")
    flip = h > 0
    h = abs(h)
    row_sz = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * row_sz,
                         offset=offset).reshape(h, row_sz)
    img = rows[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return (img[::-1] if flip else img).copy()


# ---------------------------------------------------------------------------
# WAV (PCM16)

def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """Encode int16 samples, shape (n,) mono or (n, ch), as PCM16 WAV."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(ch)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def wav_decode(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM16 WAV to ((n, ch) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(payload), "rb") as wf:
        if wf.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav_decode: only PCM16 (got {8 * wf.getsampwidth()}-bit)")
        n, ch, rate = wf.getnframes(), wf.getnchannels(), wf.getframerate()
        data = np.frombuffer(wf.readframes(n), dtype="<i2")
    return data.reshape(-1, ch), rate


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2, C444)

_Y4M_MAGIC = b"YUV4MPEG2 "
_FRAME_MARK = b"FRAME\n"


def y4m_encode(frames: np.ndarray, fps: int = 30) -> bytes:
    """Encode (N, H, W, 3) uint8 planes (Y, U, V per channel) as an
    uncompressed YUV4MPEG2 C444 stream."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(f"y4m_encode: need (N, H, W, 3), got {frames.shape}")
    n, h, w, _ = frames.shape
    header = _Y4M_MAGIC + f"W{w} H{h} F{fps}:1 Ip A1:1 C444\n".encode()
    parts = [header]
    for i in range(n):
        parts.append(_FRAME_MARK)
        # planar: all Y, then all U, then all V
        parts.append(frames[i].transpose(2, 0, 1).tobytes())
    return b"".join(parts)


def _y4m_header(payload: bytes) -> tuple[int, int, int, int]:
    """-> (width, height, n_frames, header_len); validates C444."""
    if not payload.startswith(_Y4M_MAGIC):
        raise ValueError("y4m: bad signature")
    nl = payload.index(b"\n")
    w = h = None
    colour = "C420jpeg"
    for tok in payload[len(_Y4M_MAGIC):nl].split(b" "):
        t = tok.decode("ascii", "replace")
        if t.startswith("W"):
            w = int(t[1:])
        elif t.startswith("H"):
            h = int(t[1:])
        elif t.startswith("C"):
            colour = t
    if w is None or h is None:
        raise ValueError("y4m: missing W/H")
    if colour != "C444":
        raise NotImplementedError(f"y4m: only C444 (got {colour})")
    frame_sz = len(_FRAME_MARK) + 3 * w * h
    n = (len(payload) - (nl + 1)) // frame_sz
    return w, h, n, nl + 1


def y4m_n_frames(payload: bytes) -> int:
    return _y4m_header(payload)[2]


def y4m_decode_frame(payload: bytes, frame_no: int) -> np.ndarray:
    """O(1)-seek extraction of one frame as (H, W, 3) uint8 YUV."""
    w, h, n, hdr = _y4m_header(payload)
    if not 0 <= frame_no < n:
        raise IndexError(f"y4m: frame {frame_no} of {n}")
    frame_sz = len(_FRAME_MARK) + 3 * w * h
    off = hdr + frame_no * frame_sz
    if payload[off:off + len(_FRAME_MARK)] != _FRAME_MARK:
        raise ValueError("y4m: frame marker not found (truncated stream?)")
    planes = np.frombuffer(payload, dtype=np.uint8, count=3 * w * h,
                           offset=off + len(_FRAME_MARK))
    return planes.reshape(3, h, w).transpose(1, 2, 0).copy()


# ---------------------------------------------------------------------------
# Registry + derived operations (what the multimodal operators call)

#: codecs decode_payload handles natively; anything else is the
#: documented injection seam (NotImplementedError).
REAL_CODECS = ("png", "bmp", "wav", "y4m")


def decode_payload(payload: bytes, codec: str) -> np.ndarray:
    """Decode ``payload`` per ``codec``: images -> (H, W, C) uint8,
    wav -> (n, ch) int16, y4m -> frame 0 as (H, W, 3) uint8 YUV.
    Unknown/native-library codecs raise NotImplementedError — the only
    remaining stub seam; inject ``decode_fn`` on the operator to
    handle them."""
    if codec == "png":
        return png_decode(payload)
    if codec == "bmp":
        return bmp_decode(payload)
    if codec == "wav":
        return wav_decode(payload)[0]
    if codec == "y4m":
        return y4m_decode_frame(payload, 0)
    raise NotImplementedError(
        f"no built-in decoder for codec {codec!r} (built-ins: "
        f"{', '.join(REAL_CODECS)}); pass decode_fn=... to inject one "
        f"(e.g. PIL for JPEG, ffmpeg for H.264)")


def image_features(arr: np.ndarray, dim: int = 16) -> np.ndarray:
    """Deterministic fixed-size features from a decoded image:
    [h, w, c, mean, std, min, max] + 3x3 grid-cell means, padded /
    truncated to ``dim``. Pure numpy so the oracle recomputes it."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    g = arr.astype(np.float64).mean(axis=2)
    head = [float(h), float(w), float(c), float(g.mean()), float(g.std()),
            float(g.min()), float(g.max())]
    cells = []
    for i in range(3):
        for j in range(3):
            cell = g[i * h // 3:(i + 1) * h // 3 or h,
                     j * w // 3:(j + 1) * w // 3 or w]
            cells.append(float(cell.mean()) if cell.size else 0.0)
    feat = np.array(head + cells, dtype=np.float64)
    if feat.size < dim:
        feat = np.pad(feat, (0, dim - feat.size))
    return feat[:dim]


def audio_features(samples: np.ndarray, sample_rate: int,
                   dim: int = 16) -> np.ndarray:
    """Deterministic features from PCM16 samples: [n, rate, mean, rms,
    zero-crossing count] + windowed RMS over (dim-5) equal chunks."""
    x = np.asarray(samples, dtype=np.float64).reshape(-1)
    n = x.size
    head = [float(n), float(sample_rate), float(x.mean()) if n else 0.0,
            float(np.sqrt((x ** 2).mean())) if n else 0.0,
            float(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if n > 1 else 0.0]
    k = max(dim - len(head), 0)
    wins = []
    for i in range(k):
        seg = x[i * n // k:(i + 1) * n // k] if k and n else np.array([])
        wins.append(float(np.sqrt((seg ** 2).mean())) if seg.size else 0.0)
    return np.array((head + wins)[:dim], dtype=np.float64)


def media_feature_vector(payload: bytes, meta, dim: int = 16) -> np.ndarray:
    """The decoder="real" feature path: decode per meta.codec, then the
    modality's deterministic feature kernel."""
    codec = (meta or {}).get("codec") or ""
    if codec == "wav":
        samples, rate = wav_decode(payload)
        return audio_features(samples, rate, dim)
    return image_features(decode_payload(payload, codec), dim)


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbour resample of (H, W[, C]) to (height, width[, C])
    — the deterministic, oracle-recomputable resize kernel."""
    h, w = arr.shape[:2]
    rows = (np.arange(height) * h) // height
    cols = (np.arange(width) * w) // width
    return arr[rows][:, cols].copy()


def resize_payload(payload: bytes, codec: str, width: int,
                   height: int) -> bytes:
    """decoder="real" resize: decode -> nearest-neighbour -> re-encode
    in the SAME container (png stays png, bmp stays bmp)."""
    if codec == "png":
        return png_encode(resize_nearest(png_decode(payload), width, height))
    if codec == "bmp":
        return bmp_encode(resize_nearest(bmp_decode(payload), width, height))
    raise NotImplementedError(
        f"no built-in resize for codec {codec!r}; pass resize_fn=...")


def extract_frame(payload: bytes, codec: str, frame_no: int) -> bytes:
    """decoder="real" frame sampling: O(1) seek into the container,
    frame re-encoded as PNG (the pipeline's at-rest frame format)."""
    if codec == "y4m":
        return png_encode(y4m_decode_frame(payload, frame_no))
    raise NotImplementedError(
        f"no built-in frame extractor for codec {codec!r}; "
        f"pass frame_fn=...")


def fingerprint(payload: bytes) -> str:
    """Stable content fingerprint for oracle comparison."""
    return hashlib.md5(payload).hexdigest()
