"""Minimal MJPEG-in-AVI (RIFF) container codec — pure stdlib.

Public-knowledge formats: the RIFF container (same chunk grammar as
WAV) with the AVI 1.0 layout (Microsoft "AVI RIFF File Reference"):
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
00dc...) idx1)``, video stream fourcc ``MJPG`` — each ``00dc`` chunk
is a complete baseline JPEG image (operators/jpeg.py decodes them).
This is the real-video-frame tier of multimodal ingestion: the
container walk + per-frame JPEG decode is exactly what a frame
sampler does at 100 TB, just with larger payloads.

The writer is the fixture synthesizer (mirrors png/jpeg/wav); the
parser is the production half under test. Both are strict about the
structures they own and fail loudly otherwise.
"""

from __future__ import annotations

import struct


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""  # chunks are word-aligned
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(list_type: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", list_type + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Wrap pre-encoded JPEG frames into a spec-valid AVI 1.0 MJPEG
    file (one video stream, no audio, with an idx1 index)."""
    if not frames:
        raise ValueError("at least one frame required")
    n = len(frames)
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes per second (upper bound)
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        n,  # total frames
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer size
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # flags
            0, 0,  # priority, language
            0,  # initial frames
            1, fps,  # scale, rate -> fps
            0,  # start
            n,  # length in frames
            max_size,  # suggested buffer size
            0xFFFFFFFF,  # quality (default)
            0,  # sample size (varies per frame)
            0, 0, width & 0xFFFF, height & 0xFFFF,  # rcFrame
        )
    )
    strf = struct.pack(
        "<I2i2H4s5i",
        40,  # biSize
        width,
        height,
        1,  # planes
        24,  # bit count
        b"MJPG",
        max_size,  # image size (upper bound)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_body = b"".join(_chunk(b"00dc", f) for f in frames)
    movi = _list(b"movi", movi_body)
    # idx1: one entry per frame, offsets relative to the movi list type
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for f in frames:
        idx_entries.append(
            b"00dc" + struct.pack("<3I", 0x10, off, len(f))
        )
        off += 8 + len(f) + (len(f) & 1)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Walk the RIFF/AVI structure and return
    ``(width, height, fps, frame_payloads)`` — each payload a complete
    JPEG stream from a ``00dc``/``00db`` chunk in capture order. The
    walk trusts chunk sizes (bounded by the buffer), recurses only
    into the LIST types it needs (depth-capped — a crafted
    deep-nested LIST tower must not blow the kernel's stack), and
    raises ValueError on anything that is not an MJPEG video stream
    OR on any malformed structure (truncated chunk headers normalize
    from struct.error/IndexError) — the decode tier's shared
    fail-loud contract."""
    try:
        return _parse_avi_mjpeg(data)
    except (IndexError, struct.error) as e:
        raise ValueError(
            f"corrupt AVI stream: {type(e).__name__}: {e}"
        ) from e


def _parse_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI stream")
    geom: list = [None, None, None]  # width, height, fps
    frames: list[bytes] = []
    # Stream indices are positional: the Nth strh inside hdrl owns the
    # movi chunks prefixed NN. Record which index is the MJPG vids
    # stream so a multi-stream file (e.g. video+audio) cannot
    # interleave foreign NNdc/NNdb chunks into the frame list.
    streams: list = [0, None]  # [strh count seen, MJPG stream index]

    def walk(pos: int, end: int, depth: int = 0) -> None:
        if depth > 8:  # hdrl/strl/movi/rec never nest this deep
            raise ValueError("LIST nesting exceeds AVI structure depth")
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            body_end = min(pos + 8 + size, end)
            if cid == b"LIST":
                ltype = data[pos + 8 : pos + 12]
                if ltype in (b"hdrl", b"strl", b"movi", b"rec "):
                    walk(pos + 12, body_end, depth + 1)
            elif cid == b"avih" and size >= 40:
                (geom[0], geom[1]) = struct.unpack(
                    "<2I", data[pos + 40 : pos + 48]
                )
            elif cid == b"strh":
                # EVERY strh advances the positional stream index —
                # a short foreign header must still count, or every
                # later stream is matched against the wrong NN prefix
                stream_idx = streams[0]
                streams[0] += 1
                if size < 4 or data[pos + 8 : pos + 12] != b"vids":
                    pass  # non-video stream headers are fine to skip
                elif size < 56:
                    raise ValueError("truncated vids strh")
                elif data[pos + 12 : pos + 16] != b"MJPG":
                    raise ValueError("video stream is not MJPG")
                elif streams[1] is not None:
                    raise ValueError("multiple video streams in AVI")
                else:
                    streams[1] = stream_idx
                    scale, rate = struct.unpack(
                        "<2I", data[pos + 28 : pos + 36]
                    )
                    geom[2] = rate // scale if scale else None
            elif cid[2:4] in (b"dc", b"db") and cid[:2].isdigit():
                # collect only the validated MJPG stream's chunks
                if streams[1] is not None and int(cid[:2]) == streams[1]:
                    frames.append(data[pos + 8 : pos + 8 + size])
            pos += 8 + size + (size & 1)

    walk(12, len(data))
    if geom[0] is None or not frames:
        raise ValueError("missing avih header or video frames")
    return int(geom[0]), int(geom[1]), int(geom[2] or 0), frames
