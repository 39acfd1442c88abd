"""Audio (binary-column) operators: a REAL WAV/PCM codec plus Arrow-batched
decode / feature-extract / window kernels, extending the multimodal pillar
(reference parity: the reference treats media as opaque client-side blobs —
web/assets/js/functions.js renders, never decodes; this module is part of the
north-star LLM-data-pipeline surface, not reference parity).

Codec status mirrors the image path (operators/multimodal.py): this container
ships no audio libraries, so the honest real path is the format whose layout
is spec-simple enough to implement from bytes alone — RIFF/WAVE with 16-bit
integer PCM (header walk over fmt/data chunks, odd-chunk padding, interleaved
little-endian frames). Compressed codecs (MP3/AAC/FLAC, or non-PCM WAV like
ADPCM/float) raise ``NotImplementedError`` behind the same seam a libsndfile
or ffmpeg call slots into in production.

Everything downstream of the decode is integer-exact (sums, peaks, squared
energy, sign-change counts over int16 samples), so a DuckDB oracle can
value-hash the whole encode -> bytes -> decode -> feature path: any
interleave / endianness / chunk-offset bug shifts a sum and fails the gate.

Scale notes: decode is per-payload inside Arrow-batched ``mapInPandas`` —
payload bytes cross the JVM<->Python boundary once per batch, sample math is
vectorized numpy, no shuffle is introduced by the decode stage itself. At
100 TB the knobs are the same as the image path: bound Arrow batch memory via
``spark.sql.execution.arrow.maxRecordsPerBatch`` for fat payloads, and size
input splits so one task's batches fit the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import types as T


def encode_wav(samples, sample_rate: int) -> bytes:
    """Pure-numpy WAV encoder (RIFF/WAVE, fmt + data chunks, 16-bit PCM,
    interleaved little-endian frames) — the fixture side of the real codec
    path, synthesizing genuine audio files without any external library.
    ``samples`` is an (n_frames, n_channels) int16 array."""
    import numpy as np

    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    n_frames, n_channels = samples.shape
    data = samples.tobytes()  # row-major == frame-interleaved
    u16 = lambda v: int(v).to_bytes(2, "little")  # noqa: E731
    u32 = lambda v: int(v).to_bytes(4, "little")  # noqa: E731
    block_align = n_channels * 2
    fmt = (
        b"fmt " + u32(16)
        + u16(1)                       # audio format 1 = integer PCM
        + u16(n_channels)
        + u32(sample_rate)
        + u32(sample_rate * block_align)  # byte rate
        + u16(block_align)
        + u16(16)                      # bits per sample
    )
    data_chunk = b"data" + u32(len(data)) + data + (b"\x00" if len(data) % 2 else b"")
    riff_body = b"WAVE" + fmt + data_chunk
    return b"RIFF" + u32(len(riff_body)) + riff_body


def decode_audio_real(payload: bytes):
    """REAL audio decode for 16-bit integer-PCM WAV — a genuine from-bytes
    codec (RIFF chunk walk, fmt validation, odd-chunk padding, interleaved
    frame deinterleave) implemented on numpy alone. Returns
    ``(samples, sample_rate)`` with samples an (n_frames, n_channels) int16
    array. Non-PCM/-16-bit formats raise ``NotImplementedError`` (the
    production seam where libsndfile/ffmpeg slots in); corrupt containers
    raise ``ValueError`` instead of decoding garbage."""
    import numpy as np

    buf = bytes(payload)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError(
            "decode_audio_real handles RIFF/WAVE only in this environment; "
            "other containers require audio libraries not present here"
        )
    u16_at = lambda o: int.from_bytes(buf[o:o + 2], "little")  # noqa: E731
    u32_at = lambda o: int.from_bytes(buf[o:o + 4], "little")  # noqa: E731
    off, fmt_seen, n_channels, sample_rate, data = 12, False, 0, 0, None
    while off + 8 <= len(buf):
        cid, size = buf[off:off + 4], u32_at(off + 4)
        body = off + 8
        if body + size > len(buf):
            raise ValueError(f"truncated {cid!r} chunk: {body + size} > {len(buf)}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError(f"fmt chunk too small ({size} bytes)")
            audio_format = u16_at(body)
            n_channels = u16_at(body + 2)
            sample_rate = u32_at(body + 4)
            bits = u16_at(body + 14)
            if audio_format != 1 or bits != 16:
                raise NotImplementedError(
                    f"decode_audio_real supports 16-bit integer PCM, got "
                    f"format={audio_format} bits={bits}"
                )
            if n_channels < 1 or sample_rate < 1:
                raise ValueError(
                    f"bad fmt: channels={n_channels} rate={sample_rate}"
                )
            fmt_seen = True
        elif cid == b"data":
            data = buf[body:body + size]
        off = body + size + (size % 2)  # RIFF pads odd chunks to even offsets
    if not fmt_seen or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    block_align = n_channels * 2
    n_frames = len(data) // block_align
    samples = np.frombuffer(
        data, dtype="<i2", count=n_frames * n_channels
    ).reshape(n_frames, n_channels)
    return np.ascontiguousarray(samples), sample_rate


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_channels", T.LongType(), False),
        T.StructField("sample_rate", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), False),
        T.StructField("duration_ms", T.LongType(), False),
        T.StructField("ch0_sum", T.LongType(), False),
        T.StructField("chl_sum", T.LongType(), False),
        T.StructField("peak_abs", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("zero_crossings", T.LongType(), False),
    ]
)


def audio_decode_features(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL decode + feature-extract: parse each WAV payload back to int16
    frames and compute exact integer statistics — first/last channel sums
    (any interleave bug swaps or mixes them), peak |sample|, total squared
    energy (int64: |s| <= 2^15, so even 2^32 samples stay < 2^63), and the
    channel-0 sign-change (zero-crossing) count, the classic cheap
    voiced/unvoiced signal. Input columns: doc_id, payload (binary WAV)."""
    import numpy as np

    for pdf in batches:
        out: dict[str, list] = {f.name: [] for f in AUDIO_FEATURES_SCHEMA}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            samples, rate = decode_audio_real(bytes(payload))
            s64 = samples.astype(np.int64)
            n_frames, n_channels = samples.shape
            ch0 = s64[:, 0]
            out["doc_id"].append(doc_id)
            out["n_channels"].append(n_channels)
            out["sample_rate"].append(rate)
            out["n_frames"].append(n_frames)
            out["duration_ms"].append(n_frames * 1000 // rate)
            out["ch0_sum"].append(int(ch0.sum()))
            out["chl_sum"].append(int(s64[:, -1].sum()))
            out["peak_abs"].append(int(np.abs(s64).max()) if s64.size else 0)
            out["energy"].append(int((s64 * s64).sum()))
            out["zero_crossings"].append(
                int(((ch0[:-1] < 0) != (ch0[1:] < 0)).sum())
            )
        yield pd.DataFrame(out)


AUDIO_WINDOW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("window_idx", T.LongType(), False),
        T.StructField("n_frames_in_window", T.LongType(), False),
        T.StructField("w_energy", T.LongType(), False),
        T.StructField("w_peak", T.LongType(), False),
    ]
)


def audio_window_energy(window_frames: int):
    """Build the Arrow-batched kernel for windowed audio features: decode
    each WAV, mix to channel 0, and emit one row per ``window_frames``-frame
    window with exact integer energy (sum of squares) and peak |sample| —
    the row-expanding (1 clip -> N windows) shape ASR/VAD preprocessing
    uses, with the decode actually performed. Vectorized via bincount over
    the window index (float64 sums are exact: values < 2^53 per window)."""
    import numpy as np

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in AUDIO_WINDOW_SCHEMA}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                samples, _ = decode_audio_real(bytes(payload))
                ch0 = samples[:, 0].astype(np.int64)
                n = ch0.shape[0]
                if not n:
                    continue
                widx = np.arange(n) // window_frames
                n_win = int(widx[-1]) + 1
                energy = np.bincount(widx, weights=(ch0 * ch0).astype(np.float64), minlength=n_win)
                counts = np.bincount(widx, minlength=n_win)
                peaks = np.zeros(n_win, dtype=np.int64)
                np.maximum.at(peaks, widx, np.abs(ch0))
                out["doc_id"].extend([doc_id] * n_win)
                out["window_idx"].extend(range(n_win))
                out["n_frames_in_window"].extend(int(c) for c in counts)
                out["w_energy"].extend(int(e) for e in energy)
                out["w_peak"].extend(int(p) for p in peaks)
            yield pd.DataFrame(out)

    return _kernel
