"""Pure-stdlib WAV (RIFF PCM16) codec — the audio twin of
functions/png.py, so audio feature extraction operates on REAL decoded
samples instead of metadata echoes. Only the ``wave`` + ``struct``
stdlib modules; no audio libraries required.

Scope: 16-bit PCM, any channel count/sample rate — the interchange
subset a data pipeline actually meets in practice. Anything else
raises WavError and flows through the opaque-bytes path."""

from __future__ import annotations

import io
import struct
import wave


class WavError(ValueError):
    """Payload is not a decodable PCM16 WAV."""


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode interleaved PCM16 samples (one int per channel-frame slot,
    -32768..32767) into a RIFF WAV container."""
    if len(samples) % channels:
        raise WavError("sample count not a multiple of channels")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF PCM16 WAV into (sample_rate, channels, interleaved
    samples). Raises WavError for any non-WAV or non-PCM16 payload."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as w:
            if w.getsampwidth() != 2 or w.getcomptype() != "NONE":
                raise WavError("only uncompressed PCM16 is decodable")
            channels = w.getnchannels()
            rate = w.getframerate()
            raw = w.readframes(w.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise WavError(str(e)) from e
    n = len(raw) // 2
    return rate, channels, list(struct.unpack(f"<{n}h", raw))
