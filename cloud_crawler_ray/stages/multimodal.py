"""Multimodal (image/audio/video) actor-pool stages over opaque binary columns.

Treats media as ``binary`` payload columns with typed metadata (the
input_hint pattern: bytes + w/h/fmt). The Ray-side plumbing — schemas,
actor-pool signatures, batch sizing, output layout — is real and tested;
codecs this container lacks (JPEG/WebP via Pillow, audio via soundfile,
video via PyAV) are gated behind import-tries with the in-repo raw/png/q6
codecs as the working fallback and a clearly-marked NotImplementedError
otherwise.

Batch-size guidance: wide binary rows — callers should pass small
``batch_size`` (64-256) so batch × concurrency fits worker heaps
(SURVEY.md §4.1 memory row).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import imaging

try:  # pragma: no cover - not installable in this sandbox
    from PIL import Image as _PIL_Image  # noqa: N812

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover
    import soundfile as _soundfile  # noqa: F401

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False


def decode_any(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    """Decode one image payload to an RGB ndarray.

    In-repo codecs (raw/png/q6) always work; other formats need Pillow.
    """
    if fmt in imaging.FORMATS:
        return imaging.decode_image(data, w, h, fmt)
    if _HAVE_PIL:
        import io

        return np.asarray(_PIL_Image.open(io.BytesIO(data)).convert("RGB"))
    raise NotImplementedError(
        f"format {fmt!r} needs Pillow, which is not available in this container; "
        "raw/png/q6 are supported natively"
    )


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (no external deps)."""
    h, w, _ = img.shape
    yi = np.floor(np.arange(out_h) * (h / out_h)).astype(np.int64)
    xi = np.floor(np.arange(out_w) * (w / out_w)).astype(np.int64)
    return img[yi][:, xi]


class ImageFeatureStage:
    """Actor-pool ``map_batches`` stage: decode → resize → features.

    __init__ runs once per actor (codec setup / model load point);
    __call__ decodes each row's binary payload, resizes to a thumbnail and
    emits phash + channel statistics — the shape of any real image
    feature-extraction stage (CLIP embedding, OCR, NSFW score) with the
    model swapped for deterministic features.
    """

    def __init__(self, thumb: int = 32):
        self.thumb = thumb

    def __call__(self, t: pa.Table) -> pa.Table:
        ph, means, stds, thumbs = [], [], [], []
        for data, w, h, fmt in zip(
            t["bytes"].to_pylist(), t["w"].to_pylist(), t["h"].to_pylist(), t["fmt"].to_pylist()
        ):
            img = decode_any(data, w, h, fmt)
            small = resize_nearest(img, self.thumb, self.thumb)
            ph.append(imaging.phash64(img))
            means.append(float(img.mean()))
            stds.append(float(img.std()))
            thumbs.append(imaging.encode_raw(np.ascontiguousarray(small)))
        return pa.table(
            {
                "image_id": t["image_id"],
                "phash": pa.array(ph, pa.int64()),
                "mean_intensity": pa.array(np.round(means, 4), pa.float64()),
                "std_intensity": pa.array(np.round(stds, 4), pa.float64()),
                "thumbnail": pa.array(thumbs, pa.binary()),
            }
        )


class AudioFeatureStage:
    """Audio decode/feature stage — STUB (no audio codec in this container).

    The actor signature, schema contract and batch plumbing are real; the
    decode is a deterministic fake over the binary payload so pipelines can
    be wired and tested end-to-end. Swap ``_decode`` for soundfile/librosa
    when available.
    """

    def __init__(self, sample_rate: int = 16_000):
        self.sample_rate = sample_rate

    def _decode(self, data: bytes) -> np.ndarray:
        if _HAVE_SOUNDFILE:  # pragma: no cover
            raise NotImplementedError("wire soundfile decode here")
        # deterministic fake: interpret payload bytes as int8 PCM
        return np.frombuffer(data, np.int8).astype(np.float32) / 128.0

    def __call__(self, t: pa.Table) -> pa.Table:
        durs, rms = [], []
        for data in t["bytes"].to_pylist():
            pcm = self._decode(data)
            durs.append(len(pcm) / self.sample_rate)
            rms.append(float(np.sqrt(np.mean(pcm**2))) if len(pcm) else 0.0)
        return pa.table(
            {
                "audio_id": t["audio_id"],
                "duration_s": pa.array(np.round(durs, 6), pa.float64()),
                "rms": pa.array(np.round(rms, 6), pa.float64()),
            }
        )


class FrameSampleStage:
    """Video frame-sampling stage — STUB (no video codec in this container).

    Emits every k-th "frame" of a synthetic frame sequence derived from the
    payload; the row-explosion plumbing (one input row → N frame rows) is
    the real part. Swap ``_frames`` for PyAV demux when available.
    """

    def __init__(self, every_k: int = 10, frame_w: int = 16, frame_h: int = 16):
        self.every_k = every_k
        self.frame_w = frame_w
        self.frame_h = frame_h

    def _frames(self, data: bytes) -> int:
        return max(1, len(data) // 1024)  # fake frame count from payload size

    def __call__(self, t: pa.Table) -> pa.Table:
        vids, idxs, frames = [], [], []
        for vid, data in zip(t["video_id"].to_pylist(), t["bytes"].to_pylist()):
            n = self._frames(data)
            for i in range(0, n, self.every_k):
                vids.append(vid)
                idxs.append(i)
                seed = int.from_bytes(data[:8].ljust(8, b"\0"), "little") ^ i
                frames.append(imaging.encode_raw(imaging.synth_image(seed, self.frame_w, self.frame_h)))
        return pa.table(
            {
                "video_id": pa.array(vids, pa.string()),
                "frame_index": pa.array(idxs, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
