"""Unit tests: ANN (brute + IVF recall) and multimodal stage plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from cloud_crawler_ray.functions.ann import IVFIndex, brute_topk
from cloud_crawler_ray.functions.imaging import encode_image, synth_image
from cloud_crawler_ray.stages.multimodal import (
    AudioFeatureStage,
    FrameSampleStage,
    ImageFeatureStage,
    decode_any,
    resize_nearest,
)

RNG = np.random.Generator(np.random.PCG64(3))


class TestANN:
    def setup_method(self):
        # clustered vectors so IVF has structure to find
        centers = RNG.normal(0, 1, (8, 32))
        self.vecs = np.concatenate([c + RNG.normal(0, 0.15, (120, 32)) for c in centers])
        self.ids = np.arange(len(self.vecs))

    def test_brute_topk_exact(self):
        ids, sims = brute_topk(self.vecs[0], self.vecs, self.ids, 5)
        assert ids[0] == 0 and sims[0] > 0.999
        assert (np.diff(sims) <= 1e-12).all()

    def test_ivf_deterministic(self):
        i1 = IVFIndex.build(self.vecs, 8)
        i2 = IVFIndex.build(self.vecs, 8)
        assert np.allclose(i1.centroids, i2.centroids)

    def test_ivf_recall(self):
        index = IVFIndex.build(self.vecs, 8)
        assign = index.assign(self.vecs)
        hits = 0
        for qi in range(0, 960, 97):
            probed = index.probe_lists(self.vecs[qi], 3)
            mask = np.isin(assign, probed)
            cand_ids, _ = brute_topk(self.vecs[qi], self.vecs[mask], self.ids[mask], 10)
            true_ids, _ = brute_topk(self.vecs[qi], self.vecs, self.ids, 10)
            hits += len(np.intersect1d(cand_ids, true_ids)) / 10
        recall = hits / 10
        assert recall >= 0.9, recall


class TestMultimodal:
    def _images_batch(self, n=6):
        ids, blobs, ws, hs, fmts = [], [], [], [], []
        for i in range(n):
            w, h = 20 + i, 24 + i
            img = synth_image(i, w, h)
            fmt = ("raw", "png", "q6")[i % 3]
            ids.append(f"im{i}")
            blobs.append(encode_image(img, fmt))
            ws.append(w)
            hs.append(h)
            fmts.append(fmt)
        return pa.table(
            {
                "image_id": pa.array(ids),
                "bytes": pa.array(blobs, pa.binary()),
                "w": pa.array(ws, pa.int32()),
                "h": pa.array(hs, pa.int32()),
                "fmt": pa.array(fmts),
            }
        )

    def test_decode_any_supported(self):
        img = synth_image(9, 18, 18)
        assert np.array_equal(decode_any(encode_image(img, "png"), 18, 18, "png"), img)

    def test_decode_any_unsupported_raises(self):
        with pytest.raises(NotImplementedError):
            decode_any(b"\xff\xd8\xff", 10, 10, "jpeg")

    def test_resize(self):
        img = synth_image(1, 40, 30)
        out = resize_nearest(img, 16, 16)
        assert out.shape == (16, 16, 3)

    def test_image_feature_stage(self):
        t = self._images_batch()
        out = ImageFeatureStage()(t)
        assert out.num_rows == t.num_rows
        assert set(out.column_names) == {"image_id", "phash", "mean_intensity", "std_intensity", "thumbnail"}
        out2 = ImageFeatureStage()(t)
        assert out.equals(out2)

    def test_audio_stage_stub(self):
        t = pa.table({"audio_id": pa.array(["a1", "a2"]), "bytes": pa.array([b"\x01\x02\x03\x04" * 100, b""], pa.binary())})
        out = AudioFeatureStage()(t)
        assert out["duration_s"][0].as_py() > 0
        assert out["rms"][1].as_py() == 0.0

    def test_frame_sample_explodes_rows(self):
        t = pa.table({"video_id": pa.array(["v1"]), "bytes": pa.array([b"x" * 25_000], pa.binary())})
        out = FrameSampleStage(every_k=10)(t)
        assert out.num_rows == 3  # 24 fake frames → indices 0, 10, 20
        assert set(out["video_id"].to_pylist()) == {"v1"}
