"""Built-in EXR codec + unified image IO (zdr_tpu/imageio_exr.py).

The reference workflow round-trips PNG textures and EXR outputs through
imageio (example.py:13-18,92-96); this environment has no EXR backend, so
the codec is in-tree and gated here: exact float roundtrip, half-precision
roundtrip, channel ordering, and compatibility of the PNG path.
"""

import numpy as np
import pytest

from zdr_tpu.imageio_exr import (
    load_exr,
    load_image,
    save_exr,
    save_image,
)


@pytest.mark.parametrize("shape", [(37, 53, 3), (64, 64, 4), (16, 16, 1), (21, 8)])
def test_exr_float32_exact_roundtrip(tmp_path, shape):
    rng = np.random.default_rng(0)
    img = (rng.standard_normal(shape) * 10).astype(np.float32)
    p = str(tmp_path / "x.exr")
    save_exr(p, img, half=False)
    back = load_exr(p)
    ref = img if img.ndim == 3 else img[..., None]
    np.testing.assert_array_equal(back, ref)


def test_exr_half_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.random((33, 47, 3)).astype(np.float32) * 4
    p = str(tmp_path / "h.exr")
    save_exr(p, img, half=True)
    back = load_exr(p)
    np.testing.assert_array_equal(back, img.astype(np.float16).astype(np.float32))


def test_exr_channel_order_rgba(tmp_path):
    """Channels are stored alphabetically (A,B,G,R) but load_exr returns
    R,G,B,A — a constant-per-channel image distinguishes any shuffle."""
    img = np.zeros((8, 8, 4), np.float32)
    img[..., 0] = 0.1  # R
    img[..., 1] = 0.2  # G
    img[..., 2] = 0.3  # B
    img[..., 3] = 0.4  # A
    p = str(tmp_path / "c.exr")
    save_exr(p, img, half=False)
    back = load_exr(p)
    for c, v in enumerate([0.1, 0.2, 0.3, 0.4]):
        assert np.allclose(back[..., c], v)


def test_exr_incompressible_raw_block(tmp_path):
    """Random uint-pattern data can deflate larger than raw; the writer then
    stores the raw block (spec behavior) and the reader must accept it."""
    rng = np.random.default_rng(2)
    img = rng.standard_normal((17, 1, 3)).astype(np.float32) * 1e20
    p = str(tmp_path / "r.exr")
    save_exr(p, img, half=False)
    np.testing.assert_array_equal(load_exr(p), img)


def test_save_load_image_png(tmp_path):
    rng = np.random.default_rng(3)
    img = rng.random((12, 10, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(p, img)
    back = load_image(p)
    assert back.shape == (12, 10, 3)
    assert back.dtype == np.float32
    assert np.abs(back - img).max() <= 1.0 / 255.0


def test_save_image_exr_keeps_hdr(tmp_path):
    img = np.full((4, 4, 3), 7.25, np.float32)
    p = str(tmp_path / "hdr.exr")
    save_image(p, img)
    assert np.allclose(load_image(p), 7.25)


def test_example_material_loader(tmp_path):
    """apps/example.py --material: PNG diffuse gets **2.2, optional
    roughness, nearest resize to the optimization texture resolution."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    from example import load_material_files

    d = np.full((8, 8, 3), 0.5, np.float32)
    r = np.full((8, 8), 0.25, np.float32)
    pd, pr = str(tmp_path / "d.png"), str(tmp_path / "r.png")
    save_image(pd, d)
    save_image(pr, np.repeat(r[..., None], 3, -1))
    mat = np.asarray(load_material_files(f"{pd},{pr}", tex_res=4))
    assert mat.shape == (4, 4, 4)
    assert np.allclose(mat[..., :3], (127.5 / 255) ** 2.2, atol=0.01)
    assert np.allclose(mat[..., 3], 0.25, atol=0.01)


def _spec_zip_preprocess(raw: bytes) -> bytes:
    """Literal scalar transcription of OpenEXR ImfZip.cpp Zip::compress
    preprocessing (reorder halves, then delta predictor), independent of
    the vectorized implementation under test."""
    n = len(raw)
    t1, t2 = [], []
    for i, b in enumerate(raw):
        (t1 if i % 2 == 0 else t2).append(b)
    buf = t1 + t2
    out = [buf[0]]
    p = buf[0]
    for b in buf[1:]:
        d = (b - p + 128 + 256) % 256
        p = b
        out.append(d)
    return bytes(out)


def _spec_zip_postprocess(data: bytes) -> bytes:
    """Literal scalar transcription of Zip::uncompress postprocessing
    (undo predictor, then interleave the halves back)."""
    buf = list(data)
    for i in range(1, len(buf)):
        buf[i] = (buf[i - 1] + buf[i] - 128) % 256
    half = (len(buf) + 1) // 2
    t1, t2 = buf[:half], buf[half:]
    out = []
    for i in range(len(buf)):
        out.append(t1[i // 2] if i % 2 == 0 else t2[i // 2])
    return bytes(out)


def test_zip_preprocess_matches_openexr_spec():
    """The vectorized codec must match the byte transform from the OpenEXR
    reference source (ImfZip.cpp) — not merely invert itself. Round 2 had
    reorder/predict swapped (ADVICE.md r2, high): files decoded fine here
    but were garbage for every standard reader."""
    import zlib

    from zdr_tpu.imageio_exr import _zip_predict_decode, _zip_predict_encode

    rng = np.random.RandomState(7)
    for n in (1, 2, 3, 64, 257, 4096):
        raw = rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
        # encoder output == spec transform, deflated
        assert zlib.decompress(_zip_predict_encode(raw)) == _spec_zip_preprocess(raw)
        # decoder inverts a spec-produced block
        comp = zlib.compress(_spec_zip_preprocess(raw))
        assert _zip_predict_decode(comp, n) == raw
        # and the scalar spec postprocess agrees
        assert _spec_zip_postprocess(_spec_zip_preprocess(raw)) == raw


def test_load_exr_rejects_malformed(tmp_path):
    from zdr_tpu.imageio_exr import load_exr, save_exr

    p = str(tmp_path / "x.exr")
    save_exr(p, np.random.rand(8, 8, 3).astype(np.float32))
    blob = bytearray(open(p, "rb").read())
    # corrupt dataWindow (negative extent) -> clear error, not a crash
    idx = blob.find(b"dataWindow")
    size_off = idx + len(b"dataWindow") + 1 + len(b"box2i") + 1 + 4
    import struct

    blob[size_off : size_off + 16] = struct.pack("<iiii", 0, 0, -5, -5)
    bad = str(tmp_path / "bad.exr")
    open(bad, "wb").write(bytes(blob))
    with pytest.raises((ValueError, NotImplementedError)):
        load_exr(bad)
