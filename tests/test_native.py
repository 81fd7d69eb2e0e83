"""Native C++ data-path core tests (native/image_pipe.cpp via ctypes).

The numpy fallback implements the identical algorithm, so native vs
fallback must agree bit-exactly; vs cv2 INTER_LINEAR within 1 LSB.
If no toolchain is available the native path is skipped (fallback-only).
"""

import numpy as np
import pytest

from hybrid_diffusion_tpu.data import native as nat


@pytest.fixture(scope="module")
def lib():
    lib = nat.load_library()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_version(lib):
    assert lib.hdt_version() >= 10


def test_resize_matches_numpy_reference_exactly(lib):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (317, 483, 3), np.uint8)
    a = nat.resize(img, (256, 256), nat.BILINEAR)
    b = nat._numpy_resize(img, 256, 256, nat.BILINEAR)
    assert np.array_equal(a, b)
    a = nat.resize(img, (100, 40), nat.NEAREST)
    b = nat._numpy_resize(img, 100, 40, nat.NEAREST)
    assert np.array_equal(a, b)


def test_resize_matches_cv2_within_1lsb(lib):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.RandomState(1)
    img = rng.randint(0, 255, (130, 217, 3), np.uint8)
    a = nat.resize(img, (256, 256)).astype(int)
    c = cv2.resize(img, (256, 256), interpolation=cv2.INTER_LINEAR).astype(int)
    assert np.abs(a - c).max() <= 1


def test_identity_resize_is_copy(lib):
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    out = nat.resize(img, (4, 5))
    assert np.array_equal(out, img)
    assert out.ctypes.data != img.ctypes.data


def test_batch_resize_threaded(lib):
    rng = np.random.RandomState(2)
    imgs = [rng.randint(0, 255, (rng.randint(40, 90), rng.randint(40, 90), 3),
                        np.uint8) for _ in range(17)]
    out = nat.batch_resize(imgs, (32, 32), threads=4)
    assert out.shape == (17, 32, 32, 3)
    for i, im in enumerate(imgs):
        assert np.array_equal(out[i], nat.resize(im, (32, 32)))


def test_bgr_to_rgb(lib):
    rng = np.random.RandomState(3)
    img = rng.randint(0, 255, (7, 9, 3), np.uint8)
    assert np.array_equal(nat.bgr_to_rgb_inplace(img.copy()), img[..., ::-1])


def test_registry_resize_uses_native():
    from hybrid_diffusion_tpu.data.registry import resize_image

    rng = np.random.RandomState(4)
    img = rng.randint(0, 255, (99, 77, 3), np.uint8)
    out = resize_image(img, 64)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8


def test_native_decode_png_jpeg_roundtrip(lib, tmp_path):
    """Native libpng/libjpeg decode == cv2 decode (PNG exact; JPEG both
    decoders read the same file)."""
    cv2 = pytest.importorskip("cv2")
    if not nat.decode_supported():
        pytest.skip("built without libjpeg/libpng")
    rng = np.random.RandomState(0)
    img = rng.randint(0, 255, (37, 53, 3), np.uint8)

    ok, png = cv2.imencode(".png", img[..., ::-1])  # cv2 wants BGR
    assert ok
    out = nat.decode_image(png.tobytes())
    np.testing.assert_array_equal(out, img)  # PNG is lossless

    ok, jpg = cv2.imencode(".jpg", img[..., ::-1],
                           [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    ours = nat.decode_image(jpg.tobytes())
    theirs = cv2.cvtColor(cv2.imdecode(jpg, cv2.IMREAD_COLOR),
                          cv2.COLOR_BGR2RGB)
    assert ours.shape == theirs.shape
    # Different IDCT implementations may differ by a couple of LSB.
    assert np.mean(np.abs(ours.astype(int) - theirs.astype(int))) < 2.0

    # garbage bytes → None, not a crash
    assert nat.decode_image(b"not an image") is None


def test_batch_decode_resize_fused(lib):
    cv2 = pytest.importorskip("cv2")
    if not nat.decode_supported():
        pytest.skip("built without libjpeg/libpng")
    rng = np.random.RandomState(1)
    imgs = [rng.randint(0, 255, (h, w, 3), np.uint8)
            for h, w in [(40, 60), (32, 32), (70, 20)]]
    blobs = [cv2.imencode(".png", im[..., ::-1])[1].tobytes() for im in imgs]
    blobs.append(b"corrupt")
    batch, okv = nat.batch_decode_resize(blobs, (32, 32))
    assert batch.shape == (4, 32, 32, 3)
    assert list(okv) == [True, True, True, False]
    assert batch[3].sum() == 0  # corrupt slot zeroed
    # Matches decode→resize done separately.
    np.testing.assert_array_equal(batch[1], nat.resize(imgs[1], (32, 32)))
    np.testing.assert_array_equal(
        batch[0], nat.resize(imgs[0], (32, 32)))


def test_load_image_native_path(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from hybrid_diffusion_tpu.data.registry import load_image

    rng = np.random.RandomState(2)
    img = rng.randint(0, 255, (24, 31, 3), np.uint8)
    p = str(tmp_path / "x.png")
    cv2.imwrite(p, img[..., ::-1])
    np.testing.assert_array_equal(load_image(p), img)
    with pytest.raises(FileNotFoundError):
        load_image(str(tmp_path / "missing.png"))
