import numpy as np
import pytest

from vit2spn_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native dataplane unavailable (no g++?)")


def test_gather_matches_numpy(lib_ok):
    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (100, 28, 28, 1), dtype=np.uint8)
    idx = rng.integers(0, 100, 37)
    out = native.gather_batch(images, idx)
    np.testing.assert_array_equal(out, images[idx])


def test_gather_large_rows(lib_ok):
    rng = np.random.default_rng(1)
    images = rng.integers(0, 255, (40, 256, 256, 1), dtype=np.uint8)
    idx = rng.integers(0, 40, 64)
    np.testing.assert_array_equal(native.gather_batch(images, idx), images[idx])


def test_shuffled_indices_is_permutation_and_deterministic(lib_ok):
    a = native.shuffled_indices(1000, seed=42)
    b = native.shuffled_indices(1000, seed=42)
    c = native.shuffled_indices(1000, seed=43)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)
    np.testing.assert_array_equal(np.sort(a), np.arange(1000))


def test_bincount_matches_numpy(lib_ok):
    rng = np.random.default_rng(2)
    labels = rng.integers(0, 7, 500)
    np.testing.assert_array_equal(
        native.bincount(labels, 7), np.bincount(labels, minlength=7)
    )


def test_numpy_fallback(monkeypatch):
    monkeypatch.setenv("VIT2SPN_NO_NATIVE", "1")
    monkeypatch.setattr(native, "_LIB", None)
    images = np.arange(4 * 2 * 2, dtype=np.uint8).reshape(4, 2, 2, 1)
    out = native.gather_batch(images, np.array([3, 0]))
    np.testing.assert_array_equal(out, images[[3, 0]])


def test_gather_out_of_range_matches_numpy(lib_ok):
    """The C gather has no bounds checks; the wrapper must route negative
    (numpy wraparound) and out-of-range indices through numpy instead of
    reading out-of-bounds memory."""
    from vit2spn_tpu.data import native

    images = np.arange(4 * 3, dtype=np.uint8).reshape(4, 3)
    np.testing.assert_array_equal(
        native.gather_batch(images, np.array([-1, 0])), images[[-1, 0]]
    )
    with pytest.raises(IndexError):
        native.gather_batch(images, np.array([0, 7]))
