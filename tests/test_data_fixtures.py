"""Byte-level tests of the REAL data-parser paths (VERDICT r1 #6).

The surrogate fallbacks are covered in test_data.py; these fixtures
(tests/fixtures/, regenerable via make_fixtures.py) exercise the real
formats: UCI auto-mpg text (incl. '?' horsepower rows and blank lines),
MNIST idx3-ubyte raw and gzip, and the keras mnist.npz layout. Each test
points $SVAX_DATA_DIR at a fixture dir and asserts meta["synthetic"] is
False plus format-specific facts about the parsed bytes.
"""

from pathlib import Path

import numpy as np
import pytest

from svax.data.auto import _parse_uci_file, load_auto
from svax.data.mnist import _read_idx, load_mnist

FIXTURES = Path(__file__).parent / "fixtures"


def test_auto_parser_bytes():
    x = _parse_uci_file(FIXTURES / "auto" / "auto-mpg.data")
    # 12 rows, one dropped for '?' horsepower, blank line ignored.
    assert x.shape == (11, 8)
    np.testing.assert_allclose(
        x[0], [18.0, 8, 307.0, 130.0, 3504.0, 12.0, 70, 1]
    )
    assert 25.0 not in x[:, 0]  # the ford pinto row ('?' hp) was dropped


def test_load_auto_real_path(monkeypatch):
    monkeypatch.setenv("SVAX_DATA_DIR", str(FIXTURES / "auto"))
    x_train, x_test, meta = load_auto(seed=0, test_fraction=0.2)
    assert meta["synthetic"] is False
    assert meta["source"].endswith("auto-mpg.data")
    assert x_train.shape[1] == 8
    assert len(x_train) + len(x_test) == 11
    # Standardized: column means ~0, stds ~1 over the full set.
    full = np.concatenate([x_train, x_test])
    np.testing.assert_allclose(full.mean(0), 0.0, atol=1e-8)
    np.testing.assert_allclose(full.std(0), 1.0, atol=1e-6)


@pytest.mark.parametrize("sub", ["mnist_idx_raw", "mnist_idx"])
def test_read_idx_bytes(sub):
    d = FIXTURES / sub
    name = "train-images-idx3-ubyte" + (".gz" if sub == "mnist_idx" else "")
    imgs = _read_idx(d / name)
    assert imgs.shape == (8, 28, 28)
    assert imgs.dtype == np.uint8
    # Corner markers written by make_fixtures.py.
    assert imgs[0, 0, 0] == 255 and imgs[0, 0, 1] == 0


@pytest.mark.parametrize("sub", ["mnist_idx_raw", "mnist_idx", "mnist_npz"])
def test_load_mnist_real_paths(monkeypatch, sub):
    monkeypatch.setenv("SVAX_DATA_DIR", str(FIXTURES / sub))
    x_train, x_test, meta = load_mnist(seed=0, binarize=True)
    assert meta["synthetic"] is False
    assert x_train.shape == (8, 784)
    assert x_test.shape == (4, 784)
    assert set(np.unique(x_train)) <= {0.0, 1.0}
    # Test-set binarization is deterministic (> 0.5): the 255 corner marker
    # of test image 0 (last pixel) must survive as 1.0.
    assert x_test[0, -1] == 1.0


@pytest.mark.parametrize("sub", ["mnist_idx_raw", "mnist_idx", "mnist_npz"])
def test_load_mnist_labels(monkeypatch, sub):
    """return_labels=True parses idx1 label files / npz y arrays."""
    monkeypatch.setenv("SVAX_DATA_DIR", str(FIXTURES / sub))
    x_train, x_test, meta, y_train, y_test = load_mnist(
        seed=0, return_labels=True
    )
    assert meta["synthetic"] is False
    np.testing.assert_array_equal(y_train, np.arange(8) % 10)
    np.testing.assert_array_equal(y_test, [3, 1, 4, 1])
    assert len(y_train) == len(x_train) and len(y_test) == len(x_test)


def test_load_mnist_surrogate_labels():
    """The synthetic surrogate carries its generating class labels."""
    x_train, x_test, meta, y_train, y_test = load_mnist(
        seed=0, max_train=128, return_labels=True
    )
    assert meta["synthetic"] is True
    assert len(y_train) == 128 and len(y_test) == len(x_test)
    assert set(np.unique(y_train)) <= set(range(10))


def test_idx_and_npz_paths_agree(monkeypatch):
    monkeypatch.setenv("SVAX_DATA_DIR", str(FIXTURES / "mnist_idx"))
    a_train, a_test, _ = load_mnist(seed=0, binarize=False)
    monkeypatch.setenv("SVAX_DATA_DIR", str(FIXTURES / "mnist_npz"))
    b_train, b_test, _ = load_mnist(seed=0, binarize=False)
    np.testing.assert_array_equal(a_train, b_train)
    np.testing.assert_array_equal(a_test, b_test)
