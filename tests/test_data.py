"""Dataset loaders: shapes, determinism, fallbacks (SURVEY.md §2 L5)."""

import numpy as np

from svax.data import load_auto, load_dataset, load_mnist, make_pinwheel_data


def test_pinwheel_shapes_and_determinism():
    a = make_pinwheel_data(num_classes=5, num_per_class=20, seed=3)
    b = make_pinwheel_data(num_classes=5, num_per_class=20, seed=3)
    assert a.shape == (100, 2)
    np.testing.assert_array_equal(a, b)
    c = make_pinwheel_data(num_classes=5, num_per_class=20, seed=4)
    assert not np.array_equal(a, c)


def test_auto_loader():
    train, test, meta = load_auto(seed=0)
    assert train.ndim == 2 and test.ndim == 2
    assert train.shape[1] == test.shape[1]
    assert meta["likelihood"] == "gaussian"
    # Standardized columns.
    x = np.concatenate([train, test])
    np.testing.assert_allclose(x.mean(0), 0.0, atol=1e-6)
    np.testing.assert_allclose(x.std(0), 1.0, atol=1e-6)


def test_mnist_loader():
    train, test, meta = load_mnist(seed=0, max_train=512)
    assert train.shape[1] == 784 and test.shape[1] == 784
    assert meta["likelihood"] == "bernoulli"
    assert set(np.unique(train)).issubset({0.0, 1.0})


def test_dispatcher():
    for name in ("pinwheel", "auto", "mnist"):
        train, test, meta = load_dataset(name, seed=0)
        assert len(train) > len(test) > 0
        assert "likelihood" in meta
