#!/usr/bin/env python
"""Regenerate the tiny real-format data fixtures (deterministic).

These are byte-level fixtures for the REAL parser paths of the data
loaders (VERDICT r1 #6): a 12-row UCI ``auto-mpg.data`` (one '?' horsepower
row, one blank line), minimal MNIST idx3-ubyte image files (raw and .gz,
written with mtime=0 so the gz bytes are reproducible), and a keras-layout
``mnist.npz``. Run from the repo root:  python tests/fixtures/make_fixtures.py
"""

import gzip
import struct
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parent

AUTO_ROWS = """\
18.0   8   307.0      130.0      3504.      12.0   70  1\t"chevrolet chevelle malibu"
15.0   8   350.0      165.0      3693.      11.5   70  1\t"buick skylark 320"
18.0   8   318.0      150.0      3436.      11.0   70  1\t"plymouth satellite"
16.0   8   304.0      150.0      3433.      12.0   70  1\t"amc rebel sst"
17.0   8   302.0      140.0      3449.      10.5   70  1\t"ford torino"

25.0   4   98.00      ?          2046.      19.0   71  1\t"ford pinto"
22.0   4   140.0      72.00      2408.      19.0   71  1\t"chevrolet vega (sw)"
24.0   4   113.0      95.00      2372.      15.0   70  3\t"toyota corona mark ii"
27.0   4   97.00      88.00      2130.      14.5   71  3\t"datsun pl510"
26.0   4   97.00      46.00      1835.      20.5   70  2\t"volkswagen 1131 deluxe sedan"
33.0   4   91.00      53.00      1795.      17.5   75  3\t"honda civic cvcc"
31.0   4   79.00      67.00      1950.      19.0   74  3\t"datsun b210"
"""


def write_idx3(path: Path, images: np.ndarray, gz: bool) -> None:
    n, h, w = images.shape
    header = struct.pack(">HBBIII", 0, 0x08, 3, n, h, w)
    payload = header + images.astype(np.uint8).tobytes()
    if gz:
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
                f.write(payload)
    else:
        path.write_bytes(payload)


def write_idx1(path: Path, labels: np.ndarray, gz: bool) -> None:
    header = struct.pack(">HBBI", 0, 0x08, 1, len(labels))
    payload = header + labels.astype(np.uint8).tobytes()
    if gz:
        with open(path, "wb") as raw:
            with gzip.GzipFile(fileobj=raw, mode="wb", mtime=0) as f:
                f.write(payload)
    else:
        path.write_bytes(payload)


def main() -> None:
    (ROOT / "auto").mkdir(parents=True, exist_ok=True)
    (ROOT / "auto" / "auto-mpg.data").write_text(AUTO_ROWS)

    rng = np.random.default_rng(1234)
    train = (rng.uniform(size=(8, 28, 28)) < 0.2).astype(np.uint8) * 255
    test = (rng.uniform(size=(4, 28, 28)) < 0.2).astype(np.uint8) * 255
    # Deterministic corner markers for byte-level assertions in tests.
    train[0, 0, 0] = 255
    train[0, 0, 1] = 0
    test[0, 27, 27] = 255

    y_train = (np.arange(8) % 10).astype(np.uint8)
    y_test = np.asarray([3, 1, 4, 1], np.uint8)
    for sub, gz in (("mnist_idx_raw", False), ("mnist_idx", True)):
        d = ROOT / sub
        d.mkdir(parents=True, exist_ok=True)
        ext = ".gz" if gz else ""
        write_idx3(d / f"train-images-idx3-ubyte{ext}", train, gz)
        write_idx3(d / f"t10k-images-idx3-ubyte{ext}", test, gz)
        write_idx1(d / f"train-labels-idx1-ubyte{ext}", y_train, gz)
        write_idx1(d / f"t10k-labels-idx1-ubyte{ext}", y_test, gz)

    d = ROOT / "mnist_npz"
    d.mkdir(parents=True, exist_ok=True)
    np.savez(d / "mnist.npz", x_train=train, x_test=test,
             y_train=y_train, y_test=y_test)
    print("fixtures written under", ROOT)


if __name__ == "__main__":
    main()
