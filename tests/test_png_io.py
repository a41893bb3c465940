"""PNG dataset interchange (data/png_io.py): the reference's on-disk
format — labels in 4-decimal filenames, (x-127.5)/127.5 load normalization
(modules/datasets.py:24-30, modules/pendulum_real.py:88)."""
import numpy as np
import pytest

from cdgvae_tpu.data.png_io import (load_png_dataset, sample_filename,
                                    save_png_dataset)
from cdgvae_tpu.data.pendulum import PendulumDataset, sample_factors_real
from cdgvae_tpu.data.pendulum_dr import PendulumDRDataset, sample_factors_dr


def test_sample_filename_reference_format():
    # reference: 'a_' + '_'.join(str(round(j, 4))) + '.png'
    assert sample_filename([0.78539816, 1.0, 12.34567, 0.0, 1.0]) == \
        "a_0.7854_1.0_12.3457_0.0_1.0.png"


def test_round_trip_pendulum_real(tmp_path):
    factors, is_test = sample_factors_real(seed=3, n=40)
    root = str(tmp_path / "pendulum_real")
    n_train, n_test = save_png_dataset(root, factors, is_test, image_size=32)
    assert n_train == (~is_test).sum() and n_test == is_test.sum()

    x, labels = load_png_dataset(root + "/train", image_size=32)
    assert x.shape == ((~is_test).sum(), 32, 32, 3)
    assert x.min() >= -1.0 and x.max() <= 1.0
    # labels survive the filename round trip exactly (both sides round to 4
    # decimals); loader sorts filenames, so compare as sets of rows
    want = {tuple(r) for r in factors[~is_test]}
    got = {tuple(r) for r in labels}
    assert got == want


def test_dataset_data_dir_matches_rendered(tmp_path):
    """PendulumDataset(data_dir=...) ≈ the device-rendered dataset: same
    labels, pixels within uint8 quantization of the renderer output."""
    n = 24
    factors, is_test = sample_factors_real(seed=1, n=n)
    root = str(tmp_path / "ds")
    save_png_dataset(root, factors, is_test, image_size=32)

    from_disk = PendulumDataset(image_size=32, train=True, data_dir=root)
    rendered = PendulumDataset(image_size=32, train=True, seed=1, n=n)
    assert len(from_disk) == len(rendered)
    # same factor multiset
    assert ({tuple(r) for r in from_disk.factors}
            == {tuple(r) for r in rendered.factors})
    # align rows (disk order is sorted by filename) then compare pixels:
    # written at the load size, the only error is uint8 quantization
    order_d = np.lexsort(from_disk.factors.T)
    order_r = np.lexsort(rendered.factors.T)
    np.testing.assert_allclose(from_disk.x_data[order_d],
                               rendered.x_data[order_r], atol=1.5 / 127.5)
    # normalized labels identical
    np.testing.assert_allclose(from_disk.y_data[order_d],
                               rendered.y_data[order_r], atol=1e-6)


def test_dr_round_trip_six_fields(tmp_path):
    train_f, test_f = sample_factors_dr(seed=2, n=32)
    factors = np.concatenate([train_f, test_f], 0)
    is_test = np.arange(len(factors)) >= len(train_f)
    root = str(tmp_path / "pendulum_DR")
    save_png_dataset(root, factors, is_test, image_size=32,
                     background_col=4)

    ds = PendulumDRDataset(image_size=32, train=True, data_dir=root)
    assert ds.factors.shape[1] == 6
    assert ({tuple(r) for r in ds.factors} == {tuple(r) for r in train_f})
    # blue-background samples really render blue: vs the white background,
    # blue drops the red channel inside the axes window (rows/cols 5:10 at
    # 32px are in-window, left of the sun, above the pendulum)
    bg = ds.factors[:, 4].astype(bool)
    if bg.any() and (~bg).any():
        patch = ds.x_data[:, 5:9, 5:10]
        red = patch[..., 0].mean(axis=(1, 2))
        assert red[bg].mean() < red[~bg].mean() - 0.2


def test_generate_data_cli(tmp_path):
    from cdgvae_tpu.cli.generate_data import main
    out = str(tmp_path / "gen")
    main(["--dgp", "real", "--out", out, "--n", "16", "--seed", "5",
          "--image_size", "32"])
    x, labels = load_png_dataset(out + "/train", image_size=32)
    assert labels.shape[1] == 5 and len(x) == len(labels) > 0


def test_cli_main_trains_from_png_tree(tmp_path):
    """cli.main --data_dir: the full training CLI runs on a
    reference-format PNG tree instead of the device renderer, and the
    checkpoint config records the data_dir for the eval CLIs."""
    import json
    import os

    from cdgvae_tpu.cli.generate_data import main as gen
    from cdgvae_tpu.cli.main import main as train

    data = str(tmp_path / "tree")
    gen(["--dgp", "real", "--out", data, "--n", "80", "--seed", "7",
         "--image_size", "16"])
    out = str(tmp_path / "run")
    train(["--image_size", "16", "--epochs", "1", "--batch_size", "16",
           "--model", "CDGVAE", "--data_dir", data, "--assets_dir", out])
    cfg = json.load(open(os.path.join(out, "model_CDGVAE_linear",
                                      "config.json")))
    assert cfg["data_dir"] == data


def test_load_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_png_dataset(str(tmp_path), image_size=32)
