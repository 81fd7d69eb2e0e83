"""Data pipeline tests: registry globs, splits, synthetic fixture, loader."""

import os

import numpy as np
import pytest

from hybrid_diffusion_tpu.data import (
    ATMOSPHERIC_DATASETS,
    DATASET_REGISTRY,
    UNDERWATER_DATASETS,
    BatchLoader,
    PairedImageDataset,
    SyntheticPairedDataset,
    dataset_splits,
    make_dataset,
    split_data,
    shard_for_host,
)
from hybrid_diffusion_tpu.data.pipeline import interleave


def test_split_data_ratios_and_order():
    paths = [f"img_{i}.png" for i in range(100)]
    train, test, val = split_data(paths)
    assert len(train) == 70 and len(val) == 10 and len(test) == 20
    # Reference return order is (train, test, val) — utils.py:77.
    assert train[0] == "img_0.png" and val[0] == "img_70.png"
    assert test[0] == "img_80.png"


def test_split_data_bad_ratios():
    with pytest.raises(ValueError):
        split_data(["a"], 0.5, 0.1, 0.1)


def test_registry_covers_all_seven_corpora():
    for name in UNDERWATER_DATASETS + ATMOSPHERIC_DATASETS:
        assert name in DATASET_REGISTRY


def test_dataset_splits_on_fake_layout(tmp_path):
    """Build a miniature HICRD-style tree and check pairing."""
    import cv2

    root = tmp_path / "HICRD"
    for sub in ("Train/trainA_paired", "Train/trainB_paired",
                "Test/testA", "Test/testB", "Val/valA", "Val/valB"):
        (root / sub).mkdir(parents=True)
    img = np.zeros((8, 8, 3), np.uint8)
    for i in range(3):
        for sub in ("Train/trainA_paired", "Train/trainB_paired"):
            cv2.imwrite(str(root / sub / f"{i}.png"), img)
    cv2.imwrite(str(root / "Test/testA/0.png"), img)
    cv2.imwrite(str(root / "Test/testB/0.png"), img)

    splits = dataset_splits("HICRD", str(tmp_path))
    assert len(splits["train"][0]) == 3 and len(splits["train"][1]) == 3
    assert len(splits["test"][0]) == 1
    assert len(splits["val"][0]) == 0

    ds = PairedImageDataset("HICRD", "train", str(tmp_path), image_size=16)
    item = ds[0]
    assert item["input"].shape == (16, 16, 3)
    assert item["input"].dtype == np.uint8


def test_unknown_dataset_raises():
    with pytest.raises(ValueError, match="Unknown dataset"):
        dataset_splits("NOPE", "/tmp")


def test_synthetic_dataset_deterministic_and_domained():
    ds = SyntheticPairedDataset(length=4, image_size=32, domain="underwater")
    a, b = ds[0], ds[0]
    np.testing.assert_array_equal(a["input"], b["input"])
    # Underwater degradation: blue mean exceeds red mean.
    assert a["input"][..., 2].mean() > a["input"][..., 0].mean()
    # Degraded differs from clean.
    assert not np.array_equal(a["input"], a["gt"])

    atm = SyntheticPairedDataset(length=2, image_size=32, domain="atmospheric")
    item = atm[0]
    # Low-light degradation: darker than GT.
    assert item["input"].mean() < item["gt"].mean()


def test_make_dataset_factory():
    ds = make_dataset("synthetic-atmospheric", image_size=32, synthetic_length=5)
    assert len(ds) == 5
    with pytest.raises(ValueError):
        make_dataset("BOGUS")


def test_batch_loader_shapes_and_epochs():
    ds = SyntheticPairedDataset(length=10, image_size=32)
    loader = BatchLoader(ds, batch_size=4, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 2  # drop_last
    assert batches[0]["input"].shape == (4, 32, 32, 3)
    assert batches[0]["input"].dtype == np.uint8
    assert len(batches[0]["name"]) == 4

    # set_epoch reshuffles deterministically.
    loader.set_epoch(0)
    names0 = [n for b in loader for n in b["name"]]
    loader.set_epoch(0)
    assert names0 == [n for b in loader for n in b["name"]]
    loader.set_epoch(1)
    assert names0 != [n for b in loader for n in b["name"]]


def test_shard_for_host():
    idx = np.arange(100)
    s0 = shard_for_host(idx, 0, 4)
    s3 = shard_for_host(idx, 3, 4)
    assert len(s0) == len(s3) == 25
    assert s0[0] == 0 and s3[0] == 75
    # Fewer examples than hosts: raise instead of silently duplicating the
    # full index set on every host.
    with pytest.raises(ValueError):
        shard_for_host(np.arange(3), 0, 4)


def test_interleave_round_robin():
    u = BatchLoader(SyntheticPairedDataset(8, 16, "underwater"), 4,
                    shuffle=False)
    a = BatchLoader(SyntheticPairedDataset(4, 16, "atmospheric"), 4,
                    shuffle=False)
    kinds = ["u" if "underwater" in b["name"][0] else "a"
             for b in interleave(u, a)]
    assert kinds == ["u", "a", "u"]


def test_plot_batch_grid(tmp_path):
    from hybrid_diffusion_tpu.data.visualize import plot_batch_grid

    loader = BatchLoader(SyntheticPairedDataset(6, 16, "underwater"), 6,
                         shuffle=False)
    out = plot_batch_grid(loader, num_images=6,
                          out_path=str(tmp_path / "preview.png"))
    assert out is not None and (tmp_path / "preview.png").stat().st_size > 0


def test_paired_dataset_fused_batch_matches_per_item(tmp_path):
    """get_batch (one native decode+resize call) == per-item __getitem__,
    and BatchLoader transparently uses it."""
    import cv2

    from hybrid_diffusion_tpu.data.native import decode_supported
    from hybrid_diffusion_tpu.data.pipeline import BatchLoader

    if not decode_supported():
        pytest.skip("native decode not built")
    root = tmp_path / "HICRD"
    for sub in ("Train/trainA_paired", "Train/trainB_paired"):
        (root / sub).mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(4):
        for sub in ("Train/trainA_paired", "Train/trainB_paired"):
            cv2.imwrite(str(root / sub / f"{i}.png"),
                        rng.randint(0, 255, (20, 30, 3), np.uint8))

    ds = PairedImageDataset("HICRD", "train", str(tmp_path), image_size=16)
    fused = ds.get_batch([0, 2, 3])
    assert fused is not None
    for j, idx in enumerate([0, 2, 3]):
        item = ds[idx]
        np.testing.assert_array_equal(fused["input"][j], item["input"])
        np.testing.assert_array_equal(fused["gt"][j], item["gt"])
        assert fused["name"][j] == item["name"]

    batch = next(iter(BatchLoader(ds, 4, shuffle=False, drop_last=False)))
    assert batch["input"].shape == (4, 16, 16, 3)
    assert batch["gt"].dtype == np.uint8


def test_device_batch_loader_matches_host_loader():
    """DeviceBatchLoader must yield bit-identical batch composition to
    BatchLoader for the same (seed, epoch): same RandomState shuffle over
    the same index space, same drop_last rounding."""
    from hybrid_diffusion_tpu.data.pipeline import DeviceBatchLoader

    ds = SyntheticPairedDataset(length=10, image_size=16, seed=3)
    host = BatchLoader(ds, 4, shuffle=True, seed=7, drop_last=True)
    dev = DeviceBatchLoader(ds, 4, shuffle=True, seed=7, drop_last=True)
    assert len(host) == len(dev) == 2
    for epoch in (0, 1, 5):
        host.set_epoch(epoch)
        dev.set_epoch(epoch)
        for hb, db in zip(host, dev):
            np.testing.assert_array_equal(hb["input"], np.asarray(db["input"]))
            np.testing.assert_array_equal(hb["gt"], np.asarray(db["gt"]))
            assert hb["name"] == db["name"]


def test_device_batch_loader_sharded_gather():
    """With a batch sharding, gathered batches land on the mesh data axis
    directly (no host round-trip) and still match the host loader."""
    import jax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from hybrid_diffusion_tpu.data.pipeline import DeviceBatchLoader

    devs = np.array(jax.devices()[:8]).reshape(8)
    mesh = Mesh(devs, ("data",))
    sharding = NamedSharding(mesh, PartitionSpec("data"))
    ds = SyntheticPairedDataset(length=16, image_size=8, seed=1)
    host = BatchLoader(ds, 8, shuffle=True, seed=0, drop_last=True)
    dev = DeviceBatchLoader(ds, 8, shuffle=True, seed=0, drop_last=True,
                            sharding=sharding)
    host.set_epoch(2)
    dev.set_epoch(2)
    for hb, db in zip(host, dev):
        assert db["input"].sharding.is_equivalent_to(sharding, ndim=4)
        np.testing.assert_array_equal(hb["input"], np.asarray(db["input"]))
