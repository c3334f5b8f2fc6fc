"""Data pipeline tests: triplet indexing, synchronized augs, loader."""


import numpy as np
import pytest
from PIL import Image

from vfi_tpu.data import AugmentConfig, DataLoader, TripletDataset, augment_triplet
from vfi_tpu.data.augment import apply_jitter, rotate_nearest, sample_jitter_params


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    """Two synthetic scenes, 6 and 4 frames, 40x32 RGB."""
    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(7)
    for scene, n in (("sceneA", 6), ("sceneB", 4)):
        d = root / scene
        d.mkdir()
        for i in range(n):
            img = (rng.uniform(0, 255, (32, 40, 3))).astype(np.uint8)
            Image.fromarray(img).save(d / f"frame{i:02d}.png")
    (root / "notes.txt").write_text("not a scene")
    return str(root)


def test_triplet_index(scene_dir):
    ds = TripletDataset(scene_dir, frame_interval=1, augment=None)
    # sceneA: 6-2 = 4 triplets; sceneB: 4-2 = 2 (reference data_utils.py:33-37)
    assert len(ds) == 6
    f0, ft, f1 = ds.triplets[0]
    assert f0.endswith("frame00.png") and ft.endswith("frame01.png") and f1.endswith("frame02.png")


def test_triplet_index_interval2(scene_dir):
    ds = TripletDataset(scene_dir, frame_interval=2, augment=None)
    # sceneA: 6-4 = 2; sceneB: 4-4 = 0
    assert len(ds) == 2
    f0, ft, f1 = ds.triplets[0]
    assert ft.endswith("frame02.png") and f1.endswith("frame04.png")


def test_get_normalized_item(scene_dir):
    ds = TripletDataset(scene_dir, augment=None, normalize=True)
    frames = ds.get(0, np.random.default_rng(0))
    assert all(f.shape == (32, 40, 3) and f.dtype == np.float32 for f in frames)
    # ImageNet-normalized uint8 data must leave [0,1]
    assert min(f.min() for f in frames) < -0.5


def test_augment_synchronized_geometry(rng):
    base = rng.uniform(0, 1, (40, 48, 3)).astype(np.float32)
    frames = [base.copy(), base.copy(), base.copy()]
    cfg = AugmentConfig(crop_size=(24, 24), color_jitter=False, random_grayscale=0.0)
    out = augment_triplet(frames, np.random.default_rng(3), cfg)
    # identical inputs + shared geometry -> identical outputs
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[1], out[2])
    assert out[0].shape == (24, 24, 3)


def test_augment_independent_jitter_is_default(rng):
    base = rng.uniform(0.2, 0.8, (32, 32, 3)).astype(np.float32)
    cfg = AugmentConfig(crop_size=None, random_rotation=False,
                        horizontal_flip=False, random_grayscale=0.0)
    out = augment_triplet([base.copy()] * 3, np.random.default_rng(5), cfg)
    # reference bug preserved: per-frame jitter draws differ (data_utils.py:72-76)
    assert not np.allclose(out[0], out[1])
    cfg2 = AugmentConfig(crop_size=None, random_rotation=False,
                         horizontal_flip=False, random_grayscale=0.0,
                         consistent_jitter=True)
    out2 = augment_triplet([base.copy()] * 3, np.random.default_rng(5), cfg2)
    np.testing.assert_array_equal(out2[0], out2[1])


def test_rotation_zero_is_identity(rng):
    img = rng.uniform(0, 1, (15, 17, 3)).astype(np.float32)
    np.testing.assert_array_equal(rotate_nearest(img, 0.0), img)


def test_rotation_180_is_flip(rng):
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    out = rotate_nearest(img, 180.0)
    np.testing.assert_allclose(out, img[::-1, ::-1], atol=1e-6)


def test_grayscale_path(rng):
    base = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    cfg = AugmentConfig(crop_size=None, random_rotation=False,
                        horizontal_flip=False, color_jitter=False,
                        random_grayscale=1.0)
    out = augment_triplet([base] * 3, np.random.default_rng(0), cfg)
    np.testing.assert_allclose(out[0][..., 0], out[0][..., 1])
    np.testing.assert_allclose(out[0][..., 1], out[0][..., 2])


def test_jitter_determinism(rng):
    img = rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32)
    cfg = AugmentConfig()
    p1 = sample_jitter_params(np.random.default_rng(42), cfg)
    p2 = sample_jitter_params(np.random.default_rng(42), cfg)
    np.testing.assert_array_equal(apply_jitter(img, p1), apply_jitter(img, p2))


def test_loader_shapes_and_determinism(scene_dir):
    ds = TripletDataset(scene_dir, augment=AugmentConfig(crop_size=(16, 16)))
    loader = DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_threads=2)
    epoch1 = list(loader)
    assert len(epoch1) == 3  # 6 triplets / batch 2
    f0, ft, f1 = epoch1[0]
    assert f0.shape == ft.shape == f1.shape == (2, 16, 16, 3)
    assert f0.dtype == np.float32

    loader2 = DataLoader(ds, batch_size=2, shuffle=True, seed=1, num_threads=4)
    epoch1b = list(loader2)
    for (a, _, _), (b, _, _) in zip(epoch1, epoch1b):
        np.testing.assert_array_equal(a, b)  # thread-count independent

    # second epoch shuffles differently
    epoch2 = list(loader2)
    assert any(not np.array_equal(a[0], b[0]) for a, b in zip(epoch1, epoch2))


def test_loader_drop_last(scene_dir):
    ds = TripletDataset(scene_dir, augment=None)
    keep = DataLoader(ds, batch_size=4, drop_last=False, shuffle=False)
    drop = DataLoader(ds, batch_size=4, drop_last=True, shuffle=False)
    assert len(drop) == 1 and len(keep) == 2
    batches = list(keep)
    assert batches[-1][0].shape[0] == 2  # remainder batch


def test_decoded_cache_evicts_oldest(scene_dir):
    """Regression: over-budget eviction must drop the OLDEST insertion.
    dict.popitem() is LIFO — it pinned the first-loaded images forever and
    evicted each new entry on the very next insert."""
    ds = TripletDataset(scene_dir, frame_interval=1, augment=None)
    paths = sorted({p for t in ds.triplets for p in t})[:3]
    one = ds._load(paths[0]).nbytes
    ds._cache.clear()
    ds._cache_bytes = 0
    ds.cache_decoded_mb = (2.5 * one) / 1e6  # room for exactly two images

    for p in paths:
        ds._load(p)
    assert paths[0] not in ds._cache          # oldest evicted
    assert paths[1] in ds._cache and paths[2] in ds._cache
    assert ds._cache_bytes == 2 * one
