import numpy as np
import pytest

from slowfast_vos_tpu.data import augment
from slowfast_vos_tpu.data.davis import DavisIndex, load_sequence
from slowfast_vos_tpu.data.osvos_dataset import OsvosFirstFrameDataset
from slowfast_vos_tpu.data.synthetic import make_synthetic_davis
from slowfast_vos_tpu.data.windows import train_windows


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis"))
    make_synthetic_davis(root, num_sequences=2, frames=9, hw=(48, 80), num_objects=2)
    return root


@pytest.fixture(scope="module")
def davis2016_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("davis16"))
    make_synthetic_davis(root, num_sequences=1, frames=6, hw=(48, 80), year="2016", subset="val")
    return root


def test_index_and_load(davis_root):
    idx = DavisIndex(davis_root, "train")
    assert len(idx) == 2
    seq = load_sequence(idx.sequences[0], max_gt=4)
    assert seq["images"].shape == (9, 48, 80, 3)
    assert seq["boxes"].shape == (9, 4, 4)
    assert seq["masks"].shape == (9, 4, 48, 80)
    assert seq["gt_valid"].any()
    # boxes are tight around masks
    for f in range(9):
        for g in range(4):
            if seq["gt_valid"][f, g]:
                ys, xs = np.where(seq["masks"][f, g])
                np.testing.assert_array_equal(
                    seq["boxes"][f, g], [xs.min(), ys.min(), xs.max(), ys.max()]
                )


def test_2016_layout(davis2016_root):
    idx = DavisIndex(davis2016_root, "val", year="2016")
    assert len(idx) == 1
    assert len(idx.sequences[0].images) == 6


def test_train_windows_cover_sequence(davis_root):
    idx = DavisIndex(davis_root, "train")
    seq = load_sequence(idx.sequences[0], max_gt=4)
    wins = list(train_windows(seq, fast=3, n_center=2))
    assert len(wins) == 5  # ceil(9/2)
    for w in wins:
        assert w["images"].shape[0] == 4  # 2 + F - 1
        assert w["images"].dtype == np.uint8  # device does /255
    # last window: frame 8 valid, frame 9 padding
    assert wins[-1]["frame_valid"][0]
    assert not wins[-1]["frame_valid"][1]
    # first window: left halo frame is zeroed
    assert not wins[0]["feat_valid"][0]
    assert wins[0]["images"][0].max() == 0.0


def test_flip_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3), np.uint8)
    masks = np.zeros((1, 40, 60), np.uint8)
    masks[0, 10:20, 5:25] = 1
    boxes = np.array([[5.0, 10.0, 24.0, 19.0]])
    f = augment.Flip(flipped=True)
    i2, m2, b2, keep = f.apply(img, masks, boxes)
    i3, m3, b3, _ = f.apply(i2, m2, b2)
    np.testing.assert_array_equal(i3, img)
    np.testing.assert_array_equal(m3, masks)
    np.testing.assert_allclose(b3, boxes)
    assert keep.all()
    # flipped box matches flipped mask extent
    ys, xs = np.where(m2[0])
    assert abs(b2[0, 0] - xs.min()) <= 1 and abs(b2[0, 2] - xs.max()) <= 1


def test_scale_keeps_box_geometry():
    img = np.zeros((40, 60, 3), np.uint8)
    masks = np.zeros((1, 40, 60), np.uint8)
    masks[0, 10:20, 10:30] = 1
    boxes = np.array([[10.0, 10.0, 29.0, 19.0]])
    t = augment.Scale(sx=0.5, sy=0.5)
    _, m2, b2, keep = t.apply(img, masks, boxes)
    assert keep.all()
    ys, xs = np.where(m2[0])
    assert abs(b2[0, 0] - xs.min()) <= 2 and abs(b2[0, 1] - ys.min()) <= 2


def test_scale_drops_offscreen_box():
    img = np.zeros((40, 60, 3), np.uint8)
    boxes = np.array([[50.0, 30.0, 59.0, 39.0]])
    t = augment.Scale(sx=2.0, sy=2.0)  # pushes box far off canvas
    _, _, _, keep = t.apply(img, None, boxes)
    assert not keep.any()


def test_rotate_identity_at_zero():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (40, 60, 3), np.uint8)
    boxes = np.array([[10.0, 10.0, 30.0, 20.0]])
    t = augment.Rotate(angle=0.0)
    i2, _, b2, keep = t.apply(img, None, boxes)
    np.testing.assert_array_equal(i2, img)
    np.testing.assert_allclose(b2, boxes, atol=1e-6)
    assert keep.all()


def test_rotate_90_box():
    img = np.zeros((50, 50, 3), np.uint8)
    boxes = np.array([[20.0, 10.0, 30.0, 40.0]])  # tall box
    t = augment.Rotate(angle=90.0)
    _, _, b2, keep = t.apply(img, None, boxes)
    assert keep.all()
    w2 = b2[0, 2] - b2[0, 0]
    h2 = b2[0, 3] - b2[0, 1]
    assert w2 > h2  # tall becomes wide


def test_osvos_dataset(davis_root):
    idx = DavisIndex(davis_root, "train")
    ds = OsvosFirstFrameDataset(idx.sequences[0], fast_pathway_size=3, items_per_epoch=5, max_gt=4)
    assert len(ds) == 5
    item = ds[0]
    assert item["images"].shape == (3, 48, 80, 3)  # 1 + F - 1
    assert item["boxes"].shape == (1, 4, 4)
    # single object only
    assert item["gt_valid"].sum() <= 1
    # different items get different augmentation draws
    a, b = ds[1], ds[2]
    assert not np.allclose(a["images"], b["images"])


@pytest.fixture()
def identical_frames_root(tmp_path):
    """A sequence whose frames are all the SAME image (one object), so any
    consistently-applied augmentation draw must leave every window frame
    pixel-identical — the window-consistency oracle."""
    from PIL import Image
    from slowfast_vos_tpu.data.davis import save_palette_mask

    root = str(tmp_path / "davis_ident")
    img_dir = f"{root}/JPEGImages/480p/ident"
    msk_dir = f"{root}/Annotations/480p/ident"
    import os
    os.makedirs(img_dir); os.makedirs(msk_dir)
    rng = np.random.default_rng(7)
    frame = rng.integers(0, 255, (48, 80, 3), np.uint8)
    mask = np.zeros((48, 80), np.uint8)
    mask[30:44, 60:76] = 1  # near the corner: big scale draws push it out
    for f in range(5):
        Image.fromarray(frame).save(f"{img_dir}/{f:05d}.jpg", quality=95)
        if f == 0:
            save_palette_mask(mask, f"{msk_dir}/{f:05d}.png")
    os.makedirs(f"{root}/ImageSets/2017", exist_ok=True)
    with open(f"{root}/ImageSets/2017/train.txt", "w") as fh:
        fh.write("ident\n")
    return root


def test_osvos_window_consistency_one_draw(identical_frames_root):
    """Reference contract (`dataset_osvos.py:43-68`): ONE flip/scale/rotate
    draw per item, applied to the target frame AND all neighbors — including
    when the scale-retry loop re-draws (`:59-63`, the accepted draw must be
    what the neighbors replay, not the first rejection). With identical
    source frames, consistency <=> all valid window frames pixel-identical.

    scale=0.9 + an object near the corner makes retries frequent, so this
    exercises the retry-replay path, not just the happy path."""
    idx = DavisIndex(identical_frames_root, "train")
    ds = OsvosFirstFrameDataset(
        idx.sequences[0], fast_pathway_size=5, scale=0.9, items_per_epoch=40, max_gt=2
    )
    saw_nontrivial = 0
    for i in range(40):
        item = ds[i]
        window = item["images"]
        fv = item["feat_valid"]
        assert window.shape[0] == 5
        frames = window[fv]
        for f in frames[1:]:
            np.testing.assert_array_equal(frames[0], f)
        if not np.array_equal(frames[0], frames[0] * 0):
            saw_nontrivial += 1
        # gt stays consistent with its own frame: the mask must be inside the
        # (clipped) box when an object survived
        if item["frame_valid"][0] and item["gt_valid"][0, 0]:
            ys, xs = np.where(item["masks"][0, 0])
            if len(xs):
                x1, y1, x2, y2 = item["boxes"][0, 0]
                assert xs.min() >= np.floor(x1) - 2 and xs.max() <= np.ceil(x2) + 2
                assert ys.min() >= np.floor(y1) - 2 and ys.max() <= np.ceil(y2) + 2
    assert saw_nontrivial == 40


def test_osvos_reflect_pad_order(identical_frames_root):
    """Reflect padding (`dataset_osvos.py:129-135`): for F=5 with neighbors
    n1, n2, the window is [n2', n1', f0', n1', n2'] — the same augmented
    neighbor appears mirrored on both sides."""
    idx = DavisIndex(identical_frames_root, "train")
    # distinct constant frames so identity is detectable structurally
    from PIL import Image
    for f in range(1, 3):
        arr = np.full((48, 80, 3), 40 * (f + 1), np.uint8)
        Image.fromarray(arr).save(
            f"{identical_frames_root}/JPEGImages/480p/ident/{f:05d}.jpg", quality=100
        )
    ds = OsvosFirstFrameDataset(
        idx.sequences[0], fast_pathway_size=5, scale=0.05, items_per_epoch=4, max_gt=2
    )
    item = ds[0]
    w = item["images"]
    assert item["feat_valid"].all()
    np.testing.assert_array_equal(w[0], w[4])  # both are aug(n2)
    np.testing.assert_array_equal(w[1], w[3])  # both are aug(n1)
    assert not np.array_equal(w[0], w[1])
