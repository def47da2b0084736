"""Morphology engine tests (morphology.c parity behaviors)."""

import numpy as np
import pytest
import jax.numpy as jnp

from imagemagick_tpu.ops import morphology as mo


@pytest.fixture
def dot():
    """Single white dot on black."""
    img = np.zeros((15, 15, 1), np.float32)
    img[7, 7] = 1.0
    return jnp.asarray(img)


def test_dilate_grows_square(dot):
    out = np.asarray(mo.dilate(dot, mo._square_kernel(1)))
    assert out[6:9, 6:9].min() == 1.0  # 3x3 block
    assert out[5, 7, 0] == 0.0


def test_dilate_diamond_shape(dot):
    out = np.asarray(mo.dilate(dot, mo._diamond_kernel(1)))
    assert out[6, 7, 0] == 1.0 and out[7, 6, 0] == 1.0
    assert out[6, 6, 0] == 0.0  # corners excluded by diamond


def test_erode_shrinks(dot):
    grown = mo.dilate(dot, mo._square_kernel(2))
    back = np.asarray(mo.erode(grown, mo._square_kernel(2)))
    assert back[7, 7, 0] == 1.0
    assert np.asarray(back).sum() <= np.asarray(grown).sum()


def test_open_removes_specks(dot):
    # single pixel disappears under open with 3x3
    out = np.asarray(mo.morphology(dot, "open", "square:1"))
    assert out.max() == 0.0


def test_close_fills_holes():
    img = np.ones((15, 15, 1), np.float32)
    img[7, 7] = 0.0  # pinhole
    out = np.asarray(mo.morphology(jnp.asarray(img), "close", "square:1"))
    assert out[7, 7, 0] == 1.0


def test_edge_extracts_boundary():
    img = np.zeros((16, 16, 1), np.float32)
    img[4:12, 4:12] = 1.0
    out = np.asarray(mo.morphology(jnp.asarray(img), "edgein", "square:1"))
    assert out[4, 8, 0] == 1.0   # boundary on
    assert out[8, 8, 0] == 0.0   # interior off


def test_tophat_bottomhat():
    img = np.zeros((16, 16, 1), np.float32)
    img[8, 8] = 1.0
    top = np.asarray(mo.morphology(jnp.asarray(img), "tophat", "square:1"))
    assert top[8, 8, 0] == 1.0  # small bright feature extracted


def test_hit_and_miss_corner():
    img = np.zeros((16, 16, 1), np.float32)
    img[4:12, 4:12] = 1.0
    k = mo._CORNERS
    out = np.asarray(mo.hit_and_miss(jnp.asarray(img), k))
    # the rot-0 Corners kernel (oracle orientation: fg N+E, bg W/SW/S)
    # fires at the square's SW corner; interior stays 0
    assert out[11, 4, 0] == 1.0
    assert out[8, 8, 0] == 0.0
    # the full rotation list finds all four corners (union semantics)
    full = np.asarray(mo.morphology(jnp.asarray(img), "hitandmiss",
                                    "corners"))
    hits = set(map(tuple, np.argwhere(full[..., 0] > 0.5)))
    assert hits == {(4, 4), (4, 11), (11, 4), (11, 11)}, hits


def test_distance_transform():
    img = np.ones((17, 17, 1), np.float32)
    img[8, 8] = 1.0
    img[0, :] = 0.0  # background row at top
    d = np.asarray(mo.distance_transform(jnp.asarray(img), "manhattan",
                                         scale=0.01))
    # distance grows with row index
    assert d[1, 8, 0] < d[8, 8, 0] < d[16, 8, 0] or d[16, 8, 0] == 1.0
    assert d[0, 0, 0] == 0.0


def test_kernel_parsing():
    ks = mo.get_kernel("3x3: 0,1,0 1,-4,1 0,1,0")
    assert ks[0].shape == (3, 3) and ks[0][1, 1] == -4
    disk = mo.get_kernel("disk:2")[0]
    assert disk.shape == (5, 5) and disk[2, 2] == 1.0 and disk[0, 0] == 0.0
    rot = mo.get_kernel("edges>")
    assert len(rot) > 1  # rotation expansion
    with pytest.raises(ValueError):
        mo.get_kernel("nonsensekernel")


def test_convolve_vs_correlate(dot):
    k = np.zeros((3, 3), np.float32)
    k[0, 0] = 1.0  # asymmetric kernel
    conv = np.asarray(mo.convolve_kernel(dot, k))
    corr = np.asarray(mo.correlate_kernel(dot, k))
    # convolution reflects the kernel; the dot moves opposite directions
    assert conv[6, 6, 0] == 1.0
    assert corr[8, 8, 0] == 1.0


def test_until_converged_thinning_long_snake():
    """-morphology Thinning:-1 converges on a long snake (VERDICT r2 #4:
    true lax.while_loop convergence, not a static 32-pass unroll —
    morphology.c:4129 bounds by convergence)."""
    # a 1-pixel-wide serpentine path >= 300 px long inside 48x48: thinning
    # a thin curve must leave it unchanged == converged fixed point
    img = np.zeros((48, 48, 1), np.float32)
    for r in range(2, 46, 4):
        img[r, 2:46] = 1.0                       # horizontal runs
        if (r - 2) // 4 % 2 == 0:
            img[r:r + 5, 45] = 1.0               # right connector
        else:
            img[r:r + 5, 2] = 1.0                # left connector
    out = np.asarray(mo.morphology(jnp.asarray(img), "thinning", "skeleton",
                                   iterations=-1))
    # converged: one more round changes nothing
    again = np.asarray(mo.morphology(jnp.asarray(out), "thinning",
                                     "skeleton", iterations=1))
    np.testing.assert_array_equal(out, again)
    # the path survives (thinning never disconnects a 1-px curve)
    assert out.sum() > 100


def test_until_converged_beats_static32():
    """A blob whose erosion needs >32 rounds: the while_loop converges to
    the true fixed point (empty), where a static 32-unroll would stop
    early."""
    img = np.zeros((96, 96, 1), np.float32)
    img[4:92, 4:92] = 1.0                        # 88x88 solid block
    out = np.asarray(mo.morphology(jnp.asarray(img), "erode", "square:1",
                                   iterations=-1))
    # erosion until convergence of a finite blob with background present
    # ends empty (44 rounds needed > 32)
    assert out.sum() == 0.0
