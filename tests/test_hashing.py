"""Content-hash digest: sensitivity, edge sizes, collision classes."""
import numpy as np

from multimesh_tpu.hashing import content_hash, content_fingerprint


def test_small_and_empty_arrays():
    # sub-word and empty inputs must hash, not crash (degenerate meshes,
    # empty parameter arrays reach the fingerprint through caches)
    assert content_hash(np.array([], np.float64))
    assert content_hash(np.array([1], np.uint8))
    assert content_hash(np.array([1, 2, 3], np.uint8))
    assert content_hash(np.zeros(1, np.float32))
    assert content_hash(np.array([], np.uint8)) != content_hash(
        np.array([0], np.uint8)
    )


def test_single_value_sensitivity():
    rng = np.random.default_rng(0)
    a = rng.random((500, 13))
    h0 = content_hash(a)
    assert content_hash(a.copy()) == h0  # deterministic
    for pos in [(0, 0), (250, 7), (499, 12)]:
        b = a.copy()
        b[pos] += 1e-12
        assert content_hash(b) != h0


def test_rectangle_corner_collision_class():
    """+d,-d,-d,+d at rectangle corners of the [R, 4096] uint32 view
    preserves every row and column sum; the weighted reductions must
    still move (the round-2 advisor's collision class)."""
    a = np.zeros(4096 * 8, np.uint32).reshape(8, 4096)
    b = a.copy()
    d = 7
    r1, r2, c1, c2 = 1, 5, 3, 907
    with np.errstate(over="ignore"):  # uint32 wraparound is the point
        b[r1, c1] += d
        b[r1, c2] -= d
        b[r2, c1] -= d
        b[r2, c2] += d
    assert content_hash(a) != content_hash(b)


def test_row_swap_sensitivity():
    a = np.arange(4096 * 4, dtype=np.uint32).reshape(4, 4096)
    b = a[[1, 0, 2, 3]].copy()
    assert content_hash(a) != content_hash(b)


def test_sampled_blake2b_layer_guards_weighted_sums():
    """Layer 2 (blake2b over every 64th 4 KB page) must make the digest
    depend on sampled-page bytes through a cryptographic path: two
    arrays whose uint32 views are chosen to agree in all four weighted
    reductions of a hypothetical weaker layer still differ because the
    sampled pages differ.  We can't construct a true layer-1 collision
    (that's the point of layer 1), so this asserts the structural
    property instead: edits confined to sampled pages (page 0, page 64)
    and to unsampled pages (page 1) all move the digest, for an array
    large enough that the stride actually skips pages."""
    n_pages = 130  # > 2*64 so pages 0 and 64 are sampled, 1..63 are not
    a = np.zeros(n_pages * 4096, np.uint8)
    h0 = content_hash(a)
    for page in (0, 1, 64, 129):
        b = a.copy()
        b[page * 4096 + 17] = 1
        assert content_hash(b) != h0, f"page {page} edit missed"


def test_fingerprint_shape_dtype():
    a = np.arange(24, dtype=np.float64)
    assert content_fingerprint(a) != content_fingerprint(a.reshape(4, 6))
    assert content_fingerprint(a) != content_fingerprint(
        a.astype(np.float32)
    )
    assert content_fingerprint(a, a) != content_fingerprint(a)
