"""Morton + octant algebra tests.

Mirrors the reference suites `se_core/test/utils/morton_unittest.cpp` and
`se_core/test/octree/octree_unittest.cpp` (randomized encode/decode
round-trips, parent/child/sibling/descendant identities).
"""

import numpy as np
import jax.numpy as jnp

from supereight_tpu.core import morton


def test_expand_compact_roundtrip():
    v = jnp.arange(1024, dtype=jnp.uint32)
    assert (morton.compact_bits(morton.expand_bits(v)) == v).all()


def test_morton_roundtrip_random():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 1024, size=(1000, 3)).astype(np.uint32)
    code = morton.encode_morton(xyz[:, 0], xyz[:, 1], xyz[:, 2])
    x, y, z = morton.decode_morton(code)
    np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
    np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
    np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])


def test_morton_ordering_locality():
    # Morton code of (1,0,0) has x in lowest interleave position.
    assert int(morton.encode_morton(1, 0, 0)) == 1
    assert int(morton.encode_morton(0, 1, 0)) == 2
    assert int(morton.encode_morton(0, 0, 1)) == 4


def test_key_encode_decode():
    max_depth = 8  # size 256
    x, y, z = 133, 77, 250
    for level in [1, 3, 5, 8]:
        k = morton.key_encode(x, y, z, level, max_depth)
        dx, dy, dz = morton.key_decode(k)
        side = 1 << (max_depth - level)
        assert int(dx) == (x // side) * side
        assert int(dy) == (y // side) * side
        assert int(dz) == (z // side) * side
        assert int(morton.key_level(k)) == level


def test_parent_child_identity():
    rng = np.random.default_rng(1)
    max_depth = 8
    xyz = rng.integers(0, 256, size=(200, 3)).astype(np.uint32)
    for level in [2, 4, 8]:
        k = morton.key_encode(xyz[:, 0], xyz[:, 1], xyz[:, 2], level, max_depth)
        p = morton.key_parent(k, max_depth)
        assert (morton.key_level(p) == level - 1).all()
        # parent's octant contains the child's origin
        px, py, pz = morton.key_decode(p)
        cx, cy, cz = morton.key_decode(k)
        side = 1 << (max_depth - level + 1)
        assert (np.asarray(cx) // side * side == np.asarray(px)).all()
        assert bool(morton.key_is_descendant(k, p, max_depth).all())


def test_child_id_matches_coordinates():
    max_depth = 8
    # octant at level 4 has side 16; child id bits from coords bit 4
    k = morton.key_encode(16, 32, 48, 4, max_depth)
    cid = int(morton.key_child_id(k, max_depth))
    assert cid == ((16 >> 4) & 1) | (((32 >> 4) & 1) << 1) | (((48 >> 4) & 1) << 2)


def test_siblings():
    max_depth = 8
    k = morton.key_encode(64, 64, 64, 3, max_depth)
    sibs = morton.key_siblings(k, max_depth)
    assert sibs.shape[-1] == 8
    assert len(np.unique(np.asarray(sibs))) == 8
    assert int(k) in np.asarray(sibs).tolist()
    p = morton.key_parent(k, max_depth)
    assert bool(morton.key_is_descendant(sibs, jnp.broadcast_to(p, sibs.shape),
                                         max_depth).all())


def test_far_corner_and_face_neighbour():
    max_depth = 8
    k = morton.key_encode(80, 16, 96, 4, max_depth)  # side 16
    fx, fy, fz = morton.key_far_corner(k, max_depth)
    cid = int(morton.key_child_id(k, max_depth))
    assert int(fx) == 80 + (cid & 1) * 16
    nx, ny, nz = morton.key_face_neighbour(k, 1, max_depth)  # +x
    assert (int(nx), int(ny), int(nz)) == (96, 16, 96)
    nx, ny, nz = morton.key_face_neighbour(k, 2, max_depth)  # -y
    assert (int(nx), int(ny), int(nz)) == (80, 0, 96)


def test_key_capacity_guard():
    """Octant keys widen to uint64 (19 bits/axis) past 512^3, mirroring the
    reference's 64-bit keys (`octree_defines.h:38-44`); beyond 19 bits/axis
    they must fail loudly instead of silently truncating."""
    import pytest
    x = jnp.asarray([5])
    assert morton.key_encode(x, x, x, 3, 9).dtype == jnp.uint32
    assert morton.key_encode(x, x, x, 3, 10).dtype == jnp.uint64
    with pytest.raises(ValueError):
        morton.key_encode(x, x, x, 3, 20)


def test_key64_roundtrip_upper_half():
    """The uint32 packing loses morton bits 27-29 (level 5 bits push them
    out of the word): coordinates >= 512 at max_depth 10 came back as 0
    before the uint64 widening.  Exercise the full 2048^3 coordinate range."""
    rng = np.random.default_rng(3)
    for max_depth in (10, 11):
        side = 1 << max_depth
        xyz = rng.integers(0, side, size=(500, 3)).astype(np.uint32)
        for level in [1, max_depth // 2, max_depth]:
            k = morton.key_encode(xyz[:, 0], xyz[:, 1], xyz[:, 2],
                                  level, max_depth)
            assert k.dtype == jnp.uint64
            dx, dy, dz = morton.key_decode(k)
            oct_side = 1 << (max_depth - level)
            np.testing.assert_array_equal(
                np.asarray(dx), xyz[:, 0] // oct_side * oct_side)
            np.testing.assert_array_equal(
                np.asarray(dy), xyz[:, 1] // oct_side * oct_side)
            np.testing.assert_array_equal(
                np.asarray(dz), xyz[:, 2] // oct_side * oct_side)
            assert (np.asarray(morton.key_level(k)) == level).all()


def test_key64_algebra():
    max_depth = 11  # 2048^3
    rng = np.random.default_rng(4)
    xyz = rng.integers(0, 2048, size=(200, 3)).astype(np.uint32)
    for level in [3, 7, 11]:
        k = morton.key_encode(xyz[:, 0], xyz[:, 1], xyz[:, 2],
                              level, max_depth)
        p = morton.key_parent(k, max_depth)
        assert p.dtype == jnp.uint64
        assert (np.asarray(morton.key_level(p)) == level - 1).all()
        assert bool(morton.key_is_descendant(k, p, max_depth).all())
        px, _, _ = morton.key_decode(p)
        cx, _, _ = morton.key_decode(k)
        side = 1 << (max_depth - level + 1)
        assert (np.asarray(cx) // side * side == np.asarray(px)).all()
        # child id reconstructs from coordinates
        cid = np.asarray(morton.key_child_id(k, max_depth))
        oct_side = 1 << (max_depth - level)
        want = (((xyz[:, 0] // oct_side) & 1)
                | (((xyz[:, 1] // oct_side) & 1) << 1)
                | (((xyz[:, 2] // oct_side) & 1) << 2))
        np.testing.assert_array_equal(cid, want)
    # siblings: 8 distinct keys containing the original
    k1 = morton.key_encode(jnp.asarray([1536]), jnp.asarray([640]),
                           jnp.asarray([1984]), 5, max_depth)
    sibs = morton.key_siblings(k1, max_depth)
    assert sibs.dtype == jnp.uint64
    flat = np.asarray(sibs).reshape(-1)
    assert len(np.unique(flat)) == 8
    assert int(k1[0]) in flat.tolist()


def test_key64_far_corner_face_neighbour():
    max_depth = 11
    k = morton.key_encode(jnp.asarray([1040]), jnp.asarray([16]),
                          jnp.asarray([1536]), 7, max_depth)  # side 16
    fx, fy, fz = morton.key_far_corner(k, max_depth)
    cid = int(morton.key_child_id(k, max_depth)[0])
    assert int(fx[0]) == 1040 + (cid & 1) * 16
    nx, ny, nz = morton.key_face_neighbour(k, 1, max_depth)  # +x
    assert (int(nx[0]), int(ny[0]), int(nz[0])) == (1056, 16, 1536)
