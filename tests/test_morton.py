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
    """Voxel-level keys cap at 10 bits/axis (1024^3): deeper trees must fail
    loudly instead of silently truncating (VERDICT r1; reference widens to
    21 bits/axis via 64-bit keys, `octree_defines.h:38-44`)."""
    import pytest
    x = jnp.asarray([5])
    # 1024^3 (max_depth=10) still works
    k = morton.key_encode(x, x, x, 3, 10)
    assert int(morton.key_level(k)[0]) == 3
    with pytest.raises(ValueError):
        morton.key_encode(x, x, x, 3, 11)   # 2048^3 would truncate
