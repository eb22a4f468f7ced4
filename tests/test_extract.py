"""Geometry extraction: voxel-boundary iso-surface meshing + PLY IO.

The reference renders images only; geometry export is a
framework-completeness feature (extract.py). The analytic oracle is a
sphere: every extracted vertex must sit within one cell of the radius."""

import numpy as np
import pytest

from nerf_rs_tpu.extract import extract_voxel_mesh, load_ply, save_ply


def _sphere_sigma(r=32, radius=0.8, lo=-2.0, hi=2.0, inside=50.0):
    c = lo + (np.arange(r) + 0.5) * ((hi - lo) / r)
    gx, gy, gz = np.meshgrid(c, c, c, indexing="ij")
    d = np.sqrt(gx**2 + gy**2 + gz**2)
    # Smooth falloff so iso-crossing interpolation has a gradient to use.
    return (inside * np.clip(1.0 - (d - radius) / 0.2, 0.0, 1.0)).astype(np.float32)


def test_sphere_surface_within_one_cell():
    r, radius = 32, 0.8
    sigma = _sphere_sigma(r=r, radius=radius)
    verts, faces = extract_voxel_mesh(sigma, iso=25.0, aabb=(-2.0, 2.0))
    assert len(faces) > 100 and len(verts) > 100
    cell = 4.0 / r
    rad = np.linalg.norm(verts, axis=1)
    # iso=25 sits half-way down the 0.2-wide falloff: surface at radius+0.1
    assert np.all(np.abs(rad - (radius + 0.1)) < 2 * cell), (
        rad.min(), rad.max())
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_outward_orientation_and_closedness():
    """For a convex body, every face normal must point away from the
    center, and the mesh must be closed (zero net signed area vector)."""
    sigma = _sphere_sigma()
    verts, faces = extract_voxel_mesh(sigma, iso=25.0)
    tri = verts[faces]                                  # (F, 3, 3)
    n = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    centers = tri.mean(axis=1)
    outward = np.einsum("fi,fi->f", n, centers)
    assert np.all(outward > 0), f"{(outward <= 0).sum()} inward faces"
    # closed surface: area vectors cancel
    assert np.abs(n.sum(axis=0)).max() < 1e-3 * np.abs(n).sum(axis=0).max()


def test_empty_and_full_lattices():
    empty = np.zeros((8, 8, 8), np.float32)
    v, f = extract_voxel_mesh(empty, iso=1.0)
    assert len(v) == 0 and len(f) == 0
    # a fully-occupied lattice has no INTERIOR crossings (boundary faces at
    # the lattice edge are not emitted — the AABB clips the field)
    full = np.full((8, 8, 8), 9.0, np.float32)
    v, f = extract_voxel_mesh(full, iso=1.0)
    assert len(f) == 0


def test_ply_roundtrip(tmp_path):
    sigma = _sphere_sigma(r=16)
    verts, faces = extract_voxel_mesh(sigma, iso=25.0)
    p = tmp_path / "m.ply"
    save_ply(p, verts, faces)
    v2, f2 = load_ply(p)
    assert v2.shape == verts.shape and f2.shape == faces.shape
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)


def test_cli_extract_lego(tmp_path, assets_dir):
    """End-to-end: extract the pretrained lego's surface at low res and
    check the mesh is plausibly lego-sized."""
    from nerf_rs_tpu.cli import main

    out = tmp_path / "lego.ply"
    rc = main(["extract", "-o", str(out), "--resolution", "24",
               "--extent", "1.5", "--iso", "10"])
    assert rc == 0 and out.exists()
    verts, faces = load_ply(out)
    assert len(faces) > 50
    assert np.all(np.abs(verts) <= 1.5 + 1e-5)


def test_colored_ply_and_vertex_normals(tmp_path):
    """Vertex normals on the sphere point radially outward; colored PLY
    writes uchar r/g/b and load_ply still parses positions."""
    from nerf_rs_tpu.extract import save_ply, vertex_normals

    sigma = _sphere_sigma(r=32)
    verts, faces = extract_voxel_mesh(sigma, iso=25.0)
    n = vertex_normals(verts, faces)
    rad = verts / np.maximum(np.linalg.norm(verts, axis=1, keepdims=True), 1e-9)
    cos = np.einsum("vi,vi->v", n, rad)
    # Voxel staircasing caps per-vertex alignment; outwardness must still
    # dominate strongly in aggregate and nothing may point inward much.
    assert np.mean(cos) > 0.6, float(np.mean(cos))
    assert np.mean(cos > 0.0) > 0.99, "normals must not point inward"

    colors = np.tile(np.asarray([[1.0, 0.5, 0.0]]), (len(verts), 1))
    p = tmp_path / "c.ply"
    save_ply(p, verts, faces, colors=colors)
    head = p.read_text().splitlines()
    assert "property uchar red" in head[:12]
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-5)
    np.testing.assert_array_equal(f2, faces)
    first = head[head.index("end_header") + 1].split()
    assert first[3:6] == ["255", "128", "0"]
