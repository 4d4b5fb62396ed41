"""Public OO API parity tests: Mesh validation (`Mesh.cpp:30-54`), Scene
add/remove (`Scene.cpp:37-56`), RenderTarget lock state machine
(`RenderTarget.cpp:53-83`), Camera->Scene march validation (`Scene.cpp:81-97`)."""

import numpy as np

from raytracercuda_tpu import (
    Camera,
    ERROR_ALL_FINE,
    ERROR_INVALID_PARAMETER,
    ERROR_LOCK_FIRST,
    ERROR_NO_RENDER_TARGET,
    ERROR_RT_CAM_MISMATCH,
    ERROR_UNLOCK_FIRST,
    Mesh,
    RenderConfig,
    RenderTarget,
    Scene,
    AccelKind,
    VERTEX_DATA_EXTRA4,
    VERTEX_DATA_NORMAL,
    VERTEX_DATA_POSITION,
)


def tri_mesh():
    m = Mesh.create()
    verts = np.array([[-1, -1, 2], [1, -1, 2], [0, 1, 2]], np.float32)
    normals = np.tile([[0, 0, -1]], (3, 1)).astype(np.float32)
    assert m.set_indices(np.array([0, 1, 2], np.uint32), 3) == ERROR_ALL_FINE
    assert m.set_vertex_data(verts, 3, 3, VERTEX_DATA_POSITION) == ERROR_ALL_FINE
    assert m.set_vertex_data(normals, 3, 3, VERTEX_DATA_NORMAL) == ERROR_ALL_FINE
    return m


def test_mesh_validation_matches_reference():
    m = Mesh.create()
    verts = np.zeros((4, 3), np.float32)
    # slot out of range
    assert m.set_vertex_data(verts, 4, 3, 10) == ERROR_INVALID_PARAMETER
    # too many components
    assert m.set_vertex_data(np.zeros((4, 5), np.float32), 4, 5, 1) == ERROR_INVALID_PARAMETER
    # position must be 3 components
    assert m.set_vertex_data(np.zeros((4, 2), np.float32), 4, 2, VERTEX_DATA_POSITION) == ERROR_INVALID_PARAMETER
    # zero vertices
    assert m.set_vertex_data(verts, 0, 3, VERTEX_DATA_POSITION) == ERROR_INVALID_PARAMETER
    # ok
    assert m.set_vertex_data(verts, 4, 3, VERTEX_DATA_POSITION) == ERROR_ALL_FINE
    # inconsistent vertex count across slots
    assert m.set_vertex_data(np.zeros((5, 4), np.float32), 5, 4, VERTEX_DATA_EXTRA4) == ERROR_INVALID_PARAMETER
    # indices must be divisible by 3
    assert m.set_indices(np.arange(4, dtype=np.uint32), 4) == ERROR_INVALID_PARAMETER
    assert m.set_indices(np.arange(3, dtype=np.uint32), 3) == ERROR_ALL_FINE


def test_scene_add_remove():
    s = Scene.create()
    a, b = tri_mesh(), tri_mesh()
    s.add_mesh(a)
    s.add_mesh(b)
    assert len(s.meshes) == 2
    s.remove_mesh(a)
    assert len(s.meshes) == 1 and s.meshes[0] is b


def test_scene_flattening_multi_mesh():
    s = Scene.create(RenderConfig(accel=AccelKind.BRUTE))
    s.add_mesh(tri_mesh())
    s.add_mesh(tri_mesh())
    d = s.data()
    assert d.positions.shape == (6, 3)
    assert d.faces.shape == (2, 4)
    # Second mesh's face indices are rebased by the first mesh's 3 verts.
    f = np.asarray(d.faces)
    assert f[1, :3].min() >= 3
    assert f[0, 3] == 0 and f[1, 3] == 1  # mesh ids


def test_render_target_lock_state_machine():
    rt = RenderTarget.create(8, 8)
    assert RenderTarget.get() is None
    assert rt.lock() == ERROR_ALL_FINE
    assert RenderTarget.get() is rt
    assert rt.lock() == ERROR_UNLOCK_FIRST
    assert rt.unlock() == ERROR_ALL_FINE
    assert rt.unlock() == ERROR_LOCK_FIRST
    assert RenderTarget.get() is None


def test_march_validation_codes():
    s = Scene.create(RenderConfig(accel=AccelKind.BRUTE))
    s.add_mesh(tri_mesh())
    cam = Camera.create()
    assert cam.set_initial_rays(8, 8) == ERROR_ALL_FINE
    # No render target.
    assert cam.trace_scene(np.zeros(3), np.eye(3), s, None) == ERROR_NO_RENDER_TARGET
    # Dim mismatch (`Scene.cpp:91-94`).
    rt_bad = RenderTarget.create(16, 8)
    assert cam.trace_scene(np.zeros(3), np.eye(3), s, rt_bad) == ERROR_RT_CAM_MISMATCH
    # Happy path renders into the target.
    rt = RenderTarget.create(8, 8)
    assert cam.trace_scene(np.zeros(3), np.eye(3), s, rt) == ERROR_ALL_FINE
    img = np.asarray(rt.image())
    assert img.shape == (8, 8)
    assert (img != 0).any()


def test_camera_clear():
    cam = Camera.create()
    rt = RenderTarget.create(4, 4)
    assert cam.clear(None, 5) == ERROR_NO_RENDER_TARGET
    assert cam.clear(rt, 0x123456) == ERROR_ALL_FINE
    assert (np.asarray(rt.buffer) == 0x123456).all()
