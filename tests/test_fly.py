"""Scripted-input fly loop (`apps/fly.py`) — the reference TestProgram's
interactive loop (`Program.cpp:196-263`) with a replayable event stream:
key state machine, reference movement constants, per-frame RT rotation
(`Program.cpp:302-311`)."""

import json

import numpy as np
import pytest

import raytracercuda_tpu as rt
from raytracercuda_tpu.apps.fly import (FlyState, MSPEED, SPEED, _load_script,
                                        run_loop)
from raytracercuda_tpu.models.procedural import quad_mesh


def test_flystate_reference_semantics():
    s = FlyState(np.zeros(3))
    s.feed({"event": "keydown", "key": "w"})
    orient = s.update()
    # pan=pitch=0 -> orient = I; w pushes +z by SPEED.
    np.testing.assert_allclose(s.pos, [0, 0, SPEED], atol=1e-6)
    s.feed({"event": "mouse", "xrel": 100, "yrel": -50})
    assert np.isclose(s.pan, 100 * MSPEED)
    assert np.isclose(s.pitch, -50 * MSPEED)
    s.feed({"event": "keyup", "key": "w"})
    s.feed({"event": "keydown", "key": "q"})
    p1 = s.pos[1]
    s.update()
    assert np.isclose(s.pos[1], p1 + SPEED)  # q is world-space +y
    s.feed({"event": "keydown", "key": "escape"})
    assert s.quit


def test_run_loop_rotates_rts_and_moves(tmp_path):
    config = rt.RenderConfig(accel=rt.AccelKind.BRUTE)
    scene = rt.Scene.create(config)
    scene.add_mesh(quad_mesh(z=2.5))
    scene.update_gpu_scene()
    cam = rt.Camera.create()
    assert cam.set_initial_rays(32, 32, -1, 1, -1, 1, 1) == 0
    rts = [rt.RenderTarget.create(32, 32) for _ in range(3)]
    assert rts[0].lock() == 0

    script = tmp_path / "script.jsonl"
    script.write_text("\n".join(json.dumps(e) for e in [
        {"frame": 0, "event": "keydown", "key": "s"},
        {"frame": 2, "event": "keyup", "key": "s"},
        {"frame": 2, "event": "mouse", "xrel": 30, "yrel": 0},
        {"frame": 4, "event": "quit"},
    ]))

    seen = []
    state = FlyState(np.array([0, 0, -1.0], np.float32))
    n = run_loop(scene, cam, rts, state, _load_script(str(script)),
                 max_frames=10, out_dir=None,
                 on_frame=lambda f, s, i, buf: seen.append((f, i, buf.copy())))
    assert n == 4  # quit event at frame 4 stops before rendering it
    # s held for frames 0,1 -> moved -z by 2*SPEED; pan changed at frame 2.
    assert np.isclose(state.pos[2], -1.0 - 2 * SPEED)
    assert state.pan > 0
    # RT rotation: index advances 1,2,0,1 over the 4 frames.
    assert [i for _, i, _ in seen] == [1, 2, 0, 1]
    # Every RT left unlocked.
    assert all(not r.locked for r in rts)
    # The quad is visible in at least one frame (non-background pixels).
    bg = np.uint32(255 << 8)
    assert any((buf != bg).any() for _, _, buf in seen)
