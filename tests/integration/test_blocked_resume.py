"""Block-level resume for the blocked pipeline (SURVEY.md §5 "per-temporal-
block checkpointing"; VERDICT r3 item 6): SIGKILL a `stabilize_video_blocked`
run mid-motion-sweep, then re-run — cached motion blocks must be loaded (not
recomputed), the output must be complete, and the resume directory must be
cleaned up on success."""

import json
import os
import subprocess
import sys
import time

import numpy as np
import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "_blocked_worker.py")
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

T, H, W, BLOCK = 60, 48, 64, 8


@pytest.fixture(scope="module")
def src_video(tmp_path_factory):
    cv2 = pytest.importorskip("cv2")  # noqa: F841
    from vstab.eval.synthetic import make_shaky_clip
    from vstab.io.video import write_video

    path = str(tmp_path_factory.mktemp("vid") / "in.mp4")
    frames, _ = make_shaky_clip(t=T, h=H, w=W, seed=7)
    write_video(path, np.asarray(frames), fps=24.0)
    return path


def _spawn(src, dst):
    env = dict(os.environ)
    env["PYTHONPATH"] = _REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen(
        [sys.executable, _WORKER, src, dst, str(BLOCK)],
        env=env,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
    )


def _motion_files(resume_dir):
    if not os.path.isdir(resume_dir):
        return {}
    return {
        f: os.path.getmtime(os.path.join(resume_dir, f))
        for f in os.listdir(resume_dir)
        if f.startswith("motion_") and f.endswith(".npy")
    }


def test_kill_mid_motion_then_resume(tmp_path, src_video):
    dst = str(tmp_path / "out.mp4")
    resume_dir = dst + ".resume"

    p = _spawn(src_video, dst)
    deadline = time.time() + 300
    try:
        while time.time() < deadline:
            if p.poll() is not None:
                break  # finished before the kill — resume asserts still run
            if len(_motion_files(resume_dir)) >= 2:
                break
            time.sleep(0.1)
        p.kill()
    finally:
        p.wait()

    pre = _motion_files(resume_dir)
    finished_first_run = not os.path.isdir(resume_dir)
    if not finished_first_run:
        assert len(pre) >= 1, "no motion blocks checkpointed before the kill"

    # Resume to completion.
    p2 = _spawn(src_video, dst)
    out, _ = p2.communicate(timeout=600)
    assert p2.returncode == 0, out
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["frames"] == T

    if not finished_first_run:
        # Cached blocks were loaded, not recomputed: files untouched...
        post_cached = stats["resume_cached_blocks"]
        assert post_cached >= len(pre)
        # ...and the worker reported loading them (mtime check needs the dir,
        # which is gone on success — rely on the stats counter instead).

    # Success removes the resume dir and the output is complete.
    assert not os.path.isdir(resume_dir)
    from vstab.io.video import read_video

    frames, _ = read_video(dst)
    assert frames.shape[0] == T and np.isfinite(frames).all()


def test_stale_resume_dir_is_wiped(tmp_path, src_video):
    """A resume dir from a different config/shape must be discarded."""
    from vstab.pipeline_blocked import _ResumeState
    from vstab.core.config import Config

    root = str(tmp_path / "x.resume")
    _ResumeState(root, Config(), t=100, b=8).save_motion(0, np.zeros((7, 2)))
    assert _ResumeState(root, Config(), t=100, b=8).load_motion(0) is not None
    # different T -> stale -> wiped
    st = _ResumeState(root, Config(), t=200, b=8)
    assert st.load_motion(0) is None
    # corrupt block file -> treated as missing, not a crash
    st.save_motion(8, np.ones((8, 2)))
    with open(os.path.join(root, "motion_00000008.npy"), "wb") as f:
        f.write(b"torn")
    assert st.load_motion(8) is None


def test_stale_input_or_params_wipes_cache(tmp_path, src_video):
    """ADVICE r4 (medium): cached motion must be keyed to the input video's
    identity, its resolution, AND the flow params — a same-length different
    input or a retrained checkpoint must invalidate, while an identical
    re-run must NOT."""
    import jax.numpy as jnp

    from vstab.core.config import Config
    from vstab.pipeline_blocked import _ResumeState

    root = str(tmp_path / "y.resume")
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros((3,))}
    kw = dict(t=100, b=8, in_path=src_video, hw=(H, W), params=params)
    _ResumeState(root, Config(), **kw).save_motion(0, np.zeros((7, 2)))
    # identical identity -> cache kept
    assert _ResumeState(root, Config(), **kw).load_motion(0) is not None
    # different params -> wiped
    kw2 = dict(kw, params={"w": jnp.full((3, 3), 2.0), "b": jnp.zeros((3,))})
    assert _ResumeState(root, Config(), **kw2).load_motion(0) is None
    # different input file (same length/shape) -> wiped
    _ResumeState(root, Config(), **kw).save_motion(0, np.zeros((7, 2)))
    other = str(tmp_path / "other.mp4")
    import shutil

    shutil.copyfile(src_video, other)
    kw3 = dict(kw, in_path=other)
    assert _ResumeState(root, Config(), **kw3).load_motion(0) is None
    # different resolution -> wiped
    _ResumeState(root, Config(), **kw).save_motion(0, np.zeros((7, 2)))
    kw4 = dict(kw, hw=(H * 2, W * 2))
    assert _ResumeState(root, Config(), **kw4).load_motion(0) is None
