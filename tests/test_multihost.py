"""Two-process jax.distributed integration test (SURVEY §2.4 DCN axis).

Spawns TWO real OS processes, each with 4 virtual CPU devices, that run the
actual train CLI with ``--multihost --mesh auto``: jax.distributed over a
localhost coordinator, an 8-device global mesh spanning both processes,
gloo collectives for the cross-process reductions, process-0-only output,
and the allgathered save path. The saved point cloud must match a
single-process run over the same 8 devices (same seed, same camera order)
— the collectives only reassociate floating-point sums.

Ref: the reference is single-GPU (utils/general_utils.py:133 pins cuda:0);
this axis is new TPU-native capability, so the oracle is our own
single-process mesh, not reference behavior.
"""
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_data import make_colmap_dataset

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _train_args(root, model, mesh):
    return ["-s", root, "-m", model,
            "--iterations", "8",
            "--test_iterations", "-1",
            "--save_iterations", "8",
            # no densification: keeps each process at ONE train-step compile
            "--densify_from_iter", "100",
            "--initial_capacity", "256",
            "--dup_capacity", "4096", "--max_per_tile", "64",
            "--chunk", "32", "--disable_viewer", "--quiet",
            "--seed", "7", "--mesh", mesh]


@pytest.mark.slow
def test_two_process_multihost_matches_single_process(tmp_path):
    rng = np.random.default_rng(11)
    root = str(tmp_path / "dataset")
    make_colmap_dataset(root, rng, n_images=4, width=64, height=48)

    # ---- two real processes, 4 local devices each, one global mesh --------
    model_mh = str(tmp_path / "model_mh")
    port = _free_port()
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=4",
               GS_TPU_COORD=f"localhost:{port}",
               GS_TPU_NPROCS="2",
               GS_TPU_COMPILE_CACHE="0")
    logs = [str(tmp_path / f"proc{i}.log") for i in range(2)]
    procs = []
    for i in range(2):
        with open(logs[i], "w") as lf:
            procs.append(subprocess.Popen(
                [sys.executable,
                 os.path.join(REPO, "tests", "multihost_runner.py"),
                 str(i)] + _train_args(root, model_mh, "auto")
                + ["--multihost"],
                env=env, cwd=REPO, stdout=lf, stderr=subprocess.STDOUT))
    rcs = [p.wait(timeout=1500) for p in procs]
    outs = [open(p).read() for p in logs]
    for i, rc in enumerate(rcs):
        assert rc == 0, f"proc {i} failed:\n{outs[i][-4000:]}"
    assert "Sharding gaussians over 8 devices (2 host(s))" in outs[0], \
        outs[0][-2000:]

    ply_mh = os.path.join(model_mh, "point_cloud", "iteration_8",
                          "point_cloud.ply")
    assert os.path.exists(ply_mh), outs[0][-2000:]
    # worker wrote its scratch dir but NOT the model artifacts
    assert not os.path.exists(os.path.join(
        model_mh + "_w1", "point_cloud")), "worker must not save"

    # ---- single-process oracle over the same 8 (in-process) devices -------
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU conftest")
    from gs_tpu.apps.train import main as train_main
    model_sp = str(tmp_path / "model_sp")
    train_main(_train_args(root, model_sp, "8"))
    ply_sp = os.path.join(model_sp, "point_cloud", "iteration_8",
                          "point_cloud.ply")

    from gs_tpu.data.ply import read_ply
    a, b = read_ply(ply_mh), read_ply(ply_sp)
    assert sorted(a) == sorted(b)
    for k in a:
        va, vb = np.asarray(a[k]), np.asarray(b[k])
        assert va.shape == vb.shape, k
        scale = max(1.0, float(np.max(np.abs(vb))))
        assert np.max(np.abs(va - vb)) <= 5e-5 * scale, \
            f"{k}: max diff {np.max(np.abs(va - vb))}"
