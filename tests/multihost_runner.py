"""Subprocess entry for the two-process multi-host integration test.

Run as ``python tests/multihost_runner.py <procid> <train-cli-args...>`` with
GS_TPU_COORD/GS_TPU_NPROCS set by the parent. Forces the CPU platform BEFORE
any jax computation (the axon sitecustomize otherwise routes to the remote
TPU; the env var alone is not enough) and then drives the real train CLI
with --multihost, which performs the jax.distributed.initialize() itself.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

os.environ["GS_TPU_PROCID"] = sys.argv[1]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gs_tpu.apps.train import main  # noqa: E402

main(sys.argv[2:])
