"""Offline training CLI — TPU equivalent of the reference ``train.py``.

Usage: ``python -m gs_tpu.apps.train -s <dataset> [-m <model_dir>] [...]``

Reproduces the reference entry point's behavior (ref: train.py:43-273):
dataset load, 30k-iteration schedule, densify/prune, periodic test PSNR
reports, PLY saves at --save_iterations, checkpoints at
--checkpoint_iterations, resume via --start_checkpoint, TensorBoard scalars,
and the network-viewer socket (--ip/--port, drained between iterations).
"""
from __future__ import annotations

import os
import sys
import time
import uuid

import numpy as np

from ..config import (ModelConfig, OptimizationConfig, PipelineConfig,
                      RasterConfig, save_config)
from ..data.scene import Scene
from ..train.checkpoint import load_checkpoint, save_checkpoint
from ..train.loop import Trainer
from .args import extract_dataclass, make_parser


def prepare_output_dir(model_cfg: ModelConfig) -> str:
    """ref: train.py:185-205 (prepare_output_and_logger)."""
    path = model_cfg.model_path
    if not path:
        unique = os.getenv("OAR_JOB_ID") or str(uuid.uuid4())
        path = os.path.join("./output/", unique[:10])
    print(f"Output folder: {path}")
    os.makedirs(path, exist_ok=True)
    return path


def main(argv=None):
    parser = make_parser("Training script parameters")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--checkpoint_every", type=int, default=0,
                        help="periodic checkpoint interval (recovery story: "
                             "crash -> --resume restarts from the latest)")
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--resume", action="store_true",
                        help="resume from the newest chkpnt*.pth in the "
                             "model dir, if any")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--block_scan", action="store_true",
                        help="run schedule-aligned blocks of steps per device "
                             "dispatch (default on TPU)")
    parser.add_argument("--no_block_scan", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile", type=str, default="",
                        help="directory for a jax.profiler trace "
                             "(TensorBoard-loadable; XLA op/HBM timeline). "
                             "Tracing starts once training is warm and "
                             "covers --profile_steps iterations")
    parser.add_argument("--profile_steps", type=int, default=50)
    parser.add_argument("--initial_capacity", type=int, default=0,
                        help="starting gaussian capacity (0 = auto; set "
                             "generously to avoid growth re-jits when "
                             "densification is expected to multiply the "
                             "point count)")
    parser.add_argument("--mesh", type=str, default="0",
                        help="shard the gaussian state over devices: 'auto' "
                             "= all visible chips, an integer = that many; "
                             "0/1 = single-chip. Rendering runs the "
                             "shard_map multi-chip path (tiles banded per "
                             "device, gradients reduce-scattered back)")
    parser.add_argument("--multihost", action="store_true",
                        help="call jax.distributed.initialize() first (one "
                             "process per host on a TPU pod slice; "
                             "coordinator discovered from the TPU runtime / "
                             "cluster env). Combine with --mesh auto so the "
                             "mesh spans every host's chips; collectives "
                             "ride ICI within a slice and DCN across. Saves "
                             "and logs happen on process 0 only.")
    args = parser.parse_args(argv)

    # persistent XLA compile cache: warm restarts + the background AOT tier
    # compile both land here, turning minutes of XLA into ~1 s loads
    cache_dir = os.environ.get(
        "GS_TPU_COMPILE_CACHE",
        os.path.expanduser("~/.cache/gs_tpu/jax_cache"))
    if cache_dir and cache_dir != "0":
        import jax
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:
            pass

    if args.multihost:
        # must run before any other jax call; on TPU pods all arguments are
        # autodetected from the runtime (SURVEY §2.4: DCN scale-out axis).
        # GS_TPU_COORD/GS_TPU_NPROCS/GS_TPU_PROCID override for launchers
        # without autodetect (and for the two-process CPU integration test).
        import jax
        coord = os.environ.get("GS_TPU_COORD")
        if coord:
            jax.distributed.initialize(
                coordinator_address=coord,
                num_processes=int(os.environ["GS_TPU_NPROCS"]),
                process_id=int(os.environ["GS_TPU_PROCID"]))
        else:
            jax.distributed.initialize()
        if args.mesh in ("0", "1"):
            args.mesh = "auto"
        # establish the cross-process collective context NOW, while every
        # process sits at the same program point: the transport rendezvous
        # (gloo on CPU) has a ~30 s window, and deferring it to the first
        # real collective — which fires only after minutes of per-process
        # compile skew — makes that window easy to miss under load
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("gs_tpu:init")

    if args.detect_anomaly:
        # ref: train.py:253,269 (torch.autograd.set_detect_anomaly)
        import jax
        jax.config.update("jax_debug_nans", True)

    model_cfg = extract_dataclass(ModelConfig, args)
    if model_cfg.data_device != "tpu":
        print(f"[gs_tpu] note: --data_device {model_cfg.data_device!r} has "
              "no effect here — training data lives in HBM (block-scan) or "
              "host RAM (step mode) regardless; the flag is accepted only "
              "for reference CLI compatibility (ref arguments/__init__.py)")
    opt = extract_dataclass(OptimizationConfig, args)
    pipe = extract_dataclass(PipelineConfig, args)
    raster = extract_dataclass(RasterConfig, args)
    args.save_iterations.append(opt.iterations)

    mesh = None
    if args.mesh not in ("", "0", "1"):
        import jax
        from ..parallel.mesh import make_mesh
        n = len(jax.devices()) if args.mesh == "auto" else int(args.mesh)
        if n > 1:
            mesh = make_mesh(n)
            print(f"Sharding gaussians over {n} devices "
                  f"({jax.process_count()} host(s))")

    import jax as _jax
    is_main = _jax.process_index() == 0

    # workers get distinct scratch dirs: Scene dumps cameras.json/input.ply
    # into model_path on every process, and co-located worker processes (the
    # CPU integration test; single-machine multi-process) must not collide
    model_cfg.model_path = prepare_output_dir(model_cfg) if is_main \
        else ((model_cfg.model_path or "./output/worker")
              + f"_w{_jax.process_index()}")
    if is_main:
        save_config(model_cfg.model_path, model_cfg, pipe, opt)

    tb_writer = None
    if is_main:
        try:
            from torch.utils.tensorboard import SummaryWriter
            tb_writer = SummaryWriter(model_cfg.model_path)
        except Exception:
            print("Tensorboard not available: not logging progress")

    # the Scene camera shuffle uses the python global RNG; every process
    # must agree on the order or sharded multi-host training silently
    # diverges (each host would compute gradients for a different camera)
    import random as _random
    _random.seed(args.seed)

    print(f"Optimizing {model_cfg.model_path}")
    scene = Scene(model_cfg.source_path, model_cfg.model_path,
                  images=model_cfg.images, depths=model_cfg.depths,
                  resolution=model_cfg.resolution,
                  white_background=model_cfg.white_background,
                  eval_split=model_cfg.eval,
                  train_test_exp=model_cfg.train_test_exp)

    start_state, start_iter = None, 0
    ckpt_path = args.start_checkpoint
    if args.resume and not ckpt_path:
        import glob
        import re
        cands = glob.glob(os.path.join(model_cfg.model_path, "chkpnt*.pth"))
        if cands:
            ckpt_path = max(cands, key=lambda p: int(
                re.search(r"chkpnt(\d+)", p).group(1)))
    if ckpt_path:
        start_state, start_iter, slrs = load_checkpoint(ckpt_path)
        print(f"Resumed from {ckpt_path} at iteration {start_iter}")

    trainer = Trainer(
        scene.get_train_cameras(), scene.point_cloud,
        spatial_lr_scale=scene.cameras_extent,
        model_cfg=model_cfg, opt=opt, pipe=pipe, raster=raster,
        test_cams=scene.get_test_cameras(),
        start_state=start_state, start_iteration=start_iter, seed=args.seed,
        initial_capacity=args.initial_capacity or None, mesh=mesh)

    viewer = None
    if _jax.process_count() > 1 and not args.disable_viewer:
        # the viewer would run on process 0 only, and its block-length cap
        # (block_cap below) would make process 0 dispatch different scan
        # shapes than the workers — SPMD divergence. Interactive viewing of
        # a multi-host run goes through saved snapshots instead.
        if is_main:
            print("Viewer disabled under --multihost (SPMD block shapes "
                  "must agree across hosts)")
        args.disable_viewer = True
    if not args.disable_viewer and is_main:
        try:
            from ..viewer.server import ViewerServer
            viewer = ViewerServer(args.ip, args.port, trainer=trainer,
                                  source_path=model_cfg.source_path,
                                  pipe=pipe)
            print(f"GUI server started at {args.ip}:{args.port}")
        except Exception as e:  # port in use etc. — train anyway
            print(f"Viewer server unavailable: {e}")

    save_at = set(args.save_iterations)
    ckpt_at = set(args.checkpoint_iterations)
    t_start = time.perf_counter()
    last_log = [t_start, start_iter]

    # while a viewer client is attached, cap block-scan dispatches to ~1s of
    # iterations so the client gets frames at interactive rates (the
    # reference drains its socket every iteration, train.py:72-86)
    rate = [t_start, start_iter, 8.0]   # [t_prev, i_prev, its_ema]

    def block_cap():
        if viewer is None:
            return None
        if viewer.conn is None:
            viewer.try_connect()
        if viewer.conn is None:
            return None
        return min(64, max(1, int(rate[2])))

    # [start_iteration_or_None, active] — trace a warm window of the run so
    # the capture shows steady-state steps, not the first compile
    prof = [None, False]

    def _profile_tick(i):
        if not args.profile or not is_main:
            return
        if not prof[1] and prof[0] is None and i >= start_iter + 2:
            try:
                _jax.profiler.start_trace(args.profile)
                prof[0], prof[1] = i, True
                print(f"[profile] tracing {args.profile_steps} iterations "
                      f"to {args.profile}")
            except Exception as e:
                print(f"[profile] unavailable: {e}")
                prof[0] = -1
        elif prof[1] and i >= prof[0] + args.profile_steps:
            _jax.profiler.stop_trace()
            prof[1] = False
            print(f"[profile] trace written to {args.profile}")

    def on_step(i, metrics, tr):
        _profile_tick(i)
        if viewer is not None:
            viewer.poll()
            t = time.perf_counter()
            if i > rate[1] and t > rate[0]:
                its = (i - rate[1]) / (t - rate[0])
                rate[2] = 0.5 * rate[2] + 0.5 * its
            rate[0], rate[1] = t, i
        now = time.perf_counter()
        if tb_writer is not None and i % 10 == 0:
            tb_writer.add_scalar("train_loss_patches/total_loss",
                                 float(metrics.loss), i)
            tb_writer.add_scalar("train_loss_patches/l1_loss",
                                 float(metrics.l1), i)
            tb_writer.add_scalar("total_points", int(tr.state.num_alive), i)
            if tr.overflow_exhausted:
                tb_writer.add_scalar("overflow_replay_exhausted",
                                     tr.overflow_exhausted, i)
        if not args.quiet and i % 100 == 0:
            its = (i - last_log[1]) / max(now - last_log[0], 1e-9)
            last_log[0], last_log[1] = now, i
            print(f"[{i}/{opt.iterations}] loss={tr.ema_loss:.5f} "
                  f"pts={int(tr.state.num_alive)} {its:.2f} it/s",
                  flush=True)
        periodic = (args.checkpoint_every > 0 and
                    i % args.checkpoint_every == 0 and i != start_iter)
        if i in save_at or i in ckpt_at or periodic:
            state = tr.state
            if _jax.process_count() > 1:
                # every process participates in the gather (the training loop
                # is SPMD-synchronized, so all hosts reach this iteration);
                # only process 0 touches the filesystem below
                from jax.experimental import multihost_utils
                # tiled=True: the state leaves are GLOBAL arrays sharded over
                # the cross-process mesh; gather them to their full global
                # value (untiled mode only supports fully-addressable inputs)
                state = multihost_utils.process_allgather(state, tiled=True)
        if i in save_at and is_main:
            print(f"\n[ITER {i}] Saving Gaussians")
            scene.save(i, state.params, np.asarray(state.alive),
                       exposure=state.exposure
                       if model_cfg.train_test_exp else None)
        if (i in ckpt_at or periodic) and is_main:
            print(f"\n[ITER {i}] Saving Checkpoint")
            save_checkpoint(os.path.join(model_cfg.model_path, f"chkpnt{i}.pth"),
                            state, i, tr.spatial_lr_scale)

    def on_test(i, report, tr):
        for split, r in report.items():
            if not r:
                continue
            print(f"\n[ITER {i}] Evaluating {split}: L1 {r['l1']:.4f} "
                  f"PSNR {r['psnr']:.2f}")
            if tb_writer is not None:
                tb_writer.add_scalar(f"{split}/loss_viewpoint - l1_loss",
                                     r["l1"], i)
                tb_writer.add_scalar(f"{split}/loss_viewpoint - psnr",
                                     r["psnr"], i)
        if tb_writer is not None:
            # opacity histogram + total points (ref: train.py:239-241)
            import jax
            from gs_tpu.core.gaussians import get_opacity
            op = np.asarray(get_opacity(jax.device_get(tr.state.params)))
            alive = np.asarray(tr.state.alive)
            tb_writer.add_histogram("scene/opacity_histogram",
                                    op[alive], i)
            tb_writer.add_scalar("total_points", int(alive.sum()), i)

    import jax
    block_scan = (args.block_scan or jax.default_backend() == "tpu") \
        and not args.no_block_scan
    boundaries = set(save_at) | set(ckpt_at)
    if args.checkpoint_every > 0:
        boundaries |= set(range(args.checkpoint_every, opt.iterations + 1,
                                args.checkpoint_every))
    elapsed = trainer.train(test_iterations=set(args.test_iterations),
                            on_step=on_step, on_test=on_test, log_every=1,
                            block_scan=block_scan,
                            boundary_iterations=boundaries,
                            block_cap=block_cap)
    print(f"\nTraining complete ({elapsed:.1f}s).")
    if prof[1]:  # short runs: trace window extends to the end of training
        _jax.profiler.stop_trace()
        prof[1] = False
        print(f"[profile] trace written to {args.profile}")
    if viewer is not None:
        viewer.close()


if __name__ == "__main__":
    main()
