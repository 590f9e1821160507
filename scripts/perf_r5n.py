"""Round-5n: expansion BLOCK sweep (one-hot compare cost ~ BLOCK+128).

In-context binning b0/b1 stages from perf_r5m at GS_EXPAND_BLOCK in
{512, 256, 128}; delta = expansion cost."""
import os, subprocess, sys
here = os.path.dirname(os.path.abspath(__file__))
for blk in ("512", "256", "128"):
    env = dict(os.environ, GS_EXPAND_BLOCK=blk, GS_R5M_STAGES="0,1")
    print(f"--- BLOCK={blk}", flush=True)
    subprocess.run([sys.executable, os.path.join(here, "perf_r5m.py")],
                   env=env)
