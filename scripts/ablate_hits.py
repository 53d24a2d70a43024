"""Primary-kernel ablation matrix on the bench scene (1080p, TPU).

Each config runs in a fresh subprocess (the kernel env knobs are read at
import).  Decomposes per-super-step cost: DMA+loop / +matmul / +epilogue /
+early-break, and sweeps super-step width.

Usage: python scripts/ablate_hits.py [configs...]
"""
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

CONFIGS = {
    "base": {},
    "nobreak": {"SRT_TILED_NO_BREAK": "1"},
    "sync": {"SRT_TILED_SYNC": "1"},
    "dma": {"SRT_TILED_ABLATE": "dma"},
    "matmul": {"SRT_TILED_ABLATE": "matmul"},
    "kp8": {"SRT_TILED_SUPER_COLS": "4096"},
    "kp2": {"SRT_TILED_SUPER_COLS": "1024"},
    # finer pages: tighter culling (fewer pairs) vs 2x DMA descriptors
    "pt64": {"SRT_PROF_PT": "64"},
    "pt64kp4": {"SRT_PROF_PT": "64", "SRT_TILED_SUPER_COLS": "1024"},
}

names = sys.argv[1:] or list(CONFIGS)
for name in names:
    env = dict(os.environ)
    env.update(CONFIGS[name])
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "profile_frame.py"), "hits"],
        env=env, capture_output=True, text=True, timeout=900)
    line = [l for l in r.stdout.splitlines() if l.startswith("[")]
    print(f"{name}: {line[0] if line else 'FAILED rc=' + str(r.returncode)}",
          flush=True)
    if not line:
        sys.stderr.write(r.stderr[-1500:])
