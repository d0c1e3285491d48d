"""TPU production smoke: the full CLI path (folds -> launch/train ->
probs -> ensemble evaluate) on the real chip with synthetic videos.

Round-2 run (v5e, 2026-08-17): PASSED in 1903 s — 3 folds, 6 C3D members
trained on-chip at the reference 16x112x112 geometry, probability cache +
SUM-fusion evaluation producing the legacy-named results CSV.
Round-3 run (v5e, 2026-08-17): PASSED in 2619 s — same path plus the
long-video window-scan probability cache (probs --long-video) on-chip;
re-run after launch gained shared jitted member steps: 1228 s (2.1x —
the per-member step recompiles were most of the train phase).
Run:  python examples/tpu_production_smoke.py
"""
import sys, os, tempfile, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np

t0 = time.time()
from crowded_scenes_ensemble_classification_tpu.data import generate_synthetic_dataset
from crowded_scenes_ensemble_classification_tpu.cli.main import main as cli

root = tempfile.mkdtemp(prefix="smoke_")
data = os.path.join(root, "data")
df = generate_synthetic_dataset(
    data, num_scenes=6, clips_per_scene=2, num_classes=3,
    num_frames=16, hw=(48, 48), as_videos=True,
)
print(f"[{time.time()-t0:.0f}s] dataset: {len(df)} clips")

folds = os.path.join(root, "folds")
rc = cli(["folds", "-df", data, "-pff", folds, "-fn", "3"])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] folds ok")

work = os.path.join(root, "work")
rc = cli([
    "launch", "-mt", "C3D", "-fn", "3", "--work-dir", work,
    "-df", data, "--epochs", "2", "-bs", "4", "--input-scale", "0.00392",
])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] launch/train ok")

rc = cli(["probs", "-mt", "C3D", "-fn", "3", "--work-dir", work])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] probs ok")

rc = cli(["ensemble", "-mt", "C3D", "-fn", "3", "--work-dir", work,
          "--operation", "evaluate", "-wt", "SUM"])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] ensemble evaluate ok — TPU production smoke PASSED")

# ---- round-3: long-video window-scan probabilities on-chip -----------
# Reuse fold-0's trained members; long-video caches live at their own
# npz path (…_long{T}s{stride}), so no cache clearing is needed.
rc = cli(["probs", "-mt", "C3D", "-fn", "3", "--work-dir", work,
          "--test-index", "0", "--long-video", "--window-stride", "8",
          "--long-frames", "40"])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] long-video probs ok — round-3 smoke PASSED")

# ---- round-3b: TwoStream on-chip (on-device Farnebäck flow) ----------
# The flow-inclusive production path end-to-end on the real chip: launch
# trains the k·(k−1)=6 TWOSTREAM_I3D members with FarneBack_onTheFly
# (the engine computes flow on device from staged gray pairs via the
# elementwise turbo solver), probs caches their softmax, SUM fusion
# evaluates.
work_ts = os.path.join(root, "work_ts")
rc = cli([
    "launch", "-mt", "TWOSTREAM_I3D", "-fn", "3", "--work-dir", work_ts,
    "-df", data, "--epochs", "1", "-bs", "4", "--input-scale", "0.00392",
])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] twostream launch/train ok")

rc = cli(["probs", "-mt", "TWOSTREAM_I3D", "-fn", "3", "--work-dir", work_ts])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] twostream probs ok")

rc = cli(["ensemble", "-mt", "TWOSTREAM_I3D", "-fn", "3", "--work-dir",
          work_ts, "--operation", "evaluate", "-wt", "SUM"])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] twostream ensemble ok — round-3b smoke PASSED")

# ---- round-3c: HBM-resident training on-chip --------------------------
# One member trained with --resident: the split's staged clips upload
# once, epochs gather batches on device (host ships int32 indices only).
work_r = os.path.join(root, "work_res")
rc = cli([
    "launch", "-mt", "C3D", "-fn", "3", "--work-dir", work_r,
    "-df", data, "--runner", "commands", "--resident",
])
assert rc == 0
rc = cli([
    "train", "-mt", "C3D", "-fn", "3", "--work-dir", work_r,
    "-t", "0", "-v", "1", "--epochs", "2", "-bs", "4",
    "--input-scale", "0.00392", "--resident",
])
assert rc == 0
print(f"[{time.time()-t0:.0f}s] resident train ok — round-3c smoke PASSED")
