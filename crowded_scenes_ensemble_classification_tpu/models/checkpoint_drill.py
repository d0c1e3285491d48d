"""Checkpoint readiness drill: fetch → checksum → convert → golden parity →
probability cache, one command per spec file (VERDICT r3 #6).

The environment this framework is built in has zero network egress, so the
real pretrained checkpoints (Kinetics I3D h5s, reference train.py:41-57 /
downloaded at :808; the local sports1M C3D file, train.py:1673) have never
run through the conversion path end-to-end.  The drill makes real-weights
parity a ONE-COMMAND exercise for the day egress opens:

    python -m crowded_scenes_ensemble_classification_tpu convert \
        --drill checkpoint_urls.json --work-dir drill_work

For every family in the spec it
  1. resolves each stream's checkpoint (file:// and http(s):// URLs, or a
     pre-placed cache file) — a family whose URL is null and whose cache
     file is absent reports "blocked", not "failed";
  2. records the observed SHA256 and verifies it when the spec carries an
     expected hash (expected hashes are null until the first real fetch —
     zero egress means they cannot be known in advance; the drill's report
     prints the observed hashes in spec format so they can be committed);
  3. converts through the SAME production path as training
     (weights_registry.convert_keras_checkpoint → msgpack);
  4. runs golden parity: the family's independent float64 oracle
     (tests/oracle_{c3d,i3d,r3d}.py) forward on the checkpoint's own
     weights vs the Flax forward, softmax within the 1e-4 BASELINE bar;
  5. caches member probabilities on one synthetic fold through
     ensemble.members.member_probabilities — the full probs leg.

The drill is smoke-tested today with file:// URLs over synthetic
reference-layout checkpoints (tests/test_checkpoint_drill.py).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
import os
import shutil
import sys
import urllib.parse
import urllib.request
from typing import Dict, Optional

import numpy as np

PARITY_SOFTMAX_ATOL = 1e-4  # BASELINE.json north-star bar


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _resolve(url: Optional[str], dest: str, timeout: int = 120) -> str:
    """Fetch `url` to `dest` (file:// copies, http(s):// downloads); a
    pre-existing dest short-circuits.  Raises on failure."""
    if os.path.exists(dest):
        return dest
    if not url:
        raise FileNotFoundError(
            f"no URL given and {dest} is not pre-placed in the cache"
        )
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    scheme = urllib.parse.urlparse(url).scheme
    tmp = dest + ".download"
    try:
        if scheme == "file":
            shutil.copyfile(urllib.request.url2pathname(urllib.parse.urlparse(url).path), tmp)
        elif scheme in ("http", "https"):
            with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:  # noqa: S310
                shutil.copyfileobj(r, f)
        else:
            raise ValueError(f"unsupported URL scheme {scheme!r} in {url}")
        os.replace(tmp, dest)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return dest


def _oracles():
    """Import the independent float64 oracles from tests/ (shipped in the
    repo; absent in a bare installed package → parity reports skipped)."""
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    tests = os.path.join(repo, "tests")
    if not os.path.isdir(tests):
        return None
    if tests not in sys.path:
        sys.path.insert(0, tests)
    import oracle_c3d
    import oracle_i3d
    import oracle_r3d

    return {"c3d": oracle_c3d, "i3d": oracle_i3d, "r3d": oracle_r3d}


def _softmax(logits: np.ndarray) -> np.ndarray:
    e = np.exp(logits - logits.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)


def _parity(model_type: str, stream_layers: Dict[str, Dict]) -> Dict:
    """Flax forward on the checkpoint's own weights vs the float64 oracle.
    Returns {'max_softmax_delta': float, 'geometry': ...}."""
    import jax
    import jax.numpy as jnp

    from . import weights_io as wio

    oracles = _oracles()
    if oracles is None:
        return {"skipped": "tests/oracle_*.py unavailable"}
    rng = np.random.default_rng(123)

    if model_type == "C3D":
        from .c3d import C3D

        layers = stream_layers["rgb"]
        ckpt_classes = int(np.asarray(layers["fc8"]["kernel"]).shape[-1])
        width = np.asarray(layers["conv1"]["kernel"]).shape[-1] / 64.0
        # geometry is pinned by the checkpoint's fc6 fan-in → 16×112×112
        x = rng.uniform(0, 1, (1, 16, 112, 112, 3)).astype(np.float32)
        module = C3D(num_classes=ckpt_classes, width=width)
        fresh = module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
        variables = wio.merge_pretrained(
            fresh, wio.c3d_variables_from_keras(layers, num_classes=None)
        )
        logits = module.apply(variables, jnp.asarray(x), train=False)
        want = oracles["c3d"].c3d_forward(layers, x)["softmax"]
    elif model_type == "I3D":
        from .registry import build_model

        layers = dict(stream_layers["rgb"])
        x = rng.uniform(-1, 1, (1, 16, 32, 32, 3)).astype(np.float32)
        bundle = build_model("I3D", num_classes=11)
        fresh = bundle.module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
        variables = wio.merge_pretrained(
            fresh, wio.i3d_variables_from_keras(layers, stream="rgb", num_classes=11)
        )
        logits = bundle.module.apply(variables, jnp.asarray(x), train=False)
        # no-top checkpoint: the head is the model's fresh init — inject it
        # into the oracle so the whole trunk is compared through softmax
        layers["predictions"] = {
            "kernel": np.asarray(variables["params"]["predictions"]["kernel"]),
            "bias": np.asarray(variables["params"]["predictions"]["bias"]),
        }
        want = oracles["i3d"].i3d_forward(layers, x, stream="rgb")["softmax"]
    elif model_type == "TWOSTREAM_I3D":
        from .two_stream_i3d import TwoStreamI3D

        rgb_layers = dict(stream_layers["rgb"])
        flow_layers = dict(stream_layers["flow"])
        rgb_layers.pop("predictions", None)
        flow_layers.pop("predictions", None)
        rgb = rng.uniform(-1, 1, (1, 16, 32, 32, 3)).astype(np.float32)
        flow = rng.uniform(-1, 1, (1, 16, 32, 32, 2)).astype(np.float32)
        module = TwoStreamI3D(num_classes=11)
        fresh = module.init(
            jax.random.key(0),
            jnp.zeros_like(jnp.asarray(rgb)),
            jnp.zeros_like(jnp.asarray(flow)),
        )
        variables = wio.merge_pretrained(
            fresh, wio.twostream_variables_from_keras(rgb_layers, flow_layers)
        )
        logits = module.apply(
            variables, jnp.asarray(rgb), jnp.asarray(flow), train=False
        )
        dummy_head = {
            "kernel": np.zeros((1024, 11), np.float32),
            "bias": np.zeros(11, np.float32),
        }
        fr = oracles["i3d"].i3d_forward(
            {**rgb_layers, "predictions": dummy_head}, rgb, stream="rgb"
        )["features"]
        ff = oracles["i3d"].i3d_forward(
            {**flow_layers, "predictions": dummy_head}, flow, stream="flow"
        )["features"]
        feats = np.concatenate([fr, ff], -1)
        hw = np.asarray(variables["params"]["predictions"]["kernel"], np.float64)
        hb = np.asarray(variables["params"]["predictions"]["bias"], np.float64)
        want = _softmax(feats @ hw + hb)
    elif model_type.startswith("R3D_"):
        from .r3d import R3D

        depth = int(model_type.split("_")[1])
        layers = stream_layers["rgb"]
        ckpt_classes = int(np.asarray(layers["dense_1"]["kernel"]).shape[-1])
        x = rng.uniform(0, 1, (1, 16, 64, 64, 3)).astype(np.float32)
        module = R3D(num_classes=ckpt_classes, depth=depth)
        fresh = module.init(jax.random.key(0), jnp.zeros_like(jnp.asarray(x)))
        variables = wio.merge_pretrained(
            fresh, wio.r3d_variables_from_keras(layers, depth)
        )
        logits = module.apply(variables, jnp.asarray(x), train=False)
        want = oracles["r3d"].r3d_forward(layers, x, depth)["softmax"]
    else:
        return {"skipped": f"no parity oracle for {model_type}"}

    import jax

    got = np.asarray(jax.nn.softmax(jnp.asarray(logits), -1))
    delta = float(np.max(np.abs(got - want)))
    return {"max_softmax_delta": delta, "ok": delta <= PARITY_SOFTMAX_ATOL}


def _probs_leg(
    model_type: str,
    msgpack_path: str,
    work_dir: str,
    num_clips: int = 4,
    hw: Optional[tuple] = None,
) -> Dict:
    """Cache member probabilities on one synthetic fold with the converted
    checkpoint — the full store_probabilities leg (reference
    evaluate_ensemble.py:1002-1109) with real converted weights."""
    import jax

    from ..data.pipeline import BatchPipeline, SampleSpec
    from ..data.synthetic import generate_synthetic_dataset
    from ..ensemble.members import member_probabilities
    from .pretrained import load_pretrained_variables
    from .registry import build_model

    bundle = build_model(model_type, num_classes=11)
    if model_type == "C3D":
        # geometry pinned by the checkpoint's fc6 fan-in
        hw = (bundle.clip.height, bundle.clip.width)
    elif hw is not None:
        bundle = dataclasses.replace(
            bundle,
            clip=dataclasses.replace(bundle.clip, height=hw[0], width=hw[1]),
        )
    fresh = bundle.init(jax.random.key(0))
    variables = load_pretrained_variables(
        model_type, fresh, 11, rgb_h5=msgpack_path
    )

    data_dir = os.path.join(work_dir, "drill_data", model_type)
    df = generate_synthetic_dataset(
        data_dir,
        num_scenes=max(num_clips, 2),
        clips_per_scene=1,
        num_classes=2,
        num_frames=bundle.clip.frames + 2,
        hw=(max(bundle.clip.height, 64), max(bundle.clip.width, 64)),
        as_videos=True,
        write_flow=False,
    )
    df = df.rename(columns={"label": "class"})
    spec = SampleSpec(
        num_frames=bundle.clip.frames,
        staging_hw=(bundle.clip.height, bundle.clip.width),
        two_stream=bundle.two_stream,
        flow_precomputed=False,
    )
    pipe = BatchPipeline(
        df.iloc[:num_clips], spec, batch_size=num_clips, shuffle=False,
        num_workers=2,
    )
    probs = member_probabilities(bundle, [variables], pipe)
    out = os.path.join(work_dir, f"drill_probs_{model_type}.npz")
    np.savez(out, probs=probs)
    finite = bool(np.all(np.isfinite(probs)))
    return {"path": out, "shape": list(probs.shape), "finite": finite, "ok": finite}


def run_drill(
    spec_path: str,
    work_dir: str,
    cache_dir: Optional[str] = None,
    probs_clips: int = 4,
) -> Dict:
    """Execute the drill for every family in the spec; returns the report
    (also written to {work_dir}/drill_report.json).  Families blocked on
    missing files/egress report status 'blocked'; any failed step makes the
    family 'failed'; otherwise 'ok'."""
    from .weights_registry import convert_keras_checkpoint, default_cache_dir
    from . import weights_io as wio

    with open(spec_path) as f:
        spec = json.load(f)
    cache_dir = cache_dir or default_cache_dir()
    os.makedirs(work_dir, exist_ok=True)
    report: Dict = {"spec": os.path.abspath(spec_path), "families": {}}

    for fam in spec["families"]:
        model_type = fam["model_type"]
        entry: Dict = {"steps": {}}
        report["families"][model_type] = entry
        streams = fam.get("streams", {})

        # 1+2: resolve + checksum every stream
        paths: Dict[str, str] = {}
        blocked = failed = False
        for stream, info in streams.items():
            dest = os.path.join(
                cache_dir, info.get("filename") or f"{model_type}_{stream}.h5"
            )
            step: Dict = {}
            try:
                paths[stream] = _resolve(info.get("url"), dest)
                step["path"] = paths[stream]
                step["sha256"] = _sha256(paths[stream])
                expected = info.get("sha256")
                if expected and expected != step["sha256"]:
                    step["error"] = f"sha256 mismatch: expected {expected}"
                    failed = True
            except Exception as e:
                step["blocked"] = str(e)
                blocked = True
            entry["steps"][f"fetch_{stream}"] = step

        if not streams:
            entry["status"] = "skipped"
            entry["note"] = fam.get(
                "note", "no checkpoint (trains from scratch in the reference)"
            )
            continue
        if blocked or failed:
            entry["status"] = "failed" if failed else "blocked"
            continue

        # 3: convert through the production path
        msgpack = os.path.join(work_dir, f"{model_type}.msgpack")
        try:
            convert_keras_checkpoint(
                model_type,
                msgpack,
                rgb_h5=paths.get("rgb"),
                flow_h5=paths.get("flow"),
            )
            entry["steps"]["convert"] = {"path": msgpack, "ok": True}
        except Exception as e:
            entry["steps"]["convert"] = {"error": str(e)}
            entry["status"] = "failed"
            continue

        # 4: golden parity vs the independent float64 oracle
        try:
            stream_layers = {s: wio.read_keras_h5(p) for s, p in paths.items()}
            par = _parity(model_type, stream_layers)
            entry["steps"]["parity"] = par
            if par.get("ok") is False:
                entry["status"] = "failed"
                continue
        except Exception as e:
            entry["steps"]["parity"] = {"error": str(e)}
            entry["status"] = "failed"
            continue

        # 5: probability cache on one synthetic fold
        try:
            pr = _probs_leg(
                model_type,
                msgpack,
                work_dir,
                num_clips=probs_clips,
                hw=tuple(fam["probs_hw"]) if fam.get("probs_hw") else None,
            )
            entry["steps"]["probs"] = pr
            entry["status"] = "ok" if pr["ok"] else "failed"
        except Exception as e:
            entry["steps"]["probs"] = {"error": str(e)}
            entry["status"] = "failed"

    out = os.path.join(work_dir, "drill_report.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    report["report_path"] = out
    return report
