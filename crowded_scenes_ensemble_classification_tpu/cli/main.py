"""Command-line interface.

Maps 1:1 onto the reference's entry points (SURVEY.md §7.1.9):

  folds     — generate_folds.py
  augment   — augment_dataset.py
  launch    — launch_train_ensemble.py (prepare + fan-out)
  train     — train.py (one ensemble member)
  probs     — evaluate_ensemble.py -op Store_models_probabilities
  ensemble  — evaluate_ensemble.py -op Evaluate_ensembles /
              Global_evaluate_models / Combine_ensembles
  report    — evaluate_ensemble.py -op Confusion_matrices /
              Difference_matrices / StickDiagrams…
  bench     — the clips/sec harness (no reference equivalent)

Unlike the reference, experiment identity lives in one JSON config (saved
into the work dir) rather than path-encoded names.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

from ..core.config import (
    AUGMENTATION_STATUSES,
    CLASSES_STATUSES,
    ExperimentConfig,
    MODEL_TYPES,
    OPTICAL_FLOW_STATUSES,
    TRAINING_CONDITIONS,
    WEIGHTING_SCHEMES,
)


def _add_config_flags(p: argparse.ArgumentParser):
    p.add_argument("--model-type", "-mt", choices=MODEL_TYPES, default="C3D")
    p.add_argument(
        "--training-condition", "-tc", choices=TRAINING_CONDITIONS, default="_SCRATCH"
    )
    p.add_argument("--folds-number", "-fn", type=int, default=5)
    p.add_argument("--classes-status", "-cs", choices=CLASSES_STATUSES, default="unbalanced")
    p.add_argument(
        "--augmentation-status", "-as", choices=AUGMENTATION_STATUSES,
        default="non_augmented",
    )
    p.add_argument("--augmentation-frequency", "-af", type=int, default=1)
    p.add_argument(
        "--optical-flow-status", "-ofs", choices=OPTICAL_FLOW_STATUSES,
        default="FarneBack_onTheFly",
    )
    p.add_argument("--num-classes", type=int, default=11)
    p.add_argument("--batch-size", "-bs", type=int, default=16)
    p.add_argument("--epochs", "-e", type=int, default=100)
    p.add_argument(
        "--input-scale", type=float, default=None,
        help="pixel pre-scale for model inputs (default: the scale saved "
             "by launch/train for this config in the work dir, else 1.0 = "
             "reference parity raw 0-255 floats)",
    )
    p.add_argument(
        "--flow-from-augmented", action="store_true",
        help="augmented FarneBack_onTheFly runs: compute flow from the "
             "AUGMENTED frames (exact reference semantics, train.py:176-184"
             " — the SPECIALCASE TwoStream config); default computes flow "
             "from the unaugmented staged frames (see PARITY.md)",
    )
    p.add_argument(
        "--flow-schedule", choices=("full", "turbo"), default=None,
        help="on-device Farnebäck iteration schedule: 'full' = the "
             "reference's 5-iteration schedule (cv2 parity), 'turbo' = "
             "EPE-gated adaptive schedule, ~2-3x flow throughput "
             "(default: the schedule saved by launch/train for this "
             "config in the work dir, else 'full')",
    )
    p.add_argument(
        "--mesh-data", type=int, default=None, metavar="N",
        help="shard batches (and resident datasets) over an N-device "
             "data-parallel jax.sharding.Mesh; -1 = all local devices "
             "(used by train/launch/probs; other subcommands ignore it)",
    )


def _mesh_from_args(args):
    n = getattr(args, "mesh_data", None)
    if not n:
        return None
    from ..core.mesh import make_mesh

    return make_mesh((("data", n),))


def _config_from_args(args) -> ExperimentConfig:
    cfg = ExperimentConfig(
        model_type=args.model_type,
        training_condition=args.training_condition,
        folds_number=args.folds_number,
        classes_status=args.classes_status,
        augmentation_status=args.augmentation_status,
        augmentation_frequency=args.augmentation_frequency,
        optical_flow_status=args.optical_flow_status,
        num_classes=args.num_classes,
        batch_size=args.batch_size,
        epochs=args.epochs,
        input_scale=args.input_scale if args.input_scale is not None else 1.0,
        flow_from_augmented=getattr(args, "flow_from_augmented", False),
        flow_schedule=getattr(args, "flow_schedule", None) or "full",
    )
    flow_schedule_given = getattr(args, "flow_schedule", None) is not None
    if (args.input_scale is None or not flow_schedule_given) and getattr(
        args, "work_dir", None
    ):
        # Recover the scale/flow-schedule the members trained with:
        # launch/train persist the config per subfolder
        # (WorkLayout.experiment_json), so probs/ensemble/report can't
        # silently evaluate with different preprocessing.
        import dataclasses

        from ..orchestration import WorkLayout

        saved = WorkLayout(args.work_dir).experiment_json(cfg)
        if os.path.exists(saved):
            loaded = ExperimentConfig.load(saved)
            updates = {}
            if args.input_scale is None:
                updates["input_scale"] = loaded.input_scale
            if not flow_schedule_given:
                updates["flow_schedule"] = loaded.flow_schedule
            cfg = dataclasses.replace(cfg, **updates)
    return cfg


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="crowded_scenes_ensemble_classification_tpu"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("folds", help="scene-stratified k-fold generation")
    p.add_argument("--dataset-directory", "-df", required=True)
    p.add_argument("--database-file", "-db", default=None)
    p.add_argument("--parent-folds-folder", "-pff", required=True)
    p.add_argument("--folds-number", "-fn", type=int, default=5)

    p = sub.add_parser("augment", help="offline (precomputed) augmentation")
    p.add_argument("--folds-folder", required=True)
    p.add_argument("--augmented-data-folder", required=True)
    p.add_argument("--folds-number", "-fn", type=int, default=5)
    p.add_argument("--augmentation-frequency", "-af", type=int, default=1)
    p.add_argument(
        "--operation", choices=["augment_videos", "update_links"],
        default="augment_videos",
    )

    p = sub.add_parser("launch", help="prepare + train all ensemble members")
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--dataset-directory", "-df", default=None)
    p.add_argument("--database-file", "-db", default=None)
    p.add_argument("--runner", choices=["local", "commands"], default="local")
    p.add_argument("--rgb-h5", default=None,
                   help="_PRETRAINED: Keras h5 or converted .msgpack (rgb)")
    p.add_argument("--flow-h5", default=None,
                   help="_PRETRAINED: Keras h5 (flow stream)")
    p.add_argument("--resident", action="store_true",
                   help="pin each split's staged clips in device memory "
                        "once and gather batches on device — epochs ship "
                        "only int32 indices (data.resident; replaces the "
                        "reference's per-epoch decode+feed, "
                        "train.py:257-269); needs the dataset to fit in "
                        "device memory")
    p.add_argument("--recover", action="store_true",
                   help="train only members with no complete "
                        "(checkpoint, history) artifact pair — the "
                        "idempotent relaunch after a crashed/killed "
                        "process (orchestration.pending_members)")

    p = sub.add_parser("train", help="train one (test, val) ensemble member")
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--test-index", "-t", type=int, required=True)
    p.add_argument("--val-index", "-v", type=int, required=True)
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--rgb-h5", default=None,
                   help="_PRETRAINED: Keras h5 or converted .msgpack (rgb)")
    p.add_argument("--flow-h5", default=None,
                   help="_PRETRAINED: Keras h5 (flow stream)")
    p.add_argument("--resident", action="store_true",
                   help="pin the split's staged clips in device memory "
                        "once; see launch --resident")

    p = sub.add_parser(
        "export",
        help="export one test fold's fused ensemble as a StableHLO "
             "serving artifact (member weights baked in; runs on any "
             "platform chosen at export time, no framework needed)",
    )
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--test-index", "-t", type=int, required=True)
    p.add_argument("--out", required=True, help="artifact path (.zip)")
    p.add_argument("--serve-batch", type=int, default=None,
                   help="batch size baked into the artifact signature "
                        "(default: --batch-size)")
    p.add_argument("--platforms", default="tpu",
                   help="comma-separated lowering targets (tpu,cpu,cuda); "
                        "TPU artifacts can be produced on a CPU-only host")
    p.add_argument("--weights-npy", default=None,
                   help="fusion weights .npy (e.g. learned GRID_SEARCH / "
                        "DIFFERENTIAL_EVOLUTION weights); default: equal "
                        "SUM weights")
    p.add_argument("--no-bake-params", action="store_true",
                   help="export a lean module that takes the stacked member "
                        "parameters at call time instead of baking them in "
                        "as constants (serve reloads them from --work-dir)")
    p.add_argument("--quant", action="store_true",
                   help="bake int8 conv contractions into the artifact "
                        "(models.common.quant_conv_general; same member "
                        "checkpoints, accuracy-gated) — for memory-bound "
                        "deployment targets")
    p.add_argument("--fuse-1x1", action="store_true",
                   help="I3D family: export with fused inception "
                        "block-input 1x1 convs (exact rewrite, same "
                        "checkpoints; measured ~5%% slower than XLA's "
                        "unfused lowering on v5e — see PARITY.md — but "
                        "other hardware may differ)")
    p.add_argument("--mesh-member", type=int, default=None, metavar="M",
                   help="with --mesh-data: export a MULTI-CHIP artifact over "
                        "an (member=M, data=N) jax.sharding.Mesh — SPMD "
                        "shardings are recorded in the module and the "
                        "serving runtime must run it on M*N devices "
                        "(lowered for the current platform; --platforms is "
                        "ignored)")

    p = sub.add_parser(
        "serve",
        help="classify a fold CSV with a saved serving artifact — the "
             "StableHLO module IS the ensemble (decode/staging on host, "
             "everything else inside the artifact); replaces the "
             "reference's rebuild-the-Keras-graph-and-predict deployment "
             "path (evaluate_ensemble.py:1032-1063)",
    )
    p.add_argument("--artifact", required=True, help="zip from `export`")
    p.add_argument("--csv", required=True,
                   help="clips CSV (fold/split format: rgbclips_path "
                        "[, class, flow paths])")
    p.add_argument("--out", default=None,
                   help="predictions CSV (default: <artifact>_predictions.csv)")
    p.add_argument("--num-workers", type=int, default=8,
                   help="host decode threads")
    p.add_argument("--work-dir", default=None,
                   help="member checkpoints, required only for artifacts "
                        "exported with --no-bake-params")

    p = sub.add_parser("probs", help="cache member softmax probabilities")
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument("--test-index", "-t", type=int, default=None)
    p.add_argument("--subset", choices=["test", "train_val"], default="test")
    p.add_argument("--export-csv", action="store_true",
                   help="also write the legacy (path, probabilities) CSV")
    p.add_argument("--long-video", action="store_true",
                   help="scan strided model windows over long clips with "
                        "on-device score averaging (the reference collapsed "
                        "any video to one subsampled window, "
                        "train.py:132-145); RGB models only")
    p.add_argument("--window-stride", type=int, default=None,
                   help="frame stride between windows (default: half the "
                        "model window)")
    p.add_argument("--long-frames", type=int, default=None,
                   help="frames staged per long clip (default: 4x the "
                        "model window)")
    p.add_argument("--recompute", action="store_true",
                   help="recompute even if the probability cache exists")
    p.add_argument("--quant", nargs="?", const="dynamic", default=None,
                   choices=["dynamic", "static"],
                   help="int8 member inference (TPU MXU int8 path — same "
                        "checkpoints, accuracy-gated in tests/test_quant.py); "
                        "'static' calibrates per-layer activation scales on "
                        "the first batches and pre-bakes int8 weights (the "
                        "fast path); caches at separate `…_int8`/"
                        "`…_int8static` npz paths")
    p.add_argument("--quant-blocks", default=None,
                   help="I3D family + --quant static: restrict int8 to "
                        "named stem/Mixed_* sites.  'mixed' = the "
                        "measured int8-where-it-wins policy "
                        "(models.quantize.MIXED_INT8_POLICY); or a comma "
                        "list, e.g. 'Conv3d_1a_7x7,Mixed_5b,Mixed_5c'. "
                        "Caches at a policy-qualified npz path")
    p.add_argument("--fuse-1x1", action="store_true",
                   help="I3D family: run each inception block's three "
                        "block-input 1x1x1 convs as ONE conv (exact "
                        "rewrite, same checkpoints; measured ~5%% slower "
                        "than XLA's unfused lowering on v5e — see "
                        "PARITY.md).  Composes with --quant static "
                        "(bit-identical there)")

    p = sub.add_parser("ensemble", help="ensemble evaluation")
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument(
        "--operation", choices=["evaluate", "global", "combine"], default="evaluate"
    )
    p.add_argument("--weights-type", "-wt", choices=WEIGHTING_SCHEMES, default="SUM")
    p.add_argument("--de-seed", type=int, default=None)
    p.add_argument("--long-video", action="store_true",
                   help="fuse the long-video window-scan probability "
                        "caches (same flags as `probs --long-video`; "
                        "computed on miss)")
    p.add_argument("--window-stride", type=int, default=None)
    p.add_argument("--long-frames", type=int, default=None)
    p.add_argument("--quant", nargs="?", const="dynamic", default=None,
                   choices=["dynamic", "static"],
                   help="consume (computing on miss) the quantized "
                        "probability caches — see `probs --quant`")
    p.add_argument("--quant-blocks", default=None,
                   help="int8 block policy for compute-on-miss — see "
                        "`probs --quant-blocks`")
    p.add_argument("--fuse-1x1", action="store_true",
                   help="compute-on-miss with fused inception 1x1 convs "
                        "— see `probs --fuse-1x1`")
    p.add_argument(
        "--models", "-ml", nargs="*", default=None,
        help="model specs for global/combine ops, e.g. C3D_SCRATCH "
             "I3D_PRETRAINED SPECIALCASE_PRETRAINED (reference "
             "launch_evaluate_ensemble.sh:23)",
    )
    p.add_argument(
        "--assert-targets", metavar="JSON", default=None,
        help="assert the measured mean accuracy against the published "
             "ISPA-2021 slots in an ACCURACY_TARGETS.json (null slots "
             "skip; non-null slots fail the command outside the "
             "tolerance_pp bar — see ensemble/targets.py)",
    )

    p = sub.add_parser("report", help="confusion/difference/agreement reports")
    _add_config_flags(p)
    p.add_argument("--work-dir", required=True)
    p.add_argument(
        "--operation",
        choices=["confusion", "difference", "agreement"],
        default="confusion",
    )
    p.add_argument("--weights-type", "-wt", choices=WEIGHTING_SCHEMES, default="SUM")
    p.add_argument(
        "--scope", choices=["homogeneous", "global"], default="homogeneous",
        help="difference matrices for the per-config ensemble or for the "
             "GLOBAL heterogeneous ensemble (reference Unique vs Global "
             "paths, evaluate_ensemble.py:397-489 vs 490-614)",
    )
    p.add_argument(
        "--subset", choices=["test", "train_val"], default="test",
        help="agreement diagrams over the test or the train+val sets "
             "(reference stickDiagrams variants, evaluate_ensemble.py:"
             "856-999, 928-996)",
    )
    p.add_argument(
        "--models", "-ml", nargs="*", default=None,
        help="model specs for --scope global (same syntax as `ensemble`)",
    )

    p = sub.add_parser(
        "convert",
        help="download/convert pretrained Keras h5 checkpoints "
             "(reference train.py:41-57, get_file at :808)",
    )
    p.add_argument(
        "--model-type", "-mt",
        choices=["C3D", "I3D", "TWOSTREAM_I3D",
                 "R3D_18", "R3D_34", "R3D_50", "R3D_101", "R3D_152"],
        default="I3D",
    )
    p.add_argument("--rgb-h5", default=None, help="local Keras h5 (rgb stream)")
    p.add_argument("--flow-h5", default=None, help="local Keras h5 (flow stream)")
    p.add_argument(
        "--fetch-rgb", default=None,
        help="registry name to download for the rgb stream, e.g. "
             "rgb_imagenet_and_kinetics",
    )
    p.add_argument(
        "--fetch-flow", default=None,
        help="registry name to download for the flow stream",
    )
    p.add_argument("--include-top", action="store_true",
                   help="fetch the with-classification-top variant")
    p.add_argument("--num-classes", type=int, default=None)
    p.add_argument("--cache-dir", default=None)
    p.add_argument("--out", default=None, help="output .msgpack variables file")
    p.add_argument(
        "--drill", default=None, metavar="SPEC_JSON",
        help="checkpoint readiness drill: fetch → checksum → convert → "
             "golden parity → probs cache for every family in the spec "
             "(see checkpoint_urls.json; models/checkpoint_drill.py)",
    )
    p.add_argument("--work-dir", default="drill_work",
                   help="--drill output directory")

    sub.add_parser("bench", help="run the clips/sec benchmark")
    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.command == "folds":
        from ..data.crowd11 import build_clip_table
        from ..data.folds import generate_folds

        table = build_clip_table(args.dataset_directory, args.database_file)
        folder, _ = generate_folds(
            table, args.parent_folds_folder, args.folds_number
        )
        print(f"folds written to {folder}")
        return 0

    if args.command == "augment":
        from ..data.augment_offline import augment_folds

        augment_folds(
            args.folds_folder,
            args.augmented_data_folder,
            args.folds_number,
            args.augmentation_frequency,
            operation=args.operation,
        )
        print("augmentation complete")
        return 0

    if args.command == "launch":
        from ..orchestration import launch_ensemble_training

        config = _config_from_args(args)
        table = None
        if args.dataset_directory:
            from ..data.crowd11 import build_clip_table

            table = build_clip_table(args.dataset_directory, args.database_file)
        out = launch_ensemble_training(
            config, table, args.work_dir, runner=args.runner,
            rgb_h5=args.rgb_h5, flow_h5=args.flow_h5,
            resident=args.resident, mesh=_mesh_from_args(args),
            recover=args.recover,
        )
        if args.runner == "commands":
            print("\n".join(out))
        else:
            for (t, v), r in out.items():
                print(
                    f"split test{t} val{v}: test_acc={r['test_accuracy']:.4f} "
                    f"test_loss={r['test_loss']:.4f}"
                )
        config.save(os.path.join(args.work_dir, "experiment.json"))
        return 0

    if args.command == "train":
        from ..orchestration import WorkLayout, prepare_ensemble, train_member

        config = _config_from_args(args)
        layout = prepare_ensemble(config, None, args.work_dir)
        out = train_member(
            config,
            layout,
            args.test_index,
            args.val_index,
            verbose=args.verbose,
            rgb_h5=args.rgb_h5,
            flow_h5=args.flow_h5,
            resident=args.resident,
            mesh=_mesh_from_args(args),
        )
        print(
            f"test_acc={out['test_accuracy']:.4f} test_loss={out['test_loss']:.4f} "
            f"best_val_loss={out['best_val_loss']:.4f}"
        )
        return 0

    if args.command == "export":
        from ..models import build_model
        from ..orchestration import WorkLayout, _member_variables
        from ..serving import (
            export_ensemble,
            save_serving_artifact,
            serving_batch_example,
        )

        config = _config_from_args(args)
        layout = WorkLayout(args.work_dir)
        model_kwargs = (
            {"fuse_1x1": True}
            if args.fuse_1x1 and "I3D" in config.model_type
            else {}
        )
        bundle = build_model(
            config.model_type, config.num_classes, quant=args.quant,
            **model_kwargs,
        )
        variables, names = _member_variables(config, layout, bundle, args.test_index)
        weights = np.load(args.weights_npy) if args.weights_npy else None
        example = serving_batch_example(
            bundle,
            args.serve_batch or config.batch_size,
            flow_precomputed=(config.optical_flow_status == "TVL1_precomputed"),
        )
        platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
        mesh = None
        if args.mesh_member:
            if not args.mesh_data:
                print("--mesh-member requires --mesh-data", file=sys.stderr)
                return 2
            from ..core.mesh import make_mesh

            mesh = make_mesh(
                (("member", args.mesh_member), ("data", args.mesh_data))
            )
            # sharded modules are lowered for the platform of the export
            # mesh, not --platforms (serving.export_ensemble)
            import jax

            platforms = [jax.default_backend()]
        # Match the production member-forward graph exactly
        # (ensemble.members.member_probabilities): I3D-family artifacts
        # share the s2d stem staging across members (1.2× the 4-member
        # stem on v5e), and on-device Farnebäck serves with the SAME
        # flow schedule the members trained with — an artifact exported
        # without these is a slower program than the jit path it
        # replaces (round-5 bench: 4 unshared stem stagings cost ~35%
        # of serving throughput).
        from ..flow.farneback import flow_schedule_params

        flow_params = (
            flow_schedule_params(config.flow_schedule)
            if bundle.two_stream
            and config.optical_flow_status != "TVL1_precomputed"
            else None
        )
        blob = export_ensemble(
            bundle,
            variables,
            example,
            weights=weights,
            input_scale=config.input_scale,
            platforms=platforms,
            mesh=mesh,
            bake_params=not args.no_bake_params,
            share_stem_staging=config.model_type in ("I3D", "TWOSTREAM_I3D"),
            flow_params=flow_params,
        )
        meta = {
            "model_type": config.model_type,
            "num_classes": config.num_classes,
            "test_index": args.test_index,
            "members": names,
            "quant": args.quant,
            "fuse_1x1": bool(model_kwargs),
            "input_scale": config.input_scale,
            "platforms": platforms,
            "params_baked": mesh is None and not args.no_bake_params,
            "mesh": (
                None
                if mesh is None
                else {"member": args.mesh_member, "data": args.mesh_data}
            ),
            # full config: `serve` rebuilds it to reload member checkpoints
            # for lean (params-unbaked) artifacts
            "experiment": json.loads(config.to_json()),
            "fusion_weights": (
                [1.0] * len(names) if weights is None else np.asarray(weights).tolist()
            ),
            "input_spec": {k: list(v.shape) for k, v in example.items()},
        }
        print(save_serving_artifact(args.out, blob, meta))
        return 0

    if args.command == "serve":
        import pandas as pd

        from ..data.pipeline import BatchPipeline, SampleSpec, prefetch_batches
        from ..serving import load_serving_artifact

        serve_fn, meta = load_serving_artifact(args.artifact)
        ispec = meta["input_spec"]
        b, t, h, w = ispec["rgb"][:4]
        spec = SampleSpec(
            num_frames=t,
            staging_hw=(h, w),
            two_stream=("flow" in ispec or "gray" in ispec),
            flow_precomputed=("flow" in ispec),
        )
        df = pd.read_csv(args.csv)
        pipe = BatchPipeline(
            df, spec, batch_size=b, shuffle=False, num_workers=args.num_workers
        )
        call_args = []
        if not meta.get("params_baked", True):
            # lean / mesh-exported artifact: the runtime supplies the
            # stacked member parameters (see serving.export_ensemble)
            if not args.work_dir or "experiment" not in meta:
                print(
                    "artifact was exported without baked parameters; "
                    "pass --work-dir with the member checkpoints",
                    file=sys.stderr,
                )
                return 2
            import jax

            from ..ensemble.members import stack_variables
            from ..models import build_model
            from ..orchestration import WorkLayout, _member_variables

            config = ExperimentConfig.from_json(json.dumps(meta["experiment"]))
            bundle = build_model(config.model_type, config.num_classes)
            variables, _ = _member_variables(
                config, WorkLayout(args.work_dir), bundle, meta["test_index"]
            )
            stacked = stack_variables(variables)
            if meta.get("mesh"):
                from ..core.mesh import make_mesh
                from ..ensemble.members import shard_stacked

                emesh = make_mesh(
                    (
                        ("member", meta["mesh"]["member"]),
                        ("data", meta["mesh"]["data"]),
                    )
                )
                stacked = shard_stacked(stacked, emesh)
            call_args.append(jax.device_put(stacked))

        keys = list(ispec)
        preds_chunks = []
        for batch in prefetch_batches(pipe, epoch=0):
            out = serve_fn(*call_args, {k: batch[k] for k in keys})
            valid = np.asarray(batch["valid"])
            preds_chunks.append(np.asarray(out["preds"])[valid])
        preds = np.concatenate(preds_chunks)

        out_df = df.copy()
        out_df["prediction"] = preds
        if "class" in df.columns:
            labels = df["class"].astype(int).values
            acc = float((preds == labels).mean())
            print(f"accuracy: {acc:.4f} over {len(preds)} clips")
        out_path = args.out or (
            os.path.splitext(args.artifact)[0] + "_predictions.csv"
        )
        out_df.to_csv(out_path, index=False)
        print(out_path)
        return 0

    if args.command == "probs":
        from ..ensemble.probability_store import export_reference_csv
        from ..orchestration import WorkLayout, cache_probabilities

        config = _config_from_args(args)
        layout = WorkLayout(args.work_dir)
        tests = (
            [args.test_index]
            if args.test_index is not None
            else range(config.folds_number)
        )
        for t in tests:
            path = cache_probabilities(
                config, layout, t, args.subset,
                mesh=_mesh_from_args(args),
                long_video=args.long_video,
                window_stride=args.window_stride,
                long_frames=args.long_frames,
                recompute=args.recompute,
                quant=args.quant,
                quant_blocks=args.quant_blocks,
                fuse_1x1=args.fuse_1x1,
            )
            print(path)
            if args.export_csv:
                print(export_reference_csv(path, path.replace(".npz", ".csv")))
        return 0

    if args.command == "ensemble":
        from ..ensemble.evaluate import (
            combine_ensembles,
            evaluate_ensembles,
            global_evaluate_ensembles,
            save_global_predictions_csv,
        )
        from ..orchestration import (
            WorkLayout,
            make_prob_provider,
            min_val_losses_provider,
        )

        config = _config_from_args(args)
        layout = WorkLayout(args.work_dir)
        provider_kwargs = {}
        if args.long_video:
            provider_kwargs = dict(
                long_video=True,
                window_stride=args.window_stride,
                long_frames=args.long_frames,
            )
        if args.quant:
            provider_kwargs["quant"] = args.quant
            if args.quant_blocks:
                provider_kwargs["quant_blocks"] = args.quant_blocks
        if args.fuse_1x1:
            provider_kwargs["fuse_1x1"] = True
        provider = make_prob_provider(config, layout, **provider_kwargs)
        if args.operation == "evaluate":
            res = evaluate_ensembles(
                provider,
                config.folds_number,
                args.weights_type,
                name=config.subfolder_name(),
                min_val_losses_provider=min_val_losses_provider(config, layout),
                de_seed=args.de_seed,
            )
            for f in res.folds:
                print(f"fold {f.test_index}: accuracy {f.accuracy:.4f}")
            print(f"mean accuracy: {res.mean_accuracy:.4f}")
            print(res.save_predictions_csv(layout.results_dir))
            wpath = res.save_weights_npy(layout.results_dir)
            if wpath:
                print(wpath)
            if args.assert_targets:
                from ..ensemble.targets import check_target, load_targets

                chk = check_target(
                    load_targets(args.assert_targets),
                    config.subfolder_name(),
                    res.mean_accuracy,
                    per_fold=[f.accuracy for f in res.folds],
                )
                print(chk.message)
                if chk.ok is False:
                    return 1
        else:
            if args.models:
                from ..orchestration import global_prob_providers

                providers = global_prob_providers(
                    args.models, args.work_dir, config.folds_number,
                    config.num_classes, **provider_kwargs,
                )
            else:
                providers = {config.subfolder_name(): provider}
            if args.operation == "global":
                res = global_evaluate_ensembles(providers, config.folds_number)
                print(f"global mean accuracy: {res.mean_accuracy:.4f}")
                print(save_global_predictions_csv(res, layout.results_dir))
                if args.assert_targets:
                    from ..ensemble.targets import check_target, load_targets

                    chk = check_target(
                        load_targets(args.assert_targets),
                        "GLOBAL",
                        res.mean_accuracy,
                    )
                    print(chk.message)
                    if chk.ok is False:
                        return 1
            else:
                ranked = combine_ensembles(providers, config.folds_number)
                for subset, acc in ranked:
                    print(f"{'+'.join(subset)}: {acc:.4f}")
        return 0

    if args.command == "report":
        from ..ensemble.evaluate import evaluate_ensembles
        from ..orchestration import (
            WorkLayout,
            make_prob_provider,
            min_val_losses_provider,
        )
        from ..reports import (
            agreement_histogram,
            confusion_matrix,
            members_correct_per_clip,
            render_agreement_pdf,
            render_confusion_grid_pdf,
            render_confusion_pdf,
            render_difference_pdf,
            difference_matrix,
            row_normalize,
        )

        config = _config_from_args(args)
        layout = WorkLayout(args.work_dir)
        provider = make_prob_provider(config, layout)
        os.makedirs(layout.results_dir, exist_ok=True)

        if args.scope == "global" and args.operation in ("confusion", "difference"):
            # Global heterogeneous paths: per-fold global-ensemble
            # confusion matrices (reference evaluate_ensemble.py:783-851)
            # and (global-ensemble CM − individual member CM) heatmaps
            # (reference evaluate_ensemble.py:490-614).
            from ..ensemble.evaluate import global_evaluate_ensembles

            if args.models:
                from ..orchestration import global_prob_providers

                providers = global_prob_providers(
                    args.models, args.work_dir, config.folds_number,
                    config.num_classes,
                )
            else:
                providers = {config.subfolder_name(): provider}
            gres = global_evaluate_ensembles(providers, config.folds_number)
            if args.operation == "confusion":
                first = next(iter(providers.values()))
                cms = [
                    row_normalize(
                        confusion_matrix(
                            first(f.test_index, "test")["labels"],
                            f.predictions,
                            config.num_classes,
                        )
                    )
                    for f in gres.folds
                ]
                path = render_confusion_grid_pdf(
                    cms,
                    os.path.join(
                        layout.results_dir, "confusion_global_ensemble.pdf"
                    ),
                )
                print(path)
                return 0
            for f in gres.folds:
                ens_cm = None
                for cfg_name, prov in providers.items():
                    d = prov(f.test_index, "test")
                    if ens_cm is None:
                        # labels are shared across configs (same test fold)
                        ens_cm = row_normalize(
                            confusion_matrix(
                                d["labels"], f.predictions, config.num_classes
                            )
                        )
                    for i in range(d["probs"].shape[0]):
                        member_cm = row_normalize(
                            confusion_matrix(
                                d["labels"],
                                np.argmax(d["probs"][i], -1),
                                config.num_classes,
                            )
                        )
                        path = render_difference_pdf(
                            difference_matrix(ens_cm, member_cm),
                            os.path.join(
                                layout.results_dir,
                                f"difference_global_{cfg_name}"
                                f"_t{f.test_index}_m{i}.pdf",
                            ),
                        )
                        print(path)
            return 0

        res = evaluate_ensembles(
            provider,
            config.folds_number,
            args.weights_type,
            name=config.subfolder_name(),
            min_val_losses_provider=min_val_losses_provider(config, layout),
        )
        k = config.folds_number
        if args.operation == "confusion":
            cms = []
            for f in res.folds:
                d = provider(f.test_index, "test")
                cms.append(
                    row_normalize(
                        confusion_matrix(d["labels"], f.predictions, config.num_classes)
                    )
                )
            path = render_confusion_grid_pdf(
                cms,
                os.path.join(
                    layout.results_dir,
                    f"confusion_{config.subfolder_name()}.pdf",
                ),
            )
            print(path)
        elif args.operation == "difference":
            for f in res.folds:
                d = provider(f.test_index, "test")
                ens_cm = row_normalize(
                    confusion_matrix(d["labels"], f.predictions, config.num_classes)
                )
                for i in range(d["probs"].shape[0]):
                    member_cm = row_normalize(
                        confusion_matrix(
                            d["labels"],
                            np.argmax(d["probs"][i], -1),
                            config.num_classes,
                        )
                    )
                    path = render_difference_pdf(
                        difference_matrix(ens_cm, member_cm),
                        os.path.join(
                            layout.results_dir,
                            f"difference_{config.subfolder_name()}_t{f.test_index}_m{i}.pdf",
                        ),
                    )
                    print(path)
        else:  # agreement — test or train_val sets (reference
            # stickDiagrams variants, evaluate_ensemble.py:856-999, 928-996)
            hists = []
            n_members = config.folds_number - 1
            for f in res.folds:
                d = provider(f.test_index, args.subset)
                counts = members_correct_per_clip(d["probs"], d["labels"])
                hists.append(agreement_histogram(counts, n_members))
            suffix = "" if args.subset == "test" else f"_{args.subset}"
            path = render_agreement_pdf(
                hists,
                os.path.join(
                    layout.results_dir,
                    f"agreement_{config.subfolder_name()}{suffix}.pdf",
                ),
                n_members=n_members,
            )
            print(path)
        return 0

    if args.command == "convert":
        from ..models.weights_registry import convert_keras_checkpoint, fetch_weights

        if args.drill:
            from ..models.checkpoint_drill import run_drill

            report = run_drill(
                args.drill, args.work_dir, cache_dir=args.cache_dir
            )
            failed = False
            for mt, entry in report["families"].items():
                status = entry.get("status", "?")
                failed |= status == "failed"
                parity = entry.get("steps", {}).get("parity", {})
                delta = parity.get("max_softmax_delta")
                extra = f" parity_delta={delta:.2e}" if delta is not None else ""
                print(f"drill {mt}: {status}{extra}")
            print(report["report_path"])
            return 1 if failed else 0
        if args.out is None:
            print("convert needs --out (or --drill SPEC_JSON)", file=sys.stderr)
            return 2
        rgb_h5, flow_h5 = args.rgb_h5, args.flow_h5
        if args.fetch_rgb:
            rgb_h5 = fetch_weights(
                args.fetch_rgb, include_top=args.include_top,
                cache_dir=args.cache_dir,
            )
        if args.fetch_flow:
            flow_h5 = fetch_weights(
                args.fetch_flow, include_top=args.include_top,
                cache_dir=args.cache_dir,
            )
        out, _ = convert_keras_checkpoint(
            args.model_type, args.out, rgb_h5=rgb_h5, flow_h5=flow_h5,
            num_classes=args.num_classes, include_top=args.include_top,
        )
        print(out)
        return 0

    if args.command == "bench":
        import runpy

        runpy.run_path(
            os.path.join(os.path.dirname(__file__), "..", "..", "bench.py"),
            run_name="__main__",
        )
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
