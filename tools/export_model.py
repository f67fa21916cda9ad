#!/usr/bin/env python
"""Export a finetuned classifier to a self-contained serving artifact.

Beyond the reference (which has no deployment path): the eval forward is
AOT-lowered and serialized via jax.export — weights baked in, optionally a
symbolic batch dimension — and reloads anywhere jax runs without model code
or checkpoints on the serving side.

  # export (CPU host -> portable pure-XLA artifact; --platforms to cross-lower)
  python tools/export_model.py export --config cfgs/finetune_classification/full/finetune_scan_hardest.yaml \
      --ckpts work_dirs/.../ckpt-best --dst model.actx

  # serve-side smoke: load the artifact and run a batch
  python tools/export_model.py run --src model.actx --batch 4
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def cmd_export(args):
    from act_tpu.utils.config import cfg_from_yaml_file
    from act_tpu.engine import export as ex

    config = cfg_from_yaml_file(args.config)
    if "npoints" not in config:  # pretrain yamls carry it per dataset split
        config.npoints = int(config.dataset.val.others.npoints)
    if args.smoke:
        # reuse the runners' smoke shrinks so the tiny dims stay consistent
        if args.kind == "classifier":
            from act_tpu.engine.runner_finetune import _apply_smoke
        elif args.kind in ("dvae", "tokenize"):
            from act_tpu.engine.runner_autoencoder import _apply_smoke
        else:
            from act_tpu.engine.runner_pretrain import _apply_smoke
        config = _apply_smoke(config)
        config.npoints = min(int(config.npoints), 256)
    batch = None if args.batch in (None, "sym") else int(args.batch)
    platforms = args.platforms.split(",") if args.platforms else None
    if args.kind == "classifier":
        exp = ex.export_classifier(config, ckpt_path=args.ckpts, batch=batch,
                                   n_in=args.n_in, with_fps=not args.no_fps,
                                   platforms=platforms, seed=args.seed)
        n_in = int(args.n_in or config.npoints)
    elif args.kind == "features":
        exp = ex.export_features(config, ckpt_path=args.ckpts, batch=batch,
                                 n_in=args.n_in, platforms=platforms,
                                 seed=args.seed)
        n_in = int(args.n_in or config.npoints)
    elif args.kind == "tokenize":
        exp = ex.export_dvae_tokenize(config, ckpt_path=args.ckpts,
                                      batch=batch, platforms=platforms,
                                      seed=args.seed)
        n_in = int(config.npoints)
    else:
        exp = ex.export_dvae_recon(config, ckpt_path=args.ckpts, batch=batch,
                                   platforms=platforms, seed=args.seed)
        n_in = int(config.npoints)
    meta = {"config": args.config, "ckpts": args.ckpts, "kind": args.kind,
            "npoints": int(config.npoints), "n_in": n_in}
    if args.kind == "classifier":
        meta["with_fps"] = not args.no_fps
    elif args.kind == "features":
        # features always FPS-resample when n_in != npoints (--no-fps n/a)
        meta["with_fps"] = n_in != int(config.npoints)
    ex.save_exported(exp, args.dst, meta=meta)
    print(f"wrote {args.dst} (+.json); input {exp.in_avals[0].shape} -> "
          f"output {exp.out_avals[0].shape}; platforms {list(exp.platforms)}")


def cmd_run(args):
    import numpy as np
    from act_tpu.engine.export import load_exported

    fn = load_exported(args.src)
    with open(args.src + ".json") as f:
        meta = json.load(f)
    n = args.n_in or int(meta.get("n_in") or meta.get("npoints", 1024))
    pts = np.random.default_rng(0).normal(size=(args.batch, n, 3))
    pts /= np.abs(pts).max()
    t0 = time.time()
    out = np.asarray(fn(pts))
    dt = time.time() - t0
    kind = meta.get("kind", "classifier")
    if kind == "classifier" and out.ndim == 2:
        print(f"logits {out.shape}  argmax {out.argmax(-1).tolist()}  "
              f"({dt:.2f}s incl. compile)")
    elif kind == "features":
        print(f"features {out.shape}  finite={bool(np.isfinite(out).all())}  "
              f"({dt:.2f}s incl. compile)")
    elif kind == "tokenize":
        print(f"tokens {out.shape}  vocab-range=[{out.min()}, {out.max()}]  "
              f"({dt:.2f}s incl. compile)")
    else:  # dvae reconstruction cloud
        print(f"recon {out.shape}  finite={bool(np.isfinite(out).all())}  "
              f"({dt:.2f}s incl. compile)")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    e = sub.add_parser("export")
    e.add_argument("--config", required=True)
    e.add_argument("--kind", default="classifier",
                   choices=["classifier", "features", "tokenize", "dvae"],
                   help="classifier logits, pretrain embedding features "
                        "(SVM-probe forward), discrete dVAE codebook ids, "
                        "or the Stage-I dVAE reconstruction forward")
    e.add_argument("--ckpts", default=None, help="orbax checkpoint dir")
    e.add_argument("--dst", required=True)
    e.add_argument("--batch", default="sym",
                   help="'sym' (default: symbolic batch dim) or a fixed int")
    e.add_argument("--n_in", type=int, default=None,
                   help="input point count (default: config.npoints)")
    e.add_argument("--no-fps", action="store_true",
                   help="skip the eval-protocol FPS resample")
    e.add_argument("--platforms", default=None,
                   help="comma list to cross-lower, e.g. 'cpu,tpu'")
    e.add_argument("--seed", type=int, default=0)
    e.add_argument("--smoke", action="store_true",
                   help="tiny model for pipeline checks")
    e.set_defaults(fn=cmd_export)

    r = sub.add_parser("run")
    r.add_argument("--src", required=True)
    r.add_argument("--batch", type=int, default=2)
    r.add_argument("--n_in", type=int, default=None)
    r.set_defaults(fn=cmd_run)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
