#!/usr/bin/env python
"""Package trained checkpoints into the releases/ directory.

The reference ships per-model pretrained checkpoints
(/root/reference/README.md:47-60). Upstream blobs are stripped in this
environment, so the release artifacts are trained-on-synthetic orbax
checkpoints (one per task family) plus the conversion CLI
(tools/convert_checkpoint.py) for users bringing reference .t7 files.

Usage: python tools/package_release.py [--ckpt_dir checkpoints] [--out releases]
Copies <ckpt_dir>/<exp>/<best|latest> for every --exp, writes a manifest
with the training log tail, and a README with loading instructions.
"""

import argparse
import json
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_EXPS = {
    # exp_name: (model, task, load hint)
    "r3c_dcp": (
        "dcp", "dcp",
        "rigid registration (per-epoch pair resampling + symmetry-broken synthetic set)",
    ),
    "r3c_deepgmr": ("deepgmr", "deepgmr", "GMM registration (on-device RRI)"),
    "r4_prnet": ("prnet", "prnet", "partial-to-partial registration, 1024->768 (fixed pipeline)"),
    "r4_ipcrnet": ("ipcrnet", "ipcrnet", "iterative registration (post-identifiability-fix retrain)"),
    "r4_rpmnet": ("rpmnet", "rpmnet", "RPM registration w/ normals (2-iteration training recipe)"),
    "r4_pnlk": ("pointnetlk", "pointnetlk", "IC-LK registration (classifier-transferred PointNet features)"),
    "r4_masknet": ("masknet", "masknet", "inlier mask estimation (long run past the 0.5 plateau)"),
    "r4_pointnet_cls": ("pointnet", "classification", "40-class classification (augment + label-smoothing recipe; exported feature_model for transfer)"),
    "r4_pcn": ("pcn", "pcn", "point-cloud completion (coarse + folding)"),
    "r4_flownet": ("flownet", "flow", "scene-flow estimation"),
    "r4_curvenet": ("curvenet", "classification", "CurveNet classification (enlarged shape-jittered synthetic set, original SGD recipe)"),
    # campaign v3 retrains (root-cause fixes: svd3 grad guards + normals,
    # masknet BCE, ipcrnet long schedule, enlarged-set classifiers)
    "r4b_rpmnet": ("rpmnet", "rpmnet", "RPM registration w/ PCA normals (gradient-safe Kabsch)"),
    "r4b_masknet": ("masknet", "masknet", "inlier mask estimation (BCE recipe past the sigmoid saturation)"),
    "r4b_ipcrnet": ("ipcrnet", "ipcrnet", "iterative registration, 220-epoch schedule"),
    "r4b_curvenet": ("curvenet", "classification", "CurveNet classification (size=6144 + param_jitter=0.08 synthetic set)"),
    "r4b_pointnet_cls": ("pointnet", "classification", "PointNet classification on the same enlarged set (ordering control)"),
    "r4b_dgcnn_cls": ("dgcnn-cls", "classification", "DGCNN classification on the same enlarged set (completes the 3-way ordering)"),
}

README_TMPL = """# releases — trained checkpoints

Trained-on-synthetic orbax checkpoints, one per task family (ModelNet40
is not downloadable in the build environment; the synthetic protocol and
the full training logs live in docs/runs/). Loading:

```python
from flax import nnx
from examples.train import build_model
from learning3d_tpu.train import TrainConfig, Trainer
import argparse

args = argparse.Namespace(emb_dims=1024, nearest_neighbors=20, num_points=1024)
model = build_model("dcp", args, nnx.Rngs(0))
tr = Trainer(TrainConfig(exp_name="r3_dcp", task="dcp", ckpt_dir="releases"),
             model, loss_fn=lambda *a: (0.0, {}))
tr.load("best")
```

or via the CLI: `python examples/evaluate.py --model dcp --task dcp \\
--ckpt r3_dcp --ckpt_dir releases`.

Converting a reference PyTorch checkpoint instead:
`python tools/convert_checkpoint.py --model pointnet --torch_ckpt model.t7`.

## Contents
"""


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--out", default="releases")
    p.add_argument("--exps", nargs="*", default=list(DEFAULT_EXPS))
    args = p.parse_args()
    out = Path(args.out)
    out.mkdir(exist_ok=True)
    lines = [README_TMPL]
    manifest = {}
    for exp in args.exps:
        src = Path(args.ckpt_dir) / exp
        name = "best" if (src / "best").exists() else "latest"
        if not (src / name).exists():
            print(f"skip {exp}: no checkpoint under {src}")
            continue
        dst = out / exp
        if dst.exists():
            shutil.rmtree(dst)
        dst.mkdir(parents=True)
        shutil.copytree(src / name, dst / name)
        run_log = src / "run.log"
        tail = ""
        if run_log.exists():
            tail = "".join(run_log.read_text().splitlines(keepends=True)[-3:])
            shutil.copy(run_log, dst / "run.log")
        model, task, hint = DEFAULT_EXPS.get(exp, ("?", "?", ""))
        manifest[exp] = {"model": model, "task": task, "checkpoint": name, "hint": hint}
        meta = src / name / "meta.json"
        if meta.exists():
            # carry the dataset-version tag into the manifest (ADVICE r3):
            # evals against a different synthetic distribution don't compare
            dv = json.loads(meta.read_text()).get("dataset_version")
            if dv:
                manifest[exp]["dataset_version"] = dv
        lines.append(f"- **{exp}** — {hint} (`--model {model} --task {task}`, ckpt `{name}`)")
        if tail:
            lines.append(f"  final log lines:\n  ```\n  {tail.strip()}\n  ```")
    (out / "README.md").write_text("\n".join(lines) + "\n")
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"packaged {len(manifest)} checkpoints into {out}/")


if __name__ == "__main__":
    main()
