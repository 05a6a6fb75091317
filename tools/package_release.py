#!/usr/bin/env python
"""Package trained checkpoints into the releases/ directory.

The reference ships per-model pretrained checkpoints
(/root/reference/README.md:47-60). Upstream blobs are stripped in this
environment, so the release artifacts are trained-on-synthetic orbax
checkpoints (one per task family) plus the conversion CLI
(tools/convert_checkpoint.py) for users bringing reference .t7 files.

Every release entry names its eval log (docs/runs/...) and the manifest
embeds that log's metric lines, so a release hint can never silently
contradict the recorded eval (round-4 shipped a diverged rpmnet under a
converged-sounding hint — never again). Entries whose eval log is
missing or metric-free are marked "eval": "UNVERIFIED" and flagged on
stdout.

Usage: python tools/package_release.py [--ckpt_dir checkpoints] [--out releases]
Copies <ckpt_dir>/<exp>/<best|latest> for every --exp, prunes release
dirs that are no longer in the map, writes the manifest and a README.
"""

import argparse
import json
import re
import shutil
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_EXPS = {
    # exp_name: (model, task, load hint, eval log under docs/runs/)
    "r3c_dcp": (
        "dcp", "dcp",
        "rigid registration (per-epoch pair resampling + symmetry-broken synthetic set)",
        "r3c_dcp_eval.log",
    ),
    "r3c_deepgmr": (
        "deepgmr", "deepgmr", "GMM registration (on-device RRI)",
        "r3c_deepgmr_eval.log",
    ),
    "r4_prnet": (
        "prnet", "prnet",
        "partial-to-partial registration, 1024->768 (85-epoch extended run)",
        # the round-5 G4 extension re-evals into r5_prnet_eval.log; the
        # 60-epoch eval (r4_prnet_eval.log) is superseded by it
        "r5_prnet_eval.log",
    ),
    "r4_pnlk": (
        "pointnetlk", "pointnetlk",
        "IC-LK registration (classifier-transferred PointNet features)",
        "r4_pnlk_eval.log",
    ),
    "r4_pointnet_cls": (
        "pointnet", "classification",
        "40-class classification (augment + label-smoothing recipe; exported "
        "feature_model for transfer)",
        "r4_pointnet_cls_eval.log",
    ),
    "r4_pcn": (
        "pcn", "pcn", "point-cloud completion (coarse + folding)",
        "r5_pcn_eval.log",
    ),
    "r4_flownet": (
        "flownet", "flow", "scene-flow estimation",
        "r5_flownet_eval.log",
    ),
    # campaign v3 retrains (root-cause fixes: svd3 grad guards + normals,
    # masknet BCE, ipcrnet long schedule, enlarged-set classifiers).
    # These SUPERSEDE the diverged r4_rpmnet / stuck r4_masknet, which are
    # deliberately absent from this map (round-4 VERDICT weak #2).
    "r4b_rpmnet": (
        "rpmnet", "rpmnet", "RPM registration w/ PCA normals (gradient-safe Kabsch)",
        "r4b_rpmnet_eval.log",
    ),
    "r4b_masknet": (
        "masknet", "masknet",
        "inlier mask estimation (BCE recipe past the sigmoid saturation)",
        "r4b_masknet_eval.log",
    ),
    "r4b_ipcrnet": (
        "ipcrnet", "ipcrnet", "iterative registration, 220-epoch schedule",
        "r4b_ipcrnet_eval.log",
    ),
    "r4b_curvenet": (
        "curvenet", "classification",
        "CurveNet classification (size=6144 + param_jitter=0.08 synthetic set)",
        "r4b_curvenet_eval.log",
    ),
    "r4b_pointnet_cls": (
        "pointnet", "classification",
        "PointNet classification on the same enlarged set (ordering control)",
        "r4b_pointnet_cls_eval.log",
    ),
    # round-5 records (v2): the r5_* first attempts are deliberately
    # absent — the warm-started r5_ipcrnet converged to the chamfer
    # wrong-pose attractor (docs/runs/r5_ipcrnet_eval.log, 73.7deg;
    # root cause: tools/diagnose_ipcrnet_attractor.py) and the first
    # hard-cls band (6-14 cycles) was unlearnable for every model
    # (tools/diagnose_hard_cls.py). r5b_* are the fixed-recipe runs:
    # transform-magnitude curriculum + rot_deg best-checkpoint selection
    # for iPCRNet, corrugation band 2.0-4.5 for the ordering benchmark.
    "r5b_ipcrnet": (
        "ipcrnet", "ipcrnet",
        "iterative registration (transform-magnitude curriculum recipe)",
        "r5b_ipcrnet_eval.log",
    ),
    "r5b_pointnet_hard": (
        "pointnet", "classification",
        "PointNet on the hard synthetic set (ordering benchmark, --hard_cls)",
        "r5b_pointnet_hard_eval.log",
    ),
    "r5b_dgcnn_hard": (
        "dgcnn-cls", "classification",
        "DGCNN on the hard synthetic set (ordering benchmark, --hard_cls)",
        "r5b_dgcnn_hard_eval.log",
    ),
    "r5b_curvenet_hard": (
        "curvenet", "classification",
        "CurveNet on the hard synthetic set (ordering benchmark, --hard_cls)",
        "r5b_curvenet_hard_eval.log",
    ),
    # same-set ordering run: G1's r5b_pointnet_hard trained at amp 0.04
    # before the 0.08 difficulty decision; r5c re-runs PointNet at the
    # ordering set's amp so the 3-way comparison shares one distribution
    "r5c_pointnet_hard": (
        "pointnet", "classification",
        "PointNet on the hard synthetic set at detail_amp 0.08 (ordering row)",
        "r5c_pointnet_hard_eval.log",
    ),
    "r5_pcn_detailed": (
        "pcn", "pcn",
        "completion with the folding fine decoder trained (--pcn_detailed)",
        "r5_pcn_detailed_eval.log",
    ),
}

# lines that count as "the eval recorded real numbers"
_METRIC_RE = re.compile(
    r"^(test_loss=|Stage: test|bf16_acc=|int8-ptq |int8-pv )"
)

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
tr = Trainer(TrainConfig(exp_name="r3c_dcp", task="dcp", ckpt_dir="releases"),
             model, loss_fn=lambda *a: (0.0, {}))
tr.load("best")
```

or via the CLI: `python examples/evaluate.py --model dcp --task dcp \\
--ckpt r3c_dcp --ckpt_dir releases`.

Converting a reference PyTorch checkpoint instead:
`python tools/convert_checkpoint.py --model pointnet --torch_ckpt model.t7`.

Every entry's `eval` field in manifest.json is extracted verbatim from
the named eval log — if it says UNVERIFIED, treat the checkpoint as
unvalidated.

## Contents
"""


def eval_metrics(log_path: Path) -> list[str]:
    """Metric lines of an eval log (empty list = unverified)."""
    if not log_path.exists():
        return []
    return [
        ln.strip()
        for ln in log_path.read_text().splitlines()
        if _METRIC_RE.match(ln.strip())
    ]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt_dir", default="checkpoints")
    p.add_argument("--out", default="releases")
    p.add_argument("--exps", nargs="*", default=list(DEFAULT_EXPS))
    args = p.parse_args()
    out = Path(args.out)
    out.mkdir(exist_ok=True)
    runs = Path("docs/runs")
    lines = [README_TMPL]
    manifest = {}
    unverified = []
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
        model, task, hint, eval_log = DEFAULT_EXPS.get(exp, ("?", "?", "", ""))
        entry = {"model": model, "task": task, "checkpoint": name, "hint": hint}
        metrics = eval_metrics(runs / eval_log) if eval_log else []
        entry["eval_log"] = f"docs/runs/{eval_log}" if eval_log else ""
        entry["eval"] = metrics if metrics else "UNVERIFIED"
        if not metrics:
            unverified.append(exp)
        manifest[exp] = entry
        meta = src / name / "meta.json"
        if meta.exists():
            # carry the dataset-version tag into the manifest (ADVICE r3):
            # evals against a different synthetic distribution don't compare
            dv = json.loads(meta.read_text()).get("dataset_version")
            if dv:
                entry["dataset_version"] = dv
        lines.append(f"- **{exp}** — {hint} (`--model {model} --task {task}`, ckpt `{name}`)")
        if metrics:
            lines.append("  eval (`" + entry["eval_log"] + "`):\n  ```\n  "
                         + "\n  ".join(metrics) + "\n  ```")
        else:
            lines.append("  eval: **UNVERIFIED** (no metric lines in "
                         f"`{entry['eval_log'] or '<none>'}`)")
        if tail:
            lines.append(f"  final training log lines:\n  ```\n  {tail.strip()}\n  ```")
    # prune stale release dirs (e.g. checkpoints dropped from the map for
    # shipping broken weights) so nothing loads garbage labeled as gold
    keep = set(manifest) | {"README.md", "manifest.json"}
    for child in out.iterdir():
        if child.name not in keep and child.is_dir():
            print(f"prune stale release {child.name}")
            shutil.rmtree(child)
    (out / "README.md").write_text("\n".join(lines) + "\n")
    (out / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"packaged {len(manifest)} checkpoints into {out}/")
    if unverified:
        print("UNVERIFIED (eval log missing or metric-free): " + ", ".join(unverified))


if __name__ == "__main__":
    main()
