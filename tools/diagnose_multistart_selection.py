"""Can chamfer selection identify the correct multi-start pose?

Measures, for a trained registration checkpoint, the aggregate rotation
error of ``serve.multistart_register``-style selection under several
candidate scoring norms vs the identity-start-only baseline, plus the
per-item (score gap, rot error) table for every item where a non-identity
start wins.

Finding (2026-08-20, r4b_ipcrnet @ ~20 deg mean error, 64 probe items,
K=8 octahedral starts):

| selector        | rot_deg | RMSE  | 180-deg flips |
|-----------------|---------|-------|---------------|
| identity only   | 19.54   | 28.56 | 0             |
| mean-sqrt       | 29.62   | 55.70 | 4             |
| mean-squared    | 31.53   | 59.89 | 5             |
| p90-sqrt        | 31.49   | 59.78 | 5             |
| max-sqrt        | 35.32   | 65.74 | 6             |

No chamfer norm separates the genuine attractor escapes (e.g. 18.1 ->
3.5 deg) from the symmetry disasters (37 -> 180 deg): the score gap of
the worst disaster (0.0118) EXCEEDS the gap of the best genuine escape
(0.0109), so no margin threshold works either. Root cause: a
well-refined 180-deg near-symmetry pose aligns the bulk of the cloud
better than the weak model's 30-50-deg-misaligned correct-basin output —
the class-keyed bumps only dominate the comparison once the in-basin
answer is itself well aligned. Multi-start selection is therefore
reliable only for converged models; see serve.rotation_starts docstring.

Run on CPU (forces the CPU backend; safe while a TPU campaign holds the
chip):  python tools/diagnose_multistart_selection.py [ckpt] [K] [items]
"""
import sys
import types

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
import jax.numpy as jnp
from flax import nnx


def main(ckpt="r4b_ipcrnet", n_starts=8, n_items=64, ckpt_dir="releases"):
    from examples.train import build_dataset, build_model
    from learning3d_tpu.data.device_pipeline import batch_iterator
    from learning3d_tpu.kernels.chamfer import chamfer_distance
    from learning3d_tpu.serve import rotation_starts
    from learning3d_tpu.train import TrainConfig, Trainer

    args = types.SimpleNamespace(
        model="ipcrnet", task="ipcrnet", batch_size=8, num_points=1024,
        emb_dims=1024, nearest_neighbors=20, noise=False, seed=1234,
        dataset_size=max(64, n_items), param_jitter=0.0, hard_cls=False,
        detail_amp=0.04, pcn_detailed=False, cls_noise=None, use_bn=False,
        num_iters=0, ckpt=ckpt, ckpt_dir=ckpt_dir, ckpt_name="best",
    )
    cfg = TrainConfig(exp_name=ckpt, task=args.task, batch_size=8,
                      num_points=1024, ckpt_dir=ckpt_dir)
    model = build_model(args.model, args, nnx.Rngs(args.seed))
    Trainer(cfg, model).load("best")
    model.eval()
    test_data = build_dataset(args, train=False)
    rots = rotation_starts(n_starts)
    gd, st = nnx.split(model)

    @jax.jit
    def ms_all(st, template, source):
        """Per-start composed transforms + raw squared chamfer arrays
        (same composition as serve.multistart_register, but returning
        the full per-point distances so every selector can be scored
        from one forward)."""
        m = nnx.merge(gd, st)
        Rs = jnp.asarray(rots, template.dtype)
        K, B = Rs.shape[0], template.shape[0]
        xyz = source[..., :3]
        c = xyz.mean(axis=1)
        rot = jnp.einsum("kij,bmj->kbmi", Rs, xyz - c[:, None, :]) + c[None, :, None, :]
        src_k = rot.reshape((K * B,) + rot.shape[2:])
        tmpl_k = jnp.broadcast_to(template[None], (K,) + template.shape).reshape(
            (K * B,) + template.shape[1:]
        )
        est = m(tmpl_k, src_k)["est_T"].reshape(K, B, 4, 4)
        Gt = c[None] - jnp.einsum("kij,bj->kbi", Rs, c)
        G = jnp.zeros((K, B, 4, 4), est.dtype)
        G = G.at[..., :3, :3].set(jnp.broadcast_to(Rs[:, None], (K, B, 3, 3)))
        G = G.at[..., :3, 3].set(Gt)
        G = G.at[..., 3, 3].set(1.0)
        total = est @ G
        moved = (
            jnp.einsum("kbij,bmj->kbmi", total[..., :3, :3], xyz)
            + total[..., :3, 3][:, :, None, :]
        )
        t_flat = jnp.broadcast_to(
            template[None, ..., :3], (K, B) + template.shape[1:-1] + (3,)
        ).reshape(K * B, template.shape[1], 3)
        d1, d2 = chamfer_distance(t_flat, moved.reshape(K * B, -1, 3))
        return d1.reshape(K, B, -1), d2.reshape(K, B, -1), total

    def rerr(est, igt):
        R = np.einsum("bij,bjk->bik", est[:, :3, :3], igt[:, :3, :3])
        tr = np.clip((np.trace(R, axis1=1, axis2=2) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(tr))

    d1s, d2s, totals, igts = [], [], [], []
    seen = 0
    for batch in batch_iterator(test_data, 8, shuffle=False, seed=0):
        template, source, igt = batch[0], batch[1], batch[2]
        d1, d2, total = ms_all(st, template, source)
        d1s.append(np.asarray(d1))
        d2s.append(np.asarray(d2))
        totals.append(np.asarray(total))
        igts.append(np.asarray(igt))
        seen += template.shape[0]
        if seen >= n_items:
            break

    sq = lambda d: np.sqrt(np.maximum(d, 1e-12))
    selectors = {
        "identity-only": lambda d1, d2: np.broadcast_to(
            np.where(np.arange(d1.shape[0])[:, None] == 0, -1e9, 0.0),
            d1.shape[:2],
        ).copy(),
        "mean-sqrt (serve.py)": lambda d1, d2: 0.5 * (sq(d1).mean(-1) + sq(d2).mean(-1)),
        "mean-squared": lambda d1, d2: 0.5 * (d1.mean(-1) + d2.mean(-1)),
        "p90-sqrt": lambda d1, d2: 0.5 * (
            np.percentile(sq(d1), 90, -1) + np.percentile(sq(d2), 90, -1)
        ),
        "max-sqrt": lambda d1, d2: 0.5 * (sq(d1).max(-1) + sq(d2).max(-1)),
    }
    for name, pick in selectors.items():
        errs = []
        for d1, d2, total, igt in zip(d1s, d2s, totals, igts):
            score = pick(d1, d2)
            for b in range(d1.shape[1]):
                k = int(score[:, b].argmin())
                errs.append(rerr(total[k : k + 1, b], igt[b : b + 1])[0])
        e = np.array(errs)
        print(
            f"{name:22s} rot_deg={e.mean():6.2f} RMSE={np.sqrt((e ** 2).mean()):6.2f} "
            f"flips>150deg={(e > 150).sum()}"
        )

    print("\nswitched items under mean-sqrt (item, k*, s_id, s_win, gap, "
          "rot_id, rot_win):")
    n = 0
    pick = selectors["mean-sqrt (serve.py)"]
    for d1, d2, total, igt in zip(d1s, d2s, totals, igts):
        score = pick(d1, d2)
        for b in range(d1.shape[1]):
            k = int(score[:, b].argmin())
            if k != 0:
                e0 = rerr(total[0:1, b], igt[b : b + 1])[0]
                ek = rerr(total[k : k + 1, b], igt[b : b + 1])[0]
                print(
                    f"{n:4d} k*={k} s_id={score[0, b]:.4f} s_win={score[k, b]:.4f} "
                    f"gap={score[0, b] - score[k, b]:.4f} rot_id={e0:7.2f} "
                    f"rot_win={ek:7.2f}"
                )
            n += 1


if __name__ == "__main__":
    a = sys.argv[1:]
    main(
        ckpt=a[0] if a else "r4b_ipcrnet",
        n_starts=int(a[1]) if len(a) > 1 else 8,
        n_items=int(a[2]) if len(a) > 2 else 64,
    )
