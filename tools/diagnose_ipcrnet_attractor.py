"""Round-5 iPCRNet root-cause: the chamfer wrong-pose attractor.

Evidence from training (docs/runs/r5_ipcrnet.log, the classifier warm
start; and docs/runs/registration_ipcrnet_synthetic.log, the r4b cold
run): test chamfer DECREASES monotonically while rot_deg JUMPS from
~42deg to ~70-100deg at epoch ~7 and never returns — i.e. the optimizer
finds chamfer-lower solutions that are pose-worse, and best-checkpoint
selection by test chamfer then packages the wrong-pose model.

This tool measures the underlying loss landscape directly: symmetric
chamfer between a synthetic-ModelNet40 cloud and a copy rotated by
theta about generic axes, as a function of theta. If chamfer(theta)
were monotone in [0, 180], pose error could not decouple from loss.
It is not: the class-keyed bumps make chamfer rise steeply only in a
~30deg cone around identity and go FLAT (with shallow local minima)
beyond — a gradient basin of attraction of only ~30deg. iPCRNet's
training distribution draws XYZ Euler angles +-45deg/axis (compound
rotations up to ~78deg), so most early-training pairs start OUTSIDE
the basin: the chamfer gradient then pulls the estimate toward
whatever shallow far-pose minimum is nearest, and the network learns
to predict those attractor poses (lowest EXPECTED chamfer over the
far-pose majority), which is exactly the ~0.087-loss/~70deg fixed
point both runs hit.

Fix (implemented round 5): (a) transform-magnitude curriculum —
TrainConfig.curriculum_epochs ramps the train loader's magnitudes
0.2 -> 1.0 so early training stays inside the basin and the network
first learns the identity-cone regression, which then composes over
its 8 unrolled iterations to handle full magnitudes (each iteration
only needs to shrink the residual, and a correct small-angle map is a
contraction); (b) best_metric=rot_deg checkpoint selection, so a
chamfer-flat wrong-pose solution can never be packaged as "best".

Run: python tools/diagnose_ipcrnet_attractor.py  (CPU, ~1 min)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def chamfer(a, b):
    d = np.linalg.norm(a[:, None] - b[None], axis=-1)
    return d.min(1).mean() + d.min(0).mean()


def main():
    from scipy.spatial.transform import Rotation

    from learning3d_tpu.data import SyntheticModelNet40

    ds = SyntheticModelNet40(num_points=512, size=64)
    rng = np.random.default_rng(0)
    thetas = np.arange(0, 181, 7.5)
    curves = []
    for idx in range(0, 12):
        pts, _ = ds[idx]
        axis = rng.standard_normal(3)
        axis /= np.linalg.norm(axis)
        row = []
        for th in thetas:
            R = Rotation.from_rotvec(np.deg2rad(th) * axis).as_matrix()
            row.append(chamfer(pts, pts @ R.T))
        curves.append(row)
    curves = np.asarray(curves)
    mean = curves.mean(0)
    print("theta(deg)  mean symmetric chamfer over 12 clouds")
    for th, c in zip(thetas, mean):
        print(f"{th:8.1f}  {c:.4f}")
    # basin width: last theta from 0 where the curve is still steep
    # (slope >= 25% of the initial slope)
    slopes = np.diff(mean) / np.diff(thetas)
    steep = slopes >= 0.25 * slopes[0]
    basin_end = thetas[1:][np.argmin(steep)] if not steep.all() else thetas[-1]
    plateau = mean[thetas >= 90].mean()
    print(f"\ngradient basin ends around ~{basin_end:.0f} deg "
          f"(chamfer plateaus at ~{plateau:.3f} beyond ~90 deg)")
    # fraction of iPCRNet training pairs whose compound rotation starts
    # outside the basin (XYZ euler +-45deg/axis)
    e = rng.uniform(-np.pi / 4, np.pi / 4, (20000, 3))
    ang = np.linalg.norm(Rotation.from_euler("XYZ", e).as_rotvec(), axis=-1)
    frac = float(np.mean(np.rad2deg(ang) > basin_end))
    print(f"fraction of +-45deg/axis training pairs starting outside the "
          f"basin: {frac:.2f}")

    # The mean curve hides the real attractors: the primitives have
    # near-self-symmetry maps (ellipsoid/box 180deg flips, cylinder/cone
    # axis rotations) that the class-keyed bumps only partially break —
    # search each cloud over random far-from-identity rotations for its
    # lowest wrong-pose chamfer. These minima are what the trained runs
    # converge to (loss ~0.087 at rot ~70-100deg).
    print("\nper-cloud best WRONG-pose minimum (search over 4000 random "
          "rotations with angle > 30 deg):")
    print(" idx kind  best_chamfer  at_angle(deg)")
    Rs = Rotation.random(4000, rng=rng)
    angs = np.rad2deg(np.linalg.norm(Rs.as_rotvec(), axis=-1))
    keep = angs > 30
    mats, angs = Rs.as_matrix()[keep], angs[keep]
    worst_best = 0.0
    for idx in range(8):
        pts, label = ds[idx]
        best_c, best_a = 1e9, 0.0
        for R, a in zip(mats, angs):
            c = chamfer(pts, pts @ R.T)
            if c < best_c:
                best_c, best_a = c, a
        worst_best = max(worst_best, best_c)
        print(f"{idx:4d} {int(label) % 4:4d}  {best_c:12.4f}  {best_a:10.1f}")
    print(f"\nevery cloud admits wrong-pose solutions with chamfer "
          f"<= {worst_best:.3f} (sampled UPPER bounds — the model's 8 "
          f"gradient-refined iterations land deeper in these minima), "
          f"while the gt pose has chamfer 0 (exact correspondence). The "
          f"trained runs' ~0.087 mean loss at ~70-100deg rot error is a "
          f"mixture of correctly-aligned pairs and pairs captured by "
          f"these 40-180deg near-symmetry attractors.")


if __name__ == "__main__":
    main()
