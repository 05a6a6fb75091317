"""Root-cause + redesign check for the hard classification set.

Round-5 finding: at the round-4 defaults (corrugation frequency 6-14
cycles, detail_amp 0.04, per-point noise 0.025) EVERY model — PointNet,
DGCNN, CurveNet — trains AND tests at exactly the 4-way group-alias
ceiling (~0.25; docs/runs/r5_pointnet_hard.log, r5_dgcnn_hard.log,
r5_curvenet_hard.log): the within-group label signal is not merely hard,
it is statistically invisible. Two mechanisms, both frequency-driven:

1. Positional-noise phase decorrelation. The corrugation is a radial
   wave cos(2*pi*f*(r_hat . d) + phi). Gaussian point noise sigma
   displaces the OBSERVED direction r_hat by ~sigma, so the wave phase
   at the observed point is off by ~2*pi*f*sigma radians. At f~10,
   sigma=0.025 that is ~1.6 rad — the observed wave value is nearly
   independent of the true one, so even an EXACT matched filter (which
   knows d, f, phi) cannot recover the label.
2. Sampling aliasing. 1024 points on a unit sphere have mean spacing
   ~sqrt(4*pi/1024) ~ 0.11, while the wave's surface wavelength is
   1/f ~ 0.07-0.17: neighboring points are phase-uncorrelated, so no
   local neighborhood carries a coherent gradient for a learned model.

This tool measures (1) directly: within-group matched-filter accuracy
(the Bayes-ish upper bound for this family) as a function of frequency
band and amplitude, marginalizing over the train-time z-rotation
augmentation by scanning a rotation grid. The redesign drops the
frequency band to 2.0-4.5 cycles (phase error ~0.4 rad, wavelength
2-4x the point spacing) where the matched filter separates cleanly and
a learned local model has a recoverable signal.

Run: python tools/diagnose_hard_cls.py  (CPU, numpy only, ~1 min)
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def make_wave_params(label, freq_lo, freq_hi):
    drng = np.random.default_rng(777_000_001 + 101 * label)
    out = []
    for _ in range(3):
        d = drng.standard_normal(3).astype(np.float32)
        d /= np.linalg.norm(d) + 1e-9
        freq = freq_lo + (freq_hi - freq_lo) * drng.random()
        phase = 2 * np.pi * drng.random()
        camp = 0.7 + 0.6 * drng.random()
        out.append((d, freq, phase, camp))
    return out


def wave_field(radial, params):
    w = np.zeros((radial.shape[0],), np.float32)
    for d, f, p, a in params:
        w += (a / 3.0) * np.cos(2 * np.pi * f * (radial @ d) + p)
    return w


def zrot(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


def run_band(freq_lo, freq_hi, amp, noise=0.025, n_items=120, n_points=1024,
             group_size=4, apply_zrot=True, seed=0):
    """Matched-filter within-group classification accuracy.

    Items are unit-sphere clouds (the worst case: no global shape cue at
    all) corrugated with one of `group_size` label patterns, plus
    gaussian noise, plus an unknown z-rotation (the augmentation). The
    classifier scores each candidate label by the best correlation of
    the observed radial residual with the label's wave field over a
    36-point z-rotation grid — what an ideal rotation-marginalizing
    detector could do. Learned models are strictly weaker; if THIS
    fails, the benchmark is unlearnable.
    """
    rng = np.random.default_rng(seed)
    labels_params = [make_wave_params(k, freq_lo, freq_hi) for k in range(group_size)]
    thetas = np.linspace(0, 2 * np.pi, 36, endpoint=False)
    correct = 0
    for i in range(n_items):
        true = i % group_size
        u = rng.random(n_points).astype(np.float32)
        v = rng.random(n_points).astype(np.float32)
        theta0, phi0 = 2 * np.pi * u, np.arccos(2 * v - 1)
        radial = np.stack(
            [np.sin(phi0) * np.cos(theta0), np.sin(phi0) * np.sin(theta0), np.cos(phi0)],
            -1,
        ).astype(np.float32)
        r = 1.0 + amp * wave_field(radial, labels_params[true])
        pts = radial * r[:, None]
        pts += noise * rng.standard_normal(pts.shape).astype(np.float32)
        if apply_zrot:
            pts = pts @ zrot(rng.random() * 2 * np.pi).T
        obs_dir = pts / (np.linalg.norm(pts, axis=1, keepdims=True) + 1e-9)
        resid = np.linalg.norm(pts, axis=1) - 1.0
        resid -= resid.mean()
        scores = []
        for params in labels_params:
            best = -1e9
            for th in thetas:
                # candidate pattern evaluated in the un-rotated frame
                dirs = obs_dir @ zrot(th)
                w = wave_field(dirs, params)
                w -= w.mean()
                denom = np.linalg.norm(w) * np.linalg.norm(resid) + 1e-9
                best = max(best, float(w @ resid) / denom)
            scores.append(best)
        correct += int(np.argmax(scores) == true)
    return correct / n_items


def main():
    print("matched-filter within-group accuracy (chance = 0.25)")
    print(f"{'band':>12} {'amp':>6} {'acc':>6}  phase-err(rad) @f_mid, sigma=0.025")
    for lo, hi, amp in [
        (6.0, 14.0, 0.04),   # round-4 defaults — the broken config
        (6.0, 14.0, 0.08),   # amplitude alone cannot fix decorrelation
        (2.0, 4.5, 0.04),
        (2.0, 4.5, 0.06),
        (2.0, 4.5, 0.08),
    ]:
        acc = run_band(lo, hi, amp)
        fmid = 0.5 * (lo + hi)
        print(f"{lo:5.1f}-{hi:4.1f} {amp:6.02f} {acc:6.03f}  {2*np.pi*fmid*0.025:.2f}")


if __name__ == "__main__":
    main()
