"""One-shot repair of dmsp5k items written before the u0 grid fix.

The fused pipeline used to slice the IC profile ``u0`` to the saved-pickup
subset (16 nodes for train, 32 for valid/test) instead of keeping the full
fuse_Nx=256 training grid the model expects (tasks/simulate.py fix).  The
stored values are EXACT samples of the 256-grid profile at the positions
recorded in ``x``, so a cubic-spline (scipy) / linear (fallback)
reconstruction through those nodes recovers the profile; p_x (argmax)
is quantized to the node spacing (<= 1/32) and p_a (max) to within the
inter-node sag — small, and identical conventions across splits.

Idempotent: items whose u0 already spans >= 200 columns are skipped.
"""

import glob
import os
import sys

import numpy as np

try:
    from scipy.interpolate import CubicSpline
except Exception:  # pragma: no cover
    CubicSpline = None

FUSE_NX = 256


def reconstruct(x_nodes, u_nodes):
    xi = np.linspace(0.0, 1.0, FUSE_NX)
    # pin the clamped ends: saved pickup nodes often stop short of x=1, and
    # unanchored cubic extrapolation would overshoot there
    if x_nodes[0] > 0.0:
        x_nodes = np.concatenate([[0.0], x_nodes])
        u_nodes = np.concatenate([[0.0], u_nodes])
    if x_nodes[-1] < 1.0:
        x_nodes = np.concatenate([x_nodes, [1.0]])
        u_nodes = np.concatenate([u_nodes, [0.0]])
    if CubicSpline is not None and len(x_nodes) >= 4:
        f = CubicSpline(x_nodes, u_nodes, bc_type="natural")
        out = f(xi)
    else:
        out = np.interp(xi, x_nodes, u_nodes)
    out[0] = 0.0
    out[-1] = 0.0
    return out.astype(np.float64)


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "results/dmsp5k"
    fixed = skipped = 0
    for split in ("train", "valid", "test"):
        for d in sorted(glob.glob(os.path.join(root, split, "*"))):
            p = os.path.join(d, "parameters.npz")
            try:
                with np.load(p) as z:
                    rec = {k: z[k] for k in z.files}
            except Exception as err:
                print(f"[repair] unreadable {p}: {err}")
                continue
            u0 = np.asarray(rec["u0"])
            if u0.shape[-1] >= 200:
                skipped += 1
                continue
            x = np.asarray(rec["x"]).reshape(-1)
            rec["u0"] = reconstruct(x, u0.reshape(-1))[None, :]
            tmp = os.path.join(d, ".parameters.tmp.npz")
            np.savez(tmp, **rec)
            os.replace(tmp, p)
            fixed += 1
    print(f"[repair] fixed {fixed}, already-full {skipped}")


if __name__ == "__main__":
    main()
