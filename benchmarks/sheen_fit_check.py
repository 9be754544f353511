"""Model-selection probe for the sheen LTC fit: fit two alpha rows of the
SGGX-slab reference under each candidate microflake model (specular vs
diffuse flakes) and compare (Ai, Bi, R) against the reference's fitted
table (parsed read-only, benchmarks/sheen_parity.py precedent).

Run ALONE on the TPU:  python benchmarks/sheen_fit_check.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from sheen_parity import load_ltc_table


def main():
    from hiprt_pt_tpu.utils.precompile import enable_persistent_cache

    enable_persistent_cache()
    from hiprt_pt_tpu.bake.sheen_ltc_fit import RES, fit_alpha_row

    ref = load_ltc_table()  # (32, 32, 3) — axes checked below
    import itertools

    flakes = os.environ.get("SHEEN_FLAKES", "specular,diffuse").split(",")
    thicks = [float(t) for t in
              os.environ.get("SHEEN_T", "0.5,1.0,2.0").split(",")]
    for flake, thick in itertools.product(flakes, thicks):
        for aj in (7, 23):  # alpha ~ 0.23, 0.73
            alpha = (aj + 0.5) / RES
            Ai, Bi, R, alive, loss = fit_alpha_row(
                jax.random.PRNGKey(100 + aj), jnp.float32(alpha),
                16384, flake=flake, steps=150,
                thickness=jnp.float32(thick))
            Ai, Bi, R = map(np.asarray, (Ai, Bi, R))
            # reference orientation: try both axis conventions, report the
            # better match (ROUND3: header comment contradicts the data)
            for tag, rrow in (("ref[cos,alpha]", ref[:, aj]),
                              ("ref[alpha,cos]", ref[aj, :])):
                dA = np.mean(np.abs(Ai - rrow[:, 0]))
                dB = np.mean(np.abs(Bi - rrow[:, 1]))
                dR = np.mean(np.abs(R - rrow[:, 2]))
                print(f"{flake} T={thick} a={alpha:.2f} vs {tag}: "
                      f"|dAi|={dA:.3f} |dBi|={dB:.3f} |dR|={dR:.3f}",
                      flush=True)
            mid = RES // 2
            print(f"  ours mid-cos: Ai={Ai[mid]:.3f} Bi={Bi[mid]:.3f} "
                  f"R={R[mid]:.3f}; R[cos0]={R[0]:.3f} R[cos1]={R[-1]:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
