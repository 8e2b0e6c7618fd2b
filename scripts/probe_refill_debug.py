"""Debug probe: refill vs relaunch finals, field by field (interpret)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
from jax.experimental.pallas import tpu as pltpu

from adiabatic_raytracer_tpu.ops import tree

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
from test_treekernel import _cfg, _events, _finals, KEY, SC, TCFG  # noqa: E402

x, k_init, erg = _events(4)
os.environ["TREEK_LANES"] = "2"
with pltpu.force_tpu_interpret_mode():
    base = tree.forward_tree(KEY, x, k_init, erg, SC,
                             _cfg(tree_engine="kernel", interp_coarse=0),
                             TCFG, lnt_end=0.0)
    rf = tree.forward_tree(KEY, x, k_init, erg, SC,
                           _cfg(tree_engine="kernel", interp_coarse=0,
                                tree_refill=128, tree_refill_k=4),
                           TCFG, lnt_end=0.0)

for e in range(4):
    fa, fb = _finals(rf, e), _finals(base, e)
    print(f"event {e}: orders rf={sorted(fa)} base={sorted(fb)}")
    for o in sorted(set(fa) | set(fb)):
        ra, rb = fa.get(o), fb.get(o)
        if ra is None or rb is None:
            print(f"  o={o}: MISSING rf={ra is not None} base={rb is not None}")
            continue
        for nm in ("w", "prob", "pconv", "pconv0", "ferg", "t"):
            d = abs(ra[nm] - rb[nm])
            rel = d / max(abs(rb[nm]), 1e-300)
            flag = " <<<" if rel > 1e-3 else ""
            print(f"  o={o} {nm:6s} rf={ra[nm]:.9g} base={rb[nm]:.9g}"
                  f" rel={rel:.2e}{flag}")
        dp = np.max(np.abs(ra["fpos"] - rb["fpos"]))
        print(f"  o={o} fpos maxabs diff {dp:.3e}")
