"""Round-4 probe: split vs stacked skybox_quad tables + fallback lane census.

The config4/5 op traces (/tmp/r7batch1.log) showed a ~1.9 ms/frame fusion
producing three (1, 25165824) u32 tables: slicing the stacked (3, 6HW)
``skybox_quad`` jit INPUT re-materializes all three channel tables every
frame. Three candidate layouts (``sample_cubemap_u32_quad`` accepts all):
``stacked`` (3, 6HW) sliced per channel (the relayout), ``split`` a tuple
of three flat arrays, ``flat`` ONE (3·6HW,) array indexed at c·6HW+idx.
Measured same-session (one leg per process): split won config5 by 0.6 ms
but REGRESSED config4 by ~6 (two independent readings, 116.4/117.2 vs
110.9) — the relayout's T(1,128)-tiled copies apparently gather faster
at config4's larger fallback budget; ``flat`` is the tie-breaker probe.

ONE LEG PER PROCESS: DEBUG_NBAD and the quad layout do not change jit
input shapes for the tuple path, so a second leg in the same process
would silently reuse the first leg's executable (module globals are
baked in at trace time).

    python tools/r7_skyquad_ab.py <preset> <nbad|lanes|stacked|split|flat>
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raytpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from raytpu.integrator import render_frame
from raytpu.ops import sky_mxu
from raytpu.presets import load_preset_scene
from raytpu.render import Renderer
from raytpu.utils import measure_frame


def main():
    preset, leg = sys.argv[1], sys.argv[2]
    print("backend:", jax.devices()[0].platform, flush=True)
    t0 = time.perf_counter()
    sc = load_preset_scene(preset)
    rr = Renderer(sc)
    rr.set_transforms(0.0)
    cam = jnp.asarray(rr.camera.basis())
    dev = rr.device_scene
    out = {"leg": leg}
    if leg in ("nbad", "lanes"):
        sky_mxu.DEBUG_NBAD = leg
        f = render_frame(dev, rr.static, rr.render_static, cam)
        out[leg] = int(float(f.max()))
    else:
        # explicit per-leg layout (the BUILD default is per-scene since
        # the spp>1→stacked / spp=1→tuple heuristic landed); "asbuilt"
        # keeps the scene's own choice — use it for non-layout A/Bs
        # (e.g. tools/r8_leafwide.sh) so each preset rides its best
        q = dev.skybox_quad
        if not isinstance(q, tuple):
            q = tuple(q.reshape(3, -1)[c] for c in range(3))
        if leg == "stacked":
            dev = dev._replace(skybox_quad=jnp.stack(q))
        elif leg == "split":
            dev = dev._replace(skybox_quad=q)
        elif leg == "flat":
            dev = dev._replace(skybox_quad=jnp.concatenate(q))
        elif leg != "asbuilt":
            raise SystemExit(f"unknown leg {leg!r}")

        def frame(dev=dev, rr=rr, cam=cam):
            return render_frame(dev, rr.static, rr.render_static, cam)

        mean_s, _ = measure_frame(frame, warmup=1, iters=20)
        out["frame_ms"] = round(mean_s * 1e3, 2)
    out["t"] = round(time.perf_counter() - t0, 1)
    print(json.dumps({preset: out}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
