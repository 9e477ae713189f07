"""One-process runner for every real-chip measurement job.

On this rig each python process that touches the TPU claims the single
tunnel session, and a fresh session's FIRST remote compile can wedge for
many minutes (docs/DESIGN.md §5). Once the first compile completes,
subsequent compiles flow normally — so the economical pattern is ONE
process that pays the wedge once and then runs every measurement job
back-to-back:

  python scripts/chip_session.py [profile] [calibrate] [bench_extra] [...]

Default (no args) = all jobs. Each job writes its usual artifact; failures
in one job don't stop the next.
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.append(_REPO)
_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
if _SCRIPTS not in sys.path:
    sys.path.append(_SCRIPTS)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    jobs = sys.argv[1:] or ["warm", "profile", "calibrate", "bench_extra"]

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(_REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # pay the first-compile wedge up front on a trivial program
    import jax.numpy as jnp
    import numpy as np

    t0 = time.time()
    log(f"devices: {jax.devices()}")
    np.asarray(jax.jit(lambda x: x * 2.0 + 1.0)(jnp.ones((8, 8))))
    log(f"first compile through: {time.time()-t0:.1f}s")

    for job in jobs:
        t0 = time.time()
        log(f"=== job: {job} ===")
        try:
            if job == "warm":
                continue
            elif job == "profile":
                import profile_grouped

                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    profile_grouped.main([])
                with open(os.path.join(_REPO, "PROF_GROUPED.json"), "w") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "pallas_tiles":
                # retry the fused Pallas chain at LARGER tiles (round-3
                # blocker: Mosaic compile >20 min at (256,512); (192,256)
                # and (256,256) untried). Compile under a wall-clock budget;
                # if a tile compiles, slope-time it vs the XLA path.
                import numpy as np_
                import jax.numpy as jnp

                from traversability_estimation_tpu.ops import (
                    filters as F,
                    pallas_chain as PC,
                    veto as V,
                )
                from traversability_estimation_tpu.utils.profiling import (
                    adaptive_slope,
                )

                rng = np_.random.default_rng(1)
                H = W = 336
                el = (0.1 * rng.standard_normal((H, W))).astype(np_.float32)
                el[rng.random((H, W)) < 0.01] = np_.nan
                elev = jnp.asarray(el)
                ccfg = F.ChainConfig(resolution=0.03)
                vcfg = V.VetoConfig(resolution=0.03, check_roughness=False)
                out_rows = []
                for tile in ((128, 128), (192, 256), (256, 256)):
                    t0 = time.time()
                    try:
                        got = PC.fused_update(elev, ccfg, vcfg, tile)
                        import jax as _jax

                        _jax.block_until_ready(got["traversability"])
                        t_compile = time.time() - t0

                        def make(k, tile=tile):
                            import jax as _j

                            @_j.jit
                            def loop(e):
                                def body(c, _):
                                    o = PC.fused_update(c, ccfg, vcfg, tile)
                                    acc = jnp.zeros_like(c)
                                    for vv in o.values():
                                        acc = acc + (
                                            jnp.nan_to_num(vv)
                                            if jnp.issubdtype(
                                                vv.dtype, jnp.floating
                                            )
                                            else vv.astype(jnp.float32)
                                        )
                                    return c + 1e-12 * acc, None

                                c, _ = _j.lax.scan(body, e, None, length=k)
                                return c[0, 0]

                            return loop

                        t = adaptive_slope(make, elev, 8, 24, 6e-3, log=log)
                        row = {"tile": list(tile),
                               "compile_s": round(t_compile, 1),
                               "t_ms": round(t * 1e3, 4)}
                    except Exception as e:  # noqa: BLE001
                        row = {"tile": list(tile),
                               "error": f"{type(e).__name__}: {e}"[:200]}
                    log(f"pallas tile {tile}: {row}")
                    out_rows.append(row)
                import json as _json

                with open(os.path.join(_REPO, "ABLATE_last.json"), "a") as f:
                    for r in out_rows:
                        f.write(_json.dumps(
                            {"exp": "E10_pallas_tiles", "size": H, **r}
                        ) + "\n")
            elif job == "bigmap":
                import profile_bigmap

                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    profile_bigmap.main([])
                with open(os.path.join(_REPO, "PROF_BIGMAP.json"), "w") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "pallas_smoke":
                # the Pallas fused kernel reuses ops/veto compute inside its
                # Mosaic body — confirm the (non-production) kernel still
                # lowers + matches XLA after veto/step rewrites
                import jax.numpy as jnp
                import numpy as np_

                from traversability_estimation_tpu.ops import (
                    filters as F,
                    pallas_chain as PC,
                    veto as V,
                )

                rng = np_.random.default_rng(5)
                el = (0.1 * rng.standard_normal((128, 128))).astype(np_.float32)
                el[rng.random((128, 128)) < 0.05] = np_.nan
                ccfg = F.ChainConfig(resolution=0.03)
                vcfg = V.VetoConfig(resolution=0.03, check_roughness=False)
                got = PC.fused_update(jnp.asarray(el), ccfg, vcfg)
                ref_l = F.run_chain_jit(jnp.asarray(el), ccfg)
                ref_v = V.compute_veto_fields_jit(
                    {
                        "elevation": jnp.asarray(el),
                        "traversability_slope": ref_l["traversability_slope"],
                        "traversability_step": ref_l["traversability_step"],
                    },
                    vcfg,
                )
                ok = bool(
                    np_.array_equal(
                        np_.asarray(got["traversable_mask"]),
                        np_.asarray(ref_v["traversable_mask"]),
                    )
                )
                log(f"pallas fused_update mask parity vs XLA: {ok}")
                if not ok:
                    raise RuntimeError("pallas parity broke")
            elif job == "ablate11":
                # E11 only (walk candidate-combine variants), appended
                import ablate_update
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    ablate_update.main(
                        ["--skip", "E1", "E2", "E3", "E4", "E5", "E6", "E7",
                         "E8"]
                    )
                with open(os.path.join(_REPO, "ABLATE_last.json"), "a") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "ablate8":
                # E8 only (count-veto variants), appended to ABLATE_last
                import ablate_update
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    ablate_update.main(
                        ["--skip", "E1", "E2", "E3", "E4", "E5", "E6", "E7"]
                    )
                with open(os.path.join(_REPO, "ABLATE_last.json"), "a") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "ablate":
                import ablate_update
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    ablate_update.main([])
                with open(os.path.join(_REPO, "ABLATE_last.json"), "w") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "calibrate":
                import calibrate_sol
                import contextlib
                import io

                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    calibrate_sol.main([])
                # committed artifact: per-stage SoL calibration rows backing
                # the pct_sol claims (README / DESIGN.md §6)
                with open(os.path.join(_REPO, "CALIB_last.json"), "w") as f:
                    f.write(buf.getvalue())
                log(buf.getvalue())
            elif job == "bench_extra":
                import collect_bench_extra

                collect_bench_extra.main([])
            elif job == "bench":
                import bench

                bench.main()
            else:
                log(f"unknown job {job!r}")
        except Exception as e:  # noqa: BLE001 — keep running the other jobs
            log(f"job {job} FAILED: {type(e).__name__}: {e}")
        log(f"=== job {job} done in {time.time()-t0:.1f}s ===")


if __name__ == "__main__":
    main()
