"""Wedge-source experiment (VERDICT r4 #6): does SIGKILL mid-dispatch wedge?

Round 3 and 4 both lost their driver bench to a wedged device; CLAUDE.md's
candidate list included "a killed-mid-dispatch client" (the driver's
timeout kills bench.py with the device mid-flight). This harness names the
cause by reproducing it deliberately, with hours of recovery margin:

  1. spawn a child that runs a LONG single dispatch (a chained-frame
     fori_loop of the quarter trace kernel, ~60+ s of device time in ONE
     execute call) and prints a marker the moment it dispatches;
  2. SIGKILL the child mid-dispatch;
  3. probe the device (tiny jit, 120 s timeout) from this process and
     report healthy / wedged.

Usage: python benchmarks/r5_wedge_probe.py [kill_after_s] [term|kill]

(`timeout` — what the driver uses — sends SIGTERM, which runs Python and
PJRT teardown with the device mid-flight; SIGKILL skips teardown. The
two can differ in wedge behavior, so both are testable.)
"""

import os
import pathlib
import signal
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

CHILD = r"""
import sys, time
sys.path.insert(0, "@ROOT@")
import numpy as np, jax, jax.numpy as jnp
import bench
from grace_tpu.build.sph import build_sph_tree
from grace_tpu.rays.gen import orthographic_projection_rays, spatial_sort_rays
from grace_tpu.trace.pallas_kernel import pallas_trace_sph
from grace_tpu.core.types import Rays

bench.enable_compilation_cache()
rng = np.random.default_rng(2026)
spheres = jnp.asarray(bench.make_clustered_particles(rng, 1 << 20))
ss, tree, _ = jax.jit(lambda s: build_sph_tree(s, 32))(spheres)
rays = orthographic_projection_rays(512, 512, bench.CAM, bench.LOOK,
                                    bench.UP, bench.VEXT, bench.LENGTH)
rays_s, _, _ = jax.jit(spatial_sort_rays)(rays)

def body(i, acc):
    rr = Rays(rays_s.origins, rays_s.directions, rays_s.lengths + acc * 1e-38)
    v, _ = pallas_trace_sph(rr, ss, tree, tile=128, broadphase="quarter",
                            unroll=8)
    return acc + v[0] * 1e-38 + 1.0

f = jax.jit(lambda k, x: jax.lax.fori_loop(0, k, body, x))
# warm compile with a short chain (finishes fast)
print("CHILD: compiling", flush=True)
float(f(jnp.int32(2), jnp.float32(0.0)))
print("CHILD: dispatching long chain", flush=True)
t0 = time.time()
v = float(f(jnp.int32(2000), jnp.float32(0.0)))  # ~2000 x 35 ms ~ 70 s
print(f"CHILD: finished ({time.time()-t0:.1f}s, v={v})", flush=True)
""".replace("@ROOT@", str(pathlib.Path(__file__).resolve().parents[1]))

PROBE = r"""
import time, sys
t0 = time.time()
import jax, jax.numpy as jnp
f = jax.jit(lambda a: (a @ a).sum())
print("PROBE:", float(f(jnp.ones((256, 256)))), f"{time.time()-t0:.1f}s",
      flush=True)
"""


def probe(timeout_s=130):
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", PROBE], timeout=timeout_s,
                           capture_output=True, text=True)
        ok = r.returncode == 0 and "PROBE:" in r.stdout
        print(f"probe: {'HEALTHY' if ok else 'FAILED'} "
              f"({time.time()-t0:.1f}s) {r.stdout.strip().splitlines()[-1:]}")
        return ok
    except subprocess.TimeoutExpired:
        print(f"probe: WEDGED (no response in {timeout_s}s)")
        return False


def main():
    kill_after = float(sys.argv[1]) if len(sys.argv) > 1 else 15.0
    sig = (signal.SIGTERM if len(sys.argv) > 2 and sys.argv[2] == "term"
           else signal.SIGKILL)
    print("pre-experiment health check:")
    healthy = probe(180) or probe(180)  # one retry: first-touch after an
    #                                     idle tunnel can exceed 2 min
    assert healthy, "device unhealthy before the experiment — aborting"

    child = subprocess.Popen([sys.executable, "-c", CHILD],
                             stdout=subprocess.PIPE, text=True, bufsize=1)
    dispatched = False
    for line in child.stdout:
        print(line.rstrip(), flush=True)
        if "dispatching long chain" in line:
            dispatched = True
            break
    assert dispatched, "child never dispatched"
    time.sleep(kill_after)
    print(f"KILLING child (pid {child.pid}, sig {sig}) {kill_after}s into "
          "the long dispatch", flush=True)
    os.kill(child.pid, sig)
    child.wait()

    time.sleep(5)
    print("post-kill probes (one per ~2.5 min):")
    for i in range(3):
        if probe():
            print(f"VERDICT: {sig} mid-dispatch did NOT wedge the device")
            return
        time.sleep(20)
    print(f"VERDICT: device WEDGED by {sig} mid-dispatch — cause named")


if __name__ == "__main__":
    main()
