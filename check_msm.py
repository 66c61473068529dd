import time, random
import numpy as np
import jax, jax.numpy as jnp
from zklaim_tpu.utils.jaxconfig import setup_cache
setup_cache()
from zklaim_tpu.ec import jaxcurve as JC
from zklaim_tpu.ec.hostcurve import g1_generator
from zklaim_tpu.ff.limbs import ints_to_limbs, u64s_to_limbs
from zklaim_tpu.ff.params import R
from zklaim_tpu.msm.pippenger import msm

def ts(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)

ts(f"devices: {jax.devices()}")
n = 1 << 12
rng = random.Random(7)
gen_host = JC.host_points_to_proj(JC.FQ_OPS, [g1_generator()])
tiled = jax.tree.map(lambda a: jnp.broadcast_to(a, (n,) + a.shape[1:]), gen_host)
small = jnp.asarray(u64s_to_limbs(np.arange(1, n + 1, dtype=np.uint64)))
ts("compiling scalar_mul for point gen...")
points = jax.block_until_ready(jax.jit(JC.scalar_mul, static_argnums=0)(JC.FQ_OPS, tiled, small))
ts("points ready")
scalars_int = [rng.randrange(R) for _ in range(n)]
scalars = jnp.asarray(ints_to_limbs(scalars_int))

run = jax.jit(msm, static_argnums=(0, 3))
for c in (8,):
    ts(f"compile+warmup c={c}")
    out = jax.block_until_ready(run(JC.FQ_OPS, points, scalars, c))
    ts("warmup done")
    for i in range(3):
        t0 = time.perf_counter()
        out = run(JC.FQ_OPS, points, scalars, c)
        jax.block_until_ready(out)
        t1 = time.perf_counter()
        host = np.asarray(out[0])   # force real transfer
        t2 = time.perf_counter()
        ts(f"c={c} run{i}: block_until_ready={1e3*(t1-t0):.2f}ms  +to_host={1e3*(t2-t1):.2f}ms")
    total = sum(s * (i + 1) for i, s in enumerate(scalars_int)) % R
    exp = g1_generator() * total
    got = JC.proj_to_host_points(JC.FQ_OPS, jax.tree.map(lambda a: a[None], out))[0]
    ts(f"c={c} correct: {got == exp}")
