"""One-shot encoder benchmark, designed to exit cleanly (never SIGKILL the
process while the device is busy — that wedges the axon tunnel)."""
import sys, time
import jax, jax.numpy as jnp

mode = sys.argv[1] if len(sys.argv) > 1 else "block"
iters = int(sys.argv[2]) if len(sys.argv) > 2 else 4
N = 1024 * 192
xb = jax.random.uniform(jax.random.PRNGKey(3), (N, 3), minval=-1.45, maxval=1.45)

if mode == "block":
    from indoor_nerf_tpu.ops.blockhash import BlockHashConfig, block_hash_encode, init_block_table
    cfg = BlockHashConfig(bbox_min=(-1.5,)*3, bbox_max=(1.5,)*3, n_levels=16,
                          log2_rows=12, base_resolution=16, finest_resolution=512)
    table = init_block_table(jax.random.PRNGKey(1), cfg)
    enc = lambda x, t: block_hash_encode(x, t, cfg)[0]
else:
    from indoor_nerf_tpu.ops.encoding import HashGridConfig, hash_encode, init_hash_table
    cfg = HashGridConfig(bbox_min=(-1.5,)*3, bbox_max=(1.5,)*3, n_levels=16,
                         log2_hashmap_size=19, base_resolution=16, finest_resolution=512)
    table = init_hash_table(jax.random.PRNGKey(1), cfg)
    enc = lambda x, t: hash_encode(x, t, cfg)[0]

@jax.jit
def fwd(x, acc):
    f = enc(x, table)
    s = f.sum()
    return x + 1e-18 * s, acc + s

@jax.jit
def bwd(t, x):
    g = jax.grad(lambda t: enc(x, t).sum())(t)
    return t + 1e-20 * g, x + 1e-18 * g.sum()

# warm up (single execution each)
x, acc = fwd(xb, 0.0); jax.block_until_ready(x)
t0 = time.perf_counter()
for _ in range(iters):
    x, acc = fwd(x, acc)
jax.block_until_ready(x)
print(f"{mode} fwd: {(time.perf_counter()-t0)/iters*1e3:.2f} ms/iter", flush=True)

t, x2 = bwd(table, xb); jax.block_until_ready(t)
t0 = time.perf_counter()
for _ in range(iters):
    t, x2 = bwd(t, x2)
jax.block_until_ready(t)
print(f"{mode} fwd+bwd: {(time.perf_counter()-t0)/iters*1e3:.2f} ms/iter", flush=True)
