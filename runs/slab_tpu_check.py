"""Real-TPU check: implicit_sums_pallas_slab vs jnp column-slab partial sums."""
import jax, jax.numpy as jnp, numpy as np
from sqtpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from sqtpu.ops import geometry, quaternion as quat
from sqtpu.ops.render import render_depth_soft, depth_from_axes
from sqtpu.ops.image import nearest_resize
from sqtpu.ops.kernels.implicit import implicit_sums_pallas_slab
from sqtpu.ops.losses import _as_bhw

key = jax.random.PRNGKey(3)
ka, ke, kt, kq = jax.random.split(key, 4)
b, n, shard = 8, 64, 16
a = jax.random.uniform(ka, (b,3), jnp.float32, 25/255, 75/255)
e = jax.random.uniform(ke, (b,2), jnp.float32, 0.1, 1.0)
t = jax.random.uniform(kt, (b,3), jnp.float32, 88/255, 168/255)
q = quat.random_uniform(kq, (b,), jnp.float32)
p = jnp.concatenate([a,e,t,q], -1)
imgs = jax.vmap(lambda pi: render_depth_soft(pi, n, 1.5, 260.0))(jnp.roll(p,1,0))
small = nearest_resize(_as_bhw(imgs).astype(jnp.float32), (n,n))

ok = True
for x0 in (0, 16, 48):
    slab = small[:, :, x0:x0+shard]
    got = np.asarray(jax.jit(lambda s, pp: implicit_sums_pallas_slab(
        s, pp, jnp.int32(x0), n, 1.5, 260.0))(slab, p))
    # jnp reference: same math as sharded_losses jnp path
    ax = geometry.make_axis(n, "implicit", dtype=jnp.float32)
    ax_x = ax[x0:x0+shard]
    def one(pi):
        pp = geometry.clamp_params(pi)
        return depth_from_axes(ax_x, ax, ax, pp, jnp.float32(1.5), jnp.float32(260.0), n)
    d = jax.vmap(one)(p)
    want = np.asarray(jnp.sum(jnp.abs(slab - d), axis=(1,2)))
    rel = np.abs(got-want)/np.maximum(np.abs(want), 1e-6)
    print(f"x0={x0}: max rel {rel.max():.2e}  sums[0] {got[0]:.4f} vs {want[0]:.4f}")
    ok &= rel.max() < 1e-4

# grad check at one offset
x0 = 16
slab = small[:, :, x0:x0+shard]
g_k = jax.grad(lambda pp: jnp.sum(implicit_sums_pallas_slab(
    slab, pp, jnp.int32(x0), n, 1.5, 260.0)))(p)
ax = geometry.make_axis(n, "implicit", dtype=jnp.float32)
ax_x = ax[x0:x0+shard]
def lossj(pp_all):
    def one(pi):
        ppc = geometry.clamp_params(pi)
        return depth_from_axes(ax_x, ax, ax, ppc, jnp.float32(1.5), jnp.float32(260.0), n)
    d = jax.vmap(one)(pp_all)
    return jnp.sum(jnp.abs(slab - d))
g_j = jax.grad(lossj)(p)
gk, gj = np.asarray(g_k), np.asarray(g_j)
scale = np.abs(gj).max()
print(f"grad: max abs diff {np.abs(gk-gj).max():.2e} at scale {scale:.2e}")
# measured on real TPU (r4): kernel-vs-fp64 ~9.5e-4 rel, jnp-fp32-vs-fp64
# ~2.1e-4 rel, uniform across param columns — fp32 accumulation noise of
# the single-sweep analytic backward, no systematic column error
ok &= np.abs(gk-gj).max() < 2e-3*scale
print("PASS" if ok else "FAIL")
