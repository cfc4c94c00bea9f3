"""Workaround attempt: bundled msda, no jax.checkpoint, no P-chunk loop."""
import time
import numpy as np
import jax, jax.numpy as jnp
from selfocc_tpu.ops.msda import (_bundle_corners_2d,
                                  _bilinear_gather_cf_bundled)

B, H, D, Q, P = 6, 6, 16, 66049, 8
shapes = ((96, 200), (48, 100), (24, 50), (12, 25))
L = sum(a * b for a, b in shapes)
rng = np.random.RandomState(0)
value = jnp.asarray(rng.randn(B, L, H, D).astype(np.float32))
loc = jnp.asarray(rng.uniform(0, 1, (B, Q, H, 4, P, 2)).astype(np.float32))
att = rng.rand(B, Q, H, 4, P).astype(np.float32)
att = jnp.asarray(att / att.sum((-1, -2), keepdims=True))

def msda_nockpt(value, loc, att):
    out = jnp.zeros((B * H, Q, D), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = jnp.moveaxis(value[:, start:start + h * w], 2, 1)
        v = v.reshape(B, H, h * w, D)
        start += h * w
        vf = v.swapaxes(2, 3).reshape(B * H, D, h * w)
        vb = _bundle_corners_2d(vf, h, w)
        xy = loc[:, :, :, lvl] * jnp.array([w, h], jnp.float32) - 0.5
        xy = jnp.moveaxis(xy, 2, 1).reshape(B * H, Q, P, 2)
        w_l = jnp.moveaxis(att[:, :, :, lvl], 2, 1).reshape(B * H, Q, P)
        samp = jax.vmap(lambda vbf, c: _bilinear_gather_cf_bundled(
            vbf, c, h, w, D))(vb, xy)
        out = out + jnp.einsum('bdqp,bqp->bqd', samp, w_l)
    return jnp.moveaxis(out.reshape(B, H, Q, D), 1, 2).reshape(B, Q, H * D)

fn = jax.jit(msda_nockpt)
t0 = time.time()
s = float(np.asarray(fn(value, loc, att)).reshape(-1)[0])
print(f"nockpt_nochunk compile+run {time.time()-t0:.1f}s ok ({s:.4f})", flush=True)
for _ in range(2):
    t0 = time.time()
    s = float(np.asarray(fn(value, loc, att)).reshape(-1)[0])
    print(f"  steady {time.time()-t0:.2f}s", flush=True)
