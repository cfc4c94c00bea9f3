import time, jax
import jax.numpy as jnp
from selfocc_tpu.ops.msda import ms_deform_attn
rng = jax.random.PRNGKey(0)
shapes = ((96,200),(48,100),(24,50),(12,25))
L = sum(h*w for h,w in shapes); B,H,D,Q,P = 6,6,16,66049,12
k1,k2,k3 = jax.random.split(rng,3)
value = jax.random.normal(k1,(B,L,H,D))
loc = jax.random.uniform(k2,(B,Q,H,4,P,2))
att = jax.nn.softmax(jax.random.normal(k3,(B,Q,H,4,P)).reshape(B,Q,H,-1)).reshape(B,Q,H,4,P)
f = jax.jit(lambda v,l,a: ms_deform_attn(v,shapes,l,a))
t0=time.time(); o=f(value,loc,att); s=float(o.sum()); print('bundled compile+1st', round(time.time()-t0,1))
t0=time.time(); o=f(value,loc,att); s=float(o.sum()); print('bundled', round(time.time()-t0,2))
g = jax.jit(lambda v,l,a: ms_deform_attn(v,shapes,l,a,bundle_corners=False))
t0=time.time(); o=g(value,loc,att); s=float(o.sum()); print('unbundled compile+1st', round(time.time()-t0,1))
t0=time.time(); o=g(value,loc,att); s=float(o.sum()); print('unbundled', round(time.time()-t0,2))
