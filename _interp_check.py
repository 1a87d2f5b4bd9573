import os
os.environ["JAX_PLATFORMS"]="cpu"
os.environ["DIALOG_TPU_PALLAS_INTERPRET"]="1"
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_platforms","cpu")
from dialog_tpu.kernels.fast import fast_nms_rank, _reference
rng = np.random.default_rng(0)
img = jnp.asarray(rng.uniform(0,255,(480,640)).astype(np.float32))
a = fast_nms_rank(img, 7.0, 20.0, 19)
b = _reference(img, 7.0, 20.0, 19)
print("fast kernel interpret max abs diff:", float(jnp.max(jnp.abs(a-b))))
from dialog_tpu.kernels.hamming import hamming_best2, _reference as href
da = jnp.asarray(rng.integers(0,2**32,(200,8),dtype=np.uint32))
db = jnp.asarray(rng.integers(0,2**32,(300,8),dtype=np.uint32))
va = jnp.ones(200,bool); vb = jnp.ones(300,bool)
i1,b1,s1 = hamming_best2(da,db,va,vb)
i2,b2,s2 = href(da,db,va,vb,jnp.zeros((200,2)),jnp.zeros((300,2)),jnp.full(200,-1.0),jnp.full(300,-1.0),jnp.zeros(200,jnp.int32),jnp.zeros(300,jnp.int32),-1)
print("hamming interpret equal:", bool(jnp.all(i1==i2) and jnp.all(b1==b2) and jnp.all(s1==s2)))
